"""llama2.c checkpoint formats: v0 (legacy), v1 (fp32 "ak42"), v2 (Q8_0).

Byte layouts re-derived from the reference:
- v0: 7-int32 header {dim, hidden_dim, n_layers, n_heads, n_kv_heads,
  vocab_size, seq_len}; negative vocab_size signals an unshared classifier;
  fp32 tensors in fixed order; two legacy freq_cis blocks are skipped before
  wcls (reference: src/utils.cpp:119-170, writer train/export.py:75-127).
- v1: magic 0x616b3432 ("ak42"), version=1, same 7 ints, shared_classifier
  byte, zero-pad to a 256-byte header; fp32 tensors with all norms first
  (reference: train/export.py:132-180).
- v2: same 256-byte header plus group_size int32; norms fp32 first, then each
  weight as [int8 values][fp32 per-group scales] (reference: runq.c:189-251,
  train/export.py:182-260).

All 2-D weights are stored row-major as (out_features, in_features), matching
the reference's `matmul` W(d,n) @ x(n) convention (src/seq.cpp:40-51). This
module keeps that orientation; the model layer transposes into (in, out) for
`x @ W` on the MXU.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import BinaryIO

import numpy as np

from hip_llama_tpu.config import ModelConfig

MAGIC_AK42 = 0x616B3432
HEADER_SIZE_V12 = 256


@dataclasses.dataclass
class LlamaWeights:
    """fp32 weights in file orientation: 2-D arrays are (out, in)."""

    tok_emb: np.ndarray  # (V, D)
    rms_att: np.ndarray  # (L, D)
    wq: np.ndarray  # (L, D, D)
    wk: np.ndarray  # (L, kv_dim, D)
    wv: np.ndarray  # (L, kv_dim, D)
    wo: np.ndarray  # (L, D, D)
    rms_ffn: np.ndarray  # (L, D)
    w1: np.ndarray  # (L, H, D)
    w2: np.ndarray  # (L, D, H)
    w3: np.ndarray  # (L, H, D)
    rms_final: np.ndarray  # (D,)
    wcls: np.ndarray  # (V, D); aliases tok_emb when shared


@dataclasses.dataclass
class QuantTensor:
    """Q8_0 tensor: int8 values + fp32 scale per `group_size` values.

    float value[i] = q[i] * s[i // group_size]  (reference: runq.c:139-143).
    """

    q: np.ndarray  # int8, flat or original shape
    s: np.ndarray  # float32, numel(q) // group_size

    def dequantize(self, group_size: int) -> np.ndarray:
        q = self.q.reshape(-1)
        return (
            q.astype(np.float32).reshape(-1, group_size) * self.s.reshape(-1, 1)
        ).reshape(self.q.shape)


@dataclasses.dataclass
class QuantWeights:
    """v2 Q8_0 checkpoint contents (norms fp32, weights quantized)."""

    rms_att: np.ndarray
    rms_ffn: np.ndarray
    rms_final: np.ndarray
    q_tokens: QuantTensor  # (V, D)
    wq: list[QuantTensor]  # per layer, (D, D)
    wk: list[QuantTensor]
    wv: list[QuantTensor]
    wo: list[QuantTensor]
    w1: list[QuantTensor]
    w2: list[QuantTensor]
    w3: list[QuantTensor]
    wcls: QuantTensor  # aliases q_tokens when shared


# ---------------------------------------------------------------------------
# quantization


def quantize_q80(w: np.ndarray, group_size: int) -> tuple[np.ndarray, np.ndarray, float]:
    """Symmetric int8 group quantization, scale = absmax/127.

    Matches train/export.py:46-70 / runq.c:145-171 (round-to-nearest,
    banker's rounding via np.round == torch.round semantics).
    """
    flat = w.astype(np.float32).reshape(-1, group_size)
    wmax = np.abs(flat).max(axis=1)
    scale = wmax / 127.0
    scale_safe = np.where(scale == 0.0, 1.0, scale)
    quant = flat / scale_safe[:, None]
    int8val = np.round(quant).astype(np.int8)
    fp32val = int8val.astype(np.float32) * scale[:, None]
    maxerr = float(np.abs(fp32val - flat).max()) if flat.size else 0.0
    return int8val.reshape(w.shape), scale.astype(np.float32), maxerr


def dequantize(qt: QuantTensor, group_size: int) -> np.ndarray:
    return qt.dequantize(group_size)


# ---------------------------------------------------------------------------
# readers


def _read_config_v0(f: BinaryIO) -> ModelConfig:
    vals = struct.unpack("7i", f.read(28))
    dim, hidden, n_layers, n_heads, n_kv_heads, vocab, seq_len = vals
    shared = vocab > 0
    return ModelConfig(
        dim=dim,
        hidden_dim=hidden,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=n_kv_heads,
        vocab_size=abs(vocab),
        seq_len=seq_len,
        shared_classifier=shared,
    )


def read_v0(path: str) -> tuple[ModelConfig, LlamaWeights]:
    """Read a legacy v0 checkpoint via zero-copy memmap (src/utils.cpp:150-170)."""
    with open(path, "rb") as f:
        cfg = _read_config_v0(f)
    data = np.memmap(path, dtype=np.float32, mode="r", offset=28)
    c = cfg
    hs = c.head_size
    sizes = {
        "tok_emb": (c.vocab_size, c.dim),
        "rms_att": (c.n_layers, c.dim),
        "wq": (c.n_layers, c.dim, c.dim),
        "wk": (c.n_layers, c.kv_dim, c.dim),
        "wv": (c.n_layers, c.kv_dim, c.dim),
        "wo": (c.n_layers, c.dim, c.dim),
        "rms_ffn": (c.n_layers, c.dim),
        "w1": (c.n_layers, c.hidden_dim, c.dim),
        "w2": (c.n_layers, c.dim, c.hidden_dim),
        "w3": (c.n_layers, c.hidden_dim, c.dim),
        "rms_final": (c.dim,),
    }
    out: dict[str, np.ndarray] = {}
    off = 0
    for name, shape in sizes.items():
        n = int(np.prod(shape))
        out[name] = np.asarray(data[off : off + n]).reshape(shape)
        off += n
    # skip legacy freq_cis_real / freq_cis_imag (src/utils.cpp:145-146)
    off += c.seq_len * hs  # hs/2 real + hs/2 imag
    if c.shared_classifier:
        out["wcls"] = out["tok_emb"]
    else:
        n = c.vocab_size * c.dim
        out["wcls"] = np.asarray(data[off : off + n]).reshape(c.vocab_size, c.dim)
        off += n
    return cfg, LlamaWeights(**out)


def _read_header_v12(f: BinaryIO, want_version: int) -> tuple[ModelConfig, bool, int]:
    magic, version = struct.unpack("Ii", f.read(8))
    if magic != MAGIC_AK42:
        raise ValueError(f"bad magic 0x{magic:08x}, expected 'ak42'")
    if version != want_version:
        raise ValueError(f"bad version {version}, expected {want_version}")
    vals = struct.unpack("7i", f.read(28))
    shared = struct.unpack("B", f.read(1))[0]
    group_size = 0
    if want_version == 2:
        group_size = struct.unpack("i", f.read(4))[0]
    dim, hidden, n_layers, n_heads, n_kv_heads, vocab, seq_len = vals
    cfg = ModelConfig(
        dim=dim,
        hidden_dim=hidden,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=n_kv_heads,
        vocab_size=vocab,
        seq_len=seq_len,
        shared_classifier=bool(shared),
        group_size=group_size or None,
    )
    return cfg, bool(shared), group_size


def read_v1(path: str) -> tuple[ModelConfig, LlamaWeights]:
    """Read a v1 fp32 checkpoint (train/export.py:132-180 layout)."""
    with open(path, "rb") as f:
        cfg, shared, _ = _read_header_v12(f, want_version=1)
    data = np.memmap(path, dtype=np.float32, mode="r", offset=HEADER_SIZE_V12)
    c = cfg
    order = {
        "rms_att": (c.n_layers, c.dim),
        "rms_ffn": (c.n_layers, c.dim),
        "rms_final": (c.dim,),
        "tok_emb": (c.vocab_size, c.dim),
        "wq": (c.n_layers, c.dim, c.dim),
        "wk": (c.n_layers, c.kv_dim, c.dim),
        "wv": (c.n_layers, c.kv_dim, c.dim),
        "wo": (c.n_layers, c.dim, c.dim),
        "w1": (c.n_layers, c.hidden_dim, c.dim),
        "w2": (c.n_layers, c.dim, c.hidden_dim),
        "w3": (c.n_layers, c.hidden_dim, c.dim),
    }
    out: dict[str, np.ndarray] = {}
    off = 0
    for name, shape in order.items():
        n = int(np.prod(shape))
        out[name] = np.asarray(data[off : off + n]).reshape(shape)
        off += n
    if shared:
        out["wcls"] = out["tok_emb"]
    else:
        n = c.vocab_size * c.dim
        out["wcls"] = np.asarray(data[off : off + n]).reshape(c.vocab_size, c.dim)
    return cfg, LlamaWeights(**out)


def read_v2(path: str) -> tuple[ModelConfig, QuantWeights]:
    """Read a v2 Q8_0 checkpoint (runq.c:189-251 layout)."""
    with open(path, "rb") as f:
        cfg, shared, gs = _read_header_v12(f, want_version=2)
    raw = np.memmap(path, dtype=np.uint8, mode="r", offset=HEADER_SIZE_V12)
    c = cfg
    off = 0

    def take_f32(shape) -> np.ndarray:
        nonlocal off
        n = int(np.prod(shape)) * 4
        arr = np.frombuffer(raw[off : off + n], dtype=np.float32).reshape(shape)
        off += n
        return arr

    def take_quant(shape) -> QuantTensor:
        nonlocal off
        n = int(np.prod(shape))
        q = np.frombuffer(raw[off : off + n], dtype=np.int8).reshape(shape)
        off += n
        ns = n // gs * 4
        s = np.frombuffer(raw[off : off + ns], dtype=np.float32)
        off += ns
        return QuantTensor(q=q, s=s)

    rms_att = take_f32((c.n_layers, c.dim))
    rms_ffn = take_f32((c.n_layers, c.dim))
    rms_final = take_f32((c.dim,))
    q_tokens = take_quant((c.vocab_size, c.dim))
    per_layer = lambda shape: [take_quant(shape) for _ in range(c.n_layers)]
    wq = per_layer((c.dim, c.dim))
    wk = per_layer((c.kv_dim, c.dim))
    wv = per_layer((c.kv_dim, c.dim))
    wo = per_layer((c.dim, c.dim))
    w1 = per_layer((c.hidden_dim, c.dim))
    w2 = per_layer((c.dim, c.hidden_dim))
    w3 = per_layer((c.hidden_dim, c.dim))
    wcls = q_tokens if shared else take_quant((c.vocab_size, c.dim))
    return cfg, QuantWeights(
        rms_att=rms_att,
        rms_ffn=rms_ffn,
        rms_final=rms_final,
        q_tokens=q_tokens,
        wq=wq,
        wk=wk,
        wv=wv,
        wo=wo,
        w1=w1,
        w2=w2,
        w3=w3,
        wcls=wcls,
    )


def sniff_version(path: str) -> int:
    """Return 0, 1, or 2 depending on the checkpoint format."""
    with open(path, "rb") as f:
        head = f.read(8)
    magic, version = struct.unpack("Ii", head)
    if magic == MAGIC_AK42:
        return version
    return 0


def load_checkpoint(path: str):
    """Dispatch on format; returns (config, LlamaWeights | QuantWeights)."""
    v = sniff_version(path)
    if v == 0:
        return read_v0(path)
    if v == 1:
        return read_v1(path)
    if v == 2:
        return read_v2(path)
    raise ValueError(f"unsupported checkpoint version {v}")


# ---------------------------------------------------------------------------
# writers (parity with train/export.py — P3 in SURVEY.md)


def _f32(f: BinaryIO, arr: np.ndarray) -> None:
    f.write(np.ascontiguousarray(arr, dtype=np.float32).tobytes())


def write_v0(path: str, cfg: ModelConfig, w: LlamaWeights) -> None:
    with open(path, "wb") as f:
        vocab = cfg.vocab_size if cfg.shared_classifier else -cfg.vocab_size
        f.write(
            struct.pack(
                "7i",
                cfg.dim,
                cfg.hidden_dim,
                cfg.n_layers,
                cfg.n_heads,
                cfg.n_kv_heads,
                vocab,
                cfg.seq_len,
            )
        )
        for arr in (
            w.tok_emb,
            w.rms_att,
            w.wq,
            w.wk,
            w.wv,
            w.wo,
            w.rms_ffn,
            w.w1,
            w.w2,
            w.w3,
            w.rms_final,
        ):
            _f32(f, arr)
        # legacy freq_cis blocks (skipped by readers but must occupy space)
        _f32(f, np.zeros(cfg.seq_len * cfg.head_size, dtype=np.float32))
        if not cfg.shared_classifier:
            _f32(f, w.wcls)


def _write_header_v12(f: BinaryIO, cfg: ModelConfig, version: int, group_size: int | None):
    f.write(struct.pack("Ii", MAGIC_AK42, version))
    f.write(
        struct.pack(
            "7i",
            cfg.dim,
            cfg.hidden_dim,
            cfg.n_layers,
            cfg.n_heads,
            cfg.n_kv_heads,
            cfg.vocab_size,
            cfg.seq_len,
        )
    )
    f.write(struct.pack("B", int(cfg.shared_classifier)))
    if version == 2:
        f.write(struct.pack("i", group_size))
    pad = HEADER_SIZE_V12 - f.tell()
    f.write(b"\0" * pad)


def write_v1(path: str, cfg: ModelConfig, w: LlamaWeights) -> None:
    with open(path, "wb") as f:
        _write_header_v12(f, cfg, version=1, group_size=None)
        for arr in (
            w.rms_att,
            w.rms_ffn,
            w.rms_final,
            w.tok_emb,
            w.wq,
            w.wk,
            w.wv,
            w.wo,
            w.w1,
            w.w2,
            w.w3,
        ):
            _f32(f, arr)
        if not cfg.shared_classifier:
            _f32(f, w.wcls)


def write_v2(path: str, cfg: ModelConfig, w: LlamaWeights, group_size: int = 64) -> float:
    """Write Q8_0; returns the max quantization group error (export.py:252-256)."""
    while cfg.dim % group_size != 0:
        group_size //= 2
    maxerr = 0.0
    with open(path, "wb") as f:
        _write_header_v12(f, cfg, version=2, group_size=group_size)
        _f32(f, w.rms_att)
        _f32(f, w.rms_ffn)
        _f32(f, w.rms_final)

        def q(arr: np.ndarray) -> None:
            nonlocal maxerr
            int8val, scale, err = quantize_q80(arr.reshape(arr.shape[0], -1), group_size)
            maxerr = max(maxerr, err)
            f.write(int8val.tobytes())
            f.write(scale.tobytes())

        q(w.tok_emb)
        for stack in (w.wq, w.wk, w.wv, w.wo, w.w1, w.w2, w.w3):
            for l in range(cfg.n_layers):
                q(stack[l])
        if not cfg.shared_classifier:
            q(w.wcls)
    return maxerr


# ---------------------------------------------------------------------------
# fixtures


def random_weights(cfg: ModelConfig, seed: int = 0, scale: float | None = None) -> LlamaWeights:
    """Random weights for tests/benchmarks; scaled like a trained init."""
    rng = np.random.default_rng(seed)
    c = cfg

    def mat(*shape, fan_in):
        s = scale if scale is not None else 1.0 / np.sqrt(fan_in)
        return rng.normal(0.0, s, size=shape).astype(np.float32)

    tok_emb = mat(c.vocab_size, c.dim, fan_in=c.dim)
    w = LlamaWeights(
        tok_emb=tok_emb,
        rms_att=np.ones((c.n_layers, c.dim), np.float32)
        + rng.normal(0, 0.02, (c.n_layers, c.dim)).astype(np.float32),
        wq=mat(c.n_layers, c.dim, c.dim, fan_in=c.dim),
        wk=mat(c.n_layers, c.kv_dim, c.dim, fan_in=c.dim),
        wv=mat(c.n_layers, c.kv_dim, c.dim, fan_in=c.dim),
        wo=mat(c.n_layers, c.dim, c.dim, fan_in=c.dim),
        rms_ffn=np.ones((c.n_layers, c.dim), np.float32)
        + rng.normal(0, 0.02, (c.n_layers, c.dim)).astype(np.float32),
        w1=mat(c.n_layers, c.hidden_dim, c.dim, fan_in=c.dim),
        w2=mat(c.n_layers, c.dim, c.hidden_dim, fan_in=c.hidden_dim),
        w3=mat(c.n_layers, c.hidden_dim, c.dim, fan_in=c.dim),
        rms_final=np.ones((c.dim,), np.float32),
        wcls=tok_emb,
    )
    if not c.shared_classifier:
        w.wcls = mat(c.vocab_size, c.dim, fan_in=c.dim)
    return w
