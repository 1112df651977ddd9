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
V4_EMB_GROUP = 64  # embedding rows stay Q8_0 in v4 files


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


@dataclasses.dataclass
class Q4Tensorfile:
    """One v4 int4 weight, already in matmul orientation: q (…, K/2, N) int8
    packed nibbles (half-split along K, offset-binary codes — the exact
    in-memory layout of ops/quant4.py::Q4Tensor), s (…, K/gs, N) fp32."""

    q: np.ndarray
    s: np.ndarray


@dataclasses.dataclass
class Q4Weights:
    """v4 int4 checkpoint contents (our extension — the reference's formats
    stop at Q8_0/v2). Weights are stored matmul-oriented so loading is a
    zero-copy memmap straight into the fused int4 kernel path; norms stay
    fp32 and the embedding stays Q8_0 int8 rows (quality-sensitive,
    negligible traffic)."""

    rms_att: np.ndarray  # (L, D) f32
    rms_ffn: np.ndarray
    rms_final: np.ndarray
    emb_q: np.ndarray  # (V, D) int8 (Q8_0 rows)
    emb_s: np.ndarray  # (V, D//V4_EMB_GROUP) f32
    wq: Q4Tensorfile  # (L, D/2, D)
    wk: Q4Tensorfile  # (L, D/2, KV)
    wv: Q4Tensorfile
    wo: Q4Tensorfile
    w1: Q4Tensorfile  # (L, D/2, H)
    w2: Q4Tensorfile  # (L, H/2, D)
    w3: Q4Tensorfile
    wcls: Q4Tensorfile  # (D/2, V)


# ---------------------------------------------------------------------------
# quantization


def q4_group_size(k: int, group_size: int) -> int:
    """Effective group size along a K-dim of `k`: the half-split packing
    needs group-aligned halves, so awkward dims shrink to a divisor of K/2
    (all real Llama dims keep the requested size). Shared by
    models/params.py::quantize_params_q4."""
    import math

    return group_size if (k // 2) % group_size == 0 else math.gcd(k // 2, group_size)


def quantize_q40(w: np.ndarray, group_size: int) -> tuple[np.ndarray, np.ndarray, float]:
    """Symmetric int4 group quantization of a matmul-oriented (…, K, N)
    array: scale = absmax/7, codes clipped to [-8, 7], packed half-split
    along K as offset-binary nibbles. BIT-IDENTICAL to
    ops/quant4.py::q4_quantize_weights (tests/test_q4_checkpoint.py)."""
    w = np.asarray(w, np.float32)
    k, n = w.shape[-2], w.shape[-1]
    gs = q4_group_size(k, group_size)
    lead = w.shape[:-2]
    g = w.reshape(*lead, k // gs, gs, n)
    absmax = np.abs(g).max(axis=-2, keepdims=True)
    scale = absmax / 7.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(g / scale), -8, 7)
    maxerr = float(np.abs(q * scale - g).max()) if g.size else 0.0
    nib = (q.astype(np.int32) + 8).reshape(*lead, k, n)
    packed = nib[..., : k // 2, :] | (nib[..., k // 2 :, :] << 4)
    return (
        packed.astype(np.uint8).astype(np.int8),
        np.ascontiguousarray(scale[..., 0, :], np.float32),
        maxerr,
    )


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
    if want_version in (2, 4):
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


def read_v4(path: str) -> tuple[ModelConfig, Q4Weights]:
    """Read a v4 int4 checkpoint: weights memmap zero-copy in the exact
    packed layout the fused int4 kernels consume (ops/quant4.py)."""
    with open(path, "rb") as f:
        cfg, shared, gs = _read_header_v12(f, want_version=4)
    raw = np.memmap(path, dtype=np.uint8, mode="r", offset=HEADER_SIZE_V12)
    c = cfg
    off = 0

    def take(dtype, shape) -> np.ndarray:
        nonlocal off
        n = int(np.prod(shape)) * np.dtype(dtype).itemsize
        arr = np.frombuffer(raw[off : off + n], dtype=dtype).reshape(shape)
        off += n
        return arr

    def take_q4(k, n) -> Q4Tensorfile:
        gs_t = q4_group_size(k, gs)
        q = take(np.int8, (c.n_layers, k // 2, n))
        s = take(np.float32, (c.n_layers, k // gs_t, n))
        return Q4Tensorfile(q=q, s=s)

    rms_att = take(np.float32, (c.n_layers, c.dim))
    rms_ffn = take(np.float32, (c.n_layers, c.dim))
    rms_final = take(np.float32, (c.dim,))
    emb_q = take(np.int8, (c.vocab_size, c.dim))
    emb_s = take(np.float32, (c.vocab_size, c.dim // V4_EMB_GROUP))
    wq = take_q4(c.dim, c.dim)
    wk = take_q4(c.dim, c.kv_dim)
    wv = take_q4(c.dim, c.kv_dim)
    wo = take_q4(c.dim, c.dim)
    w1 = take_q4(c.dim, c.hidden_dim)
    w2 = take_q4(c.hidden_dim, c.dim)
    w3 = take_q4(c.dim, c.hidden_dim)
    # wcls is 2-D (D/2, V); always materialized (the int8 embedding cannot
    # alias an int4 classifier even for shared_classifier configs)
    gs_c = q4_group_size(c.dim, gs)
    nq = (c.dim // 2) * c.vocab_size
    q = np.frombuffer(raw[off : off + nq], np.int8).reshape(c.dim // 2, c.vocab_size)
    off += nq
    ns = (c.dim // gs_c) * c.vocab_size * 4
    s = np.frombuffer(raw[off : off + ns], np.float32).reshape(
        c.dim // gs_c, c.vocab_size
    )
    wcls = Q4Tensorfile(q=q, s=s)
    return cfg, Q4Weights(
        rms_att=rms_att, rms_ffn=rms_ffn, rms_final=rms_final,
        emb_q=emb_q, emb_s=emb_s,
        wq=wq, wk=wk, wv=wv, wo=wo, w1=w1, w2=w2, w3=w3, wcls=wcls,
    )


def sniff_version(path: str) -> int:
    """Return 0, 1, 2, or 4 depending on the checkpoint format."""
    with open(path, "rb") as f:
        head = f.read(8)
    magic, version = struct.unpack("Ii", head)
    if magic == MAGIC_AK42:
        return version
    return 0


def load_checkpoint(path: str):
    """Dispatch on format; returns (config, LlamaWeights | QuantWeights |
    Q4Weights)."""
    v = sniff_version(path)
    if v == 0:
        return read_v0(path)
    if v == 1:
        return read_v1(path)
    if v == 2:
        return read_v2(path)
    if v == 4:
        return read_v4(path)
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
    if version in (2, 4):
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


def write_v4(path: str, cfg: ModelConfig, w: LlamaWeights, group_size: int = 32) -> float:
    """Write an int4 (v4) checkpoint from dense fp32 weights; returns the max
    quantization group error. Weights are transposed to matmul orientation
    (K=in, N=out) and packed exactly as ops/quant4.py::Q4Tensor expects, so
    read_v4 loads them zero-copy."""
    if cfg.dim % V4_EMB_GROUP:
        # read_v4 sizes the embedding scales row-aligned as (V, D//64); a
        # dim that 64 does not divide would silently shift every subsequent
        # tensor's read offset
        raise ValueError(
            f"v4 checkpoints need dim divisible by {V4_EMB_GROUP} "
            f"(Q8 embedding groups); got dim={cfg.dim}"
        )
    maxerr = 0.0
    with open(path, "wb") as f:
        _write_header_v12(f, cfg, version=4, group_size=group_size)
        _f32(f, w.rms_att)
        _f32(f, w.rms_ffn)
        _f32(f, w.rms_final)
        # Q8_0 embedding rows (groups along D)
        emb_q, emb_s, err = quantize_q80(
            np.asarray(w.tok_emb, np.float32).reshape(-1, V4_EMB_GROUP),
            V4_EMB_GROUP,
        )
        maxerr = max(maxerr, err)
        f.write(np.ascontiguousarray(emb_q).tobytes())
        f.write(np.ascontiguousarray(emb_s, np.float32).tobytes())

        def q4(arr: np.ndarray) -> None:
            nonlocal maxerr
            a = np.swapaxes(np.asarray(arr, np.float32), -1, -2)  # -> (…, K, N)
            packed, scale, err = quantize_q40(a, group_size)
            maxerr = max(maxerr, err)
            f.write(np.ascontiguousarray(packed).tobytes())
            f.write(np.ascontiguousarray(scale, np.float32).tobytes())

        for stack in (w.wq, w.wk, w.wv, w.wo, w.w1, w.w2, w.w3):
            q4(stack)
        q4(w.wcls)
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
