"""Import Llama checkpoints from HuggingFace / Meta formats.

Parity with the reference's export-side loaders (train/export.py:356-491:
load_meta_model / load_hf_model feeding model_export). Output is
`LlamaWeights` in the file orientation (2-D tensors (out, in)), so the
result plugs into params_from_weights / write_v0/v1/v2 directly.

Key transform: HF stores q_proj/k_proj with rows PERMUTED for its
half-rotation RoPE; the llama2.c family (and this framework, models/llama.py
rope()) uses the original Meta interleaved-pair convention, so the inverse
permutation is applied here (the same `permute_reverse` the reference's
exporter applies, export.py:422-437).
"""

from __future__ import annotations

import json
import os

import numpy as np

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.io.checkpoint import LlamaWeights


def _unpermute(w: np.ndarray, n_heads: int, dim1: int, dim2: int) -> np.ndarray:
    """Inverse of HF's rotary row permutation: HF groups each head's rows as
    [evens..., odds...]; Meta/llama2.c interleaves (e0, o0, e1, o1, ...)."""
    return (
        w.reshape(n_heads, 2, dim1 // n_heads // 2, dim2)
        .swapaxes(1, 2)
        .reshape(dim1, dim2)
    )


def _permute(w: np.ndarray, n_heads: int, dim1: int, dim2: int) -> np.ndarray:
    """HF's rotary row permutation (inverse of _unpermute): regroup each
    head's interleaved (e0, o0, e1, o1, ...) rows as [evens..., odds...]."""
    return (
        w.reshape(n_heads, dim1 // n_heads // 2, 2, dim2)
        .swapaxes(1, 2)
        .reshape(dim1, dim2)
    )


def save_hf_llama(
    out_dir: str, cfg: ModelConfig, w: LlamaWeights, dtype: str = "float32"
) -> None:
    """Export LlamaWeights to a HuggingFace-format model directory
    (config.json + model.safetensors) loadable by
    transformers.LlamaForCausalLM.from_pretrained and by load_hf_llama.

    Parity with the reference's hf_export (train/export.py:262-354,
    dispatched at :492-510): wq/wk rows get HF's half-rotation permutation
    applied so HF's rotate-half RoPE reproduces the Meta interleaved-pair
    convention this framework computes (models/llama.py rope())."""
    os.makedirs(out_dir, exist_ok=True)
    hd = cfg.head_size

    tensors: dict[str, np.ndarray] = {
        "model.embed_tokens.weight": w.tok_emb,
        "model.norm.weight": w.rms_final,
    }
    for l in range(cfg.n_layers):
        p = f"model.layers.{l}"
        tensors[f"{p}.input_layernorm.weight"] = w.rms_att[l]
        tensors[f"{p}.self_attn.q_proj.weight"] = _permute(
            w.wq[l], cfg.n_heads, cfg.dim, cfg.dim
        )
        tensors[f"{p}.self_attn.k_proj.weight"] = _permute(
            w.wk[l], cfg.n_kv_heads, cfg.n_kv_heads * hd, cfg.dim
        )
        tensors[f"{p}.self_attn.v_proj.weight"] = w.wv[l]
        tensors[f"{p}.self_attn.o_proj.weight"] = w.wo[l]
        tensors[f"{p}.post_attention_layernorm.weight"] = w.rms_ffn[l]
        tensors[f"{p}.mlp.gate_proj.weight"] = w.w1[l]
        tensors[f"{p}.mlp.down_proj.weight"] = w.w2[l]
        tensors[f"{p}.mlp.up_proj.weight"] = w.w3[l]
    if not cfg.shared_classifier:
        tensors["lm_head.weight"] = w.wcls

    st_path = os.path.join(out_dir, "model.safetensors")
    if dtype == "bfloat16":
        # numpy has no native bf16 — go through torch for the payload
        import torch
        from safetensors.torch import save_file as save_torch

        save_torch(
            {
                k: torch.from_numpy(
                    np.ascontiguousarray(np.asarray(v, np.float32))
                ).to(torch.bfloat16)
                for k, v in tensors.items()
            },
            st_path, metadata={"format": "pt"},
        )
    else:
        from safetensors.numpy import save_file

        np_dtype = {"float32": np.float32, "float16": np.float16}[dtype]
        save_file(
            {
                k: np.ascontiguousarray(np.asarray(v, np_dtype))
                for k, v in tensors.items()
            },
            # "pt": transformers rejects format "np"; the payload bytes are
            # framework-agnostic either way
            st_path, metadata={"format": "pt"},
        )

    config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": cfg.dim,
        "intermediate_size": cfg.hidden_dim,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "head_dim": hd,
        "vocab_size": cfg.vocab_size,
        "max_position_embeddings": cfg.seq_len,
        "rms_norm_eps": cfg.norm_eps,
        "rope_theta": cfg.rope_theta,
        "hidden_act": "silu",
        "tie_word_embeddings": bool(cfg.shared_classifier),
        "bos_token_id": 1,
        "eos_token_id": 2,
        "torch_dtype": dtype,
        "attention_bias": False,
        "mlp_bias": False,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    with open(os.path.join(out_dir, "generation_config.json"), "w") as f:
        json.dump({"bos_token_id": 1, "eos_token_id": 2}, f, indent=2)


def load_hf_llama(model_dir: str) -> tuple[ModelConfig, LlamaWeights]:
    """Load a local HF-format Llama directory (config.json + safetensors or
    pytorch_model*.bin shards) into LlamaWeights."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hc = json.load(f)
    rs = hc.get("rope_scaling")
    if rs and rs.get("rope_type", rs.get("type")) not in (None, "default"):
        # Llama-3.1+ long-context scaling schemes (llama3/linear/yarn...) are
        # not implemented by rope(); loading would silently produce
        # incoherent output at any context length
        raise NotImplementedError(
            f"rope_scaling={rs!r} is not supported (plain RoPE with "
            "configurable rope_theta only)"
        )
    cfg = ModelConfig(
        dim=hc["hidden_size"],
        hidden_dim=hc["intermediate_size"],
        n_layers=hc["num_hidden_layers"],
        n_heads=hc["num_attention_heads"],
        n_kv_heads=hc.get("num_key_value_heads", hc["num_attention_heads"]),
        vocab_size=hc["vocab_size"],
        seq_len=hc.get("max_position_embeddings", 2048),
        shared_classifier=bool(hc.get("tie_word_embeddings", False)),
        norm_eps=hc.get("rms_norm_eps", 1e-5),
        rope_theta=float(hc.get("rope_theta", 10000.0)),
    )

    # Lazy per-tensor access (ADVICE r1): materializing every shard as fp32
    # before stacking peaks at ~2x model fp32 bytes. safetensors are read
    # tensor-by-tensor through open handles (peak ~= one fp32 copy + one
    # layer); torch shards stay in their on-disk dtype (fp16/bf16) and each
    # tensor is popped + converted only as it is consumed.
    st_files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors import safe_open  # available via transformers dep

        handles = {
            fn: safe_open(os.path.join(model_dir, fn), framework="np")
            for fn in st_files
        }
        where = {k: fn for fn, h in handles.items() for k in h.keys()}

        def fetch(name):
            return handles[where[name]].get_tensor(name)

        has = where.__contains__
    else:
        import torch

        tensors: dict = {}
        for fn in sorted(
            f for f in os.listdir(model_dir)
            if f.startswith("pytorch_model") and f.endswith(".bin")
        ):
            sd = torch.load(
                os.path.join(model_dir, fn), map_location="cpu", weights_only=True
            )
            tensors.update(sd)
        if not tensors:
            raise FileNotFoundError(f"no weight files in {model_dir}")

        def fetch(name):
            return tensors.pop(name).float().numpy()

        has = tensors.__contains__

    def t(name):
        return np.asarray(fetch(name), np.float32)

    L = cfg.n_layers
    hd = cfg.head_size

    def layer(fmt):
        return np.stack([t(fmt.format(l)) for l in range(L)])

    wq = np.stack([
        _unpermute(t(f"model.layers.{l}.self_attn.q_proj.weight"),
                   cfg.n_heads, cfg.dim, cfg.dim)
        for l in range(L)
    ])
    wk = np.stack([
        _unpermute(t(f"model.layers.{l}.self_attn.k_proj.weight"),
                   cfg.n_kv_heads, cfg.n_kv_heads * hd, cfg.dim)
        for l in range(L)
    ])

    tok_emb = t("model.embed_tokens.weight")
    wcls = (
        tok_emb
        if cfg.shared_classifier or not has("lm_head.weight")
        else t("lm_head.weight")
    )
    return cfg, LlamaWeights(
        tok_emb=tok_emb,
        rms_att=layer("model.layers.{}.input_layernorm.weight"),
        wq=wq,
        wk=wk,
        wv=layer("model.layers.{}.self_attn.v_proj.weight"),
        wo=layer("model.layers.{}.self_attn.o_proj.weight"),
        rms_ffn=layer("model.layers.{}.post_attention_layernorm.weight"),
        w1=layer("model.layers.{}.mlp.gate_proj.weight"),
        w2=layer("model.layers.{}.mlp.down_proj.weight"),
        w3=layer("model.layers.{}.mlp.up_proj.weight"),
        rms_final=t("model.norm.weight"),
        wcls=wcls,
    )


def load_meta_llama(ckpt_dir: str) -> tuple[ModelConfig, LlamaWeights]:
    """Load Meta's original release format (params.json + consolidated.*.pth),
    concatenating model-parallel shards (export.py:356-420 behavior)."""
    import torch

    with open(os.path.join(ckpt_dir, "params.json")) as f:
        p = json.load(f)
    shards = sorted(
        f for f in os.listdir(ckpt_dir)
        if f.startswith("consolidated.") and f.endswith(".pth")
    )
    states = [
        torch.load(os.path.join(ckpt_dir, s), map_location="cpu", weights_only=True)
        for s in shards
    ]

    def cat(name, dim):
        ts = [st[name].float() for st in states]
        # 1-D tensors (norm weights) are REPLICATED across model-parallel
        # shards — take shard 0 (reference export.py concat_weights does the
        # same); concatenating would produce (n_shards*dim,) garbage
        if ts[0].dim() == 1 or len(ts) == 1:
            return ts[0].numpy()
        return torch.cat(ts, dim=dim).numpy()

    n_heads = p["n_heads"]
    n_kv_heads = p.get("n_kv_heads", n_heads)
    dim = p["dim"]
    tok_emb = cat("tok_embeddings.weight", 1)
    w1_0 = cat("layers.0.feed_forward.w1.weight", 0)
    L = p["n_layers"]
    cfg = ModelConfig(
        dim=dim,
        hidden_dim=w1_0.shape[0],
        n_layers=L,
        n_heads=n_heads,
        n_kv_heads=n_kv_heads,
        vocab_size=tok_emb.shape[0],
        seq_len=2048,
        shared_classifier=False,
        norm_eps=p.get("norm_eps", 1e-5),
        rope_theta=float(p.get("rope_theta", 10000.0)),
    )

    def layer(fmt, dim_):
        return np.stack([cat(fmt.format(l), dim_) for l in range(L)])

    return cfg, LlamaWeights(
        tok_emb=tok_emb,
        rms_att=layer("layers.{}.attention_norm.weight", 0),
        wq=layer("layers.{}.attention.wq.weight", 0),
        wk=layer("layers.{}.attention.wk.weight", 0),
        wv=layer("layers.{}.attention.wv.weight", 0),
        wo=layer("layers.{}.attention.wo.weight", 1),
        rms_ffn=layer("layers.{}.ffn_norm.weight", 0),
        w1=layer("layers.{}.feed_forward.w1.weight", 0),
        w2=layer("layers.{}.feed_forward.w2.weight", 1),
        w3=layer("layers.{}.feed_forward.w3.weight", 0),
        rms_final=cat("norm.weight", 0),
        wcls=cat("output.weight", 0),
    )
