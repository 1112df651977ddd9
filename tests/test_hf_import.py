"""HF checkpoint import + architecture oracle: our JAX forward must match
transformers' LlamaForCausalLM logits on the same weights (validates the
RoPE convention / GQA / norm placement end to end — the strongest available
independent oracle; the reference used its CPU engine the same way,
SURVEY.md §4.2)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from conftest import assert_close
from hip_llama_tpu.io.hf import load_hf_llama
from hip_llama_tpu.models import init_kv_cache, make_decode_step, params_from_weights
from hip_llama_tpu.train.model import make_train_forward


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        hidden_size=64,
        intermediate_size=172,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("hf_llama")
    model.save_pretrained(d, safe_serialization=False)
    return str(d), model


def test_hf_import_matches_transformers(hf_dir):
    path, hf_model = hf_dir
    cfg, w = load_hf_llama(path)
    assert cfg.dim == 64 and cfg.n_kv_heads == 2 and not cfg.shared_classifier

    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (2, 10)).astype(np.int64)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(toks)).logits.float().numpy()

    params = params_from_weights(w, dtype=jnp.float32)
    fwd = jax.jit(make_train_forward(cfg, precision="highest"))
    got = np.asarray(fwd(params, jnp.asarray(toks, jnp.int32)))
    assert_close(got, want, atol=2e-3, rtol=2e-3)


def test_hf_import_rope_theta(tmp_path_factory):
    """A non-default rope_theta in config.json (Llama-3-era checkpoints)
    must flow into ModelConfig and produce logits matching transformers'
    own forward with that base."""
    cfg_hf = transformers.LlamaConfig(
        hidden_size=64,
        intermediate_size=172,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=256,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        rope_theta=100000.0,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg_hf)
    d = tmp_path_factory.mktemp("hf_llama_theta")
    model.save_pretrained(d, safe_serialization=False)

    cfg, w = load_hf_llama(str(d))
    assert cfg.rope_theta == 100000.0

    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg.vocab_size, (1, 12)).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(toks)).logits.float().numpy()
    params = params_from_weights(w, dtype=jnp.float32)
    fwd = jax.jit(make_train_forward(cfg, precision="highest"))
    got = np.asarray(fwd(params, jnp.asarray(toks, jnp.int32)))
    assert_close(got, want, atol=2e-3, rtol=2e-3)


def test_hf_export_roundtrip(tmp_path):
    """save_hf_llama(load_hf_llama(save_hf_llama(w))) == w bit-exactly at
    fp32 (VERDICT r2 item 5; reference train/export.py:262-354 hf_export)."""
    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.io.checkpoint import random_weights
    from hip_llama_tpu.io.hf import save_hf_llama

    cfg = ModelConfig(dim=64, hidden_dim=172, n_layers=3, n_heads=4,
                      n_kv_heads=2, vocab_size=256, seq_len=64,
                      rope_theta=50000.0)
    w = random_weights(cfg, seed=7)
    d = str(tmp_path / "hf_out")
    save_hf_llama(d, cfg, w)
    cfg2, w2 = load_hf_llama(d)
    assert cfg2 == cfg
    for name in w.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(w2, name), np.float32),
            np.asarray(getattr(w, name), np.float32), err_msg=name,
        )


def test_hf_export_shared_classifier_roundtrip(tmp_path):
    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.io.checkpoint import random_weights
    from hip_llama_tpu.io.hf import save_hf_llama

    cfg = ModelConfig(dim=32, hidden_dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=4, vocab_size=128, seq_len=32,
                      shared_classifier=True)
    w = random_weights(cfg, seed=9)
    d = str(tmp_path / "hf_tied")
    save_hf_llama(d, cfg, w)
    cfg2, w2 = load_hf_llama(d)
    assert cfg2.shared_classifier
    np.testing.assert_array_equal(w2.wcls, w2.tok_emb)


def test_hf_export_loads_in_transformers(tmp_path):
    """transformers must accept our exported dir and produce the same
    logits as our own forward on the same weights — the re-entry-to-the-
    ecosystem guarantee the round-trip test alone can't give."""
    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.io.checkpoint import random_weights
    from hip_llama_tpu.io.hf import save_hf_llama
    from hip_llama_tpu.models import params_from_weights

    cfg = ModelConfig(dim=64, hidden_dim=172, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=256, seq_len=64)
    w = random_weights(cfg, seed=11)
    d = str(tmp_path / "hf_xcheck")
    save_hf_llama(d, cfg, w)

    model = transformers.LlamaForCausalLM.from_pretrained(d)
    rng = np.random.default_rng(5)
    toks = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(toks)).logits.float().numpy()

    params = params_from_weights(w, dtype=jnp.float32)
    fwd = jax.jit(make_train_forward(cfg, precision="highest"))
    got = np.asarray(fwd(params, jnp.asarray(toks, jnp.int32)))
    assert_close(got, want, atol=2e-3, rtol=2e-3)


def test_hf_import_decode_path(hf_dir):
    """Step-by-step decode on imported weights matches HF's full forward."""
    path, hf_model = hf_dir
    cfg, w = load_hf_llama(path)
    params = params_from_weights(w, dtype=jnp.float32)
    step = jax.jit(make_decode_step(cfg))
    cache = init_kv_cache(cfg, 1)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int64)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(toks)).logits.float().numpy()
    for p in range(8):
        logits, cache = step(
            params, cache, jnp.asarray(toks[:, p], jnp.int32),
            jnp.full((1,), p, jnp.int32),
        )
        assert_close(np.asarray(logits), want[:, p], atol=2e-3, rtol=2e-3,
                     msg=f"pos {p}")
