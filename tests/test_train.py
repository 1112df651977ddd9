"""Training sidecar: loss decreases on a learnable stream, checkpoints
resume exactly, and the exported .bin round-trips into the engine
(the role train/train.py + test_all.py play in the reference)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.train import TrainConfig, Trainer
from hip_llama_tpu.train.dataset import PretokDataset, pretokenize, synthetic_batches
from hip_llama_tpu.train.model import cross_entropy_loss, make_train_forward


def _tiny_tcfg(**kw):
    base = dict(
        learning_rate=1e-2, warmup_iters=5, max_iters=60, batch_size=8,
        log_interval=1000, grad_clip=1.0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_train_forward_matches_prefill(tiny_cfg, tiny_weights):
    """The training forward must agree with the inference prefill path on
    the same params (same architecture, different plumbing)."""
    from hip_llama_tpu.models import init_kv_cache, make_prefill, params_from_weights

    cfg = tiny_cfg
    params = params_from_weights(tiny_weights)
    fwd = jax.jit(make_train_forward(cfg, precision="highest"))
    prefill = jax.jit(make_prefill(cfg))
    rng = np.random.default_rng(0)
    b, t = 2, 12
    toks = rng.integers(0, cfg.vocab_size, (b, t)).astype(np.int32)
    lt = fwd(params, jnp.asarray(toks))
    cache = init_kv_cache(cfg, b)
    lp, _ = prefill(
        params, cache, jnp.asarray(toks), jnp.zeros((b,), jnp.int32),
        jnp.full((b,), t, jnp.int32),
    )
    assert_close(lt, lp, atol=1e-4, rtol=1e-3)


def test_loss_decreases_on_learnable_stream():
    cfg = tiny_config(vocab_size=128, seq_len=32, n_layers=2, dim=64, hidden_dim=128)
    trainer = Trainer(cfg, _tiny_tcfg())
    batches = synthetic_batches(cfg.vocab_size, 8, cfg.seq_len, seed=1)
    losses = trainer.fit(batches, max_iters=60, log=lambda *_: None)
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.5, (first, last)


def test_checkpoint_resume_exact(tmp_path):
    cfg = tiny_config(vocab_size=64, seq_len=16, n_layers=2)
    tcfg = _tiny_tcfg(max_iters=30)
    path = os.path.join(tmp_path, "state.npz")

    t1 = Trainer(cfg, tcfg)
    b1 = synthetic_batches(cfg.vocab_size, 8, cfg.seq_len, seed=2)
    t1.fit(b1, max_iters=10, log=lambda *_: None)
    t1.save(path)
    cont1 = t1.fit(b1, max_iters=20, log=lambda *_: None)

    t2 = Trainer(cfg, tcfg)
    t2.load(path)
    b2 = synthetic_batches(cfg.vocab_size, 8, cfg.seq_len, seed=2)
    for _ in range(10):  # consume the same first-10 batches
        next(b2)
    cont2 = t2.fit(b2, max_iters=20, log=lambda *_: None)
    np.testing.assert_allclose(cont1, cont2, rtol=1e-5)


def test_export_runs_in_engine(tmp_path, toy_tokenizer):
    from hip_llama_tpu.engine import InferenceEngine
    from hip_llama_tpu.io.checkpoint import load_checkpoint
    from hip_llama_tpu.models.params import params_from_weights

    cfg = tiny_config()  # vocab 512 matches toy tokenizer
    trainer = Trainer(cfg, _tiny_tcfg(max_iters=3, batch_size=4))
    trainer.fit(synthetic_batches(cfg.vocab_size, 4, cfg.seq_len), max_iters=3,
                log=lambda *_: None)
    path = os.path.join(tmp_path, "model.bin")
    trainer.export_v0(path)

    cfg2, w = load_checkpoint(path)
    assert cfg2.dim == cfg.dim and cfg2.n_layers == cfg.n_layers
    eng = InferenceEngine(cfg2, params_from_weights(w), toy_tokenizer, batch_size=1)
    res = eng.generate("hello", steps=8)
    assert isinstance(res.text, str)


def test_pretokenize_and_memmap(tmp_path, toy_tokenizer):
    p = os.path.join(tmp_path, "corpus.txt")
    with open(p, "w") as f:
        for _ in range(50):
            f.write("hello hello hello hello hello hello hello hello\n")
    shards = pretokenize([p], toy_tokenizer, str(tmp_path))
    ds = PretokDataset(shards, max_seq_len=8, seed=0)
    toks, tgts = next(ds.batches(4))
    assert toks.shape == (4, 8) and tgts.shape == (4, 8)
    np.testing.assert_array_equal(toks[:, 1:], tgts[:, :-1])


def test_grad_accum_matches_plain():
    cfg = tiny_config(vocab_size=64, seq_len=16, n_layers=2)
    b = synthetic_batches(cfg.vocab_size, 8, cfg.seq_len, seed=3)
    toks, tgts = next(b)
    t_plain = Trainer(cfg, _tiny_tcfg(grad_accum_steps=1))
    t_acc = Trainer(cfg, _tiny_tcfg(grad_accum_steps=2))
    l1 = t_plain.step(toks, tgts)
    l2 = t_acc.step(toks, tgts)
    assert abs(l1 - l2) < 1e-3
    p1 = jax.tree.leaves(t_plain.params)
    p2 = jax.tree.leaves(t_acc.params)
    for a, c in zip(p1, p2):
        assert_close(a, c, atol=1e-5, rtol=1e-4)
