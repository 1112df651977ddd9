"""JAX model vs the numpy oracle (the GPU-vs-CPU validation strategy of the
reference, scripts/test/thaDNN.test.cpp:150-247, re-applied to TPU code)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hip_llama_tpu.models import (
    init_kv_cache,
    make_decode_step,
    make_prefill,
    params_from_weights,
)
from hip_llama_tpu.models import reference as ref
from tests.conftest import assert_close


@pytest.fixture(scope="module")
def setup(tiny_cfg, tiny_weights):
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    step = make_decode_step(tiny_cfg)
    return tiny_cfg, tiny_weights, params, step


def test_single_token_logits(setup):
    cfg, w, params, step = setup
    state = ref.RefState.create(cfg)
    want = ref.forward(cfg, w, state, token=5, pos=0)

    cache = init_kv_cache(cfg, batch=1)
    logits, cache = step(params, cache, jnp.array([5]), jnp.array([0]))
    assert_close(np.asarray(logits[0]), want, atol=1e-4, rtol=1e-3, msg="logits pos0")


def test_multi_step_decode_matches_oracle(setup):
    cfg, w, params, step = setup
    tokens = [3, 17, 100, 9, 255, 42]
    state = ref.RefState.create(cfg)
    want = [ref.forward(cfg, w, state, t, p) for p, t in enumerate(tokens)]

    cache = init_kv_cache(cfg, batch=1)
    got = []
    for p, t in enumerate(tokens):
        logits, cache = step(params, cache, jnp.array([t]), jnp.array([p]))
        got.append(np.asarray(logits[0]))
    for p in range(len(tokens)):
        assert_close(got[p], want[p], atol=1e-4, rtol=1e-3, msg=f"pos {p}")


def test_rope_theta_override_matches_oracle(tiny_cfg, tiny_weights):
    """Non-default RoPE base (Llama-3-era models) flows through both the
    jitted decode step and the numpy oracle identically — and actually
    changes the output vs the default base."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, rope_theta=500000.0)
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    step = make_decode_step(cfg)
    tokens = [3, 17, 100, 9]
    state = ref.RefState.create(cfg)
    want = [ref.forward(cfg, tiny_weights, state, t, p)
            for p, t in enumerate(tokens)]

    cache = init_kv_cache(cfg, batch=1)
    got = []
    for p, t in enumerate(tokens):
        logits, cache = step(params, cache, jnp.array([t]), jnp.array([p]))
        got.append(np.asarray(logits[0]))
    for p in range(len(tokens)):
        assert_close(got[p], want[p], atol=1e-4, rtol=1e-3, msg=f"pos {p}")

    # sanity: the base actually matters beyond pos 0 (pos 0 angle is 0)
    base_step = make_decode_step(tiny_cfg)
    cache2 = init_kv_cache(tiny_cfg, batch=1)
    base = []
    for p, t in enumerate(tokens):
        lg, cache2 = base_step(params, cache2, jnp.array([t]), jnp.array([p]))
        base.append(np.asarray(lg[0]))
    assert np.abs(base[-1] - got[-1]).max() > 1e-3


def test_batched_slots_are_independent(setup):
    """Ragged batch: slots at different positions must match per-sequence
    oracles (the fixed-shape reformulation of llama.cpp:968-1073)."""
    cfg, w, params, step = setup
    seqs = [[7, 8, 9, 10], [200, 3, 50], [1, 2]]
    oracle_logits = []
    for s in seqs:
        st = ref.RefState.create(cfg)
        oracle_logits.append([ref.forward(cfg, w, st, t, p) for p, t in enumerate(s)])

    b = len(seqs)
    cache = init_kv_cache(cfg, batch=b)
    pos = [0] * b
    got = [[] for _ in range(b)]
    for stepi in range(max(len(s) for s in seqs)):
        toks = []
        for i, s in enumerate(seqs):
            toks.append(s[stepi] if stepi < len(s) else 0)
        logits, cache = step(
            params, cache, jnp.array(toks), jnp.array(pos, dtype=jnp.int32)
        )
        for i, s in enumerate(seqs):
            if stepi < len(s):
                got[i].append(np.asarray(logits[i]))
                pos[i] += 1
        # slots past their end keep stepping at a stale pos — garbage compute,
        # masked out by the scheduler, must not corrupt other slots
    for i, s in enumerate(seqs):
        for p in range(len(s)):
            assert_close(
                got[i][p], oracle_logits[i][p], atol=1e-4, rtol=1e-3, msg=f"seq{i} pos{p}"
            )


def test_prefill_matches_stepwise(setup):
    cfg, w, params, step = setup
    prefill = make_prefill(cfg)
    tokens = [3, 17, 100, 9]

    # stepwise
    cache1 = init_kv_cache(cfg, batch=1)
    step_logits = []
    for p, t in enumerate(tokens):
        lg, cache1 = step(params, cache1, jnp.array([t]), jnp.array([p]))
        step_logits.append(np.asarray(lg[0]))

    # one-shot prefill
    cache2 = init_kv_cache(cfg, batch=1)
    lg2, cache2 = prefill(
        params,
        cache2,
        jnp.array([tokens]),
        jnp.array([0], dtype=jnp.int32),
        jnp.array([len(tokens)], dtype=jnp.int32),
    )
    for p in range(len(tokens)):
        assert_close(
            np.asarray(lg2[0, p]), step_logits[p], atol=1e-4, rtol=1e-3, msg=f"pos {p}"
        )
    # caches agree
    assert_close(
        np.asarray(cache2.k[:, :, : len(tokens)]),
        np.asarray(cache1.k[:, :, : len(tokens)]),
        atol=1e-5,
        rtol=1e-4,
        msg="k cache",
    )


def test_prefill_then_decode(setup):
    cfg, w, params, step = setup
    prefill = make_prefill(cfg)
    tokens = [3, 17, 100, 9, 77]
    n_prefill = 4

    state = ref.RefState.create(cfg)
    want = [ref.forward(cfg, w, state, t, p) for p, t in enumerate(tokens)]

    cache = init_kv_cache(cfg, batch=1)
    _, cache = prefill(
        params,
        cache,
        jnp.array([tokens[:n_prefill]]),
        jnp.array([0], dtype=jnp.int32),
        jnp.array([n_prefill], dtype=jnp.int32),
    )
    lg, cache = step(
        params, cache, jnp.array([tokens[n_prefill]]), jnp.array([n_prefill])
    )
    assert_close(np.asarray(lg[0]), want[n_prefill], atol=1e-4, rtol=1e-3)


def test_bf16_params_close(setup):
    cfg, w, params, step = setup
    params_bf16 = params_from_weights(w, dtype=jnp.bfloat16)
    cache = init_kv_cache(cfg, batch=1, dtype=jnp.bfloat16)
    logits, _ = step(params_bf16, cache, jnp.array([5]), jnp.array([0]))
    state = ref.RefState.create(cfg)
    want = ref.forward(cfg, w, state, 5, 0)
    # loose tolerance: bf16 has ~3 decimal digits
    assert_close(np.asarray(logits[0]), want, atol=0.15, rtol=0.1, msg="bf16 logits")
