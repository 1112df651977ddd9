"""On-device speculative chain (models/spec_chain.py): greedy output must
be BYTE-IDENTICAL to the plain greedy chain — speculation with greedy
acceptance is an execution strategy, never a distribution change."""

import jax.numpy as jnp
import numpy as np
import pytest

from hip_llama_tpu.models import init_kv_cache, params_from_weights
from hip_llama_tpu.models.spec_chain import (
    make_plain_chain,
    make_spec_lookup_chain,
)


@pytest.mark.parametrize("attn", ["xla", "pallas"])
def test_spec_chain_matches_plain_greedy(tiny_cfg, tiny_weights, attn):
    cfg = tiny_cfg
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    H, k, n_rounds = 64, 4, 12

    # prompt: a few tokens force-fed via the plain chain to build cache
    prompt = [1, 5, 9, 5, 9]

    def seed(chain_len):
        cache = init_kv_cache(cfg, 1, dtype=jnp.float32)
        # force-feed prompt through single steps
        plain1 = make_plain_chain(cfg, n_steps=1, attn_impl=attn,
                                  precision="highest")
        tok = jnp.int32(prompt[0])
        pos = jnp.int32(0)
        for t in prompt[1:]:
            _, cache, _, pos = plain1(params, cache, tok, pos)
            tok = jnp.int32(t)
        return cache, tok, pos

    # plain chain output
    n_tok = n_rounds * (k + 1)
    cache_p, tok_p, pos_p = seed(n_tok)
    plain = make_plain_chain(cfg, n_steps=n_tok, attn_impl=attn,
                             precision="highest")
    toks_plain, *_ = plain(params, cache_p, tok_p, pos_p)
    toks_plain = np.asarray(toks_plain)

    # spec chain output
    cache_s, tok_s, pos_s = seed(n_tok)
    hist = np.full((H,), -7, np.int32)
    hist[-len(prompt):] = prompt
    spec = make_spec_lookup_chain(cfg, k=k, n_rounds=n_rounds, hist_len=H,
                                  attn_impl=attn, precision="highest")
    toks, counts, cache, nxt, pos, hist_out = spec(
        params, cache_s, tok_s, pos_s, jnp.asarray(hist))
    toks, counts = np.asarray(toks), np.asarray(counts)

    flat = []
    for r in range(n_rounds):
        flat.extend(toks[r, : counts[r]].tolist())
    n = min(len(flat), len(toks_plain))
    assert n >= n_rounds  # at least one token per round
    np.testing.assert_array_equal(np.asarray(flat[:n]), toks_plain[:n])
    # the emitted stream advanced exactly pos delta
    assert int(pos) - int(pos_s) == len(flat)
    # history ends with the last committed tokens
    tail = np.asarray(hist_out)[-min(8, len(flat)):]
    np.testing.assert_array_equal(tail, np.asarray(flat[-len(tail):]))
