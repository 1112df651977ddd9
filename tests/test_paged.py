"""Paged KV cache: block manager + paged decode/prefill vs the contiguous
oracle (the completed BatchManager design, reference BatchManager.hpp:11-52)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import assert_close
from hip_llama_tpu.config import tiny_config
from hip_llama_tpu.engine.block_manager import BlockManager, OutOfPagesError
from hip_llama_tpu.io.checkpoint import random_weights
from hip_llama_tpu.models import init_kv_cache, make_decode_step, params_from_weights
from hip_llama_tpu.models.paged import (
    PagedKVCache,
    init_paged_kv_cache,
    make_paged_decode_step,
    make_paged_prefill,
)

PS = 16  # page size for tests


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(seq_len=64)
    w = random_weights(cfg, seed=2)
    params = params_from_weights(w)
    return cfg, params


def test_block_manager_alloc_free():
    bm = BlockManager(num_pages=8, page_size=4, num_slots=2)
    assert bm.num_free == 8
    new = bm.ensure_capacity(0, 9)  # 3 pages
    assert len(new) == 3 and bm.num_free == 5
    assert bm.append_token(0, 9) is None  # page 2 covers pos 9..11
    assert bm.append_token(0, 12) is not None  # new page
    bm.ensure_capacity(1, 16)  # 4 pages
    assert bm.num_free == 0
    with pytest.raises(OutOfPagesError):
        bm.ensure_capacity(1, 17)
    bm.free_slot(0)
    assert bm.num_free == 4
    assert bm.table_array(1, 8)[:4] == bm.page_tables[1]


def test_paged_decode_matches_contiguous(setup):
    cfg, params = setup
    b = 3
    n_pages = b * (cfg.seq_len // PS)
    bm = BlockManager(num_pages=n_pages, page_size=PS, num_slots=b)
    max_pages = cfg.seq_len // PS

    step_c = jax.jit(make_decode_step(cfg))
    step_p = jax.jit(make_paged_decode_step(cfg))
    cache_c = init_kv_cache(cfg, b)
    cache_p = init_paged_kv_cache(cfg, n_pages + 1, PS)  # +1: trash page 0

    rng = np.random.default_rng(0)
    # interleave page allocation exactly as the engine would
    for p in range(PS + 3):  # cross a page boundary
        for s in range(b):
            bm.append_token(s, p)
        table = jnp.asarray(
            [bm.table_array(s, max_pages) for s in range(b)], jnp.int32
        )
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        pos = jnp.full((b,), p, jnp.int32)
        lc, cache_c = step_c(params, cache_c, toks, pos)
        lp, cache_p = step_p(params, cache_p, table, toks, pos)
        assert_close(lp, lc, atol=1e-4, rtol=1e-3, msg=f"pos {p}")


def test_paged_prefill_matches_decode(setup):
    cfg, params = setup
    b = 2
    n_pages = 2 * b * (cfg.seq_len // PS)
    bm = BlockManager(num_pages=n_pages, page_size=PS, num_slots=b)
    max_pages = cfg.seq_len // PS

    prefill = jax.jit(make_paged_prefill(cfg))
    step_p = jax.jit(make_paged_decode_step(cfg))
    step_c = jax.jit(make_decode_step(cfg))

    rng = np.random.default_rng(4)
    n = PS + 5  # two page-aligned chunks: PS then 5
    toks = rng.integers(0, cfg.vocab_size, (b, n)).astype(np.int32)

    cache_p = init_paged_kv_cache(cfg, n_pages + 1, PS)  # +1: trash page 0
    for s in range(b):
        bm.ensure_capacity(s, n)
    table = jnp.asarray([bm.table_array(s, max_pages) for s in range(b)], jnp.int32)

    # chunk 1: tokens [0, PS) at start 0; chunk 2: [PS, n) at start PS
    l1, cache_p = prefill(
        params, cache_p, table, jnp.asarray(toks[:, :PS]),
        jnp.zeros((b,), jnp.int32), jnp.full((b,), PS, jnp.int32),
    )
    l2, cache_p = prefill(
        params, cache_p, table, jnp.asarray(toks[:, PS:]),
        jnp.full((b,), PS, jnp.int32), jnp.full((b,), n - PS, jnp.int32),
    )

    cache_c = init_kv_cache(cfg, b)
    for p in range(n):
        lc, cache_c = step_c(
            params, cache_c, jnp.asarray(toks[:, p]), jnp.full((b,), p, jnp.int32)
        )
    assert_close(l2[:, n - PS - 1], lc, atol=1e-4, rtol=1e-3)

    # and decoding one more token from the paged cache agrees
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
    pos = jnp.full((b,), n, jnp.int32)
    lp, _ = step_p(params, cache_p, table, tok, pos)
    lc2, _ = step_c(params, cache_c, tok, pos)
    assert_close(lp, lc2, atol=1e-4, rtol=1e-3)


def test_paged_slot_reuse_isolated(setup):
    """Retiring a slot and reusing its pages for a new request must not leak
    stale KV into the new request's attention."""
    cfg, params = setup
    b = 1
    n_pages = 4
    bm = BlockManager(num_pages=n_pages, page_size=PS, num_slots=b)
    max_pages = 4
    step_p = jax.jit(make_paged_decode_step(cfg))
    rng = np.random.default_rng(8)

    cache_p = init_paged_kv_cache(cfg, n_pages + 1, PS)  # +1: trash page 0
    # request A: 20 tokens (2 pages)
    for p in range(20):
        bm.append_token(0, p)
        table = jnp.asarray([bm.table_array(0, max_pages)], jnp.int32)
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (1,)), jnp.int32)
        _, cache_p = step_p(params, cache_p, table, tok, jnp.full((1,), p, jnp.int32))
    bm.free_slot(0)

    # request B on the same slot, same token stream as a fresh-cache oracle
    toks_b = rng.integers(0, cfg.vocab_size, (8,)).astype(np.int32)
    cache_fresh = init_paged_kv_cache(cfg, n_pages + 1, PS)
    bm_fresh = BlockManager(num_pages=n_pages, page_size=PS, num_slots=b)
    out_reused, out_fresh = [], []
    for p in range(8):
        bm.append_token(0, p)
        bm_fresh.append_token(0, p)
        t_r = jnp.asarray([bm.table_array(0, max_pages)], jnp.int32)
        t_f = jnp.asarray([bm_fresh.table_array(0, max_pages)], jnp.int32)
        tok = jnp.asarray([toks_b[p]], jnp.int32)
        lr, cache_p = step_p(params, cache_p, t_r, tok, jnp.full((1,), p, jnp.int32))
        lf, cache_fresh = step_p(
            params, cache_fresh, t_f, tok, jnp.full((1,), p, jnp.int32)
        )
        out_reused.append(np.asarray(lr))
        out_fresh.append(np.asarray(lf))
    for p, (a, c) in enumerate(zip(out_reused, out_fresh)):
        assert_close(a, c, atol=1e-5, rtol=1e-4, msg=f"pos {p}")


def test_idle_slot_writes_hit_trash_page(setup):
    """A retired slot (cleared table, pos=0, token=0) still executes the
    fixed-shape decode step; its KV row write must land on the reserved
    trash page, NOT on a live slot's page. Regression: before page 0 was
    reserved, the padding pointed idle slots at the first-allocated page
    and clobbered its row 0."""
    cfg, params = setup
    b = 2
    bm = BlockManager(num_pages=4, page_size=PS, num_slots=b)
    step_p = jax.jit(make_paged_decode_step(cfg))
    cache_p = init_paged_kv_cache(cfg, 4 + 1, PS)

    # both slots active for 3 steps
    for p in range(3):
        for s in range(b):
            bm.append_token(s, p)
        table = jnp.asarray([bm.table_array(s, 4) for s in range(b)], jnp.int32)
        toks = jnp.asarray([5 + p, 7 + p], jnp.int32)
        _, cache_p = step_p(params, cache_p, table, toks,
                            jnp.full((b,), p, jnp.int32))
    first_page = bm.page_tables[0][0]
    assert first_page != BlockManager.TRASH_PAGE
    row0_before = np.asarray(cache_p.k[0, :, first_page, 0, :]).copy()

    # slot1 retires; slot0 keeps decoding
    bm.free_slot(1)
    table = jnp.asarray([bm.table_array(s, 4) for s in range(b)], jnp.int32)
    assert table[1, 0] == BlockManager.TRASH_PAGE
    _, cache_p = step_p(params, cache_p, table, jnp.asarray([9, 0], jnp.int32),
                        jnp.asarray([3, 0], jnp.int32))
    row0_after = np.asarray(cache_p.k[0, :, first_page, 0, :])
    np.testing.assert_array_equal(row0_before, row0_after)


def test_engine_paged_matches_contiguous(toy_tokenizer):
    """Whole-engine parity: serve() with paged=True produces the same
    generations as the contiguous engine. Greedy samplers — the two paths
    differ by ~1e-6 in logits (flash vs einsum reduction order), which would
    legitimately flip stochastic top-p draws."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg = tiny_config(seq_len=64)
    w = random_weights(cfg, seed=6)
    params = params_from_weights(w)
    prompts = ["hello", " hello hello", "he"]

    def run(paged):
        eng = InferenceEngine(
            cfg, params, toy_tokenizer, batch_size=2,
            paged=paged, page_size=16,
        )
        reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in prompts]
        eng.serve(reqs, steps=24, samplers=samplers)
        return reqs.generations

    a = run(False)
    b = run(True)
    assert a == b


def test_paged_chunk_return_logits(setup):
    """Paged chunked step with return_logits: tokens must equal the argmax
    of the returned per-step logits and match the tokens-only variant."""
    from hip_llama_tpu.models.paged import make_paged_chunked_sampling_step

    cfg, params = setup
    b, n_steps = 2, 3
    bm = BlockManager(num_pages=4, page_size=PS, num_slots=b)
    for s in range(b):
        bm.ensure_capacity(s, n_steps)
    table = jnp.asarray([bm.table_array(s, 2) for s in range(b)], jnp.int32)
    key = jax.random.PRNGKey(0)
    tok0 = jnp.asarray([5, 7], jnp.int32)
    pos0 = jnp.zeros((b,), jnp.int32)

    chunk_l = jax.jit(make_paged_chunked_sampling_step(cfg, n_steps,
                                                       return_logits=True))
    chunk_t = jax.jit(make_paged_chunked_sampling_step(cfg, n_steps))
    c1 = init_paged_kv_cache(cfg, 4 + 1, PS)
    c2 = init_paged_kv_cache(cfg, 4 + 1, PS)
    toks_l, logits, _ = chunk_l(params, c1, table, tok0, pos0, key)
    toks_t, _ = chunk_t(params, c2, table, tok0, pos0, key)
    assert logits.shape == (b, n_steps, cfg.vocab_size)
    np.testing.assert_array_equal(np.asarray(toks_l), np.asarray(toks_t))
    np.testing.assert_array_equal(
        np.asarray(toks_l), np.argmax(np.asarray(logits), axis=-1)
    )


def test_block_manager_prefix_cache():
    """Prefix cache mechanics: register -> match -> refcount -> retain after
    the registrant retires -> evict under allocation pressure."""
    ps = 4
    bm = BlockManager(num_pages=6, page_size=ps, num_slots=2)
    toks = list(range(100, 111))  # 11 tokens: rows [0, 10) eligible = 2 pages
    bm.ensure_capacity(0, len(toks))  # prefill allocation (3 pages)
    bm.register_prefix(0, toks)

    n = bm.match_prefix(1, toks)  # identical prompt shares both full pages
    assert n == 2 * ps
    assert bm.page_tables[1] == bm.page_tables[0][:2]
    bm.free_slot(1)

    toks2 = toks[:6] + [999, 998, 997, 996, 995]  # diverges inside page 2
    n = bm.match_prefix(1, toks2)
    assert n == ps
    bm.free_slot(1)

    bm.free_slot(0)  # registrant retires: registered pages are RETAINED
    n = bm.match_prefix(1, toks)
    assert n == 2 * ps
    bm.free_slot(1)

    # pool pressure: retained pages are evicted rather than failing
    assert len(bm.ensure_capacity(0, 6 * ps)) == 6
    bm.free_slot(0)
    assert bm.match_prefix(1, toks) == 0  # evicted: no hits left


def test_engine_prefix_cache_matches_uncached(toy_tokenizer):
    """Serving with prefix_cache=True must produce the same greedy
    generations as plain paged serving, and must actually hit the cache on
    repeated prompt prefixes."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg = tiny_config(seq_len=96)
    w = random_weights(cfg, seed=6)
    params = params_from_weights(w)
    shared = "hello" * 12  # long shared prefix (> 1 page at page_size=8)
    prompts = [shared + "l", shared + "o", shared + "l"]

    def run(prefix_cache):
        eng = InferenceEngine(
            cfg, params, toy_tokenizer, batch_size=2,
            paged=True, page_size=8, prefix_cache=prefix_cache,
        )
        reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in prompts]
        stats = {}
        eng.serve(reqs, steps=30, samplers=samplers, stats=stats)
        return reqs.generations, stats

    base, stats0 = run(False)
    cached, stats1 = run(True)
    assert base == cached
    assert stats0["prefix_hit_tokens"] == 0
    assert stats1["prefix_hit_tokens"] > 0


def test_engine_paged_chunked_matches_contiguous(toy_tokenizer):
    """Multi-step scheduling (chunk_steps>1) over the PAGED cache: greedy
    chunks must reproduce the contiguous single-step engine's generations
    (pages are reserved chunk-wide before dispatch; mid-chunk retirements
    and idle slots write to reserved pages / the trash page)."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg = tiny_config(seq_len=64)
    w = random_weights(cfg, seed=6)
    params = params_from_weights(w)
    prompts = ["hello", " hello hello", "he"]

    def run(paged, chunk):
        eng = InferenceEngine(
            cfg, params, toy_tokenizer, batch_size=2,
            paged=paged, page_size=16, chunk_steps=chunk,
        )
        reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in prompts]
        eng.serve(reqs, steps=24, samplers=samplers)
        return reqs.generations

    assert run(True, 4) == run(False, 1)


def test_engine_paged_chunked_under_page_pressure(toy_tokenizer):
    """When the pool can't cover a whole chunk, the engine falls back to
    single steps (and to waiting admission control) instead of crashing,
    and every request still completes."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg = tiny_config(seq_len=64)
    w = random_weights(cfg, seed=9)
    params = params_from_weights(w)
    eng = InferenceEngine(
        cfg, params, toy_tokenizer, batch_size=2,
        paged=True, page_size=16, num_pages=4, chunk_steps=4,
    )
    prompts = ["hello", " hello hello", "he", "hello hello"]
    reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
    samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in prompts]
    n = eng.serve(reqs, steps=20, samplers=samplers)
    assert n > 0
    assert all(g for g in reqs.generations)


def test_engine_paged_admission_control(toy_tokenizer):
    """When the page pool can't fit a new prompt, the request waits for a
    retirement instead of crashing (the reference's BatchManager had no free
    path at all)."""
    from hip_llama_tpu.engine import InferenceEngine, Requests
    from hip_llama_tpu.sampler import Sampler

    cfg = tiny_config(seq_len=64)
    w = random_weights(cfg, seed=9)
    params = params_from_weights(w)
    # pool: 4 pages of 16 = 64 positions total for 2 slots x 24 steps
    eng = InferenceEngine(
        cfg, params, toy_tokenizer, batch_size=2,
        paged=True, page_size=16, num_pages=4,
    )
    prompts = ["hello", " hello hello", "he", "hello hello"]
    reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
    samplers = [Sampler(cfg.vocab_size, temperature=0.0) for _ in prompts]
    n = eng.serve(reqs, steps=20, samplers=samplers)
    assert n > 0
    assert all(g for g in reqs.generations)  # every request completed
