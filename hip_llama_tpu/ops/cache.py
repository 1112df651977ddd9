"""In-place KV cache row writer.

Writes one token's K/V rows (all layers, all heads) per slot into the cache
at each slot's position — the hot-path cache update of every decode step.

Done as a Pallas kernel with `input_output_aliases` + explicit DMAs so the
update is GUARANTEED in-place: the XLA dynamic-update-slice chain this
replaces materialized whole-cache copies (~5 ms/step at 7B — measured with
tools/profile_step.py), the TPU equivalent of the reference's fused
KV-scatter addressing in its QKV GEMV (thaBLAS.cpp:191-228).

TPU DMAs require slices aligned to the buffer tiling, so a single position
row can't be DMA'd directly; instead each slot read-modify-writes a small
tile-aligned window around `pos`: window -> VMEM, vector-select the new row
in, window -> HBM. Traffic is W rows per slot (~100 KB/step at 7B) instead
of the whole cache.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane_window(dtype) -> int:
    # max sublane tile Mosaic may pick: 8 * (4 / itemsize)
    return max(8, (8 * 4) // jnp.dtype(dtype).itemsize)


# RMW window width for the per-step row writers. Mosaic accepts HBM
# sublane slices aligned to 8 (probed on v5e, tools/kv_direct_probe.py),
# so the window can be narrower than the VMEM sublane tile — 8 rows moves
# 4x less window traffic than 32 for int8 caches. Env-overridable for
# sweeps (HIPLLAMA_KV_W=32 restores the old tile-width windows).
_ENV_KV_W = int(os.environ.get("HIPLLAMA_KV_W", "8"))


def _rmw_window(dtype, s: int) -> int:
    w = _ENV_KV_W if _ENV_KV_W >= 8 else 8
    w = min(w, _sublane_window(dtype), s)
    while s % w:
        w //= 2
    if w < 8:
        # Halving for a non-8-divisible s dipped below the 8-row HBM
        # sublane alignment floor (Mosaic rejects sub-8 window DMAs —
        # tools/kv_direct_probe.py). Use the full-s window instead: its
        # start is always 0, so no sublane slicing is needed at all.
        w = s
    return w


def _kv_write_kernel(
    pos_ref, valid_ref, rows_ref, cache_in_ref, cache_out_ref, scratch, sems,
    *, batch, window, s, l_chunk,
):
    del cache_in_ref  # aliased with cache_out
    n_layers = rows_ref.shape[1]

    # double-buffered software pipeline over a flattened (slot, layer-chunk)
    # sequence: the next window's load overlaps this one's modify+store
    # (all windows are disjoint cache regions, so reordering is safe). The
    # serial ld.wait->st.wait loop was ~2x slower (0.29 -> ~0.15 ms/step at
    # 7B b=8). Layer chunking keeps the scratch inside scoped VMEM for deep
    # models (13B: L=40, KVH=40 would need a 13 MB window).
    steps = [
        (b, c) for b in range(batch) for c in range(n_layers // l_chunk)
    ]

    def window_slice(b):
        pos = pos_ref[b]
        start = pl.multiple_of(
            jnp.minimum((pos // window) * window, s - window), window
        )
        return start, pos - start

    def load(idx):
        b, c = steps[idx]
        start, _ = window_slice(b)
        ld = pltpu.make_async_copy(
            cache_out_ref.at[
                b, pl.ds(c * l_chunk, l_chunk), :, pl.ds(start, window), :
            ],
            scratch.at[idx % 2],
            sems.at[idx % 2],
        )
        ld.start()
        return ld

    pending_ld = load(0)
    pending_st = [None, None]  # in-flight store per scratch buffer
    for idx, (b, c) in enumerate(steps):
        if idx + 1 < len(steps):
            if pending_st[(idx + 1) % 2] is not None:
                pending_st[(idx + 1) % 2].wait()  # free that buffer first
                pending_st[(idx + 1) % 2] = None
            nxt = load(idx + 1)
        else:
            nxt = None
        pending_ld.wait()
        start, off = window_slice(b)
        win = scratch[idx % 2]  # (l_chunk, KVH, W, HS)
        sub = jax.lax.broadcasted_iota(jnp.int32, win.shape, 2)
        new = rows_ref[b, pl.ds(c * l_chunk, l_chunk)][:, :, None, :]
        keep = (sub == off) & (valid_ref[b] != 0)
        scratch[idx % 2] = jnp.where(keep, new.astype(win.dtype), win)
        st = pltpu.make_async_copy(
            scratch.at[idx % 2],
            cache_out_ref.at[
                b, pl.ds(c * l_chunk, l_chunk), :, pl.ds(start, window), :
            ],
            sems.at[idx % 2],
        )
        st.start()
        pending_st[idx % 2] = st
        pending_ld = nxt
    for st in pending_st:
        if st is not None:
            st.wait()  # drain before kernel exit


def _pick_l_chunk(n_layers: int, kvh: int, w: int, hs: int, itemsize: int,
                  budget: int = 6 * 2 ** 20) -> int:
    """Largest divisor of n_layers whose double-buffered window scratch
    stays within `budget` bytes of scoped VMEM."""
    for div in range(1, n_layers + 1):
        if n_layers % div:
            continue
        lc = n_layers // div
        if 2 * lc * kvh * w * hs * itemsize <= budget:
            return lc
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def kv_write_rows(
    cache: jax.Array,  # (B, L, KVH, S, HS) — donated, updated in place
    rows: jax.Array,  # (L, B, KVH, HS) — this step's K (or V) rows
    pos: jax.Array,  # (B,) int32
    valid: jax.Array | None = None,  # (B,) bool/int: False keeps the old row
    *,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n_layers, kvh, s, hs = cache.shape
    valid_arr = (
        jnp.ones((b,), jnp.int32) if valid is None else valid.astype(jnp.int32)
    )
    w = _rmw_window(cache.dtype, s)
    # window_slice clamps start to s - w and asserts (pl.multiple_of) that
    # the result is window-aligned — only true when w divides s
    assert s % w == 0, (s, w)
    l_chunk = _pick_l_chunk(n_layers, kvh, w, hs, cache.dtype.itemsize)
    rows4 = jnp.moveaxis(rows, 1, 0).astype(cache.dtype)  # (B, L, KVH, HS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pos, valid
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows (B, L, KVH, HS)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cache
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, l_chunk, kvh, w, hs), cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kv_write_kernel, batch=b, window=w, s=s, l_chunk=l_chunk
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={3: 0},  # cache input (after pos, valid, rows)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pos, valid_arr, rows4, cache)


# ---------------------------------------------------------------------------
# combined K+V (+scales) commit — one kernel per decode step


def _kv_commit_kernel(
    pos_ref, valid_ref, krows_ref, vrows_ref, *rest,
    batch, window, s, l_chunk, quantized,
):
    """One pipeline committing this step's K AND V rows (and, for int8
    caches, their per-row quantization scales) — the 2 row writers + 2 scale
    writers + the XLA-side rowwise quantization collapse into ONE pallas
    call. Rows arrive as raw fp (L, B, KVH, HS); int8 caches quantize
    in-kernel (absmax/127 per row, runq.c:145-171 applied per cached row),
    overlapped with the window DMAs."""
    if quantized:
        (k_in, v_in, ks_in, vs_in, k_out, v_out, ks_out, vs_out,
         k_scr, v_scr, ks_scr, vs_scr, sems) = rest
        del k_in, v_in, ks_in, vs_in  # aliased with the outputs
    else:
        k_in, v_in, k_out, v_out, k_scr, v_scr, sems = rest
        del k_in, v_in
    n_layers = krows_ref.shape[0]
    steps = [
        (b, c) for b in range(batch) for c in range(n_layers // l_chunk)
    ]

    def window_slice(b):
        pos = pos_ref[b]
        start = pl.multiple_of(
            jnp.minimum((pos // window) * window, s - window), window
        )
        return start, pos - start

    def scale_slice(b):
        pos = pos_ref[b]
        start = pl.multiple_of(jnp.minimum((pos // 128) * 128, s - 128), 128)
        return start, pos - start

    def copies(idx, to_scratch):
        b, c = steps[idx]
        start, _ = window_slice(b)
        slot = idx % 2
        lsl = pl.ds(c * l_chunk, l_chunk)
        wsl = pl.ds(start, window)
        pairs = [
            (k_out.at[b, lsl, :, wsl, :], k_scr.at[slot], 0),
            (v_out.at[b, lsl, :, wsl, :], v_scr.at[slot], 1),
        ]
        if quantized:
            sst, _ = scale_slice(b)
            ssl = pl.ds(sst, 128)
            pairs += [
                (ks_out.at[b, lsl, :, ssl], ks_scr.at[slot], 2),
                (vs_out.at[b, lsl, :, ssl], vs_scr.at[slot], 3),
            ]
        cps = [
            pltpu.make_async_copy(hbm, scr, sems.at[slot, t])
            if to_scratch
            else pltpu.make_async_copy(scr, hbm, sems.at[slot, t])
            for hbm, scr, t in pairs
        ]
        for cp in cps:
            cp.start()
        return cps

    def modify(idx):
        b, c = steps[idx]
        slot = idx % 2
        start, off = window_slice(b)
        lsl = pl.ds(c * l_chunk, l_chunk)
        ok = valid_ref[b] != 0
        for rows_ref, w_scr, s_scr in (
            (krows_ref, k_scr, ks_scr if quantized else None),
            (vrows_ref, v_scr, vs_scr if quantized else None),
        ):
            rows = rows_ref[lsl, b]  # (l_chunk, KVH, HS)
            win = w_scr[slot]  # (l_chunk, KVH, W, HS)
            sub = jax.lax.broadcasted_iota(jnp.int32, win.shape, 2)
            if quantized:
                rf = rows.astype(jnp.float32)
                # am / 127.0 (not am * (1/127)): bit-match quantize_kv_rows
                am = jnp.max(jnp.abs(rf), axis=-1, keepdims=True)
                sc = jnp.where(am == 0.0, 1.0, am / 127.0)
                new = jnp.round(rf / sc).astype(win.dtype)
                sst, soff = scale_slice(b)
                swin = s_scr[slot]  # (l_chunk, KVH, 128)
                lane = jax.lax.broadcasted_iota(jnp.int32, swin.shape, 2)
                s_scr[slot] = jnp.where((lane == soff) & ok, sc, swin)
            else:
                new = rows.astype(win.dtype)
            w_scr[slot] = jnp.where(
                (sub == off) & ok, new[:, :, None, :], win
            )

    # double-buffered (slot, layer-chunk) pipeline, same reordering-safety
    # argument as _kv_write_kernel (windows of distinct slots are disjoint)
    pending_ld = copies(0, True)
    pending_st = [None, None]
    for idx in range(len(steps)):
        if idx + 1 < len(steps):
            if pending_st[(idx + 1) % 2] is not None:
                for cp in pending_st[(idx + 1) % 2]:
                    cp.wait()
                pending_st[(idx + 1) % 2] = None
            nxt = copies(idx + 1, True)
        else:
            nxt = None
        for cp in pending_ld:
            cp.wait()
        modify(idx)
        pending_st[idx % 2] = copies(idx, False)
        pending_ld = nxt
    for st in pending_st:
        if st is not None:
            for cp in st:
                cp.wait()


def kv_commit_rows(
    cache,  # KVCache-like: .k/.v (B, L, KVH, S, HS) donated; int8 also
    # .k_scale/.v_scale (B, L, KVH, S) f32
    k_rows: jax.Array,  # (L, B, KVH, HS) raw fp rows for this step
    v_rows: jax.Array,
    pos: jax.Array,  # (B,) int32
    valid: jax.Array | None = None,
    *,
    interpret: bool | None = None,
):
    """Combined in-place commit of one decode step's K/V rows (+ int8
    scales): ONE pallas dispatch instead of four, with the rowwise int8
    quantization folded in-kernel (the standalone XLA abs/max/round ops and
    the 3-launch serialization disappear). Returns the updated cache."""
    from hip_llama_tpu.models.llama import KVCache

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    k_cache, v_cache = cache.k, cache.v
    quantized = bool(getattr(cache, "quantized", False))
    b, n_layers, kvh, s, hs = k_cache.shape
    valid_arr = (
        jnp.ones((b,), jnp.int32) if valid is None else valid.astype(jnp.int32)
    )
    w = _rmw_window(k_cache.dtype, s)
    assert s % w == 0, (s, w)
    if quantized:
        assert s % 128 == 0, s  # 128-lane scale windows
    # half the single-plane budget: K and V window scratch coexist (plus the
    # fp rows operands), and the scoped-vmem stack must hold them all
    l_chunk = _pick_l_chunk(
        n_layers, kvh, w, hs, k_cache.dtype.itemsize, budget=3 * 2 ** 20
    )

    n_out = 4 if quantized else 2
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # k_rows
        pl.BlockSpec(memory_space=pltpu.VMEM),  # v_rows
    ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_out
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * n_out
    scratch = [
        pltpu.VMEM((2, l_chunk, kvh, w, hs), k_cache.dtype),
        pltpu.VMEM((2, l_chunk, kvh, w, hs), v_cache.dtype),
    ]
    operands = [k_rows, v_rows, k_cache, v_cache]
    out_shape = [
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    if quantized:
        operands += [cache.k_scale, cache.v_scale]
        out_shape += [
            jax.ShapeDtypeStruct(cache.k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(cache.v_scale.shape, jnp.float32),
        ]
        scratch += [
            pltpu.VMEM((2, l_chunk, kvh, 128), jnp.float32),
            pltpu.VMEM((2, l_chunk, kvh, 128), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2, n_out)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pos, valid
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        functools.partial(
            _kv_commit_kernel, batch=b, window=w, s=s, l_chunk=l_chunk,
            quantized=quantized,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # cache planes alias their outputs (after pos, valid, k_rows, v_rows)
        input_output_aliases={4 + i: i for i in range(n_out)},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # window scratch for K+V (+scale) planes plus the fp rows
            # operands exceed the default 16 MB scoped-vmem stack at 7B
            vmem_limit_bytes=48 * 2 ** 20,
        ),
        interpret=interpret,
    )(pos, valid_arr, k_rows, v_rows, *operands[2:])
    if quantized:
        return KVCache(outs[0], outs[1], outs[2], outs[3])
    return KVCache(outs[0], outs[1])


# ---------------------------------------------------------------------------
# int8-KV scale row writer


def _scale_write_kernel(
    pos_ref, srows_ref, sc_in_ref, sc_out_ref, scratch, sems, *, batch, s
):
    # scale cache (B, L, KVH, S): one fp32 per cached row. `pos` indexes the
    # LANE dim, so the RMW window is a 128-lane-aligned strip around pos.
    del sc_in_ref  # aliased with sc_out
    for b in range(batch):
        pos = pos_ref[b]
        start = pl.multiple_of(jnp.minimum((pos // 128) * 128, s - 128), 128)
        off = pos - start
        ld = pltpu.make_async_copy(
            sc_out_ref.at[b, :, :, pl.ds(start, 128)], scratch.at[0],
            sems.at[0],
        )
        ld.start()
        ld.wait()
        win = scratch[0]  # (L, KVH, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, win.shape, 2)
        new = srows_ref[b][:, :, None]  # (L, KVH, 1)
        scratch[0] = jnp.where(lane == off, new, win)
        st = pltpu.make_async_copy(
            scratch.at[0], sc_out_ref.at[b, :, :, pl.ds(start, 128)],
            sems.at[0],
        )
        st.start()
        st.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scale_write_rows(
    scale_cache: jax.Array,  # (B, L, KVH, S) f32 — donated, updated in place
    srows: jax.Array,  # (L, B, KVH) f32 — this step's per-row scales
    pos: jax.Array,  # (B,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """In-place per-row quantization-scale writer for the int8 KV cache —
    the companion of kv_write_rows (~512 KB RMW traffic per slot vs a
    whole-array XLA dynamic-update-slice chain)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n_layers, kvh, s = scale_cache.shape
    if s % 128 or s < 128 or kvh % 8:
        # tiny test configs; also non-8-aligned KVH (110m: 12): the HBM
        # slice of the (.., KVH, 128) window would span a tiling-padded
        # second-minor dim and Mosaic rejects it ("slice must be aligned
        # to tiling (8)"). XLA per-slot update is fine at these sizes.
        upd = jnp.moveaxis(srows, 1, 0)  # (B, L, KVH)
        out = scale_cache
        for i in range(b):
            out = jax.lax.dynamic_update_slice(
                out, upd[i][None, :, :, None], (i, 0, 0, pos[i])
            )
        return out
    srows3 = jnp.moveaxis(srows, 1, 0).astype(jnp.float32)  # (B, L, KVH)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # srows (B, L, KVH)
            pl.BlockSpec(memory_space=pltpu.HBM),  # scale cache
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((1, n_layers, kvh, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_scale_write_kernel, batch=b, s=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(scale_cache.shape, jnp.float32),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pos, srows3, scale_cache)


def _scale_write_kernel_paged(
    pos_ref, pt_ref, srows_ref, sc_in_ref, sc_out_ref, scratch, sems, *, batch, ps
):
    # paged scale plane (L, KVH, P, PS): RMW the slot's page lane-strip
    del sc_in_ref
    for b in range(batch):
        pos = pos_ref[b]
        page = pt_ref[b, pos // ps]
        off = pos % ps
        ld = pltpu.make_async_copy(
            sc_out_ref.at[:, :, page, :], scratch.at[0], sems.at[0]
        )
        ld.start()
        ld.wait()
        win = scratch[0]  # (L, KVH, PS)
        lane = jax.lax.broadcasted_iota(jnp.int32, win.shape, 2)
        new = srows_ref[b][:, :, None]  # (L, KVH, 1)
        scratch[0] = jnp.where(lane == off, new, win)
        st = pltpu.make_async_copy(
            scratch.at[0], sc_out_ref.at[:, :, page, :], sems.at[0]
        )
        st.start()
        st.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scale_write_rows_paged(
    scale_pages: jax.Array,  # (L, KVH, P, PS) f32 — donated
    srows: jax.Array,  # (L, B, KVH) f32
    page_table: jax.Array,  # (B, MAX_PAGES) int32
    pos: jax.Array,  # (B,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Paged companion of scale_write_rows (int8 KV, paged cache)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_layers, kvh, p, ps = scale_pages.shape
    b = srows.shape[1]
    if ps % 128:
        upd = jnp.moveaxis(srows, 1, 0)  # (B, L, KVH)
        out = scale_pages
        for i in range(b):
            page = page_table[i, pos[i] // ps]
            out = jax.lax.dynamic_update_slice(
                out, upd[i][:, :, None, None], (0, 0, page, pos[i] % ps)
            )
        return out
    srows3 = jnp.moveaxis(srows, 1, 0).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # srows
            pl.BlockSpec(memory_space=pltpu.HBM),  # scale pages
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((1, n_layers, kvh, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_scale_write_kernel_paged, batch=b, ps=ps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(scale_pages.shape, jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pos, page_table, srows3, scale_pages)


def quantize_kv_rows(rows: jax.Array):
    """Per-row symmetric int8 quantization of KV rows (L, B, KVH, HS):
    scale = absmax/127 over the head dim (the Q8_0 recipe of runq.c:145-171
    applied per cached row). Returns (int8 rows, (L, B, KVH) f32 scales)."""
    absmax = jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.round(rows.astype(jnp.float32) / scale[..., None])
    return q.astype(jnp.int8), scale


# ---------------------------------------------------------------------------
# paged variant


def _kv_write_kernel_paged(
    pos_ref, pt_ref, rows_ref, pages_in_ref, pages_out_ref, scratch, sems,
    *, batch, window, ps, l_chunk,
):
    del pages_in_ref  # aliased with pages_out
    n_layers = rows_ref.shape[1]

    # same double-buffered (slot, layer-chunk) pipeline as _kv_write_kernel.
    # NOTE: unlike the contiguous cache, two slots share a page only if the
    # BlockManager mis-assigned them — pages are exclusively owned, so slot
    # windows are disjoint and the reordering is safe.
    steps = [
        (b, c) for b in range(batch) for c in range(n_layers // l_chunk)
    ]

    def window_slice(b):
        pos = pos_ref[b]
        page = pt_ref[b, pos // ps]
        off_in_page = pos % ps
        start = pl.multiple_of(
            jnp.minimum((off_in_page // window) * window, ps - window), window
        )
        return page, start, off_in_page - start

    def load(idx):
        b, c = steps[idx]
        page, start, _ = window_slice(b)
        ld = pltpu.make_async_copy(
            pages_out_ref.at[
                pl.ds(c * l_chunk, l_chunk), :, page, pl.ds(start, window), :
            ],
            scratch.at[idx % 2],
            sems.at[idx % 2],
        )
        ld.start()
        return ld

    pending_ld = load(0)
    pending_st = [None, None]
    for idx, (b, c) in enumerate(steps):
        if idx + 1 < len(steps):
            if pending_st[(idx + 1) % 2] is not None:
                pending_st[(idx + 1) % 2].wait()
                pending_st[(idx + 1) % 2] = None
            nxt = load(idx + 1)
        else:
            nxt = None
        pending_ld.wait()
        page, start, off = window_slice(b)
        win = scratch[idx % 2]  # (l_chunk, KVH, W, HS)
        sub = jax.lax.broadcasted_iota(jnp.int32, win.shape, 2)
        new = rows_ref[b, pl.ds(c * l_chunk, l_chunk)][:, :, None, :]
        scratch[idx % 2] = jnp.where(sub == off, new.astype(win.dtype), win)
        st = pltpu.make_async_copy(
            scratch.at[idx % 2],
            pages_out_ref.at[
                pl.ds(c * l_chunk, l_chunk), :, page, pl.ds(start, window), :
            ],
            sems.at[idx % 2],
        )
        st.start()
        pending_st[idx % 2] = st
        pending_ld = nxt
    for st in pending_st:
        if st is not None:
            st.wait()  # drain before kernel exit


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def kv_write_rows_paged(
    pages: jax.Array,  # (L, KVH, P, PS, HS) — donated, updated in place
    rows: jax.Array,  # (L, B, KVH, HS)
    page_table: jax.Array,  # (B, MAX_PAGES) int32
    pos: jax.Array,  # (B,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Paged in-place row writer (the device half of BlockManager): same
    aligned-window RMW as kv_write_rows, but the window lives inside the
    slot's physical page."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_layers, kvh, p, ps, hs = pages.shape
    b = rows.shape[1]
    w = _rmw_window(pages.dtype, ps)
    assert ps % w == 0, (ps, w)  # see kv_write_rows: clamp alignment
    l_chunk = _pick_l_chunk(n_layers, kvh, w, hs, pages.dtype.itemsize)
    rows4 = jnp.moveaxis(rows, 1, 0).astype(pages.dtype)  # (B, L, KVH, HS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows
            pl.BlockSpec(memory_space=pltpu.HBM),  # pages
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, l_chunk, kvh, w, hs), pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kv_write_kernel_paged, batch=b, window=w, ps=ps, l_chunk=l_chunk
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        input_output_aliases={3: 0},  # pages input (after pos, pt, rows)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pos, page_table, rows4, pages)


# ---------------------------------------------------------------------------
# chunked prefill writers: T prompt rows per slot in one windowed RMW


def _kv_write_chunk_kernel(
    layer_ref, start_ref, valid_ref, rows_ref, cache_in_ref, cache_out_ref,
    scratch, rows_scr, sems, *, batch, window, t, sub,
):
    del cache_in_ref  # aliased with cache_out
    l = layer_ref[0]
    s = cache_out_ref.shape[3]

    # serial per-slot RMW: chunk windows are MBs, so double-buffering would
    # double the VMEM footprint for a ~2x overlap win on a path that is
    # ~4 ms vs the 85 ms XLA scatter chain it replaces (b8 t511 at 7B,
    # tools/profile_step.py --mode prefill)
    for b in range(batch):
        v = valid_ref[b]

        @pl.when(v > 0)
        def _():
            st = start_ref[b]
            # S and window are both sub-multiples, so s - window is aligned
            # and the clamp costs no extra offset; worst-case in-window
            # offset is then < 3*sub and window = align_up(t) + 2*sub holds
            # every rolled row without wrapping
            ws = pl.multiple_of(
                jnp.minimum((st // sub) * sub, s - window), sub
            )
            ld = pltpu.make_async_copy(
                cache_out_ref.at[b, l, :, pl.ds(ws, window), :],
                scratch.at[0],
                sems.at[0],
            )
            ld.start()
            # rows live in ANY/HBM space — DMA the slot's rows while the
            # cache window load is in flight
            ld_rows = pltpu.make_async_copy(
                rows_ref.at[b], rows_scr.at[0], sems.at[1]
            )
            ld_rows.start()
            ld.wait()
            ld_rows.wait()
            off = st - ws
            # Mosaic's dynamic rotate is 32-bit-only and unaligned sublane
            # vector loads are illegal, so the off-shift runs as an f32
            # roll PER KV HEAD (exact for int8/bf16; bounds the transient
            # to one (W, HS) f32 tile instead of 9.4 MB for all heads)
            kvh = scratch.shape[1]
            for h in range(kvh):
                win_h = scratch[0, h]  # (W, HS)
                rows_h = rows_scr[0, h].astype(jnp.float32)  # (T, HS)
                padded = jnp.pad(rows_h, ((0, window - t), (0, 0)))
                shifted = pltpu.roll(padded, off, 0)  # zeros wrap, harmless
                j = jax.lax.broadcasted_iota(jnp.int32, win_h.shape, 0)
                keep_new = (j >= off) & (j < off + v)
                scratch[0, h] = jnp.where(
                    keep_new, shifted.astype(win_h.dtype), win_h
                )
            st_cp = pltpu.make_async_copy(
                scratch.at[0],
                cache_out_ref.at[b, l, :, pl.ds(ws, window), :],
                sems.at[0],
            )
            st_cp.start()
            st_cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def kv_write_chunk(
    cache: jax.Array,  # (B, L, KVH, S, HS) — donated, updated in place
    rows: jax.Array,  # (B, T, KVH, HS) — this LAYER's chunk rows
    layer: jax.Array,  # () int32
    start: jax.Array,  # (B,) int32 — first position of the chunk per slot
    valid: jax.Array,  # (B,) int32 — live rows per slot (0 = bystander)
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Write a prefill chunk (positions start..start+valid-1 per slot) of
    ONE layer into the cache in place. Replaces the XLA merge +
    dynamic-update-slice scatter, which cost ~85 ms/step at 7B b8 t511
    (while + DUS chains over the (B, L, KVH, S, HS) cache)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n_layers, kvh, s, hs = cache.shape
    t = rows.shape[1]
    sub = _sublane_window(cache.dtype)
    # window = align_up(t) + 2*sub: the end-of-cache clamp can push the
    # in-window offset to just under 3*sub (start near S - T with t not
    # sub-aligned), and rolled rows must never wrap. REQUIRES s % sub == 0
    # (callers guard), so the clamp target s - w stays sub-aligned.
    w = -(-t // sub) * sub + 2 * sub
    assert s % sub == 0, (s, sub)
    # the clamp target s - w must be non-negative or the windowed RMW DMA
    # would read/write out of bounds (callers gate on this; fail loudly for
    # any new caller instead of corrupting adjacent HBM)
    assert s >= w, (s, w, t)
    rows_t = jnp.swapaxes(rows, 1, 2).astype(cache.dtype)  # (B, KVH, T, HS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # layer, start, valid
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rows (B, KVH, T, HS)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cache in
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((1, kvh, w, hs), cache.dtype),
            pltpu.VMEM((1, kvh, t, hs), cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _kv_write_chunk_kernel, batch=b, window=w, t=t, sub=sub
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={4: 0},  # cache input (after 3 scalars, rows)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer_arr, start, valid, rows_t, cache)


def _scale_write_chunk_kernel(
    layer_ref, start_ref, valid_ref, srows_ref, sc_in_ref, sc_out_ref,
    scratch, sems, *, batch, window, t, lane,
):
    del sc_in_ref
    l = layer_ref[0]
    s = sc_out_ref.shape[3]

    for b in range(batch):
        v = valid_ref[b]

        @pl.when(v > 0)
        def _():
            st = start_ref[b]
            ws = pl.multiple_of(
                jnp.minimum((st // lane) * lane, s - window), lane
            )
            ld = pltpu.make_async_copy(
                sc_out_ref.at[b, l, :, pl.ds(ws, window)],
                scratch.at[0],
                sems.at[0],
            )
            ld.start()
            ld.wait()
            off = st - ws
            win = scratch[0]  # (KVH, W)
            padded = jnp.pad(srows_ref[b], ((0, 0), (0, window - t)))  # (KVH, W)
            shifted = pltpu.roll(padded, off, 1)
            j = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
            keep_new = (j >= off) & (j < off + v)
            scratch[0] = jnp.where(keep_new, shifted, win)
            st_cp = pltpu.make_async_copy(
                scratch.at[0],
                sc_out_ref.at[b, l, :, pl.ds(ws, window)],
                sems.at[0],
            )
            st_cp.start()
            st_cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scale_write_chunk(
    scale_cache: jax.Array,  # (B, L, KVH, S) f32 — donated
    srows: jax.Array,  # (B, T, KVH) f32 — this layer's chunk scales
    layer: jax.Array,  # () int32
    start: jax.Array,  # (B,) int32
    valid: jax.Array,  # (B,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Chunk companion of scale_write_chunk for the int8 KV scale planes."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n_layers, kvh, s = scale_cache.shape
    t = srows.shape[1]
    w = -(-t // 128) * 128 + 256  # align_up(t, lane) + 2*lane (see above)
    assert s % 128 == 0, s
    assert s >= w, (s, w, t)  # clamp target s - w must stay in bounds
    srows_t = jnp.swapaxes(srows, 1, 2).astype(jnp.float32)  # (B, KVH, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # srows: ~0.5 MB at 7B b8
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((1, kvh, w), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _scale_write_chunk_kernel, batch=b, window=w, t=t, lane=128
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(scale_cache.shape, jnp.float32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer_arr, start, valid, srows_t, scale_cache)


# ---------------------------------------------------------------------------
# paged chunk writers: prefill commits for the paged cache. The engine
# guarantees page-aligned chunk starts with T <= page_size, so each slot's
# chunk lands at offset 0 of exactly ONE physical page — a single
# whole-page RMW per slot, no clamp/roll needed (cf. kv_write_chunk).


def _kv_write_chunk_kernel_paged(
    layer_ref, start_ref, valid_ref, pt_ref, rows_ref, pages_in_ref,
    pages_out_ref, scratch, rows_scr, sems, *, batch, t, ps,
):
    del pages_in_ref  # aliased with pages_out
    l = layer_ref[0]
    for b in range(batch):
        v = valid_ref[b]

        @pl.when(v > 0)
        def _():
            page = pt_ref[b, start_ref[b] // ps]
            ld = pltpu.make_async_copy(
                pages_out_ref.at[l, :, page, :, :], scratch.at[0], sems.at[0]
            )
            ld.start()
            ld_rows = pltpu.make_async_copy(
                rows_ref.at[b], rows_scr.at[0], sems.at[1]
            )
            ld_rows.start()
            ld.wait()
            ld_rows.wait()
            win = scratch[0]  # (KVH, PS, HS)
            new = rows_scr[0]  # (KVH, T, HS)
            if t < ps:
                new = jnp.pad(new, ((0, 0), (0, ps - t), (0, 0)))
            j = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
            scratch[0] = jnp.where(j < v, new, win)
            st_cp = pltpu.make_async_copy(
                scratch.at[0], pages_out_ref.at[l, :, page, :, :], sems.at[0]
            )
            st_cp.start()
            st_cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def kv_write_chunk_paged(
    pages: jax.Array,  # (L, KVH, P, PS, HS) — donated, updated in place
    rows: jax.Array,  # (B, T, KVH, HS) — this LAYER's chunk rows
    layer: jax.Array,  # () int32
    page_table: jax.Array,  # (B, MAX_PAGES) int32
    start: jax.Array,  # (B,) int32 — PAGE-ALIGNED chunk start per slot
    valid: jax.Array,  # (B,) int32 — live rows per slot (0 = bystander)
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Paged companion of kv_write_chunk: one whole-page RMW DMA per slot
    per layer instead of the XLA merge + whole-pool dynamic-update-slice
    scatter (the same ~80 ms/step class of win measured for the contiguous
    writer at 7B b8 t511)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_layers, kvh, p, ps, hs = pages.shape
    b, t = rows.shape[:2]
    assert t <= ps, (t, ps)
    rows_t = jnp.swapaxes(rows, 1, 2).astype(pages.dtype)  # (B, KVH, T, HS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # layer, start, valid, page_table
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rows
            pl.BlockSpec(memory_space=pltpu.HBM),  # pages in
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((1, kvh, ps, hs), pages.dtype),
            pltpu.VMEM((1, kvh, t, hs), pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _kv_write_chunk_kernel_paged, batch=b, t=t, ps=ps
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer_arr, start, valid, page_table, rows_t, pages)


def _scale_write_chunk_kernel_paged(
    layer_ref, start_ref, valid_ref, pt_ref, srows_ref, sc_in_ref,
    sc_out_ref, scratch, sems, *, batch, t, ps,
):
    del sc_in_ref
    l = layer_ref[0]
    for b in range(batch):
        v = valid_ref[b]

        @pl.when(v > 0)
        def _():
            page = pt_ref[b, start_ref[b] // ps]
            ld = pltpu.make_async_copy(
                sc_out_ref.at[l, :, page, :], scratch.at[0], sems.at[0]
            )
            ld.start()
            ld.wait()
            win = scratch[0]  # (KVH, PS)
            new = srows_ref[b]  # (KVH, T)
            if t < ps:
                new = jnp.pad(new, ((0, 0), (0, ps - t)))
            j = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
            scratch[0] = jnp.where(j < v, new, win)
            st_cp = pltpu.make_async_copy(
                scratch.at[0], sc_out_ref.at[l, :, page, :], sems.at[0]
            )
            st_cp.start()
            st_cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def scale_write_chunk_paged(
    scale_pages: jax.Array,  # (L, KVH, P, PS) f32 — donated
    srows: jax.Array,  # (B, T, KVH) f32
    layer: jax.Array,  # () int32
    page_table: jax.Array,  # (B, MAX_PAGES) int32
    start: jax.Array,  # (B,) int32 — page-aligned
    valid: jax.Array,  # (B,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_layers, kvh, p, ps = scale_pages.shape
    b, t = srows.shape[:2]
    assert t <= ps, (t, ps)
    srows_t = jnp.swapaxes(srows, 1, 2).astype(jnp.float32)  # (B, KVH, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # srows (small)
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((1, kvh, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _scale_write_chunk_kernel_paged, batch=b, t=t, ps=ps
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(scale_pages.shape, jnp.float32),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer_arr, start, valid, page_table, srows_t, scale_pages)
