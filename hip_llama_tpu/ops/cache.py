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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane_window(dtype) -> int:
    # max sublane tile Mosaic may pick: 8 * (4 / itemsize)
    return max(8, (8 * 4) // jnp.dtype(dtype).itemsize)


def _kv_write_kernel(
    pos_ref, rows_ref, cache_in_ref, cache_out_ref, scratch, sems,
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
        scratch[idx % 2] = jnp.where(sub == off, new.astype(win.dtype), win)
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


def _pick_l_chunk(n_layers: int, kvh: int, w: int, hs: int, itemsize: int) -> int:
    """Largest divisor of n_layers whose double-buffered window scratch
    stays within ~6 MB of scoped VMEM."""
    budget = 6 * 2 ** 20
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
    *,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n_layers, kvh, s, hs = cache.shape
    w = min(_sublane_window(cache.dtype), s)
    l_chunk = _pick_l_chunk(n_layers, kvh, w, hs, cache.dtype.itemsize)
    rows4 = jnp.moveaxis(rows, 1, 0).astype(cache.dtype)  # (B, L, KVH, HS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
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
        input_output_aliases={2: 0},  # cache input (after pos, rows) -> output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pos, rows4, cache)


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
            sc_out_ref.at[b, :, :, pl.ds(start, 128)],
            scratch.at[b % 2],
            sems.at[b % 2],
        )
        ld.start()
        ld.wait()
        win = scratch[b % 2]  # (L, KVH, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, win.shape, 2)
        new = srows_ref[b][:, :, None]  # (L, KVH, 1)
        scratch[b % 2] = jnp.where(lane == off, new, win)
        st = pltpu.make_async_copy(
            scratch.at[b % 2],
            sc_out_ref.at[b, :, :, pl.ds(start, 128)],
            sems.at[b % 2],
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
    if s % 128 or s < 128:
        # tiny test configs: XLA per-slot update is fine at these sizes
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
            pltpu.VMEM((2, n_layers, kvh, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
            sc_out_ref.at[:, :, page, :], scratch.at[b % 2], sems.at[b % 2]
        )
        ld.start()
        ld.wait()
        win = scratch[b % 2]  # (L, KVH, PS)
        lane = jax.lax.broadcasted_iota(jnp.int32, win.shape, 2)
        new = srows_ref[b][:, :, None]  # (L, KVH, 1)
        scratch[b % 2] = jnp.where(lane == off, new, win)
        st = pltpu.make_async_copy(
            scratch.at[b % 2], sc_out_ref.at[:, :, page, :], sems.at[b % 2]
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
            pltpu.VMEM((2, n_layers, kvh, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
    w = min(_sublane_window(pages.dtype), ps)
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
