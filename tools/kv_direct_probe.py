"""Probe: is a DIRECT single-row DMA (VMEM -> HBM at a dynamic sublane
offset) legal and correct on this chip?

ops/cache.py assumes "TPU DMAs require slices aligned to the buffer
tiling" and therefore read-modify-writes a 32-row window per slot
(~268 MB/step of window traffic at 7B int8). If a (L, KVH, 1, HS) copy
into cache.at[b, :, :, pl.ds(pos, 1), :] compiles and lands correctly,
the commit kernel can skip the window READ entirely and write ~1000x
fewer bytes. Run on the real chip:  python tools/kv_direct_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, rows_ref, cache_in, cache_out, scr, sems, *, batch, w):
    del cache_in
    # narrow-window RMW: load the w-row aligned window, select the row in,
    # store it back (w = the HBM sublane slice alignment: 4 int8 / 2 bf16)
    def start(b):
        return pl.multiple_of((pos_ref[b] // w) * w, w)

    for b in range(batch):
        pltpu.make_async_copy(
            cache_out.at[b, :, :, pl.ds(start(b), w), :],
            scr.at[b], sems.at[b],
        ).start()
    for b in range(batch):
        pltpu.make_async_copy(
            cache_out.at[b, :, :, pl.ds(start(b), w), :],
            scr.at[b], sems.at[b],
        ).wait()
        off = pos_ref[b] - start(b)
        sub = jax.lax.broadcasted_iota(jnp.int32, scr.shape[1:], 2)
        new = rows_ref[:, b][:, :, None, :].astype(scr.dtype)
        scr[b] = jnp.where(sub == off, new, scr[b])
    for b in range(batch):
        pltpu.make_async_copy(
            scr.at[b], cache_out.at[b, :, :, pl.ds(start(b), w), :],
            sems.at[b],
        ).start()
    for b in range(batch):
        pltpu.make_async_copy(
            scr.at[b], cache_out.at[b, :, :, pl.ds(start(b), w), :],
            sems.at[b],
        ).wait()


@functools.partial(jax.jit, donate_argnums=(0,))
def direct_write(cache, rows, pos):
    b, nl, kvh, s, hs = cache.shape
    w = 8  # Mosaic: HBM sublane slices must align to tiling (8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rows
            pl.BlockSpec(memory_space=pltpu.HBM),  # cache in (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((b, nl, kvh, w, hs), cache.dtype),
            pltpu.SemaphoreType.DMA((b,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, batch=b, w=w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pos, rows, cache)


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.int8, jnp.bfloat16):
        b, nl, kvh, s, hs = 4, 3, 8, 256, 128
        cache0 = rng.integers(-100, 100, (b, nl, kvh, s, hs)).astype(
            np.float32
        )
        rows = rng.integers(-100, 100, (nl, b, kvh, hs)).astype(np.float32)
        pos = np.asarray([0, 37, 100, 255], np.int32)
        cache = jnp.asarray(cache0, dtype)
        got = np.asarray(
            direct_write(cache, jnp.asarray(rows, dtype), jnp.asarray(pos))
        ).astype(np.float32)
        want = cache0.copy()
        for i in range(b):
            want[i, :, :, pos[i], :] = rows[:, i]
        ok = np.array_equal(got, want)
        print(f"dtype={jnp.dtype(dtype).name}: "
              f"{'OK — direct row DMA is legal and correct' if ok else 'MISMATCH'}")
        if not ok:
            bad = np.argwhere(got != want)
            print("first bad:", bad[:5], got[tuple(bad[0])], want[tuple(bad[0])])
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
