"""Lower-bound probe of HBM streaming bandwidth (VPU reduction rate).

Context for the roofline denominator (tools/roofline.py uses the v5e
spec-sheet 819 GB/s): the strongest evidence for what is ACHIEVABLE is
the q8 matmul kernels' own device profiles — 9.49 ms/step for a 7.16 GB
weight+scale stream (round 3) = 755 GB/s = 92% of spec sustained through
a real dequant+matmul kernel, so the spec-sheet denominator is honest to
within ~8%. This probe is a complementary LOWER bound: a fused
convert+reduce chain streams the array at the VPU's elementwise rate
(~550 GB/s measured), which bounds HBM read bandwidth from below without
any kernel machinery. Dispatch is amortized by chaining `reps` full
re-reads in one jit (a single tunneled dispatch + scalar fetch costs
~25 ms — more than one read).

Run on the real chip:  python tools/hbm_bw.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    results = {}
    for name, dtype, gb in (
        ("int8_6gb", jnp.int8, 6.0),
        ("bf16_6gb", jnp.bfloat16, 6.0),
        ("f32_4gb", jnp.float32, 4.0),
    ):
        itemsize = jnp.dtype(dtype).itemsize
        n = int(gb * 2 ** 30 / itemsize / 1024) * 1024
        x = jnp.ones((n // 1024, 1024), dtype)
        reps = 8

        @jax.jit
        def rsum(x):
            # the s-dependence in the summand stops XLA from hoisting the
            # loop-invariant reduction out of the fori_loop
            def body(i, s):
                return s + jnp.sum(x.astype(jnp.float32) + s * 1e-30)

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        np.asarray(rsum(x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(rsum(x))
            best = min(best, time.perf_counter() - t0)
        bw = reps * n * itemsize / best / 1e9
        results[name] = round(bw, 1)
        print(f"{name}: {bw:.1f} GB/s VPU-stream lower bound "
              f"({reps} x {n * itemsize / 2**30:.1f} GiB in {best:.3f} s)")
        del x
    print(f"best lower bound / spec 819 GB/s = "
          f"{max(results.values()) / 819.0:.3f}; kernel-demonstrated "
          f"achievable (q8 device profile) = ~755 GB/s (0.92)")


if __name__ == "__main__":
    main()
