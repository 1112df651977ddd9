import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from hip_llama_tpu.ops.quant import q8_matmul, q8_matmul_silu, q8_quantize_weights

rng = np.random.default_rng(0)
M = 4096
def t(name, fn):
    try:
        out = fn()
        np.asarray(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:150]}", flush=True)

d, hid, nqkv = 4096, 11008, 12288
x = jnp.asarray(rng.standard_normal((M, d)), jnp.bfloat16)
xh = jnp.asarray(rng.standard_normal((M, hid)), jnp.bfloat16)
g = jnp.ones((d,), jnp.float32)
pos = jnp.zeros((M,), jnp.int32)
qkv_t = q8_quantize_weights(jnp.asarray(rng.standard_normal((d, nqkv)) * 0.02), 64)
w13_t = q8_quantize_weights(jnp.asarray(rng.standard_normal((d, 2 * hid)) * 0.02), 64)
w2_t = q8_quantize_weights(jnp.asarray(rng.standard_normal((hid, d)) * 0.02), 64)
wo_t = q8_quantize_weights(jnp.asarray(rng.standard_normal((d, d)) * 0.02), 64)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "qkv"):
    t("qkv out_heads", lambda: q8_matmul(x, qkv_t, out_dtype=jnp.bfloat16, norm_weight=g,
        rope_pos=pos, rope_limit=d + 1024, rope_head=128, out_heads=128))
if which in ("all", "silu"):
    t("silu w13", lambda: q8_matmul_silu(x, w13_t, out_dtype=jnp.bfloat16, norm_weight=g))
if which in ("all", "w2"):
    t("w2 res", lambda: q8_matmul(xh, w2_t, out_dtype=jnp.bfloat16,
        residual=jnp.zeros((M, d), jnp.bfloat16)))
if which in ("all", "wo"):
    t("wo res", lambda: q8_matmul(x, wo_t, out_dtype=jnp.bfloat16,
        residual=jnp.zeros((M, d), jnp.bfloat16)))
