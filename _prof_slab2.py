"""H-split (first image dim) for the (9,9) conv on (240,240) images."""
import time
import jax, jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
D, H, W, CI, CO = 160, 240, 240, 64, 32
x = jax.random.normal(key, (D, H, W, CI), jnp.bfloat16)
w = jax.random.normal(key, (9, 9, CI, CO), jnp.bfloat16) * 0.01

def conv2d(inp, ker, pad="SAME"):
    return jax.lax.conv_general_dilated(
        inp, ker, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

def t(fn, *a, nrep=3):
    _ = float(fn(*a))
    best = 1e9
    for _ in range(nrep):
        t0 = time.perf_counter()
        _ = float(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 - 30.0

base = jax.jit(lambda x, w: jnp.sum(conv2d(x, w).astype(jnp.float32)))
print(f"(240,240) b160 : {t(base, x, w):7.1f} ms", flush=True)

def hsplit(x, w):
    h = H // 2                                  # 120
    a = x[:, : h + 4]                           # (D, 124, 240, C)
    b = x[:, h - 4 :]
    xx = jnp.concatenate([a, b], axis=0)        # (2D, 124, 240, C)
    y = conv2d(xx, w)
    ya = y[:D, :h]
    yb = y[D:, 4:]
    return jnp.sum(jnp.concatenate([ya, yb], 1).astype(jnp.float32))
print(f"H-split (124,240) b320: {t(jax.jit(hsplit), x, w):7.1f} ms",
      flush=True)

# correctness of the split vs base
f32x = x.astype(jnp.float32)
f32w = w.astype(jnp.float32)
yb_ = conv2d(f32x, f32w)
h = H // 2
xx = jnp.concatenate([f32x[:, : h + 4], f32x[:, h - 4 :]], 0)
y = conv2d(xx, f32w)
ys = jnp.concatenate([y[:D, :h], y[D:, 4:]], 1)
err = float(jnp.max(jnp.abs(ys - yb_)))
print(f"split max err vs SAME: {err:.2e}", flush=True)
