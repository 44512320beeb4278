"""2D conv image-geometry experiments for the (1,9,9) SA conv."""
import time
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
D, H, W, CI, CO = 160, 240, 240, 64, 32
x = jax.random.normal(key, (D, H, W, CI), jnp.bfloat16)
w = jax.random.normal(key, (9, 9, CI, CO), jnp.bfloat16) * 0.01

def conv2d(inp, ker):
    return jax.lax.conv_general_dilated(
        inp, ker, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

def t(fn, *a, nrep=3):
    _ = float(fn(*a))
    best = 1e9
    for _ in range(nrep):
        t0 = time.perf_counter()
        _ = float(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 - 30.0

base = jax.jit(lambda x, w: jnp.max(conv2d(x, w).astype(jnp.float32)))
print(f"(240,240) batch160 : {t(base, x, w):7.1f} ms", flush=True)

def slab(x, w):
    # split W into two halo'd slabs folded into batch
    h = W // 2
    a = x[:, :, : h + 4]          # (D, 240, 124, C)
    b = x[:, :, h - 4 :]
    xx = jnp.concatenate([jnp.pad(a, ((0,0),(0,0),(0,0),(0,0))),
                          b], axis=0)         # (2D, 240, 124, C)
    y = conv2d(xx, w)
    ya = y[:D, :, : h]
    yb = y[D:, :, 4:]
    return jnp.max(jnp.concatenate([ya, yb], 2).astype(jnp.float32))
print(f"W-split slabs      : {t(jax.jit(slab), x, w):7.1f} ms", flush=True)

# transpose H<->D then conv (160,240) image, batch 240
def tr(x, w):
    xt = jnp.transpose(x, (1, 0, 2, 3))       # (H, D, W, C)
    wt = jnp.transpose(w, (0, 1, 2, 3))       # kernel (9,9) same
    y = conv2d(xt, wt)
    return jnp.max(y.astype(jnp.float32))
print(f"transposed (160,240): {t(jax.jit(tr), x, w):7.1f} ms", flush=True)
