"""Sample stage breakdown."""
import time
import jax, jax.numpy as jnp
from pointunet_tpu.ops.sampling import sample_cloud_device

key = jax.random.PRNGKey(0)
mods = jax.random.normal(key, (4, 240, 240, 155), jnp.float32)
mask = jax.random.uniform(key, (240, 240, 155)) < 0.2

def t(fn, *a, nrep=4):
    _ = float(fn(*a))
    best = 1e9
    for _ in range(nrep):
        t0 = time.perf_counter()
        _ = float(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 - 30.0

full = jax.jit(lambda m, mk, k: jnp.sum(
    sample_cloud_device(m, mk, k, 365_000).features))
print(f"sample full    : {t(full, mods, mask, key):7.1f} ms", flush=True)

nvox = 240*240*155
def score_only(m, mk, k):
    flat = m.reshape(4, nvox).T
    nz = jnp.any(flat != 0, axis=1)
    sal = (mk.reshape(nvox)) & nz
    sc = (jax.random.uniform(k, (nvox,), jnp.float32)
          + 2.0*sal.astype(jnp.float32) + nz.astype(jnp.float32))
    return jnp.sum(jax.lax.top_k(sc, 365_000)[1])
print(f"score+topk     : {t(jax.jit(score_only), mods, mask, key):7.1f} ms",
      flush=True)

def score2(m, mk, k):
    # channel-major: no (nvox, C) transpose
    nz = jnp.any(m != 0, axis=0).reshape(nvox)
    sal = mk.reshape(nvox) & nz
    sc = (jax.random.uniform(k, (nvox,), jnp.float32)
          + 2.0*sal.astype(jnp.float32) + nz.astype(jnp.float32))
    return jnp.sum(jax.lax.top_k(sc, 365_000)[1])
print(f"score2+topk    : {t(jax.jit(score2), mods, mask, key):7.1f} ms",
      flush=True)

sel = jax.random.randint(key, (365_000,), 0, nvox, jnp.int32)
g1 = jax.jit(lambda m, s: jnp.sum(m.reshape(4, nvox).T[s]))
print(f"feats gather rows: {t(g1, mods, sel):7.1f} ms", flush=True)
g2 = jax.jit(lambda m, s: jnp.sum(m.reshape(4, nvox)[:, s]))
print(f"feats gather cols: {t(g2, mods, sel):7.1f} ms", flush=True)
