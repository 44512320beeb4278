"""Per-op wall-clock breakdown of the fused pipeline's pointseg stage.

The r3 roofline put pointseg_scatter at 131 ms / 0.62% MFU / 4.7% HBM —
the worst stage on the repo's own accounting (VERDICT r3 item 1). This
locator times each component of the RandLA-Net forward at the 365k BraTS
contract with the REAL pyramid indices (gather cost depends on index
distribution: a dense tumor blob plus sparse background fill, exactly what
ops/sampling.py emits — uniform-random clouds understate window sizes).

Sub-graphs are jitted separately, so their sum over-counts fusion wins
slightly — a locator, not an accounting identity.

Run on the TPU chip:  PYTHONPATH=. python docs/profile_pointseg_stage.py
"""
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointunet_tpu.core.config import brats_pointseg_config
from pointunet_tpu.models.randlanet import init_randlanet
from pointunet_tpu.ops.pyramid import build_pyramid_batch
from pointunet_tpu.ops.sampling import sample_cloud_device
from pointunet_tpu.ops.scatter import scatter_labels_to_volume

N = 365_000
K = 16
SHAPE = (240, 240, 155)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))


def bench(name, fn, *args, iters=6):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:56s} {min(times):8.2f} ms "
          f"(med {statistics.median(times):.2f})")
    return min(times)


def make_cloud():
    """BraTS-like cloud: ellipsoid brain + dense tumor blob, sampled with
    the production on-device sampler (same distribution as the e2e bench)."""
    rng = np.random.default_rng(0)
    x, y, z = SHAPE
    xx, yy, zz = np.meshgrid(
        np.arange(x), np.arange(y), np.arange(z), indexing="ij"
    )
    brain = (
        ((xx - 120.0) / 75.0) ** 2
        + ((yy - 122.0) / 88.0) ** 2
        + ((zz - 76.0) / 70.0) ** 2
    ) < 1.0
    d2 = (xx - 140.0) ** 2 + (yy - 100.0) ** 2 + ((zz - 70.0) * 1.5) ** 2
    tumor = d2 < 30.0 ** 2          # ~100k voxels, the r_div=16 regime
    mods = rng.standard_normal((4, x, y, z)).astype(np.float32) * 0.2
    mods[:, brain] += 1.0
    mods[:, ~brain] = 0.0
    return sample_cloud_device(
        jnp.asarray(mods),
        jnp.asarray(tumor & brain),
        jax.random.PRNGKey(0),
        N,
    )


def main():
    print("backend:", jax.default_backend())
    cfg = brats_pointseg_config(use_bfloat16=True)
    model, variables = init_randlanet(jax.random.PRNGKey(0), cfg)
    cloud = make_cloud()

    pyramid_fn = jax.jit(
        lambda xyz: build_pyramid_batch(
            xyz[None], cfg.k_n, cfg.sub_sampling_ratio
        )
    )
    pyr = pyramid_fn(cloud.xyz)
    sync(pyr)
    sizes = [int(p.shape[1]) for p in pyr.xyz]
    print("level sizes:", sizes)

    # ---- whole stage & whole forward ----
    @jax.jit
    def whole_stage(pyramid, xyz, feats, origin):
        order = pyramid.order[0]
        logits = model.apply(
            variables,
            jnp.concatenate([xyz, feats], -1)[order][None],
            pyramid, train=False,
        )
        labels_pt = jnp.argmax(logits[0], axis=-1).astype(jnp.uint8)
        return scatter_labels_to_volume(
            labels_pt, origin[order], (SHAPE[2], SHAPE[1], SHAPE[0])
        )

    @jax.jit
    def forward_only(pyramid, xyz, feats):
        order = pyramid.order[0]
        return model.apply(
            variables,
            jnp.concatenate([xyz, feats], -1)[order][None],
            pyramid, train=False,
        )

    bench("WHOLE pointseg_scatter stage", whole_stage,
          pyr, cloud.xyz, cloud.features, cloud.xyz_origin)
    bench("forward only (apply)", forward_only,
          pyr, cloud.xyz, cloud.features)

    # ---- the row reorder gather feats[order] ----
    feats_c = jnp.concatenate([cloud.xyz, cloud.features], -1)
    reorder = jax.jit(lambda f, o: f[o])
    bench("reorder gather feats[order] (365k x 7)", reorder,
          feats_c, pyr.order[0])

    # ---- per-level gathers with REAL indices ----
    d_out = cfg.d_out
    for i in range(cfg.num_layers):
        n_i = sizes[i]
        d_in = d_out[i] // 2
        xyz_i = pyr.xyz[i][0]
        idx_i = pyr.neigh_idx[i][0]
        # combined [xyz | feature] gather, width 3 + d_in
        table = jnp.concatenate(
            [xyz_i, jnp.ones((n_i, d_in), jnp.bfloat16).astype(jnp.float32)],
            axis=-1,
        )
        g = jax.jit(lambda t, ix: jnp.take(t, ix, axis=0))
        bench(f"L{i} neigh gather ({n_i}x{K}, w={3 + d_in})",
              g, table, idx_i)
        # second-round f_agg gather, width d_in, bf16
        table2 = jnp.ones((n_i, d_in), jnp.bfloat16)
        bench(f"L{i} f_agg gather ({n_i}x{K}, w={d_in}, bf16)",
              g, table2, idx_i)
        # pool gather, width 2*d_out (the DRB output), rows N_{i+1} x K
        tpool = jnp.ones((n_i, 2 * d_out[i]), jnp.bfloat16)
        bench(f"L{i} pool gather ({sizes[i+1]}x{K}, w={2 * d_out[i]}, bf16)",
              g, tpool, pyr.sub_idx[i][0])

    # ---- interp gathers (decoder) ----
    for j in range(cfg.num_layers):
        lev = cfg.num_layers - 1 - j      # gathers level lev+1 -> lev rows
        w = 2 * d_out[lev]
        tbl = jnp.ones((sizes[lev + 1], w), jnp.bfloat16)
        g1 = jax.jit(lambda t, ix: jnp.take(t, ix[:, 0], axis=0))
        bench(f"interp gather L{lev + 1}->L{lev} ({sizes[lev]}x1, w={w})",
              g1, tbl, pyr.interp_idx[lev][0])

    # ---- non-gather compute proxies ----
    from pointunet_tpu.ops.gather import encode_neighbor_xyz

    enc = jax.jit(lambda q, nbr: encode_neighbor_xyz(q, nbr))
    nbr0 = jnp.ones((N, K, 3), jnp.float32)
    bench("encode_neighbor_xyz L0 (365k x 16)", enc, pyr.xyz[0][0], nbr0)

    def mlp_shape(name, rows, cin, cout, dtype=jnp.bfloat16):
        w = jnp.ones((cin, cout), dtype)
        xx_ = jnp.ones((rows, cin), dtype)
        f = jax.jit(
            lambda a, ww: jax.nn.leaky_relu(a @ ww, negative_slope=0.2)
        )
        bench(name, f, xx_, w)

    mlp_shape("f_xyz MLP L0 proxy (5.84M x 10 -> 8)", N * K, 10, 8)
    mlp_shape("att Dense L0 proxy (5.84M x 16 -> 16)", N * K, 16, 16)

    def attpool_proxy(rows_nk, d):
        s = jnp.ones((rows_nk // K, K, d), jnp.bfloat16)
        w = jnp.ones((d, d), jnp.bfloat16)

        @jax.jit
        def f(fs, ww):
            att = fs @ ww
            sc = jax.nn.softmax(att, axis=-2)
            return jnp.sum(sc * fs, axis=-2)

        bench(f"attpool core ({rows_nk // K}x{K}x{d})", f, s, w)

    attpool_proxy(N * K, 16)        # L0 round 2
    attpool_proxy(sizes[1] * K, 64)  # L1 round 2

    # ---- scatter tail ----
    sc = jax.jit(
        lambda lp, og: scatter_labels_to_volume(
            lp, og, (SHAPE[2], SHAPE[1], SHAPE[0])
        )
    )
    bench("scatter_labels_to_volume (365k)", sc,
          jnp.ones((N,), jnp.uint8), cloud.xyz_origin)


if __name__ == "__main__":
    main()
