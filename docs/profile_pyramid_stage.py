"""Per-op wall-clock breakdown of the on-device pyramid build (r4).

BENCH_r03/r04 put the pyramid stage at ~156-166 ms — the largest
non-attention stage — at ~600 GB/s of XLA-cost-model bytes (~73% of HBM
peak). This locator times the stage's sub-ops separately at the 365k
BraTS contract to find where the milliseconds (and the 94 GB the cost
model charges) actually live: the level-0 sort, each level's self-KNN
(Pallas cell-window above GRID_THRESHOLD, brute below), the cross-level
1-NN up searches, and the decimation/re-sort plumbing.

Sub-graphs are jitted separately with on-device inputs at the exact
intermediate shapes; isolated timings over-count fusion wins slightly —
a locator, not an accounting identity. Numbers include the axon-relay
dispatch overhead (~23-27 ms/call); the `null dispatch` row measures it.

Run on the TPU host:  python docs/profile_pyramid_stage.py
"""
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointunet_tpu.core.config import brats_pointseg_config
from pointunet_tpu.ops.knn import knn
from pointunet_tpu.ops.knn_window import _grid_resolution
from pointunet_tpu.ops.pyramid import (
    _level_resolutions,
    _search_sorted,
    build_pyramid,
)

N = 365_000
K = 16


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))


def bench(name, fn, *args, iters=5):
    fn = jax.jit(fn)
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:52s} {min(times):8.1f} ms "
          f"(med {statistics.median(times):.1f})")
    return min(times)


def main():
    cfg = brats_pointseg_config(num_points=N)
    ratios = cfg.sub_sampling_ratio
    rng = np.random.default_rng(0)
    # dense tumor blob + background fill, mirroring the bench's sampled
    # cloud density profile (gather/window cost depends on it)
    n_blob = N // 3
    blob = rng.normal(0.55, 0.06, (n_blob, 3))
    bg = rng.uniform(0, 1, (N - n_blob, 3))
    xyz_np = np.clip(
        np.concatenate([blob, bg]), 0, 1
    ).astype(np.float32)
    rng.shuffle(xyz_np)
    xyz = jax.device_put(jnp.asarray(xyz_np))

    bench("null dispatch", lambda x: x[0, 0] * 1.0, xyz)
    bench("WHOLE build_pyramid", lambda x: build_pyramid(x, K, ratios), xyz)

    # ---- reproduce the level structure to time sub-ops ----
    r0 = _grid_resolution(N, 1.8)
    rs = _level_resolutions(r0, len(ratios))
    lo = jnp.min(xyz, axis=0)
    span = jnp.maximum(jnp.max(xyz, axis=0) - lo, 1e-6)
    c3 = jnp.clip(
        jnp.floor((xyz - lo) / span * r0).astype(jnp.int32), 0, r0 - 1
    )
    ids0 = (c3[:, 0] * r0 + c3[:, 1]) * r0 + c3[:, 2]

    bench("L0 cell ids + argsort(365k)",
          lambda c: jnp.argsort((c[:, 0] * r0 + c[:, 1]) * r0 + c[:, 2]),
          c3)

    order = jnp.argsort(ids0).astype(jnp.int32)
    cur_x = xyz[order]
    cur_c3 = c3[order]
    cur_ord = order

    from pointunet_tpu.ops.pyramid import GRID_THRESHOLD

    for i, ratio in enumerate(ratios):
        ns_i = int(cur_x.shape[0])
        n_sub = ns_i // ratio

        def shifted(cells3, lvl):
            s, r = lvl, rs[lvl]
            cc = cells3 >> s
            ids = (cc[:, 0] * r + cc[:, 1]) * r + cc[:, 2]
            return cc, ids

        if ns_i <= GRID_THRESHOLD:
            bench(f"L{i} brute self-KNN ({ns_i} pts)",
                  lambda x: knn(x, x, K), cur_x)
        else:
            def self_knn(x, c):
                cc, ids = shifted(c, i)
                return _search_sorted(x, cc, ids, x, cc, ids, K, rs[i])
            bench(f"L{i} window self-KNN ({ns_i} pts)",
                  self_knn, cur_x, cur_c3)

        idx_rel = jnp.nonzero(cur_ord < n_sub, size=n_sub, fill_value=0)[0]
        bench(f"L{i} decimation compaction ({ns_i}->{n_sub})",
              lambda o: jnp.nonzero(o < n_sub, size=n_sub, fill_value=0)[0],
              cur_ord)
        sub_x = cur_x[idx_rel]
        sub_c3 = cur_c3[idx_rel]

        if ns_i <= GRID_THRESHOLD:
            bench(f"L{i} brute up 1-NN ({ns_i} q)",
                  lambda s, q: knn(s, q, 1), sub_x, cur_x)
        else:
            def up_knn(s, sc, q, qc):
                scc, sids = shifted(sc, i)
                qcc, qids = shifted(qc, i)
                return _search_sorted(s, scc, sids, q, qcc, qids, 1, rs[i])
            bench(f"L{i} window up 1-NN ({ns_i} q of {n_sub})",
                  up_knn, sub_x, sub_c3, cur_x, cur_c3)

        def resort(sc3):
            _, sids_next = shifted(sc3, i + 1)
            return jnp.argsort(sids_next, stable=True)
        bench(f"L{i} next-grid re-sort ({n_sub})", resort, sub_c3)

        s_sort = jnp.argsort(
            shifted(sub_c3, i + 1)[1], stable=True
        ).astype(jnp.int32)
        cur_x = sub_x[s_sort]
        cur_c3 = sub_c3[s_sort]
        cur_ord = cur_ord[idx_rel][s_sort]


if __name__ == "__main__":
    main()
