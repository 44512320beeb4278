"""Pallas TPU kernel for the cell-window KNN hot loop.

The XLA formulation (ops/knn_window.py) materializes (tiles, T, W) distance
and mask tensors in HBM for each of the 9 window offsets. This kernel fuses
the whole per-tile pipeline in VMEM:

  for each query tile t (grid):
    for each of the 9 (dx, dy) offsets (unrolled):
      DMA the contiguous support window  [w0[t,o], w0[t,o]+W) from HBM
      distances  = matmul (T,3)x(3,W) on the MXU   (f32)
      validity   = decoded-cell-coordinate check   (VPU)
      stash into a (T, 9W) VMEM scoreboard
    k-step max extraction over the scoreboard -> (T, k) indices

HBM traffic per tile is exactly the window bytes (no intermediate tensors),
and the selection runs entirely out of VMEM. Window size is a power of two
so the final column -> (offset, col) decode is shift/mask.

The host-side wrapper reuses the sort/cell bookkeeping from knn_window and
falls back to the XLA path off-TPU (tests, CPU sim).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn_window import _grid_resolution, _round_up, knn_cell_window


def _kernel_factory(tile: int, window: int, k: int, n_offsets: int = 9):
    nw = n_offsets * window
    log2w = int(math.log2(window))
    assert 1 << log2w == window, "window must be a power of two"

    def kernel(
        w0_ref,       # (nt*9,) int32 flat window starts (scalar prefetch)
        qp_ref,       # (T, 8) f32 queries, coord-padded (VMEM block)
        qc_ref,       # (T, 3) int32 decoded query cells (VMEM block)
        sp_ref,       # (8, Ns_pad) f32 sorted support, transposed+padded (HBM)
        sc_ref,       # (8, Ns_pad) int32 decoded support cells (HBM)
        out_idx_ref,  # (T, k) int32 (VMEM block)
        out_negd_ref, # (T, k) f32 (VMEM block)
        rows_buf,     # (W, 3) f32 scratch
        cells_buf,    # (W, 3) int32 scratch
        score_ref,    # (T, nw) f32 scratch
        sem,          # 2 DMA semaphores
    ):
        t = pl.program_id(0)
        qp = qp_ref[:]                          # (T, 8), cols 3..7 zero
        qc = qc_ref[:]                          # (T, 3)

        offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        for o, (dx, dy) in enumerate(offsets):
            # starts are pre-aligned to the 128-lane tiling on the host
            w0 = pl.multiple_of(w0_ref[t * 9 + o], 128)
            cp_rows = pltpu.make_async_copy(
                sp_ref.at[:, pl.ds(w0, window)], rows_buf, sem.at[0]
            )
            cp_cells = pltpu.make_async_copy(
                sc_ref.at[:, pl.ds(w0, window)], cells_buf, sem.at[1]
            )
            cp_rows.start()
            cp_cells.start()
            cp_rows.wait()
            cp_cells.wait()

            rows = rows_buf[:]                  # (8, W), rows 3..7 zero
            cells = cells_buf[:]                # (8, W)
            # explicit difference form: the matmul expansion
            # 2q.s - |q|^2 - |s|^2 cancels catastrophically under the
            # MXU's reduced f32 precision and scrambles near-tie ranks
            negd = jnp.zeros((tile, window), jnp.float32)
            for c in range(3):
                diff = qp[:, c : c + 1] - rows[c : c + 1, :]
                negd = negd - diff * diff       # (T, W)
            valid = (
                ((cells[0:1, :] - qc[:, 0:1]) == dx)
                & ((cells[1:2, :] - qc[:, 1:2]) == dy)
                & (jnp.abs(cells[2:3, :] - qc[:, 2:3]) <= 1)
            )
            score_ref[:, o * window : (o + 1) * window] = jnp.where(
                valid, negd, -jnp.inf
            )

        # k-step max extraction fully in VMEM; the winning column decodes
        # to (offset, row-within-window) by shift/mask, and the offset's
        # window base comes from a 9-way select chain (no gathers).
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, nw), 1)
        for j in range(k):
            cur = score_ref[:]
            m = jnp.max(cur, axis=1, keepdims=True)         # (T, 1)
            am = jnp.argmax(cur, axis=1).astype(jnp.int32)  # (T,)
            out_negd_ref[:, j] = m[:, 0]
            off_idx = jax.lax.shift_right_logical(am, log2w)
            within = jax.lax.bitwise_and(am, window - 1)
            base = jnp.zeros_like(am)
            for o in range(n_offsets):
                base = jnp.where(off_idx == o, w0_ref[t * 9 + o], base)
            out_idx_ref[:, j] = base + within
            score_ref[:] = jnp.where(
                col_iota == am[:, None], -jnp.inf, cur
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "resolution", "tile", "window"),
)
def _knn_pallas_impl(
    support: jax.Array,      # (Ns, 3)
    query: jax.Array,        # (Nq, 3)
    k: int,
    resolution: int,
    tile: int,
    window: int,
):
    ns, nq = support.shape[0], query.shape[0]
    r = resolution
    r2 = r * r

    lo = jnp.min(support, axis=0)
    span = jnp.maximum(jnp.max(support, axis=0) - lo, 1e-6)

    def cell3(pts):
        return jnp.clip(
            jnp.floor((pts - lo) / span * r).astype(jnp.int32), 0, r - 1
        )

    sc3 = cell3(support)
    s_ids = (sc3[:, 0] * r + sc3[:, 1]) * r + sc3[:, 2]
    s_order = jnp.argsort(s_ids)
    s_ids_sorted = s_ids[s_order]
    sp_sorted = support[s_order]
    sc_sorted = sc3[s_order]

    counts = jnp.zeros((r2 * r + 1,), jnp.int32).at[s_ids_sorted + 1].add(1)
    cell_start = jnp.cumsum(counts)

    qc3 = cell3(query)
    q_ids = (qc3[:, 0] * r + qc3[:, 1]) * r + qc3[:, 2]
    q_order = jnp.argsort(q_ids)
    q_ids_sorted = q_ids[q_order]
    qp_sorted = query[q_order]
    qc_sorted = qc3[q_order]

    pad_q = (-nq) % tile
    # coord dim padded to 8 (sublane tiling); extra cols are zero
    qp = jnp.pad(qp_sorted, ((0, pad_q), (0, 5)))
    # padded queries land in an impossible cell so nothing matches
    qc = jnp.pad(qc_sorted, ((0, pad_q), (0, 0)), constant_values=-1000)
    qi = jnp.pad(q_ids_sorted, (0, pad_q), constant_values=r2 * r - 1)
    nt = qp.shape[0] // tile

    # transposed (8, N) layout: window DMAs slice the 128-lane dim and the
    # coord dim satisfies the sublane tiling; rows 3..7 are zeros
    sp_pad = jnp.pad(sp_sorted, ((0, window + 128), (0, 5))).T
    sc_pad = jnp.pad(
        sc_sorted, ((0, window + 128), (0, 5)), constant_values=1_000_000
    ).T

    c_lo = qi.reshape(nt, tile)[:, 0]
    offs = jnp.asarray(
        [dx * r2 + dy * r for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        jnp.int32,
    )
    w0 = cell_start[
        jnp.clip(c_lo[:, None] + offs[None, :] - 1, 0, r2 * r - 1)
    ].astype(jnp.int32)                                  # (nt, 9)
    # align starts down to the 128-lane tiling; the windows carry slack
    w0 = w0 & ~jnp.int32(127)

    kernel = _kernel_factory(tile, window, k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (tile, 8), lambda t, w: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, 3), lambda t, w: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, k), lambda t, w: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, k), lambda t, w: (t, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, window), jnp.float32),
            pltpu.VMEM((8, window), jnp.int32),
            pltpu.VMEM((tile, 9 * window), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_idx, out_negd = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt * tile, k), jnp.int32),
            jax.ShapeDtypeStruct((nt * tile, k), jnp.float32),
        ],
    )(w0.reshape(-1), qp, qc, sp_pad, sc_pad)

    idx = out_idx[:nq]
    negd = out_negd[:nq]
    found = jnp.isfinite(negd)
    orig = jnp.where(found, s_order[jnp.clip(idx, 0, ns - 1)], -1)
    first = jnp.where(orig[:, :1] >= 0, orig[:, :1], 0)
    orig = jnp.where(found & (orig >= 0), orig, first)
    return jnp.zeros_like(orig).at[q_order].set(orig)


def knn_pallas(
    support: jax.Array,
    query: jax.Array,
    k: int,
    alpha: float = 1.8,
    tile: int = 128,
    slack: float = 2.0,
) -> jax.Array:
    """Pallas-fused cell-window KNN (TPU); XLA fallback elsewhere."""
    if jax.default_backend() != "tpu":
        return knn_cell_window(support, query, k, alpha=alpha, slack=slack)
    support = support.astype(jnp.float32)
    query = query.astype(jnp.float32)
    ns = int(support.shape[0])
    nq = int(query.shape[0])
    k = min(k, ns)
    resolution = _grid_resolution(ns, alpha)
    tile = min(tile, max(_round_up(nq, 8), 8))
    per_cell = ns / float(resolution ** 3)
    exp_rows = tile * (ns / max(nq, 1)) + 2.0 * per_cell + 64.0
    window = 1 << max(7, math.ceil(math.log2(max(slack * exp_rows, 128))))
    window = min(window, 1 << math.ceil(math.log2(max(ns, 128))))
    return _knn_pallas_impl(support, query, k, resolution, tile, window)
