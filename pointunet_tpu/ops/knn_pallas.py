"""Pallas TPU kernel for the cell-window KNN hot loop.

The XLA formulation (ops/knn_window.py) materializes (tiles, T, W) distance
and mask tensors in HBM for each of the 9 window offsets. This kernel fuses
the whole per-tile pipeline in VMEM:

  for each query tile t (grid):
    issue ALL 18 window DMAs [w0[t,o], w0[t,o]+W) up front (overlapped —
      serial start/wait pairs are latency-bound), wait once
    for each of the 9 (dx, dy) offsets (unrolled):
      distances  = explicit difference form      (VPU, f32)
      validity   = decoded-cell-coordinate check (VPU)
      pack (d^2 bits | global column) into an int32 key -> (T, 9W) board
    k-step min extraction: per step ONE min-reduce (the key carries both
      distance and identity; no argmin pass) + one knockout sweep

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

from .knn import pad_k_columns
from .knn_window import _grid_resolution, _round_up, knn_cell_window


def _kernel_factory(tile: int, window: int, k: int, n_offsets: int = 9):
    nw = n_offsets * window
    log2w = int(math.log2(window))
    assert 1 << log2w == window, "window must be a power of two"
    # the global column (offset * W + within-window) is packed into the low
    # mantissa bits of the distance key; 9 * 4096 columns max keeps this at
    # 13 bits of d^2 mantissa loss (relative quantization ~2^-10 — far
    # below the cell-window approximation noise)
    col_bits = max(13, log2w + 4)
    col_mask = (1 << col_bits) - 1
    assert nw <= col_mask + 1, "window too large for packed columns"
    INVALID = np.int32(0x7FFFFFFF)  # python scalar: not a captured tracer

    def kernel(
        w0_ref,       # (nt*9,) int32 flat window starts (scalar prefetch)
        qp_ref,       # (T, 8) f32 queries, coord-padded (VMEM block)
        qc_ref,       # (T, 3) int32 decoded query cells (VMEM block)
        sp_ref,       # (8, Ns_pad) f32 sorted support, transposed+padded (HBM)
        sc_ref,       # (8, Ns_pad) int32 decoded support cells (HBM)
        out_idx_ref,  # (T, k) int32 (VMEM block)
        out_negd_ref, # (T, k) f32 (VMEM block)
        rows_buf,     # (8, nw) f32 scratch: all 9 windows side by side
        cells_buf,    # (8, nw) int32 scratch
        score_ref,    # (T, nw) int32 packed-key scoreboard
        sem,          # (18,) DMA semaphores
    ):
        t = pl.program_id(0)
        qp = qp_ref[:]                          # (T, 8), cols 3..7 zero
        qc = qc_ref[:]                          # (T, 3)

        offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        # issue all 18 window DMAs up front: at ~1-2 us latency each,
        # serial start/wait pairs cost ~50 ms across the 2.8k tiles of a
        # BraTS cloud; batched issue overlaps them all
        copies = []
        for o in range(n_offsets):
            # starts are pre-aligned to the 128-lane tiling on the host
            w0 = pl.multiple_of(w0_ref[t * 9 + o], 128)
            cp_rows = pltpu.make_async_copy(
                sp_ref.at[:, pl.ds(w0, window)],
                rows_buf.at[:, pl.ds(o * window, window)],
                sem.at[2 * o],
            )
            cp_cells = pltpu.make_async_copy(
                sc_ref.at[:, pl.ds(w0, window)],
                cells_buf.at[:, pl.ds(o * window, window)],
                sem.at[2 * o + 1],
            )
            cp_rows.start()
            cp_cells.start()
            copies.append((cp_rows, cp_cells))
        for cp_rows, cp_cells in copies:
            cp_rows.wait()
            cp_cells.wait()

        for o, (dx, dy) in enumerate(offsets):
            sl = slice(o * window, (o + 1) * window)
            rows = rows_buf[:, sl]              # (8, W), rows 3..7 zero
            cells = cells_buf[:, sl]            # (8, W)
            # explicit difference form: the matmul expansion
            # 2q.s - |q|^2 - |s|^2 cancels catastrophically under the
            # MXU's reduced f32 precision and scrambles near-tie ranks
            d2 = jnp.zeros((tile, window), jnp.float32)
            for c in range(3):
                diff = qp[:, c : c + 1] - rows[c : c + 1, :]
                d2 = d2 + diff * diff           # (T, W), >= 0
            valid = (
                ((cells[0:1, :] - qc[:, 0:1]) == dx)
                & ((cells[1:2, :] - qc[:, 1:2]) == dy)
                & (jnp.abs(cells[2:3, :] - qc[:, 2:3]) <= 1)
            )
            # packed key: f32 bits of d^2 are order-preserving for d^2>=0;
            # low bits carry the global column so one min-reduce yields
            # winner distance AND identity (no argmin pass)
            col = jax.lax.broadcasted_iota(
                jnp.int32, (tile, window), 1
            ) + (o * window)
            key = jax.lax.bitwise_or(
                jax.lax.bitwise_and(
                    jax.lax.bitcast_convert_type(d2, jnp.int32),
                    jnp.int32(~col_mask),
                ),
                col,
            )
            score_ref[:, sl] = jnp.where(valid, key, INVALID)

        # k-step min extraction fully in VMEM. The board is carried as a
        # VALUE between steps: step j>0 reads the previous board once,
        # produces the knocked-out board, and the min-reduce fuses into
        # that same traversal — ~2 board passes per step (and 1 for step
        # 0, which needs no knockout) vs 3 for the read/min + read/write
        # knockout formulation. At 365k x k=16 the selection sweeps are
        # the kernel's VPU-throughput bound, so passes ~= milliseconds
        # (measured: 156 -> 109 ms net).
        mk = None
        cur = score_ref[:]
        for j in range(k):
            if j > 0:
                cur = jnp.where(cur == mk[:, None], INVALID, cur)
            mk = jnp.min(cur, axis=1)                       # (T,) int32
            d2q = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(mk, jnp.int32(~col_mask)), jnp.float32
            )
            # invalid keys decode to NaN (exponent all-ones) -> callers'
            # isfinite() check keeps treating them as not-found
            out_negd_ref[:, j] = -d2q
            am = jax.lax.bitwise_and(mk, jnp.int32(col_mask))
            off_idx = jax.lax.shift_right_logical(am, log2w)
            within = jax.lax.bitwise_and(am, window - 1)
            base = jnp.zeros_like(am)
            for o in range(n_offsets):
                base = jnp.where(off_idx == o, w0_ref[t * 9 + o], base)
            out_idx_ref[:, j] = base + within

    return kernel


# NOTE: the sort/cell/window-start bookkeeping below intentionally
# re-specializes (rather than reuses) knn_window's: the kernel needs
# transposed (8, N) coordinate layouts, 128-lane-aligned window starts,
# and 3-column decoded cells — none of which the XLA path wants. The
# shared policy (cells per axis) lives in knn_window._grid_resolution;
# recall equivalence of the two paths is pinned by tests/test_knn_window
# and the TPU recall checks.
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((8, 9 * window), jnp.float32),
            pltpu.VMEM((8, 9 * window), jnp.int32),
            pltpu.VMEM((tile, 9 * window), jnp.int32),
            pltpu.SemaphoreType.DMA((18,)),
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
    slack: float = 4.0,
) -> jax.Array:
    """Pallas-fused cell-window KNN (TPU); XLA fallback elsewhere.

    slack 4.0: windows sized for the voxel-cloud density bound. Measured
    on-chip at 365k (all-voxel tumor + subsampled background): tie-aware
    recall 0.9978 overall / 1.0000 in the dense tumor region, 165 ms —
    slack 2.0 truncated dense-region windows (tumor recall 0.989, 149 ms).
    See tests/test_tpu_kernels.py + docs/TPU_KERNEL_VALIDATION.md."""
    if jax.default_backend() != "tpu":
        return knn_cell_window(support, query, k, alpha=alpha, slack=slack)
    support = support.astype(jnp.float32)
    query = query.astype(jnp.float32)
    ns = int(support.shape[0])
    nq = int(query.shape[0])
    k_req, k = k, min(k, ns)
    resolution = _grid_resolution(ns, alpha)
    tile = min(tile, max(_round_up(nq, 8), 8))
    per_cell = ns / float(resolution ** 3)
    exp_rows = tile * (ns / max(nq, 1)) + 2.0 * per_cell + 64.0
    window = 1 << max(7, math.ceil(math.log2(max(slack * exp_rows, 128))))
    window = min(window, 1 << math.ceil(math.log2(max(ns, 128))))
    return pad_k_columns(
        _knn_pallas_impl(support, query, k, resolution, tile, window), k_req
    )
