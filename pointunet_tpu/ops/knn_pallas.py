"""Pallas TPU kernel for the cell-window KNN hot loop.

The XLA formulation (ops/knn_window.py) materializes (tiles, T, W) distance
and mask tensors in HBM for each of the 9 window offsets. This kernel fuses
the whole per-tile pipeline in VMEM:

  for each query tile t (grid):
    issue the window DMAs up front (overlapped — serial start/wait pairs
      are latency-bound), wait once
    for each window group (unrolled):
      distances  = explicit difference form      (VPU, f32)
      validity   = decoded-cell-coordinate check (VPU)
      pack (d^2 bits | global column) into an int32 key -> scoreboard
    k-step min extraction: per step ONE min-reduce (the key carries both
      distance and identity; no argmin pass) filtered by "key strictly
      greater than the previous winner" (keys are unique, so winners come
      out in increasing order — no knockout writes)

Cost model, measured at 365k x k=16 on v5e: the kernel is bound by
per-tile FIXED overhead (DMA issue/wait latency, ~1-2 us each) plus VPU
sweeps proportional to the scoreboard width. Both are attacked
structurally:

  * ONE merged (16, W) DMA per window carries coords (rows 0-2) AND the
    decoded cell coordinates bitcast into rows 8-10 — half the DMA count
    of separate coord/cell copies at identical bytes.
  * Tiles are split by measured candidate density (exact per-window
    extents from the cell prefix sums) into two predicated launches over
    the same grid, both 9-window, differing ONLY in board width: tiles
    whose widest exact window fits 512 rows (94% of a realistic BraTS
    e2e cloud) run the narrow board, the rest the full width. The k-step
    extraction sweeps the static (tile, 9*W) board k times, so average
    board width IS the VPU cost (~1.85x fewer lanes on that cloud). A
    dynamic chunk-list formulation measured 1.5x SLOWER than static
    boards (Mosaic per-iteration scalar/dynamic-slice overhead), hence
    static shapes + pl.when. An earlier 3-window sparse class (one
    contiguous [dy-1, dy+1] span per dx) was removed: the contiguous
    span includes every row between the dy cells, so only ~2.5% of
    realistic tiles ever qualified.

HBM traffic per tile is exactly the window bytes (no intermediate
tensors), and the selection runs entirely out of VMEM. Window size is a
power of two so the final column -> (group, col) decode is shift/mask.

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


def _kernel_factory(
    tile: int, window: int, k: int, groups: int, flag: int = -1
):
    """groups == 9: one window per (dx, dy) offset. flag >= 0: per-tile
    class predication — the body runs only for tiles whose prefetched
    class equals ``flag`` (the dual-launch density split). flag == -1:
    single launch, no gate. (An r2-r3 3-group variant — one contiguous
    [dy-1, dy+1] span per dx — was removed in r4: on a realistic e2e
    cloud only 2.5% of tiles fit its contiguous span in a small window,
    so it optimized a class that barely exists.)"""
    assert groups == 9
    nw = groups * window
    log2w = int(math.log2(window))
    assert 1 << log2w == window, "window must be a power of two"
    # the global column (group * W + within-window) is packed into the low
    # mantissa bits of the distance key; 9 * 4096 columns max keeps this at
    # 13 bits of d^2 mantissa loss (relative quantization ~2^-10 — far
    # below the cell-window approximation noise)
    col_bits = max(13, log2w + 4)
    col_mask = (1 << col_bits) - 1
    assert nw <= col_mask + 1, "window too large for packed columns"
    INVALID = np.int32(0x7FFFFFFF)  # python scalar: not a captured tracer

    def kernel(
        w0_ref,       # (nt*groups,) int32 window starts (scalar prefetch)
        cls_ref,      # (nt,) int32 per-tile density class (scalar prefetch)
        qp_ref,       # (T, 8) f32 queries, coord-padded (VMEM block)
        qc_ref,       # (T, 3) int32 decoded query cells (VMEM block)
        sup_ref,      # (16, Ns_pad) f32 sorted support: rows 0-2 coords,
                      #   rows 8-10 int32 cells bitcast to f32 (HBM)
        out_idx_ref,  # (T, k) int32 (VMEM block)
        out_negd_ref, # (T, k) f32 (VMEM block)
        buf,          # (16, nw) f32 scratch: all windows side by side
        score_ref,    # (T, nw) int32 packed-key scoreboard
        sem,          # (groups,) DMA semaphores
    ):
        t = pl.program_id(0)

        def body():
            _tile_body(
                t, w0_ref, qp_ref, qc_ref, sup_ref,
                out_idx_ref, out_negd_ref, buf, score_ref, sem,
            )

        if flag >= 0:
            pl.when(cls_ref[t] == flag)(body)
        else:
            body()

    def _tile_body(
        t, w0_ref, qp_ref, qc_ref, sup_ref,
        out_idx_ref, out_negd_ref, buf, score_ref, sem,
    ):
        qp = qp_ref[:]                          # (T, 8), cols 3..7 zero
        qc = qc_ref[:]                          # (T, 3)

        # issue all window DMAs up front: at ~1-2 us latency each, serial
        # start/wait pairs are the kernel's fixed-cost floor across the
        # ~2.8k tiles of a BraTS cloud; batched issue overlaps them
        copies = []
        for g in range(groups):
            # starts are pre-aligned to the 128-lane tiling on the host
            w0 = pl.multiple_of(w0_ref[t * groups + g], 128)
            cp = pltpu.make_async_copy(
                sup_ref.at[:, pl.ds(w0, window)],
                buf.at[:, pl.ds(g * window, window)],
                sem.at[g],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        deltas = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

        for g, (dx, dy) in enumerate(deltas):
            sl = slice(g * window, (g + 1) * window)
            rows = buf[:8, sl]                  # (8, W) coords, 3..7 zero
            # cells ride rows 8-10 as PLAIN f32 values (exact for ints
            # < 2^23). Bitcast int32 bit patterns would be f32 denormals,
            # which the TPU flushes to zero in host-side relayouts —
            # measured recall 0.0001 before this was value-encoded.
            cells = buf[8:11, sl].astype(jnp.int32)
            # explicit difference form: the matmul expansion
            # 2q.s - |q|^2 - |s|^2 cancels catastrophically under the
            # MXU's reduced f32 precision and scrambles near-tie ranks
            d2 = jnp.zeros((tile, window), jnp.float32)
            for c in range(3):
                diff = qp[:, c : c + 1] - rows[c : c + 1, :]
                d2 = d2 + diff * diff           # (T, W), >= 0
            dxv = (cells[0:1, :] - qc[:, 0:1]) == dx
            dyv = (cells[1:2, :] - qc[:, 1:2]) == dy
            valid = dxv & dyv & (jnp.abs(cells[2:3, :] - qc[:, 2:3]) <= 1)
            # packed key: f32 bits of d^2 are order-preserving for d^2>=0;
            # low bits carry the global column so one min-reduce yields
            # winner distance AND identity (no argmin pass)
            col = jax.lax.broadcasted_iota(
                jnp.int32, (tile, window), 1
            ) + (g * window)
            key = jax.lax.bitwise_or(
                jax.lax.bitwise_and(
                    jax.lax.bitcast_convert_type(d2, jnp.int32),
                    jnp.int32(~col_mask),
                ),
                col,
            )
            score_ref[:, sl] = jnp.where(valid, key, INVALID)

        # k-step min extraction fully in VMEM. Packed keys are UNIQUE per
        # row (the low bits carry the global column), so winners come out
        # in strictly increasing key order — step j takes the smallest key
        # strictly greater than winner j-1 from the UNMODIFIED board: one
        # compare+select fused into the min-reduce, no knockout writes and
        # no value-carried board copy (halves the VMEM footprint vs the
        # knockout formulation; at tile=128, W=1024 the copy was 4.7 MB).
        mk = None
        for j in range(k):
            cur = score_ref[:]
            if j > 0:
                cur = jnp.where(cur > mk[:, None], cur, INVALID)
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
            for g in range(groups):
                base = jnp.where(off_idx == g, w0_ref[t * groups + g], base)
            out_idx_ref[:, j] = base + within

    return kernel


# NOTE: the sort/cell/window-start bookkeeping below intentionally
# re-specializes (rather than reuses) knn_window's: the kernel needs
# transposed (16, N) coordinate layouts, 128-lane-aligned window starts,
# and cells interleaved with coords — none of which the XLA path wants.
# The shared policy (cells per axis) lives in knn_window._grid_resolution;
# recall equivalence of the two paths is pinned by tests/test_knn_window
# and the TPU recall checks.
def knn_pallas_core(
    sp_sorted: jax.Array,    # (Ns, 3) support, cell-id sorted
    sc_sorted: jax.Array,    # (Ns, 3) int32 decoded support cells
    cell_start: jax.Array,   # (r^3 + 1,) int32 prefix sums of cell counts
    qp_sorted: jax.Array,    # (Nq, 3) queries, cell-id sorted
    qc_sorted: jax.Array,    # (Nq, 3) int32 decoded query cells
    q_ids_sorted: jax.Array, # (Nq,) int32 query cell ids (sorted)
    k: int,
    resolution: int,
    tile: int,
    window: int,
):
    """Cell-window KNN over PRE-SORTED clouds: returns (Nq, k) indices in
    the sorted-support row space. This is the whole kernel path minus the
    sort/unsort plumbing — the sorted-pyramid build (ops/pyramid.py) keeps
    every level in cell order, so neither the two argsorts nor the
    ~80 ms/level epilogue (s_order gather + q_order unsort scatter,
    measured v5e at 365k x 16) exist on the hot path."""
    ns, nq = sp_sorted.shape[0], qp_sorted.shape[0]
    r = resolution
    r2 = r * r

    pad_q = (-nq) % tile
    # coord dim padded to 8 (sublane tiling); extra cols are zero
    qp = jnp.pad(qp_sorted, ((0, pad_q), (0, 5)))
    # padded queries land in an impossible cell so nothing matches
    qc = jnp.pad(qc_sorted, ((0, pad_q), (0, 0)), constant_values=-1000)
    qi = jnp.pad(q_ids_sorted, (0, pad_q), constant_values=r2 * r - 1)
    nt = qp.shape[0] // tile

    # merged, transposed (16, N) support: rows 0-2 coords, rows 8-10 the
    # decoded cells as PLAIN f32 values (exact: cells < 2^23; int bit
    # patterns bitcast to f32 would be denormals and TPU flushes those to
    # zero in relayouts) — ONE window DMA carries both. Window DMAs slice
    # the 128-lane dim; 16 rows satisfy sublane tiling.
    pad_n = window + 128
    sp_p = jnp.pad(sp_sorted, ((0, pad_n), (0, 0)))
    sc_p = jnp.pad(
        sc_sorted.astype(jnp.float32),
        ((0, pad_n), (0, 0)),
        constant_values=1_000_000.0,
    )
    zeros5 = jnp.zeros((ns + pad_n, 5), jnp.float32)
    sup_pad = jnp.concatenate(
        [sp_p, zeros5, sc_p, zeros5], axis=1
    ).T                                                  # (16, Ns_pad)

    c_lo = qi.reshape(nt, tile)[:, 0]
    c_hi = qi.reshape(nt, tile)[:, -1]

    def extents(deltas):
        """(starts, ends): per-tile support-row windows for cell-id
        deltas [c_lo+d_lo, c_hi+d_hi]. Sorted cell ids are monotone
        within a tile, so rows outside [cell_start[c_lo+d_lo],
        cell_start[c_hi+d_hi+1]) fail the cell-validity check for EVERY
        query in the tile — exact extents lose nothing."""
        d_lo = jnp.asarray([d for d, _ in deltas], jnp.int32)
        d_hi = jnp.asarray([d for _, d in deltas], jnp.int32)
        w0 = cell_start[
            jnp.clip(c_lo[:, None] + d_lo[None, :], 0, r2 * r - 1)
        ].astype(jnp.int32)
        w0 = w0 & ~jnp.int32(127)   # align down to the 128-lane tiling
        end = cell_start[
            jnp.clip(c_hi[:, None] + d_hi[None, :] + 1, 0, r2 * r)
        ].astype(jnp.int32)
        return w0, end

    # 9-window launch: one window per (dx, dy), z-halo +-1
    off9 = [
        (dx * r2 + dy * r - 1, dx * r2 + dy * r + 1)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ]
    w0_9, end_9 = extents(off9)

    def launch(win, grps, flag, w0, cls):
        kernel = _kernel_factory(tile, win, k, grps, flag=flag)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec(
                    (tile, 8), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile, 3), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (tile, k), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile, k), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((16, grps * win), jnp.float32),
                pltpu.VMEM((tile, grps * win), jnp.int32),
                pltpu.SemaphoreType.DMA((grps,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nt * tile, k), jnp.int32),
                jax.ShapeDtypeStruct((nt * tile, k), jnp.float32),
            ],
        )(w0.reshape(-1), cls, qp, qc, sup_pad)

    small = 512
    if window <= small or nt < 8:
        out_idx, out_negd = launch(
            window, 9, -1, w0_9, jnp.zeros((nt,), jnp.int32)
        )
    else:
        # Density split (see module docstring). r4 REDESIGN, measured on
        # a realistic BraTS e2e cloud (365k brain-ellipsoid voxels +
        # all-voxel tumor ball, r=40): the old 3-window sparse class
        # (contiguous per-dx span <= 512) fired on 2.5% of tiles — the
        # contiguous [dy-1, dy+1] span includes every row BETWEEN the dy
        # cells, so almost nothing qualifies — while 94% of tiles fit
        # ALL NINE exact per-(dx,dy) windows in 512 rows. Both classes
        # now run the 9-window kernel and differ only in board width;
        # the k-step min extraction sweeps the static (tile, 9*W) board
        # k times, so the average board width IS the kernel's VPU cost:
        # 9025 -> 4884 expected lanes (1.85x) on that cloud. Two
        # predicated launches over the same grid; each tile's body
        # executes in exactly one.
        cls = (jnp.max(end_9 - w0_9, axis=1) <= small).astype(jnp.int32)
        idx_s, negd_s = launch(small, 9, 1, w0_9, cls)
        idx_b, negd_b = launch(window, 9, 0, w0_9, cls)
        rows_small = jnp.repeat(cls, tile).astype(bool)[:, None]
        out_idx = jnp.where(rows_small, idx_s, idx_b)
        out_negd = jnp.where(rows_small, negd_s, negd_b)

    idx = jnp.clip(out_idx[:nq], 0, ns - 1)
    found = jnp.isfinite(out_negd[:nq])
    # not-found columns fall back to the first found neighbor (row 0 if
    # none) so downstream gathers stay in-bounds
    first = jnp.where(found[:, :1], idx[:, :1], 0)
    return jnp.where(found, idx, first)


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
    """Standalone entry: cell-sorts both clouds, runs the core, and maps
    the results back to the callers' row order."""
    ns = support.shape[0]
    r = resolution

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

    counts = jnp.zeros((r * r * r + 1,), jnp.int32).at[s_ids_sorted + 1].add(1)
    cell_start = jnp.cumsum(counts)

    qc3 = cell3(query)
    q_ids = (qc3[:, 0] * r + qc3[:, 1]) * r + qc3[:, 2]
    q_order = jnp.argsort(q_ids)

    idx_sorted = knn_pallas_core(
        sp_sorted, sc_sorted, cell_start,
        query[q_order], qc3[q_order], q_ids[q_order],
        k, resolution, tile, window,
    )
    orig = s_order[idx_sorted]
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

    slack 4.0: dense-class windows sized for the voxel-cloud density
    bound. Measured on-chip at 365k (all-voxel tumor + subsampled
    background): tie-aware recall 0.9978 overall / 1.0000 in the dense
    tumor region — slack 2.0 truncated dense-region windows (tumor recall
    0.989). Tiles are routed by measured candidate density onto one of
    two 9-window boards differing only in width: sparse tiles (widest
    exact window <= 512 rows) run the narrow board, dense tiles the full
    width. See tests/test_tpu_kernels.py + docs/TPU_KERNEL_VALIDATION.md."""
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
