"""Pallas TPU kernel: fused 3x3x3 channels-last convolution.

Why it exists: the attention stage's full-res tail is ~15 separate conv /
norm / elementwise launches, each re-reading its ~0.8-1.6 GB input from
HBM, and XLA:TPU lowers the convs themselves far from roofline at these
shapes (measured 2-16% MFU for the (Z,Y,X,64..128) tail convs even via
the depth-batched 2-D path, docs/ATTENTION_STAGE.md). The arithmetic of a
3x3x3 conv is 27 shifted (rows, Cin) @ (Cin, Cout) matmuls — exactly what
the MXU wants — and the input tile can stay resident in VMEM across all
27 taps. This kernel does that:

    per grid cell (bz x by z/y block):
      one DMA brings the haloed input block (bz+2, by+2, W+2, Cin) to VMEM
      acc(f32) += dot(x[dz:dz+bz, dy:dy+by, dx:dx+W, :], w[dz,dy,dx])
                  for the 27 (dz, dy, dx) taps, unrolled
      write acc -> (bz, by, W, Cout)

HBM traffic is one read of x plus one write of y — the compulsory bytes —
vs the XLA path's repeated materializations. SAME padding is realized by
zero-padding x once in XLA (also rounding Z/Y up to block multiples); the
pad is elementwise and fuses upstream.

Replaces the hot-path use of ``fast_conv3d`` (models/fastconv.py) for
stride-1 dilation-1 3x3x3 SAME convs on TPU; reference counterpart is any
``helper_tf_util.conv3d`` / keras Conv3D at full resolution (reference
SaliencyAttention/model.py:177-314). Validated against
``lax.conv_general_dilated`` in tests/test_conv_pallas.py (interpret mode
on CPU, real kernel on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_factory(bz: int, by: int, ny: int, total: int, w_full: int,
                    cin: int, cout: int, out_dtype):
    """1-D grid over (z-block, y-block) cells with double-buffered input
    DMA: the copy for cell t+1 is in flight while cell t computes its 27
    taps — without it the per-cell DMA round trip dominates (measured
    84 ms for the c1 shape at the naive 2-D grid; the work per cell is
    ~15 us of MXU time)."""

    def kernel(xp_ref, w_ref, out_ref, xbuf, acc, sems):
        t = pl.program_id(0)
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        def copy(cell, dest_slot):
            i = cell // ny
            j = cell % ny
            return pltpu.make_async_copy(
                xp_ref.at[pl.ds(i * bz, bz + 2), pl.ds(j * by, by + 2)],
                xbuf.at[dest_slot],
                sems.at[dest_slot],
            )

        @pl.when(t == 0)
        def _():
            copy(t, slot).start()

        @pl.when(t + 1 < total)
        def _():
            copy(t + 1, nxt).start()

        copy(t, slot).wait()
        acc[...] = jnp.zeros_like(acc)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    xs = xbuf[
                        slot, dz:dz + bz, dy:dy + by, dx:dx + w_full, :
                    ]
                    acc[...] += jax.lax.dot_general(
                        xs,
                        w_ref[dz * 9 + dy * 3 + dx],
                        (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        out_ref[...] = acc[...].astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("bz", "by"))
def conv3d_3x3_pallas(
    x: jax.Array,      # (Z, Y, X, Cin) channels-last
    w: jax.Array,      # (3, 3, 3, Cin, Cout)
    bz: int = 8,
    by: int = 4,
) -> jax.Array:
    """SAME, stride-1 3x3x3 conv; f32 accumulation, output in x.dtype."""
    z, y, xw, cin = x.shape
    cout = w.shape[-1]
    zp = -z % bz
    yp = -y % by
    # Mosaic HBM slice tiling: the haloed DMA's second-minor extent must
    # be 8-aligned and its lane (channel) extent a multiple of 128 — pad
    # X so (xw + 2) rounds up to 8 (the extra zero columns sit past
    # dx + xw, never read) and C up to 128 (zero channels contribute
    # nothing to the taps; the padded read still prices far below the
    # XLA conv paths this replaces)
    xw2 = -(-(xw + 2) // 8) * 8
    cin_p = -(-cin // 128) * 128
    xp = jnp.pad(
        x,
        ((1, 1 + zp), (1, 1 + yp), (1, xw2 - xw - 1), (0, cin_p - cin)),
    )
    nz, ny = (z + zp) // bz, (y + yp) // by
    wf = jnp.pad(
        w.reshape(27, cin, cout), ((0, 0), (0, cin_p - cin), (0, 0))
    ).astype(x.dtype)

    total = nz * ny
    out = pl.pallas_call(
        _kernel_factory(bz, by, ny, total, xw, cin_p, cout, x.dtype),
        grid=(total,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((27, cin_p, cout), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bz, by, xw, cout), lambda t: (t // ny, t % ny, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((z + zp, y + yp, xw, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2, by + 2, xw2, cin_p), x.dtype),
            pltpu.VMEM((bz, by, xw, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, wf)
    return out[:z, :y]


def conv3d_3x3_pallas_batched(x: jax.Array, w: jax.Array) -> jax.Array:
    """(B, Z, Y, X, Cin) wrapper — unrolled over the (tiny) batch."""
    return jnp.stack([conv3d_3x3_pallas(x[b], w) for b in range(x.shape[0])])
