"""Fused end-to-end segmentation: nii.gz volumes -> nii.gz labels.

This command has no reference equivalent — it replaces the reference's
six-step filesystem relay (predict -> genBinaryMap -> dataPrepare -> run
test -> genSegmentation -> evaluation, SURVEY §1) with one in-process
pipeline call per case (pipeline/end2end.py). It is the path behind the
<2 s/volume north-star target.
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..core.config import (
    brats_pointseg_config,
    brats_saliency_config,
    pancreas_pointseg_config,
    pancreas_saliency_config,
)
from ..core.checkpoint import BestMetricCheckpointer
from ..data import nifti
from ..data.loader import (
    BRATS_MODALITIES,
    find_brats_cases,
    load_brats_case,
)
from ..models.randlanet import init_randlanet
from ..models.saliency_unet import init_saliency_unet
from ..pipeline.end2end import PointUnetPipeline
from ..train.pointseg import PointSegTrainer
from ..train.saliency import SaliencyTrainer


def build_pipeline(args):
    # the fast path runs the attention net as one whole-volume window;
    # bf16 compute keeps that inside HBM (f32 at (160,240,240,64) OOMs).
    # It also runs the SA gate convs at stride 2 (config.py
    # sa_gate_stride): checkpoints transfer across strides, and the
    # full-contract paired A/B (ACCURACY_r03.json @ ffc8bbd) shows the
    # strided gate is Dice-neutral (0.9999 -> 0.9999) at -17% latency
    # (e2e 632 -> 542 ms on chip). --sa_stride 1 restores the
    # reference-exact gate.
    bf16 = getattr(args, "fast", False)
    stride = getattr(args, "sa_stride", None)
    if stride is None:
        stride = 2 if bf16 else 1
    if args.dataset == "brats":
        scfg = brats_saliency_config(use_bfloat16=bf16, sa_gate_stride=stride)
        pcfg = brats_pointseg_config(num_points=args.n_point)
    else:
        scfg = pancreas_saliency_config(
            use_bfloat16=bf16, sa_gate_stride=stride
        )
        pcfg = pancreas_pointseg_config(num_points=args.n_point)

    rng = jax.random.PRNGKey(0)
    smodel, svars = init_saliency_unet(rng, scfg)
    pmodel, pvars = init_randlanet(rng, pcfg, num_points=pcfg.num_points)

    if args.saliency_checkpoint:
        strainer = SaliencyTrainer(scfg)
        sstate = strainer.init_state()
        restored = BestMetricCheckpointer(
            args.saliency_checkpoint
        ).restore_best(sstate)
        if restored is not None:
            svars = {
                "params": restored.params,
                "batch_stats": restored.batch_stats,
            }
    if args.pointseg_checkpoint:
        ptrainer = PointSegTrainer(pcfg)
        pstate = ptrainer.init_state()
        restored = BestMetricCheckpointer(
            args.pointseg_checkpoint
        ).restore_best(pstate)
        if restored is not None:
            pvars = {
                "params": restored.params,
                "batch_stats": restored.batch_stats,
            }
    return PointUnetPipeline(
        smodel, svars, pmodel, pvars, scfg, pcfg, threshold=args.threshold
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", choices=["brats", "pancreas"],
                        default="brats")
    parser.add_argument("--data_3D_path", type=str, required=True)
    parser.add_argument("--outSegment_path", type=str, required=True)
    parser.add_argument("--saliency_checkpoint", type=str, default=None)
    parser.add_argument("--pointseg_checkpoint", type=str, default=None)
    parser.add_argument("--threshold", type=float, default=0.9)
    parser.add_argument("--n_point", type=int, default=365000)
    parser.add_argument("--fast", action="store_true",
                        help="fully device-resident path: whole-volume "
                             "attention window (bf16) + on-device sampling "
                             "(pipeline/fused.py)")
    parser.add_argument("--roi", type=int, nargs=3, default=None,
                        metavar=("X", "Y", "Z"),
                        help="static brain-ROI crop for the fast path's "
                             "attention stage (the reference crops to the "
                             "brain bbox, data_sampler.py:448); e.g. "
                             "--roi 192 208 155 for BraTS")
    parser.add_argument("--postprocess", action="store_true")
    parser.add_argument("--sa_stride", type=int, default=None,
                        help="SA-gate resolution divisor; default: 2 on the "
                             "--fast path (Dice-neutral, -17% latency; "
                             "ACCURACY_r03.json), 1 (reference-exact) "
                             "otherwise")
    parser.add_argument("--att_downscale", type=int, default=1,
                        help="run the whole saliency net at 1/s resolution "
                             "on the --fast path (the mask only guides "
                             "point sampling; pipeline/fused.py). Gated by "
                             "the paired Dice A/B in the accuracy preset")
    parser.add_argument("--mask_band", type=int, default=None,
                        help="boundary-band width for the downscaled fast "
                             "path: a second sampling tier that spends only "
                             "budget slack (pipeline/fused.py mask_band); "
                             "default: 4 when --att_downscale > 1")
    parser.add_argument("--mask_dilate", type=int, default=None,
                        help="isotropic mask dilation (the r4 recovery "
                             "mode; superseded by --mask_band, kept for "
                             "A/B); mutually exclusive with --mask_band")
    args = parser.parse_args(argv)

    pipeline = build_pipeline(args)
    os.makedirs(args.outSegment_path, exist_ok=True)

    fast_pipe = None
    cases = find_brats_cases(args.data_3D_path)
    for case_dir in cases:
        rec, meta = load_brats_case(case_dir, with_label=False, crop=False)
        # record is [z,y,x]; pipeline expects (C, X, Y, Z)
        mods = np.transpose(rec.image, (0, 3, 2, 1))
        t0 = time.time()
        if args.fast:
            if fast_pipe is None:
                from ..pipeline.fused import FusedPointUnet

                fast_pipe = FusedPointUnet(
                    pipeline.saliency_model,
                    pipeline.saliency_variables,
                    pipeline.pointseg_model,
                    pipeline.pointseg_variables,
                    pipeline.scfg,
                    pipeline.pcfg,
                    threshold=args.threshold,
                    volume_shape=mods.shape[1:],
                    roi_shape=args.roi,
                    att_downscale=getattr(args, "att_downscale", 1),
                    # pair the downscale with the boundary BAND by
                    # default (pipeline/fused.py mask_band: slack-only
                    # second sampling tier; the r4 dilation mode stays
                    # reachable via --mask_dilate for A/B)
                    mask_dilate=args.mask_dilate or 0,
                    mask_band=(
                        args.mask_band
                        if args.mask_band is not None
                        else (4 if args.att_downscale > 1
                              and not args.mask_dilate else 0)
                    ),
                )
            labels = fast_pipe.segment_volume(
                mods, brats_labels=args.dataset == "brats"
            )
        else:
            labels = pipeline.segment_volume(
                mods,
                brats_labels=args.dataset == "brats",
                postprocess=args.postprocess,
            )
        if args.fast and args.postprocess and args.dataset == "brats":
            from ..pipeline.postprocess import postprocess_brats

            labels = postprocess_brats(labels)
        dt = time.time() - t0
        out = os.path.join(
            args.outSegment_path, f"{meta['case_id']}.nii.gz"
        )
        nifti.save(labels, out)
        print(f"{meta['case_id']}: {dt:.2f} s -> {out}")


if __name__ == "__main__":
    main()
