"""Persistent segmentation service: watch a directory, segment arrivals.

No reference equivalent — the reference is batch scripts only. This is the
deployment-shaped entry point for the TPU rebuild: the process loads
checkpoints ONCE, builds the fused device-resident pipeline (whose XLA
programs compile on the first case and stay warm), then polls an inbox
directory for new BraTS-layout case folders and writes ``<case>.nii.gz``
labels plus a ``<case>.json`` latency/status record to the outbox. Cases
already present in the outbox are skipped, so the service is restart-safe
and idempotent.

Layout contract: each inbox entry is a case directory of
``<case>_{t1ce,t1,flair,t2}.nii.gz`` files — identical to the training
data layout (data/loader.py find_brats_cases).

Usage:
    python -m pointunet_tpu.cli.serve --inbox in/ --outbox out/ \
        --saliency_checkpoint ... --pointseg_checkpoint ... [--once]

``--once`` drains the current inbox and exits (also the test mode);
without it the service polls forever at ``--poll_s`` intervals.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..data import nifti
from ..data.loader import find_brats_cases, load_brats_case
from .segment import build_pipeline


def _serve_case(fast_pipe, case, mods, outbox, brats_labels):
    out_nii = os.path.join(outbox, case + ".nii.gz")
    out_rec = os.path.join(outbox, case + ".json")
    t0 = time.time()
    labels = fast_pipe.segment_volume(mods, brats_labels=brats_labels)
    latency = time.time() - t0
    nifti.save(labels.astype(np.uint8), out_nii)
    with open(out_rec, "w") as f:
        json.dump(
            {"case": case, "latency_s": round(latency, 3),
             "labels": out_nii, "voxels": int((labels > 0).sum())},
            f,
        )
    return latency


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--inbox", type=str, required=True,
                        help="directory of incoming case folders")
    parser.add_argument("--outbox", type=str, required=True)
    parser.add_argument("--dataset", choices=["brats", "pancreas"],
                        default="brats")
    parser.add_argument("--saliency_checkpoint", type=str, default=None)
    parser.add_argument("--pointseg_checkpoint", type=str, default=None)
    parser.add_argument("--threshold", type=float, default=0.9)
    parser.add_argument("--n_point", type=int, default=365000)
    parser.add_argument("--roi", type=int, nargs=3, default=None,
                        metavar=("X", "Y", "Z"))
    parser.add_argument("--poll_s", type=float, default=2.0)
    parser.add_argument("--once", action="store_true",
                        help="drain the inbox once and exit")
    args = parser.parse_args(argv)
    args.fast = True                       # build_pipeline: bf16 fused path

    pipeline = build_pipeline(args)
    os.makedirs(args.outbox, exist_ok=True)

    from ..pipeline.fused import FusedPointUnet

    def iter_cases():
        """(case_id, load_thunk) for every not-yet-served inbox arrival.
        Loading is deferred into the caller's try block: a half-copied
        case must not kill the scan."""
        def fresh(case):
            return not os.path.exists(
                os.path.join(args.outbox, case + ".json")
            )

        if args.dataset == "brats":
            for case_dir in find_brats_cases(args.inbox):
                case = os.path.basename(case_dir.rstrip("/"))
                if fresh(case):
                    yield case, (
                        lambda d=case_dir: np.transpose(
                            load_brats_case(
                                d, with_label=False, crop=False
                            )[0].image,
                            (0, 3, 2, 1),
                        )
                    )
        else:
            from ..data.loader import load_pancreas_case

            for fname in sorted(os.listdir(args.inbox)):
                if not fname.startswith("PANCREAS_") or ".nii" not in fname:
                    continue
                case = fname.split(".nii")[0]
                if fresh(case):
                    yield case, (
                        lambda f=fname: np.transpose(
                            load_pancreas_case(
                                os.path.join(args.inbox, f)
                            ).image,
                            (0, 3, 2, 1),
                        )
                    )

    # one compiled pipeline per volume shape (pancreas CTs vary per case;
    # the jitted stages pin their pad/crop constants at construction)
    pipes = {}
    failures = {}
    served = 0
    while True:
        for case, load in iter_cases():
            if failures.get(case, 0) >= 3:
                continue
            try:
                mods = load()
                shape = tuple(mods.shape[1:])
                if shape not in pipes:
                    pipes[shape] = FusedPointUnet(
                        pipeline.saliency_model,
                        pipeline.saliency_variables,
                        pipeline.pointseg_model,
                        pipeline.pointseg_variables,
                        pipeline.scfg,
                        pipeline.pcfg,
                        threshold=args.threshold,
                        volume_shape=shape,
                        roi_shape=args.roi,
                    )
                latency = _serve_case(
                    pipes[shape], case, mods, args.outbox,
                    brats_labels=args.dataset == "brats",
                )
            except Exception as e:       # contain per-case failures:
                # a malformed/half-copied case is retried on later polls
                # (it may still be uploading) and skipped after 3 strikes
                # so it cannot crash-loop or starve the rest of the inbox
                failures[case] = failures.get(case, 0) + 1
                print(f"ERROR {case} (attempt {failures[case]}/3): {e}",
                      flush=True)
                continue
            served += 1
            print(f"served {case}: {latency:.2f} s (total {served})",
                  flush=True)
        if args.once:
            break
        time.sleep(args.poll_s)
    return served


if __name__ == "__main__":
    main()
