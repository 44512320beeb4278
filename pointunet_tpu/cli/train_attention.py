"""Saliency-attention network driver: train / evaluate / predict.

Parity CLI for reference SaliencyAttention/train.py (flags --logdir --gpu
--evaluate --predict --checkpoint_path, train.py:174-182). The reference's
--predict/--evaluate paths read ``args.load`` which no flag ever sets
(train.py:198,223,254 — a latent bug noted in SURVEY §2.3); here everything
consistently uses --checkpoint_path.

Predict writes per-case (X, Y, Z, 2) float32 probability .npy files into
--outPros_path, ready for gen_binary_map.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from ..core.config import (
    TrainConfig,
    brats_saliency_config,
    pancreas_saliency_config,
)
from ..core.checkpoint import BestMetricCheckpointer
from ..data.loader import (
    find_brats_cases,
    find_pancreas_cases,
    load_brats_case,
    load_pancreas_case,
)
from ..data.sampler import patch_batches
from ..train.saliency import SaliencyTrainer
from .run_brats import make_logger


def _load_records(args, with_label=True):
    if args.dataset == "brats":
        cases = find_brats_cases(args.basedir)
        records, metas = [], []
        for c in cases:
            rec, meta = load_brats_case(c, with_label=with_label)
            records.append(rec)
            metas.append(meta)
        return records, metas
    cases = find_pancreas_cases(args.basedir, args.label_dir)
    records = [load_pancreas_case(ct, lab) for _, ct, lab in cases]
    metas = [{"case_id": cid} for cid, _, _ in cases]
    return records, metas


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", choices=["brats", "pancreas"],
                        default="brats")
    parser.add_argument("--basedir", type=str, required=True)
    parser.add_argument("--label_dir", type=str, default=None,
                        help="pancreas label dir")
    parser.add_argument("--logdir", type=str, default="./train_log/unet3d")
    parser.add_argument("--gpu", type=str, default="0", help="ignored (JAX)")
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--predict", action="store_true")
    parser.add_argument("--outPros_path", type=str, default="./attention_maps")
    parser.add_argument("--max_epoch", type=int, default=None)
    parser.add_argument("--val_fraction", type=float, default=0.2)
    parser.add_argument(
        "--direction", choices=["axial", "sagittal", "coronal"],
        default=None,
        help="train a view-transposed model for the MULTI_VIEW ensemble "
        "(reference config.DIRECTION consumed by sampler3d, "
        "data_sampler.py:174-198)",
    )
    args = parser.parse_args(argv)

    import dataclasses

    cfg = (
        brats_saliency_config() if args.dataset == "brats"
        else pancreas_saliency_config()
    )
    if args.max_epoch:
        cfg = dataclasses.replace(cfg, max_epoch=args.max_epoch)
    if args.direction:
        cfg = dataclasses.replace(cfg, direction=args.direction)

    log = make_logger(args.logdir)
    trainer = SaliencyTrainer(cfg, TrainConfig())
    state = trainer.init_state()
    ckpt_dir = args.checkpoint_path or os.path.join(args.logdir, "snapshots")
    checkpointer = BestMetricCheckpointer(ckpt_dir, max_to_keep=10)

    if args.predict or args.evaluate:
        restored = checkpointer.restore_best(state)
        if restored is None:
            raise SystemExit(f"no checkpoint under {ckpt_dir}")
        state = restored
        records, metas = _load_records(args, with_label=args.evaluate)
        if args.evaluate:
            # evaluate in the training view: a sagittal/coronal-trained
            # model must see transposed volumes, mirroring training
            # (reference transposes per DIRECTION before eval)
            if cfg.direction != "axial":
                from ..data.sampler import transpose_record

                records = [
                    transpose_record(r, cfg.direction) for r in records
                ]
            trainer.evaluate(state, records, log)
            return
        os.makedirs(args.outPros_path, exist_ok=True)
        for rec, meta in zip(records, metas):
            vol = np.moveaxis(rec.image, 0, -1)          # (D, H, W, C)
            # predict_volume_tta transposes the volume into the model's
            # training view and inverse-transposes the probabilities, so
            # saved maps are axial-aligned for the downstream pipeline
            # regardless of --direction (reference eval.py:355-411)
            probs = trainer.predict_volume_tta(
                state, vol, direction=cfg.direction
            )
            # back to (X, Y, Z, C); undo the brain crop if one was applied
            probs_xyz = np.transpose(probs, (2, 1, 0, 3))
            if "bbox" in meta and "original_shape" in meta:
                full = np.zeros(
                    tuple(reversed(meta["original_shape"]))
                    + (probs.shape[-1],),
                    np.float32,
                )
                (zlo, zhi), (ylo, yhi), (xlo, xhi) = meta["bbox"]
                full[xlo:xhi, ylo:yhi, zlo:zhi] = probs_xyz
                probs_xyz = full
            np.save(
                os.path.join(
                    args.outPros_path, f"{meta['case_id']}.npy"
                ),
                probs_xyz,
            )
            log(f"predicted {meta['case_id']}")
        return

    # training
    records, _ = _load_records(args, with_label=True)
    if cfg.direction != "axial":
        from ..data.sampler import transpose_record

        records = [transpose_record(r, cfg.direction) for r in records]
    n_val = max(1, int(len(records) * args.val_fraction))
    val_records, train_records = records[:n_val], records[n_val:]
    if not train_records:
        train_records = val_records
    rng = np.random.default_rng(0)
    batches = patch_batches(
        train_records, cfg.patch_size, cfg.batch_size, rng, cfg.data_sampling
    )
    restored = checkpointer.restore_latest(state)
    if restored is not None:
        state = restored
        log(f"resumed from step {int(state.step)}")
    from ..core.metrics_sink import MetricsLogger

    with MetricsLogger(args.logdir) as sink:
        trainer.fit(
            state, batches, val_records, checkpointer, log, metrics=sink
        )


if __name__ == "__main__":
    main()
