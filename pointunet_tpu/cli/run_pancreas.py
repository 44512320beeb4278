"""Pancreas point-segmentation driver: train / test with 4-fold CV.

Parity CLI for reference PointSegment/runPancreas.py (flags --gpu --mode
--fold --n_epoch --logdir --data_PC_path --data_3D_path --checkpoint_path
--results_path). Test mode scatters per-point probabilities into the source
CT's (Z, X, Y) grid and saves .npy per loop (reference testPancreas.py:
71-85, 106-204), printing binary Dice.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..core.config import TrainConfig, pancreas_pointseg_config
from ..core.checkpoint import BestMetricCheckpointer
from ..data import nifti
from ..data.datasets import PancreasPointDataset
from ..train.metrics import binary_dice
from ..train.pointseg import PointSegTrainer
from .run_brats import make_logger


def run_test(trainer, state, dataset, data_3d_path, results_path, log):
    import jax.numpy as jnp
    from ..ops.scatter import scatter_probs_to_volume

    os.makedirs(results_path, exist_ok=True)
    dices = []
    for name, xyz, feats, labels, origin in dataset.test_iter():
        case_id = name.split("_loop_")[0]
        vol_path = os.path.join(data_3d_path, f"PANCREAS_{case_id}.nii.gz")
        shape = nifti.load(vol_path).shape          # (X, Y, Z)
        probs = np.asarray(trainer.eval_step(state, xyz, feats, labels))[0]
        pred = probs.argmax(-1)
        lab = np.asarray(labels)[0]
        dice = binary_dice(pred, lab)
        dices.append(dice)
        log(f"{name}: point dice {dice:.4f}")
        vol = np.asarray(
            scatter_probs_to_volume(
                jnp.asarray(probs),
                jnp.asarray(origin.astype(np.int32)),
                (shape[2], shape[1], shape[0]),
            )
        )
        np.save(os.path.join(results_path, f"{name}.npy"), vol)
    if dices:
        log(f"mean point dice: {float(np.mean(dices)):.4f}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gpu", type=int, default=0, help="ignored (JAX)")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "test"])
    parser.add_argument("--fold", type=int, default=3)
    parser.add_argument("--n_epoch", type=int, default=100)
    parser.add_argument("--logdir", type=str,
                        default="./model_logs/Pancreas")
    parser.add_argument("--data_PC_path", type=str, required=True)
    parser.add_argument("--data_3D_path", type=str, default=None)
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--results_path", type=str, default="./results")
    parser.add_argument("--n_point", type=int, default=180000)
    args = parser.parse_args(argv)

    cfg = pancreas_pointseg_config(
        max_epoch=args.n_epoch, num_points=args.n_point
    )
    dataset = PancreasPointDataset(args.data_PC_path, args.fold, cfg)
    log = make_logger(args.logdir)
    trainer = PointSegTrainer(cfg, TrainConfig())
    state = trainer.init_state()

    ckpt_dir = args.checkpoint_path or os.path.join(
        args.logdir, f"fold{args.fold}"
    )
    checkpointer = BestMetricCheckpointer(ckpt_dir)

    if args.mode == "train":
        restored = checkpointer.restore_latest(state)
        if restored is not None:
            state = restored
            log(f"resumed from step {int(state.step)}")
        from ..core.metrics_sink import MetricsLogger

        with MetricsLogger(args.logdir) as sink:
            trainer.fit(
                state, dataset.train_iter, dataset.val_iter, checkpointer,
                log, metrics=sink,
            )
    else:
        restored = checkpointer.restore_best(state)
        if restored is None:
            raise SystemExit(f"no checkpoint found under {ckpt_dir}")
        if args.data_3D_path is None:
            raise SystemExit("--data_3D_path required for test mode")
        run_test(
            trainer, restored, dataset, args.data_3D_path,
            args.results_path, log,
        )


if __name__ == "__main__":
    main()
