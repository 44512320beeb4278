"""BraTS point-segmentation driver: train / test.

Parity CLI for reference PointSegment/runBraTS.py (flags --gpu --mode
--n_epoch --logdir --data_PC_path --checkpoint_path --results_path;
README.md:184-197). --gpu is accepted and ignored (device selection is
JAX's). Test mode writes per-volume (155,240,240,4) probability .npy files
consumed by gen_segmentation_brats, matching testBraTS.point2prod.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..core.config import TrainConfig, brats_pointseg_config
from ..core.checkpoint import BestMetricCheckpointer
from ..data.datasets import BraTSPointDataset
from ..train.pointseg import PointSegTrainer
from ..train.metrics import per_class_dice


def _read_ids(path):
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def make_logger(logdir):
    os.makedirs(logdir, exist_ok=True)
    log_path = os.path.join(logdir, "train_summary.txt")

    def log(msg):
        with open(log_path, "a") as f:
            f.write(str(msg) + "\n")
        print(msg, flush=True)

    return log


def run_test(trainer, state, dataset, results_path, log,
             volume_shape=(240, 240, 155)):
    """Inference over validation clouds -> scattered prob volumes
    (reference testBraTS.py:155-231; the reference hardcodes the BraTS
    240x240x155 grid — here it's the --volume_shape flag)."""
    import jax.numpy as jnp
    from ..ops.scatter import scatter_probs_to_volume

    x, y, z = volume_shape
    os.makedirs(results_path, exist_ok=True)
    for name, xyz, feats, labels, origin in dataset.test_iter():
        probs = np.asarray(
            trainer.eval_step(state, xyz, feats, labels)
        )[0]
        pred = probs.argmax(-1)
        lab = np.asarray(labels)[0]
        dice = per_class_dice(pred, lab, trainer.cfg.num_classes)
        log(
            f"{name}: dice "
            + " ".join(f"{d:.4f}" for d in dice)
        )
        vol = np.asarray(
            scatter_probs_to_volume(
                jnp.asarray(probs), jnp.asarray(origin), (z, y, x)
            )
        )
        np.save(os.path.join(results_path, f"{name}.npy"), vol)
        log(f"saved {name}.npy")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gpu", type=int, default=0, help="ignored (JAX)")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "test"])
    parser.add_argument("--n_epoch", type=int, default=100)
    parser.add_argument("--logdir", type=str,
                        default="./model_logs/BraTS20")
    parser.add_argument("--data_PC_path", type=str, required=True)
    parser.add_argument("--train_ids", type=str, default=None,
                        help="txt of training IDs (default: <data>/train_BraTS20.txt)")
    parser.add_argument("--val_ids", type=str, default=None)
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--results_path", type=str,
                        default="./predict_npy")
    parser.add_argument("--n_point", type=int, default=365000)
    parser.add_argument("--volume_shape", type=int, nargs=3,
                        default=[240, 240, 155], metavar=("X", "Y", "Z"),
                        help="voxel grid for scatter-back in test mode")
    args = parser.parse_args(argv)

    root = args.data_PC_path
    train_txt = args.train_ids or os.path.join(root, "train_BraTS20.txt")
    val_txt = args.val_ids or os.path.join(root, "valOffline_BraTS20.txt")
    train_ids = _read_ids(train_txt) if os.path.exists(train_txt) else []
    val_ids = _read_ids(val_txt) if os.path.exists(val_txt) else None

    cfg = brats_pointseg_config(
        max_epoch=args.n_epoch, num_points=args.n_point
    )
    dataset = BraTSPointDataset(root, train_ids, val_ids, cfg)
    log = make_logger(args.logdir)
    trainer = PointSegTrainer(cfg, TrainConfig())
    state = trainer.init_state()

    ckpt_dir = args.checkpoint_path or os.path.join(args.logdir, "snapshots")
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
        run_test(
            trainer, restored, dataset, args.results_path, log,
            tuple(args.volume_shape),
        )


if __name__ == "__main__":
    main()
