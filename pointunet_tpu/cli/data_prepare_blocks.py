"""Block-based alternative prep: 64^3 blocks -> fixed-budget point clouds.

Parity CLI for the reference's block pipeline (reference
PointSegment/utils/process_tf.py:548-653, the BraTS_Block64 variant with
class weights [1403, 22, 80, 11] at helper_tool.py:179): the brain-cropped
volume is tiled with 64^3 blocks at stride 54, dropping blocks with no
brain voxels; blocks whose tumor content exceeds 5% re-tile their
neighborhood at stride 4. Each block's brain voxels become points, padded
to a fixed budget by duplication (the reference's DP.data_aug semantics).

Deviation (documented): the reference writes channel 0 four times as the
point features (process_tf.py:551); here the four real modalities are used.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import write_ply
from ..data.loader import load_brats_case

BLOCK = 64
STRIDE = 54
STRIDE_TUMOR = 4
TUMOR_FRACTION = 1.0 / 20.0


def block_to_points(volume, label, weight, n_points, origin=(0, 0, 0),
                    rng=None):
    """(C, 64, 64, 64) block -> fixed-budget cloud (xyz int, feats, labels)."""
    mask = weight != 0
    coords = np.argwhere(mask).astype(np.float32)
    if coords.shape[0] == 0:
        return None
    feats = volume[:, mask].T.astype(np.float32)
    labels = label[mask].astype(np.uint8)
    coords += np.asarray(origin, np.float32)

    n = coords.shape[0]
    if n > n_points:
        # random subsample — truncating to the first n_points voxels in
        # scan order would systematically drop the high-z end of every
        # oversized block
        rng = rng or np.random.default_rng(0)
        sel = rng.choice(n, n_points, replace=False)
    else:
        # duplicate-pad to the fixed budget (reference process_tf.py:554-563)
        reps = max(n_points // n, 1)
        extra = n_points - reps * n
        sel = np.concatenate(
            [np.tile(np.arange(n), reps), np.arange(max(extra, 0))]
        )[:n_points]
    return coords[sel], feats[sel], labels[sel]


def process_case(case_dir, out_dir, n_points, index_list):
    rec, meta = load_brats_case(case_dir, with_label=True, crop=True)
    case_id = meta["case_id"]
    volume = rec.image                     # (C, D, H, W)
    label = meta["label_full"]
    weight = rec.weight
    x_axis, y_axis, z_axis = label.shape

    rng = np.random.default_rng(abs(hash(case_id)) % (2 ** 31))
    count = tumor = 0
    # per-axis strides: each loop's advance depends only on density seen in
    # its own sweep — a single shared stride would let one tumor-dense
    # block at the end of a z-column re-tile whole unrelated rows/planes
    x = 0
    while x <= max(x_axis - 1, 0):
        xb = min(x, max(x_axis - BLOCK, 0))
        y = 0
        dense_in_plane = False
        while y <= max(y_axis - 1, 0):
            yb = min(y, max(y_axis - BLOCK, 0))
            z = 0
            dense_in_column = False
            stride_z = STRIDE
            while z <= max(z_axis - 1, 0):
                zb = min(z, max(z_axis - BLOCK, 0))
                sl = (
                    slice(xb, xb + BLOCK),
                    slice(yb, yb + BLOCK),
                    slice(zb, zb + BLOCK),
                )
                wblk = weight[sl]
                if wblk.max() != 0:
                    vblk = volume[(slice(None),) + sl]
                    lblk = label[sl]
                    pts = block_to_points(
                        vblk, lblk, wblk, n_points, rng=rng
                    )
                    if pts is not None:
                        name = f"{case_id}_xyz_{xb}_{yb}_{zb}.ply"
                        xyz, feats, labels = pts
                        write_ply(
                            os.path.join(out_dir, name),
                            (xyz, feats, labels),
                            ["x", "y", "z", "t1ce", "t1", "flair", "t2",
                             "class"],
                        )
                        index_list.append(name)
                        count += 1
                        n_tumor = int((lblk > 0).sum())
                        tumor += n_tumor > 0
                        dense = n_tumor >= BLOCK ** 3 * TUMOR_FRACTION
                        stride_z = STRIDE_TUMOR if dense else STRIDE
                        dense_in_column |= dense
                z += stride_z
            dense_in_plane |= dense_in_column
            y += STRIDE_TUMOR if dense_in_column else STRIDE
        x += STRIDE_TUMOR if dense_in_plane else STRIDE
    print(f"{case_id}: {count} blocks ({tumor} with tumor)")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_3D_path", type=str, required=True)
    parser.add_argument("--outPC_path", type=str, required=True)
    parser.add_argument("--n_point", type=int, default=180000)
    args = parser.parse_args(argv)

    from ..data.loader import find_brats_cases

    os.makedirs(args.outPC_path, exist_ok=True)
    index_list = []
    for case_dir in find_brats_cases(args.data_3D_path):
        process_case(case_dir, args.outPC_path, args.n_point, index_list)
    with open(os.path.join(args.outPC_path, "blocks.txt"), "w") as f:
        f.write("\n".join(index_list) + "\n")


if __name__ == "__main__":
    main()
