"""Context-aware sampling prep for BraTS volumes -> point-cloud files.

Parity CLI for reference PointSegment/utils/dataPrepareBraTS.py (flags
--n_point --data_3D_path --outPC_path). Writes, per case ID:

  <out>/original_ply/<ID>.ply           full nonzero-voxel cloud
  <out>/input0.01/<ID>.ply              grid-subsampled (0.01) cloud
  <out>/input0.01/<ID>_xyz_origin.npy   original int voxel coords

The reference additionally pickles a sklearn KDTree and a projection index
(dataPrepareBraTS.py:107-116) that existed only to serve its host-side KNN;
this framework searches neighbors on device, so those files are not needed
and are not produced (pass --write_proj to emit the projection indices for
tools that expect them).

Training mode z-scores each modality over nonzero voxels and remaps label
4 -> 3 (dataPrepareBraTS.py:61-65); inference mode instead loads a binary
attention mask as the sampling channel (dataPrepareBraTS.py:67-70,
--attention_mask_path).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..data import nifti, write_ply
from ..data.volume import intensity_normalize_nonzero
from ..ops.subsample import grid_subsample

MODALITIES = ("t1ce", "t1", "flair", "t2")
SUB_GRID_SIZE = 0.01


def load_volume(dataset_path: str, case_id: str, attention_mask_path=None):
    base = os.path.join(dataset_path, case_id, case_id)
    mods = []
    for mod in MODALITIES:
        img = nifti.load(f"{base}_{mod}.nii.gz")
        mods.append(intensity_normalize_nonzero(img.get_fdata()))
    mods = np.stack(mods)                      # (4, X, Y, Z)
    if attention_mask_path is None:
        seg = nifti.load(f"{base}_seg.nii.gz").get_fdata().astype(np.int32)
        seg[seg == 4] = 3
    else:
        seg = (
            nifti.load(os.path.join(attention_mask_path, f"{case_id}.nii.gz"))
            .get_fdata()
            .astype(np.uint8)
            .astype(np.int32)
        )
    return mods, seg


def process_case(
    dataset_path: str,
    case_id: str,
    original_dir: str,
    sub_dir: str,
    attention_mask_path=None,
    write_proj: bool = False,
):
    from ..data.pointcloud import volume_to_points

    mods, seg = load_volume(dataset_path, case_id, attention_mask_path)
    cloud = volume_to_points(mods, seg)
    np.save(
        os.path.join(sub_dir, f"{case_id}_xyz_origin.npy"), cloud.xyz_origin
    )

    names = ["x", "y", "z", *MODALITIES, "class"]
    write_ply(
        os.path.join(original_dir, f"{case_id}.ply"),
        (cloud.xyz, cloud.features, cloud.labels.astype(np.uint8)),
        names,
    )
    sub_xyz, sub_feats, sub_labels = grid_subsample(
        cloud.xyz, cloud.features, cloud.labels, SUB_GRID_SIZE
    )
    write_ply(
        os.path.join(sub_dir, f"{case_id}.ply"),
        (sub_xyz, sub_feats, sub_labels.astype(np.uint8)),
        names,
    )
    if write_proj:
        from ..ops.knn import knn
        import jax.numpy as jnp
        import pickle

        proj = np.asarray(
            knn(jnp.asarray(sub_xyz), jnp.asarray(cloud.xyz), 1)
        )[:, 0].astype(np.int32)
        with open(os.path.join(sub_dir, f"{case_id}_proj.pkl"), "wb") as f:
            pickle.dump([proj, cloud.labels], f)
    return len(cloud.labels)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_point", type=int, default=365000)
    parser.add_argument("--data_3D_path", type=str, required=True)
    parser.add_argument("--outPC_path", type=str, default="train")
    parser.add_argument("--attention_mask_path", type=str, default=None)
    parser.add_argument("--write_proj", action="store_true")
    args = parser.parse_args(argv)

    original_dir = os.path.join(args.outPC_path, "original_ply")
    sub_dir = os.path.join(args.outPC_path, "input0.01")
    os.makedirs(original_dir, exist_ok=True)
    os.makedirs(sub_dir, exist_ok=True)

    for case_id in sorted(os.listdir(args.data_3D_path)):
        if not os.path.isdir(os.path.join(args.data_3D_path, case_id)):
            continue
        n = process_case(
            args.data_3D_path,
            case_id,
            original_dir,
            sub_dir,
            args.attention_mask_path,
            args.write_proj,
        )
        print(f"{case_id}: {n} points")


if __name__ == "__main__":
    main()
