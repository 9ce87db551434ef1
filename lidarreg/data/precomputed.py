"""Precomputed-feature pair datasets (npz): KITTI / 3DMatch / 3DLoMatch /
Redwood families.

Rebuild of the reference's precomputed-descriptor loaders
(Experiments/datasets/KITTI.py:8-158, ThreeDMatch.py:10-471, Redwood.py:9-236,
dataloader.py:6-40): one npz per pair with keys xyz0/xyz1/features0/
features1/gt_trans; FPFH descriptors L2-normalized on load; train-time
keypoint jitter (U[0,0.05)) and rotation/translation augmentation; num_node
subsampling; correspondences by (mutual) feature NN; GT labels by
inlier_threshold — the per-pair output matches what PointDSC/OANet consume
(`build_correspondences` mirrors LidarFeatureExtractor.get_pairs, so indoor
3DMatch npz dumps and outdoor KITTI npz dumps flow through the same code).

Also provides `export_pair_npz` — the precompute side (reference:
Experiments/misc/cal_fcgf.py process_kitti/3dmatch writers) using our FCGF.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ..core.se3 import euler_to_rotation  # noqa: F401 (doc cross-ref)
from .augment import random_rotation_matrix


def build_correspondences(
    src_keypts, tgt_keypts, src_desc, tgt_desc, orig_trans,
    num_node=5000, use_mutual=True, inlier_threshold=0.6, in_dim=6,
    rng=None, train=False,
    augment_axis=0, augment_rotation=1.0, augment_translation=0.01,
):
    """Numpy reference path of the correspondence builder (host-side datasets).

    Returns dict(corr_pos, src_keypts, tgt_keypts, gt_trans, gt_labels).
    """
    rng = rng or np.random.default_rng(0)
    if train:
        src_keypts = src_keypts + rng.random((len(src_keypts), 3)) * 0.05
        tgt_keypts = tgt_keypts + rng.random((len(tgt_keypts), 3)) * 0.05
    aug = np.eye(4)
    aug[:3, :3] = random_rotation_matrix(rng, augment_axis, augment_rotation)
    aug[:3, 3] = rng.random(3) * augment_translation
    tgt_keypts = tgt_keypts @ aug[:3, :3].T + aug[:3, 3]
    gt_trans = aug @ orig_trans

    n_src, n_tgt = len(src_desc), len(tgt_desc)
    sel0 = (rng.choice(n_src, num_node, replace=False)
            if n_src > num_node else np.arange(n_src))
    sel1 = (rng.choice(n_tgt, num_node, replace=False)
            if n_tgt > num_node else np.arange(n_tgt))
    sk, tk = src_keypts[sel0], tgt_keypts[sel1]
    sd, td = src_desc[sel0], tgt_desc[sel1]

    dist = np.sqrt(
        np.maximum(
            (sd**2).sum(1)[:, None] + (td**2).sum(1)[None] - 2 * sd @ td.T,
            1e-12,
        )
    )
    nn01 = dist.argmin(1)
    if use_mutual:
        nn10 = dist.argmin(0)
        mutual = nn10[nn01] == np.arange(len(nn01))
        corr = np.stack([np.nonzero(mutual)[0], nn01[mutual]], axis=1)
    else:
        corr = np.stack([np.arange(len(nn01)), nn01], axis=1)

    f0 = sk[corr[:, 0]]
    f1 = tk[corr[:, 1]]
    warped = f0 @ gt_trans[:3, :3].T + gt_trans[:3, 3]
    labels = (np.linalg.norm(warped - f1, axis=1) < inlier_threshold)

    if in_dim == 3:
        corr_pos = f0 - f1
    elif in_dim == 6:
        corr_pos = np.concatenate([f0, f1], axis=1)
        corr_pos = corr_pos - corr_pos.mean(0)
    else:
        raise ValueError(f"in_dim {in_dim} not supported here")

    return {
        "corr_pos": corr_pos.astype(np.float32),
        "src_keypts": f0.astype(np.float32),
        "tgt_keypts": f1.astype(np.float32),
        "gt_trans": gt_trans.astype(np.float32),
        "gt_labels": labels.astype(np.float32),
    }


class PrecomputedPairDataset:
    """Directory of `<root>/<descriptor>_<split>/*.npz` pair files."""

    def __init__(self, root, split="test", descriptor="fcgf", num_node=5000,
                 use_mutual=True, inlier_threshold=0.6, in_dim=6,
                 augment_axis=0, augment_rotation=1.0,
                 augment_translation=0.01, seed=0):
        self.dirname = os.path.join(root, f"{descriptor}_{split}")
        self.files = sorted(
            os.path.join(self.dirname, f) for f in os.listdir(self.dirname)
        )
        self.descriptor = descriptor
        self.split = split
        self.num_node = num_node
        self.use_mutual = use_mutual
        self.inlier_threshold = inlier_threshold
        self.in_dim = in_dim
        self.augment = (augment_axis, augment_rotation, augment_translation)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        d = np.load(self.files[i])
        src_desc = d["features0"]
        tgt_desc = d["features1"]
        if self.descriptor == "fpfh":
            src_desc = src_desc / (np.linalg.norm(src_desc, axis=1, keepdims=True) + 1e-6)
            tgt_desc = tgt_desc / (np.linalg.norm(tgt_desc, axis=1, keepdims=True) + 1e-6)
        ax, rot, tr = self.augment
        return build_correspondences(
            d["xyz0"], d["xyz1"], src_desc, tgt_desc, d["gt_trans"],
            num_node=self.num_node, use_mutual=self.use_mutual,
            inlier_threshold=self.inlier_threshold, in_dim=self.in_dim,
            rng=self.rng, train=self.split == "train",
            augment_axis=ax, augment_rotation=rot, augment_translation=tr,
        )


# Split configs mirroring the reference dataset classes.
THREEDMATCH_DEFAULTS = dict(inlier_threshold=0.10, num_node=5000)      # indoor
THREEDLOMATCH_DEFAULTS = dict(inlier_threshold=0.10, num_node=5000)
KITTI_DEFAULTS = dict(inlier_threshold=0.60, num_node=5000)            # outdoor
REDWOOD_DEFAULTS = dict(inlier_threshold=0.10, num_node=5000)


def export_pair_npz(path, xyz0, xyz1, features0, features1, gt_trans):
    """Write one precomputed pair (cal_fcgf.py writer format)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path, xyz0=xyz0, xyz1=xyz1, features0=features0,
        features1=features1, gt_trans=gt_trans,
    )
