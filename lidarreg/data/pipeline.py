"""Pair pipeline: clouds -> voxels -> FCGF features -> PointDSC inputs.

TPU-native equivalent of Experiments/datasets/LidarFeatureExtractor.py
(process_batch :166-200, correspondence construction + GT labels :83-164)
plus the voxelization half of
Experiments/dataloader/generic_balanced_loader.py:32-98.

Static-shape discipline: clouds voxelize into fixed `capacity` slots, and
keypoints are sampled to exactly `num_node` (the reference itself subsamples
to num_node when larger, LidarFeatureExtractor.py:96-101; when a cloud has
fewer voxels than num_node we sample WITH replacement instead of keeping a
ragged array — documented deviation, only reachable on tiny clouds).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.se3 import transform
from ..ops.knn import find_nn
from ..ops.voxelize import voxelize
from ..sparse.tensor import SparseTensor

DEFAULT_VOXEL_SIZE = 0.3  # generic_balanced_loader.py:10


def pad_cloud(cloud: np.ndarray, point_capacity: int):
    """Pad/truncate a host cloud to `point_capacity` rows.

    Returns (padded [point_capacity, 3] float32, n_real int). Callers pass
    n_real into `prepare_sparse_input` so padding rows are MASKED OUT of
    voxelization rather than forming a spurious valid sentinel voxel (which
    would wreck GPF's min/max grid normalization downstream).
    """
    n = min(len(cloud), point_capacity)
    out = np.zeros((point_capacity, 3), np.float32)
    out[:n] = cloud[:n]
    return out, n


@partial(jax.jit, static_argnums=(1, 2))
def prepare_sparse_input(cloud: jnp.ndarray, voxel_size: float, capacity: int,
                         n_valid: jnp.ndarray | None = None):
    """Voxelize one cloud into a unit-feature SparseTensor + voxel xyz.

    Returns (SparseTensor, xyz [capacity, 3]) — xyz are the ORIGINAL point
    coordinates of each kept voxel (first point per voxel), the reference's
    convention (generic_balanced_loader.py:62-75).

    n_valid: number of real (non-padding) rows at the front of `cloud`;
    when given, padding rows are excluded from voxelization entirely.
    """
    mask = None
    if n_valid is not None:
        mask = jnp.arange(cloud.shape[0], dtype=jnp.int32) < n_valid
    res = voxelize(cloud, voxel_size, capacity, mask)
    xyz = cloud[res.indices] * res.valid[:, None]
    feats = jnp.ones((capacity, 1), jnp.float32) * res.valid[:, None]
    st = SparseTensor(res.coords, feats, res.valid, 1)
    return st, xyz


# Cloud-B separation along x, in voxel units. Must be (a) far beyond any
# kernel radius + both clouds' x-extents so the clouds never share or
# neighbor a voxel, and (b) small enough that B's coords stay inside the
# pallas build's 12-bit x packing (sparse/pallas_build.py: x < 2048).
# 1024 leaves ±300-voxel (±90 m at 0.3 m) extents a 400-voxel safety gap.
_PAIR_OFFSET = jnp.int32(1 << 10)


@partial(jax.jit, static_argnums=(2, 3))
def prepare_pair_sparse_input(cloud_a: jnp.ndarray, cloud_b: jnp.ndarray,
                              voxel_size: float, capacity: int,
                              n_a: jnp.ndarray | None = None,
                              n_b: jnp.ndarray | None = None):
    """Voxelize BOTH clouds of a pair into ONE batched SparseTensor.

    Cloud B's voxel coordinates are offset by +1024 along x — far beyond
    any kernel radius — so a single FCGF forward processes both clouds with
    zero cross-talk while amortizing every table build, kernel map, gather
    and matmul over 2x rows (ME's batched_coordinates achieves the same
    with an explicit batch column; a spatial offset keeps dim=3 and fits
    the pallas build's packed-coordinate range).

    Returns (SparseTensor [2*capacity], xyz_a, xyz_b [capacity, 3]).
    """
    st_a, xyz_a = prepare_sparse_input(cloud_a, voxel_size, capacity, n_a)
    st_b, xyz_b = prepare_sparse_input(cloud_b, voxel_size, capacity, n_b)
    coords = jnp.concatenate(
        [st_a.coords,
         st_b.coords + jnp.array([_PAIR_OFFSET, 0, 0], jnp.int32)], axis=0
    )
    # padding rows must stay far from BOTH clouds' occupied regions
    coords = jnp.where(
        jnp.concatenate([st_a.valid, st_b.valid])[:, None],
        coords, jnp.int32(2**30),
    )
    st = SparseTensor(
        coords,
        jnp.concatenate([st_a.feats, st_b.feats], axis=0),
        jnp.concatenate([st_a.valid, st_b.valid], axis=0),
        1,
    )
    return st, xyz_a, xyz_b


def sample_keypoints(key, valid: jnp.ndarray, num_node: int) -> jnp.ndarray:
    """Sample exactly num_node valid row indices.

    Without replacement while valid rows last (reference: np.random.choice
    replace=False, LidarFeatureExtractor.py:99-101), cycling through the
    valid set again only when count < num_node (static-shape substitute for
    the reference's keep-all branch).
    """
    n = valid.shape[0]
    u = jax.random.uniform(key, (n,)) + (~valid) * 1e3  # valid rows first
    order = jnp.argsort(u).astype(jnp.int32)
    count = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    idx = jnp.arange(num_node, dtype=jnp.int32) % count
    return order[idx]


@partial(jax.jit, static_argnums=(7, 8))
def build_pointdsc_input(
    key,
    xyz0: jnp.ndarray,
    F0: jnp.ndarray,
    m0: jnp.ndarray,
    xyz1: jnp.ndarray,
    F1: jnp.ndarray,
    m1: jnp.ndarray,
    num_node: int = 12000,
    inlier_threshold: float = 0.6,
    T_gt: jnp.ndarray | None = None,
) -> Dict[str, Any]:
    """Correspondence set for PointDSC from per-voxel features.

    Mirrors LidarFeatureExtractor.get_pairs (:83-164): subsample num_node
    keypoints per cloud, match every source keypoint to its feature NN,
    label inliers by GT distance < inlier_threshold (0.6 m), 6-D corr_pos =
    concat(src, tgt) centered.
    """
    k0, k1 = jax.random.split(key)
    sel0 = sample_keypoints(k0, m0, num_node)
    sel1 = sample_keypoints(k1, m1, num_node)
    src_kp = xyz0[sel0]
    tgt_kp = xyz1[sel1]
    fd0 = F0[sel0]
    fd1 = F1[sel1]

    nn = find_nn(fd0, fd1)
    corr_tgt = tgt_kp[nn.idx]

    corr_pos = jnp.concatenate([src_kp, corr_tgt], axis=-1)
    corr_pos = corr_pos - corr_pos.mean(axis=0, keepdims=True)

    out = {
        "corr_pos": corr_pos[None],
        "src_keypts": src_kp[None],
        "tgt_keypts": corr_tgt[None],
    }
    if T_gt is not None:
        warped = transform(src_kp, T_gt)
        dist = jnp.linalg.norm(warped - corr_tgt, axis=-1)
        out["gt_labels"] = (dist < inlier_threshold).astype(jnp.float32)[None]
        out["gt_trans"] = T_gt[None].astype(jnp.float32)
    return out


class FeaturePipeline:
    """Host-side orchestration: dataset pair -> device batch.

    Holds the (jitted) FCGF apply function; pads host clouds to the fixed
    point capacity before transfer.
    """

    def __init__(self, fcgf_apply, variables, voxel_size: float = DEFAULT_VOXEL_SIZE,
                 capacity: int = 32768, point_capacity: int = 131072,
                 num_node: int = 12000, inlier_threshold: float = 0.6):
        self.fcgf_apply = fcgf_apply
        self.variables = variables
        self.voxel_size = voxel_size
        self.capacity = capacity
        self.point_capacity = point_capacity
        self.num_node = num_node
        self.inlier_threshold = inlier_threshold

    def features_for(self, cloud: np.ndarray):
        pad, n = pad_cloud(cloud, self.point_capacity)
        st, xyz = prepare_sparse_input(
            jnp.asarray(pad), self.voxel_size, self.capacity,
            jnp.int32(n),
        )
        feats = self.fcgf_apply(self.variables, st)
        return xyz, feats.feats, feats.valid

    def features_for_pair(self, cloud_a: np.ndarray, cloud_b: np.ndarray):
        """One batched forward for both clouds (prepare_pair_sparse_input).

        Returns (xyz_a, F_a, m_a, xyz_b, F_b, m_b).
        """
        pad_a, na = pad_cloud(cloud_a, self.point_capacity)
        pad_b, nb = pad_cloud(cloud_b, self.point_capacity)
        st, xyz_a, xyz_b = prepare_pair_sparse_input(
            jnp.asarray(pad_a), jnp.asarray(pad_b), self.voxel_size,
            self.capacity, jnp.int32(na), jnp.int32(nb),
        )
        out = self.fcgf_apply(self.variables, st)
        c = self.capacity
        return (xyz_a, out.feats[:c], out.valid[:c],
                xyz_b, out.feats[c:], out.valid[c:])

    def pointdsc_batch(self, dataset, ind: int, key) -> Dict[str, Any]:
        T_gt, cloud_a, cloud_b = dataset.get_pair(ind)
        xyz0, F0, m0 = self.features_for(cloud_a)
        xyz1, F1, m1 = self.features_for(cloud_b)
        return build_pointdsc_input(
            key, xyz0, F0, m0, xyz1, F1, m1,
            self.num_node, self.inlier_threshold,
            T_gt=jnp.asarray(T_gt.astype(np.float32)),
        )
