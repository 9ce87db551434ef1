"""Precomputed-feature dataset tests (npz pair files)."""
import numpy as np

from lidarreg.data.precomputed import (
    PrecomputedPairDataset,
    build_correspondences,
    export_pair_npz,
)


def make_pair_npz(tmp_path, rng, n=600, split="test"):
    d = tmp_path / f"fcgf_{split}"
    d.mkdir(parents=True, exist_ok=True)
    T = np.eye(4)
    T[:3, 3] = [2.0, -1.0, 0.3]
    xyz0 = rng.uniform(-20, 20, (n, 3))
    xyz1 = xyz0 @ T[:3, :3].T + T[:3, 3] + rng.normal(0, 0.01, (n, 3))
    f = rng.normal(size=(n, 32))
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    export_pair_npz(str(d / "pair_0.npz"), xyz0, xyz1, f, f, T)
    return str(tmp_path), T


class TestPrecomputed:
    def test_load_and_labels(self, tmp_path, rng):
        root, T = make_pair_npz(tmp_path, rng)
        ds = PrecomputedPairDataset(root, split="test", num_node=600,
                                    inlier_threshold=0.6,
                                    augment_rotation=0.0,
                                    augment_translation=0.0)
        assert len(ds) == 1
        item = ds[0]
        # identical features -> correct matches -> nearly all inliers
        assert item["gt_labels"].mean() > 0.95
        assert item["corr_pos"].shape[1] == 6
        np.testing.assert_allclose(item["corr_pos"].mean(0), 0.0, atol=1e-5)

    def test_mutual_filter_reduces_under_outliers(self, rng):
        n = 400
        T = np.eye(4)
        xyz0 = rng.uniform(-10, 10, (n, 3))
        xyz1 = xyz0.copy()
        f0 = rng.normal(size=(n, 16))
        f1 = f0 + rng.normal(size=(n, 16)) * 0.5  # noisy features
        a = build_correspondences(xyz0, xyz1, f0, f1, T, num_node=n,
                                  use_mutual=True, augment_rotation=0.0,
                                  augment_translation=0.0)
        b = build_correspondences(xyz0, xyz1, f0, f1, T, num_node=n,
                                  use_mutual=False, augment_rotation=0.0,
                                  augment_translation=0.0)
        assert len(a["src_keypts"]) < len(b["src_keypts"])
        assert a["gt_labels"].mean() >= b["gt_labels"].mean()

    def test_train_augmentation_changes_gt(self, tmp_path, rng):
        root, T = make_pair_npz(tmp_path, rng, split="train")
        ds = PrecomputedPairDataset(root, split="train", num_node=600,
                                    augment_axis=1, augment_rotation=0.5,
                                    augment_translation=0.1)
        item = ds[0]
        assert not np.allclose(item["gt_trans"], T, atol=1e-4)
