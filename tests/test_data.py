"""Data layer tests: balanced-set IO, synthetic adapter, pipeline."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarreg.data import (
    read_balanced_set,
    write_balanced_set,
    resolve_dataset_name,
    balanced_set_path,
    default_balanced_root,
    make_dataset,
)
from lidarreg.data.augment import sample_almost_planar_rotation
from lidarreg.data.pipeline import prepare_sparse_input, build_pointdsc_input
from lidarreg.core.se3 import rotation_to_euler

HAVE_SETS = os.path.isdir(default_balanced_root())


@pytest.mark.skipif(not HAVE_SETS, reason="published balanced sets not mounted")
class TestBalancedIO:
    def test_read_published_sets(self):
        p = read_balanced_set(
            balanced_set_path(default_balanced_root(), "K", "test")
        )
        assert len(p) == 555  # BASELINE.md test-set sizes
        # motions are rigid: R orthonormal, last row [0,0,0,1]
        R = p.motions[:, :3, :3]
        err = np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max()
        assert err < 1e-6
        np.testing.assert_allclose(p.motions[:, 3], np.broadcast_to([0.0, 0, 0, 1], (len(p), 4)), atol=1e-9)
        # header columns are consistent: trans == motion translation
        np.testing.assert_allclose(p.translations, p.motions[:, :3, 3])

    def test_apollo_sizes(self):
        p = read_balanced_set(
            balanced_set_path(default_balanced_root(), "A", "test")
        )
        assert len(p) == 7008

    def test_roundtrip(self, tmp_path):
        p = read_balanced_set(
            balanced_set_path(default_balanced_root(), "K", "validation")
        )
        out = str(tmp_path / "rt.txt")
        write_balanced_set(out, p)
        q = read_balanced_set(out)
        np.testing.assert_allclose(q.motions, p.motions, atol=1e-12)
        np.testing.assert_array_equal(q.session_ind, p.session_ind)

    def test_nicknames(self):
        assert resolve_dataset_name("A") == "ApolloSouthbay"
        assert resolve_dataset_name("KITTI_10m") == "KITTI_10m"


@pytest.mark.skipif(not HAVE_SETS, reason="published balanced sets not mounted")
class TestSyntheticDataset:
    def test_pair_geometry(self):
        ds = make_dataset("K", phase="validation", synthetic=True,
                          n_points=20000)
        T, a, b = ds.get_pair(0)
        # A transformed by GT must land on B's world; compare NN distances of
        # the aligned vs unaligned cloud (sampling sparsity cancels out)
        a_t = a @ T[:3, :3].T + T[:3, 3]
        ref = b[::11]
        d_aligned = np.sqrt(((a_t[::97][:, None] - ref[None]) ** 2).sum(-1)).min(1)
        d_raw = np.sqrt(((a[::97][:, None] - ref[None]) ** 2).sum(-1)).min(1)
        assert np.median(d_aligned) < 0.5 * np.median(d_raw)
        assert np.median(d_aligned) < 1.5

    def test_determinism(self):
        ds = make_dataset("K", phase="validation", synthetic=True, n_points=5000)
        _, a1, b1 = ds.get_pair(3)
        _, a2, b2 = ds.get_pair(3)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)


class TestAugment:
    def test_almost_planar(self, rng):
        M = sample_almost_planar_rotation(rng)
        R = M[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(M[:3, 3], 0)
        # roll/pitch small: R = Rz Ry Rx -> z-axis stays near vertical
        assert abs(R[2, 2]) > np.cos(np.radians(7.1))

    def test_rotation_augment_pair_preserves_alignment(self, rng):
        """T' must map the augmented source onto the augmented target
        exactly (reference composition `trans = T1 @ M2 @ inv(T0)`,
        Experiments/dataloader/generic_balanced_loader.py:32-98)."""
        from lidarreg.data.augment import rotation_augment_pair

        a = rng.uniform(-30, 30, (64, 3))
        T = np.eye(4)
        T[:3, :3] = sample_almost_planar_rotation(rng)[:3, :3]
        T[:3, 3] = [5.0, -2.0, 0.3]
        b = a @ T[:3, :3].T + T[:3, 3]  # exact correspondences
        T2, a2, b2 = rotation_augment_pair(rng, T, a, b)
        warped = a2 @ T2[:3, :3].T + T2[:3, 3]
        np.testing.assert_allclose(warped, b2, atol=1e-8)
        # the augmentation actually rotated something
        assert not np.allclose(a2, a) and not np.allclose(b2, b)

    def test_yaw_rotation_probe_composition(self, rng):
        """Validation-time yaw probe: rotating the source by M and using
        T @ M.T keeps GT alignment (cli.train fcgf val_metric math)."""
        from lidarreg.data.augment import yaw_rotation_4x4

        a = rng.uniform(-30, 30, (64, 3))
        T = np.eye(4)
        T[:3, :3] = sample_almost_planar_rotation(rng)[:3, :3]
        T[:3, 3] = [5.0, -2.0, 0.3]
        b = a @ T[:3, :3].T + T[:3, 3]
        M = yaw_rotation_4x4(135.0)
        np.testing.assert_allclose(M @ M.T, np.eye(4), atol=1e-12)
        a2 = a @ M[:3, :3].T
        T2 = T @ M.T
        np.testing.assert_allclose(a2 @ T2[:3, :3].T + T2[:3, 3], b,
                                   atol=1e-8)


class TestPipeline:
    def test_prepare_sparse_input(self, rng):
        cloud = rng.uniform(-10, 10, (3000, 3)).astype(np.float32)
        st, xyz = prepare_sparse_input(jnp.asarray(cloud), 0.3, 4096)
        assert st.feats.shape == (4096, 1)
        v = np.asarray(st.valid)
        assert 1000 < v.sum() <= 3000
        # xyz rows are original points
        found = np.asarray(xyz)[v]
        assert all(
            np.any(np.all(np.isclose(cloud, f, atol=1e-6), axis=1)) for f in found[:20]
        )

    def test_padding_is_masked_out(self, rng):
        # Regression (round-1 advisor): padded rows must not form a valid
        # sentinel voxel — it would enter GPF's min/max grid normalization
        # and collapse all real points into one grid cell.
        cloud = rng.uniform(-10, 10, (3000, 3)).astype(np.float32)
        st_ref, xyz_ref = prepare_sparse_input(jnp.asarray(cloud), 0.3, 4096)
        padded = np.zeros((5000, 3), np.float32)
        padded[:3000] = cloud
        st_pad, xyz_pad = prepare_sparse_input(
            jnp.asarray(padded), 0.3, 4096, jnp.int32(3000)
        )
        assert int(st_pad.valid.sum()) == int(st_ref.valid.sum())
        np.testing.assert_array_equal(
            np.asarray(st_pad.coords), np.asarray(st_ref.coords)
        )
        np.testing.assert_allclose(
            np.asarray(xyz_pad), np.asarray(xyz_ref), atol=0
        )
        # padded voxel xyz rows are zeroed, never the padding value
        v = np.asarray(st_pad.valid)
        assert np.abs(np.asarray(xyz_pad)[~v]).max() == 0.0

    def test_gpf_binning_unchanged_by_padding(self, rng):
        # GPF grid cells are computed from min/max of the valid source
        # coords; a junk voxel at the padding sentinel would collapse the
        # grid. Compare GPF keep-sets with and without padded input rows.
        from lidarreg.match import match_pair

        n = 1500
        src = rng.uniform(-30, 30, (n, 3)).astype(np.float32)

        def run(pt_pad):
            cloud = np.zeros((n + pt_pad, 3), np.float32)
            cloud[:n] = src
            st, xyz = prepare_sparse_input(
                jnp.asarray(cloud), 0.3, 2048, jnp.int32(n)
            )
            v = st.valid
            c = match_pair(xyz, xyz, xyz, mask0=v, mask1=v, mode="GPF")
            return np.asarray(c.keep & c.valid)

        keep_a = run(0)
        keep_b = run(4000)
        np.testing.assert_array_equal(keep_a, keep_b)

    def test_build_pointdsc_input(self, rng):
        n = 512
        xyz0 = jnp.asarray(rng.uniform(-30, 30, (n, 3)).astype(np.float32))
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [2.0, 1.0, 0.0]
        xyz1 = xyz0 @ jnp.asarray(T[:3, :3].T) + jnp.asarray(T[:3, 3])
        F = rng.normal(size=(n, 16)).astype(np.float32)
        F /= np.linalg.norm(F, axis=1, keepdims=True)
        out = build_pointdsc_input(
            jax.random.PRNGKey(0),
            xyz0, jnp.asarray(F), jnp.ones(n, bool),
            xyz1, jnp.asarray(F), jnp.ones(n, bool),
            512, 0.6, T_gt=jnp.asarray(T),
        )
        assert out["corr_pos"].shape == (1, 512, 6)
        # identical features -> NN matches are correct -> labels ~ all inliers
        assert float(out["gt_labels"].mean()) > 0.95
        # corr_pos centered
        np.testing.assert_allclose(
            np.asarray(out["corr_pos"]).mean(axis=1), 0.0, atol=1e-4
        )


class TestPlyIO:
    """data/fileio.py — PLY subset the reference moves clouds through
    (demo inputs, symmetric-ICP handshake, indoor fragments)."""

    def test_binary_roundtrip_with_normals(self, tmp_path):
        from lidarreg.data.fileio import read_ply, write_ply

        rng = np.random.default_rng(0)
        xyz = rng.uniform(-50, 50, (257, 3)).astype(np.float32)
        nrm = rng.standard_normal((257, 3)).astype(np.float32)
        p = str(tmp_path / "c.ply")
        write_ply(p, xyz, normals=nrm, binary=True)
        got, gn = read_ply(p, return_normals=True)
        np.testing.assert_array_equal(got, xyz)
        np.testing.assert_array_equal(gn, nrm)

    def test_ascii_roundtrip(self, tmp_path):
        from lidarreg.data.fileio import read_ply, write_ply

        xyz = np.array([[1.5, -2.25, 3.0], [0.0, 0.125, -7.5]], np.float32)
        p = str(tmp_path / "a.ply")
        write_ply(p, xyz, binary=False)
        got, gn = read_ply(p, return_normals=True)
        np.testing.assert_allclose(got, xyz, rtol=1e-6)
        assert gn is None

    def test_binary_skips_unknown_vertex_props(self, tmp_path):
        # o3d-style colored cloud: uchar r/g/b interleaved with xyz
        from lidarreg.data.fileio import read_ply

        p = str(tmp_path / "rgb.ply")
        xyz = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], "<f4")
        rgb = np.array([[255, 0, 10], [1, 2, 3]], np.uint8)
        header = (
            "ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        with open(p, "wb") as f:
            f.write(header.encode())
            for i in range(2):
                f.write(xyz[i].tobytes() + rgb[i].tobytes())
        got = read_ply(p)
        np.testing.assert_array_equal(got, xyz)

    def test_ascii_reference_style_file(self, tmp_path):
        from lidarreg.data.fileio import read_ply

        p = str(tmp_path / "ref.ply")
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\ncomment made by hand\n"
                    "element vertex 3\nproperty float x\nproperty float y\n"
                    "property float z\nend_header\n"
                    "0 0 0\n1.5 2 3\n-4 5.25 6\n")
        got = read_ply(p)
        assert got.shape == (3, 3)
        np.testing.assert_allclose(got[2], [-4, 5.25, 6])

    def test_rejects_non_ply_and_big_endian(self, tmp_path):
        from lidarreg.data.fileio import read_ply

        p1 = str(tmp_path / "x.ply")
        open(p1, "w").write("not a ply\n")
        with pytest.raises(ValueError):
            read_ply(p1)
        p2 = str(tmp_path / "be.ply")
        open(p2, "w").write(
            "ply\nformat binary_big_endian 1.0\nelement vertex 0\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n")
        with pytest.raises(ValueError):
            read_ply(p2)

    def test_demo_load_cloud_reads_ply(self, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo")
        from demo_registration import load_cloud
        from lidarreg.data.fileio import write_ply

        xyz = np.array([[1.0, 2.0, 3.0]], np.float32)
        p = str(tmp_path / "d.ply")
        write_ply(p, xyz)
        np.testing.assert_array_equal(load_cloud(p), xyz)
