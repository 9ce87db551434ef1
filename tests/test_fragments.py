"""RGBD fragment pipeline: odometry, TSDF integration, surface extraction.

Synthetic scene: a camera looking at a flat wall + box, translated between
frames; every stage is checked against analytic ground truth.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lidarreg.multiway.fragments import (
    CameraIntrinsic,
    TSDFVolume,
    depth_to_points,
    extract_surface_points,
    integrate_frame,
    make_fragment,
    rgbd_odometry,
)

K = CameraIntrinsic(fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48)


def render_plane_depth(cam_from_world, wall_z=2.0, box=None, slope=(0.0, 0.0),
                       corner=False):
    """Depth image of the plane z = wall_z + ax + by (world) + optional box.

    `slope` (a, b) != 0 tilts the wall; `corner=True` renders TWO
    differently-tilted half-walls (split at world x=0) so translation is
    fully observable by point-to-plane odometry — a single plane (even
    tilted) leaves a tangential null space that the reference's hybrid
    COLOR term would otherwise constrain.
    """
    v, u = np.meshgrid(np.arange(K.height), np.arange(K.width), indexing="ij")
    d = np.stack([(u - K.cx) / K.fx, (v - K.cy) / K.fy, np.ones_like(u)],
                 axis=-1).astype(np.float64)
    world_from_cam = np.linalg.inv(cam_from_world)
    Rwc, twc = world_from_cam[:3, :3], world_from_cam[:3, 3]
    dirs = d @ Rwc.T
    org = twc

    def plane_t(a, b, c):
        den = dirs[..., 2] - a * dirs[..., 0] - b * dirs[..., 1]
        den = np.where(np.abs(den) < 1e-9, 1e-9, den)
        return (a * org[0] + b * org[1] + c - org[2]) / den

    if corner:
        t1 = plane_t(0.35, -0.25, wall_z)
        t2 = plane_t(-0.45, 0.3, wall_z)
        x1 = org[0] + t1 * dirs[..., 0]
        tz = np.where(x1 < 0, t1, t2)
    else:
        a, b = slope
        tz = plane_t(a, b, wall_z)
    depth = np.where(tz > 0, tz * d[..., 2], 0.0)  # camera-z depth
    if box is not None:
        (bx0, bx1, by0, by1, bz) = box
        # a raised slab in front of the wall inside the xy window
        tz2 = (bz - org[2]) / np.where(np.abs(dirs[..., 2]) < 1e-9, 1e-9,
                                       dirs[..., 2])
        hit2 = org[None, None, :2] + tz2[..., None] * dirs[..., :2]
        inbox = ((hit2[..., 0] > bx0) & (hit2[..., 0] < bx1)
                 & (hit2[..., 1] > by0) & (hit2[..., 1] < by1) & (tz2 > 0))
        depth = np.where(inbox, tz2 * d[..., 2], depth)
    return depth.astype(np.float32)


class TestBackprojection:
    def test_roundtrip(self):
        depth = render_plane_depth(np.eye(4))
        pts, valid = depth_to_points(jnp.asarray(depth), K)
        pts = np.asarray(pts)[np.asarray(valid)]
        np.testing.assert_allclose(pts[:, 2].max(), depth.max(), atol=1e-4)
        # all points lie on the z=2 wall
        np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-3)


class TestOdometry:
    def test_recovers_translation(self):
        box = (-0.4, 0.3, -0.3, 0.2, 1.5)
        d0 = render_plane_depth(np.eye(4), box=box, corner=True)
        T_gt = np.eye(4)
        T_gt[:3, 3] = [0.05, -0.03, 0.02]   # camera moved -> world fixed
        d1 = render_plane_depth(T_gt, box=box, corner=True)
        ok, T, info = rgbd_odometry(jnp.asarray(d0), jnp.asarray(d1), K,
                                    iters=15)
        assert bool(ok)
        # T maps frame-0 camera points into frame-1 camera coords = T_gt
        np.testing.assert_allclose(np.asarray(T)[:3, 3], T_gt[:3, 3],
                                   atol=5e-3)
        A = np.asarray(info)
        assert A.shape == (6, 6) and np.allclose(A, A.T, atol=1e-3)

    def test_identity_pair(self):
        d0 = render_plane_depth(np.eye(4), box=(-0.4, 0.3, -0.3, 0.2, 1.5))
        ok, T, _ = rgbd_odometry(jnp.asarray(d0), jnp.asarray(d0), K)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-5)


def render_textured_plane(cam_from_world, wall_z=2.0):
    """Fronto-parallel wall z=wall_z with a smooth world-anchored texture.

    Depth alone carries ZERO signal about in-plane motion here (the depth
    image is constant); only the photometric term can observe it.
    Returns (depth [H,W] f32, intensity [H,W] f32 in [0,1]).
    """
    v, u = np.meshgrid(np.arange(K.height), np.arange(K.width), indexing="ij")
    d = np.stack([(u - K.cx) / K.fx, (v - K.cy) / K.fy, np.ones_like(u)],
                 axis=-1).astype(np.float64)
    world_from_cam = np.linalg.inv(cam_from_world)
    Rwc, twc = world_from_cam[:3, :3], world_from_cam[:3, 3]
    dirs = d @ Rwc.T
    tz = (wall_z - twc[2]) / dirs[..., 2]
    depth = (tz * d[..., 2]).astype(np.float32)
    wx = twc[0] + tz * dirs[..., 0]
    wy = twc[1] + tz * dirs[..., 1]
    tex = (0.5 + 0.2 * np.sin(3.0 * wx) + 0.15 * np.cos(4.0 * wy)
           + 0.1 * np.sin(7.0 * (wx + wy)))
    return depth, tex.astype(np.float32)


class TestHybridOdometry:
    """The color term constrains what flat geometry cannot.

    Rebuilds the capability of RGBDOdometryJacobianFromHybridTerm
    (reference Experiments/multiway/make_fragments.py:35-62): on a
    textured fronto-parallel plane, in-plane translation is invisible to
    any depth-only term but fully observable photometrically.
    """

    def test_depth_only_blind_to_inplane_motion(self):
        d0, _ = render_textured_plane(np.eye(4))
        T_gt = np.eye(4)
        T_gt[:3, 3] = [0.02, -0.015, 0.0]
        d1, _ = render_textured_plane(T_gt)
        ok, T, _ = rgbd_odometry(jnp.asarray(d0), jnp.asarray(d1), K,
                                 iters=10)
        assert bool(ok)
        # the constant depth image admits the identity: the solver must NOT
        # hallucinate the in-plane component (ridge keeps it near zero)
        assert abs(np.asarray(T)[0, 3]) < 0.5 * 0.02

    def test_hybrid_recovers_inplane_motion(self):
        d0, i0 = render_textured_plane(np.eye(4))
        T_gt = np.eye(4)
        T_gt[:3, 3] = [0.02, -0.015, 0.0]
        d1, i1 = render_textured_plane(T_gt)
        ok, T, info = rgbd_odometry(
            jnp.asarray(d0), jnp.asarray(d1), K, iters=10,
            intensity_src=jnp.asarray(i0), intensity_tgt=jnp.asarray(i1),
        )
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(T)[:3, 3], T_gt[:3, 3],
                                   atol=3e-3)
        assert np.isfinite(np.asarray(info)).all()

    def test_hybrid_matches_depth_only_on_geometric_scene(self):
        # on a geometry-rich scene the hybrid estimate must agree with the
        # (already-validated) depth-only one: flat texture = no-op term
        box = (-0.4, 0.3, -0.3, 0.2, 1.5)
        d0 = render_plane_depth(np.eye(4), box=box, corner=True)
        T_gt = np.eye(4)
        T_gt[:3, 3] = [0.03, 0.01, -0.02]
        d1 = render_plane_depth(T_gt, box=box, corner=True)
        flat = jnp.full(d0.shape, 0.5, jnp.float32)
        ok, T, _ = rgbd_odometry(jnp.asarray(d0), jnp.asarray(d1), K,
                                 iters=15, intensity_src=flat,
                                 intensity_tgt=flat)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(T)[:3, 3], T_gt[:3, 3],
                                   atol=5e-3)


class TestTSDF:
    def test_wall_surface_recovered(self):
        depth = render_plane_depth(np.eye(4))
        vol = TSDFVolume.create((64, 64, 64), (-1.0, -1.0, 1.5),
                                1.0 / 32.0, trunc=0.08)
        vol = integrate_frame(vol, jnp.asarray(depth), jnp.eye(4), K)
        pts, nrm, valid = extract_surface_points(vol, capacity=20000)
        pts = np.asarray(pts)[np.asarray(valid)]
        assert len(pts) > 100
        # recovered surface sits on the z=2 wall
        assert abs(np.median(pts[:, 2]) - 2.0) < 0.05
        nrm = np.asarray(nrm)[np.asarray(valid)]
        assert np.abs(nrm[:, 2]).mean() > 0.9   # normals along +-z

    def test_weights_accumulate(self):
        depth = render_plane_depth(np.eye(4))
        vol = TSDFVolume.create((32, 32, 32), (-0.5, -0.5, 1.7), 1.0 / 32.0)
        v1 = integrate_frame(vol, jnp.asarray(depth), jnp.eye(4), K)
        v2 = integrate_frame(v1, jnp.asarray(depth), jnp.eye(4), K)
        assert float(v2.weight.max()) == 2 * float(v1.weight.max()) > 0


class TestMakeFragment:
    def test_end_to_end(self):
        box = (-0.4, 0.3, -0.3, 0.2, 1.5)
        poses = []
        depths = []
        for i in range(6):
            cam_from_world = np.eye(4)
            cam_from_world[:3, 3] = [0.03 * i, -0.01 * i, 0.0]
            poses.append(np.linalg.inv(cam_from_world))
            depths.append(render_plane_depth(cam_from_world, box=box,
                                             corner=True))
        pts, nrm, valid, opt = make_fragment(
            depths, K, n_keyframes_per_n_frame=2,
            volume_dims=(64, 64, 64), volume_origin=(-1.0, -1.0, 1.2),
            tsdf_cubic_size=1.0 / 32.0 * 512.0, capacity=20000,
        )
        pts = pts[valid]
        assert len(pts) > 100
        # fragment surface includes both wall (z=2) and box (z=1.5) layers
        z = pts[:, 2]
        wall_z = np.where(pts[:, 0] < 0,
                          2.0 + 0.35 * pts[:, 0] - 0.25 * pts[:, 1],
                          2.0 - 0.45 * pts[:, 0] + 0.3 * pts[:, 1])
        assert (np.abs(z - wall_z) < 0.07).mean() > 0.3
        assert (np.abs(z - 1.5) < 0.07).mean() > 0.02
        # optimized poses track the GT camera trajectory
        for i, P in enumerate(poses):
            err = np.linalg.norm(opt[i][:3, 3] - P[:3, 3])
            assert err < 0.02, (i, err)


    def test_nonfinite_keyframe_edge_is_skipped(self, monkeypatch):
        # a near-singular keyframe solve can return ok=True with a
        # non-finite (T, info); such a loop-closure edge must be SKIPPED
        # (not fed to the pose graph, where one NaN edge poisons every node)
        import lidarreg.multiway.fragments as frag_mod

        box = (-0.4, 0.3, -0.3, 0.2, 1.5)
        poses, depths = [], []
        for i in range(6):
            cam_from_world = np.eye(4)
            cam_from_world[:3, 3] = [0.03 * i, -0.01 * i, 0.0]
            poses.append(np.linalg.inv(cam_from_world))
            depths.append(render_plane_depth(cam_from_world, box=box,
                                             corner=True))

        real_odo = frag_mod.rgbd_odometry
        calls = {"n": 0}

        def poisoned(*args, **kw):
            calls["n"] += 1
            if calls["n"] == 6:   # first keyframe pair (after 5 sequential)
                bad = jnp.full((4, 4), jnp.nan, jnp.float32)
                return jnp.bool_(True), bad, jnp.full((6, 6), jnp.nan)
            return real_odo(*args, **kw)

        monkeypatch.setattr(frag_mod, "rgbd_odometry", poisoned)
        pts, nrm, valid, opt = make_fragment(
            depths, K, n_keyframes_per_n_frame=2,
            volume_dims=(64, 64, 64), volume_origin=(-1.0, -1.0, 1.2),
            tsdf_cubic_size=1.0 / 32.0 * 512.0, capacity=20000,
        )
        assert calls["n"] > 6    # the keyframe loop kept running
        assert np.isfinite(np.asarray(opt)).all()
        assert np.isfinite(np.asarray(pts)[np.asarray(valid)]).all()
        for i, P in enumerate(poses):
            err = np.linalg.norm(opt[i][:3, 3] - P[:3, 3])
            assert err < 0.02, (i, err)


class TestFileIO:
    def test_alphanum_sort_and_lists(self, tmp_path):
        from lidarreg.multiway import get_rgbd_file_lists, sorted_alphanum

        assert sorted_alphanum(["f10.png", "f2.png"]) == ["f2.png", "f10.png"]
        root = tmp_path / "scan"
        (root / "color").mkdir(parents=True)
        (root / "depth").mkdir()
        for i in (2, 10, 1):
            (root / "color" / f"{i}.jpg").write_bytes(b"")
            (root / "depth" / f"{i}.png").write_bytes(b"")
        color, depth = get_rgbd_file_lists(str(root))
        assert [c.split("/")[-1] for c in color] == ["1.jpg", "2.jpg", "10.jpg"]
        assert [d.split("/")[-1] for d in depth] == ["1.png", "2.png", "10.png"]

    def test_initialize_config_defaults(self):
        from lidarreg.multiway import initialize_config

        cfg = initialize_config({"max_depth": 4.5})
        assert cfg["max_depth"] == 4.5            # user value preserved
        assert cfg["n_frames_per_fragment"] == 100
        assert cfg["tsdf_cubic_size"] == 3.0
        assert cfg["template_fragment_pointcloud"].endswith("%03d.ply")

    def test_depth_png_roundtrip(self, tmp_path):
        import numpy as np
        import zlib, struct
        from lidarreg.multiway import read_depth_png

        # write a minimal 16-bit grayscale PNG (filter 0 rows)
        h, w = 6, 5
        depth_mm = (np.arange(h * w).reshape(h, w) * 37 % 5000).astype(">u2")
        raw = b"".join(b"\x00" + depth_mm[r].tobytes() for r in range(h))

        def chunk(typ, payload):
            c = struct.pack(">I", len(payload)) + typ + payload
            return c + struct.pack(">I", zlib.crc32(typ + payload))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
        path = str(tmp_path / "d.png")
        open(path, "wb").write(png)
        got = read_depth_png(path)
        np.testing.assert_allclose(
            got, depth_mm.astype(np.float32) / 1000.0, atol=1e-6
        )
