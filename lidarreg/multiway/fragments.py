"""RGBD fragment construction: odometry -> pose graph -> TSDF -> point cloud.

Rebuilds Experiments/multiway/make_fragments.py:23-140 (the front half of
the multiway experiment: Open3D RGBD odometry + ScalableTSDFVolume) with
TPU-native math:

  * `rgbd_odometry` — HYBRID color+depth odometry (fixed Gauss-Newton
    iterations over the projective association, fully jitted) rebuilding
    o3d.odometry.compute_rgbd_odometry with
    RGBDOdometryJacobianFromHybridTerm (make_fragments.py:35-62, Park et
    al. ICCV'17): when intensity images are passed, each GN step stacks a
    photometric residual I_tgt(w(x)) - I_src(x) (image gradients chained
    through the projective warp) with the geometric term at equal weight
    (lambda = 0.5 each, Open3D's hybrid constants). The photometric
    jacobian conditions exactly the directions flat geometry cannot
    (in-plane translation / rotation about the normal) — validated on a
    textured fronto-parallel plane where depth-only observes nothing
    (tests/test_fragments.py). DOCUMENTED DEVIATIONS: the geometric term
    is point-to-plane (better conditioned than the reference's depth-
    difference term), and association is single-scale (no image pyramid) —
    odometry inits must be within the basin, which fragment-rate frames
    are. Without intensities the depth-only behavior is unchanged.
    Returns (success, T, 6x6 information) with the information matrix
    built from the point-to-plane Jacobians like
    o3d.registration.get_information_matrix_from_point_clouds.
  * `TSDFVolume` — a DENSE truncated-signed-distance volume integrated one
    depth frame per call: every voxel center is projected into the frame
    (one fused vectorized pass — the TPU-native replacement for Open3D's
    scalable hash volume, make_fragments.py:112-131), with the classic
    weighted running average (Curless-Levoy).
  * `extract_surface_points` — zero-crossing voxels with central-difference
    normals. The reference extracts a marching-cubes mesh and immediately
    discards the faces (make_fragments.py:133-140 uses mesh.vertices as the
    fragment POINT CLOUD), so surface points are the functional output.
  * `make_fragment` — frames -> odometry chain + keyframe loop closures ->
    line-process pose-graph optimization (multiway.posegraph) -> TSDF
    integration -> fragment cloud (make_fragments.py:65-140).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.se3 import integrate
from .posegraph import PoseGraphEdge, optimize_pose_graph

__all__ = [
    "CameraIntrinsic",
    "depth_to_points",
    "rgbd_odometry",
    "TSDFVolume",
    "integrate_frame",
    "extract_surface_points",
    "make_fragment",
]


class CameraIntrinsic(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int


def depth_to_points(depth: jnp.ndarray, K: CameraIntrinsic,
                    max_depth: float = 3.0):
    """Back-project a depth image -> ([H*W, 3] camera-frame points, valid)."""
    h, w = depth.shape
    v, u = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    z = depth
    x = (u - K.cx) / K.fx * z
    y = (v - K.cy) / K.fy * z
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = ((z > 1e-4) & (z < max_depth)).reshape(-1)
    return pts, valid


def _cholesky_solve6(A, b):
    """Unrolled 6x6 SPD solve in scalar f32 ops.

    TPU's jnp.linalg.solve lowers to a matmul-blocked LU that honors the
    default (bf16) matmul precision — a Gauss-Newton step solved that way
    lands ~millimetres off and the odometry converges to a biased fixed
    point (v5e-observed). 36 scalar ops are exact and free.
    """
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-18))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _normals_from_depth(depth: jnp.ndarray, K: CameraIntrinsic):
    """Per-pixel normals via cross products of forward differences."""
    h, w = depth.shape
    # grazing-ray renders can carry ~1e9 sentinel depths; unclipped they
    # overflow the f32 cross product to inf and the normalization to NaN,
    # which 0-weights cannot remove downstream (0/NaN == NaN)
    pts, _ = depth_to_points(jnp.clip(depth, 0.0, 1e4), K,
                             max_depth=jnp.inf)
    P = pts.reshape(h, w, 3)
    dx = jnp.roll(P, -1, axis=1) - P
    dy = jnp.roll(P, -1, axis=0) - P
    n = jnp.cross(dx, dy)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return (n / norm).reshape(-1, 3)


@partial(jax.jit, static_argnums=(2, 3, 4))
def rgbd_odometry(
    depth_src: jnp.ndarray,    # [H, W] metres
    depth_tgt: jnp.ndarray,
    K: CameraIntrinsic,
    iters: int = 10,
    max_depth: float = 3.0,
    max_depth_diff: float = 0.07,   # config["max_depth_diff"] default
    init_T: jnp.ndarray | None = None,
    intensity_src: jnp.ndarray | None = None,   # [H, W] in [0, 1]
    intensity_tgt: jnp.ndarray | None = None,
):
    """Projective hybrid (photometric + point-to-plane) odometry src->tgt.

    Returns (success, T [4,4] mapping src-frame points into tgt-frame,
    info [6,6]). `success` mirrors o3d's criterion: enough associated pixels.
    When `intensity_src/tgt` are given the GN normal equations additionally
    accumulate the photometric term (RGBDOdometryJacobianFromHybridTerm).
    """
    src_pts, src_valid = depth_to_points(depth_src, K, max_depth)
    tgt_P, tgt_valid = depth_to_points(depth_tgt, K, max_depth)
    tgt_P = tgt_P.reshape(K.height, K.width, 3)
    tgt_N = _normals_from_depth(depth_tgt, K).reshape(K.height, K.width, 3)
    T0 = jnp.eye(4) if init_T is None else init_T

    tgt_valid_img = tgt_valid.reshape(K.height, K.width)

    use_color = intensity_src is not None and intensity_tgt is not None
    if use_color:
        i_src_flat = intensity_src.reshape(-1)
        # central-difference image gradients (intensity per pixel), sampled
        # bilinearly at the warped location inside each GN step
        g_iu = 0.5 * (jnp.roll(intensity_tgt, -1, axis=1)
                      - jnp.roll(intensity_tgt, 1, axis=1))
        g_iv = 0.5 * (jnp.roll(intensity_tgt, -1, axis=0)
                      - jnp.roll(intensity_tgt, 1, axis=0))

    def step(T, _):
        R, t = T[:3, :3], T[:3, 3]
        p = jnp.einsum("nc,dc->nd", src_pts, R, precision="highest") + t
        u = p[:, 0] / jnp.maximum(p[:, 2], 1e-6) * K.fx + K.cx
        v = p[:, 1] / jnp.maximum(p[:, 2], 1e-6) * K.fy + K.cy
        # bilinear sub-pixel sampling of the target surface (nearest-pixel
        # rounding quantizes the association and biases the fixed point)
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, K.width - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, K.height - 2)
        fu = jnp.clip(u - u0, 0.0, 1.0)[:, None]
        fv = jnp.clip(v - v0, 0.0, 1.0)[:, None]

        def bil(img):
            return (
                img[v0, u0] * (1 - fu) * (1 - fv)
                + img[v0, u0 + 1] * fu * (1 - fv)
                + img[v0 + 1, u0] * (1 - fu) * fv
                + img[v0 + 1, u0 + 1] * fu * fv
            )

        def bil_scalar(img):
            fu1, fv1 = fu[:, 0], fv[:, 0]
            return (
                img[v0, u0] * (1 - fu1) * (1 - fv1)
                + img[v0, u0 + 1] * fu1 * (1 - fv1)
                + img[v0 + 1, u0] * (1 - fu1) * fv1
                + img[v0 + 1, u0 + 1] * fu1 * fv1
            )

        q = bil(tgt_P)
        nrm = bil(tgt_N)
        # interpolating unit normals across a crease or occlusion boundary
        # shrinks the vector; such pixels carry garbage normals AND their
        # window membership is ulp-sensitive (grid-aligned projections can
        # flip floor(u) between backends) — gate them out for determinism
        nlen2 = jnp.sum(nrm * nrm, -1)
        nrm = nrm / jnp.sqrt(nlen2 + 1e-12)[..., None]
        coherent = nlen2 > 0.9
        z4 = jnp.stack([
            tgt_P[v0, u0, 2], tgt_P[v0, u0 + 1, 2],
            tgt_P[v0 + 1, u0, 2], tgt_P[v0 + 1, u0 + 1, 2],
        ])
        corner_ok = (
            tgt_valid_img[v0, u0] & tgt_valid_img[v0, u0 + 1]
            & tgt_valid_img[v0 + 1, u0] & tgt_valid_img[v0 + 1, u0 + 1]
            # don't interpolate across depth discontinuities (occlusion
            # boundaries blend fore/background into phantom surface points)
            & (z4.max(0) - z4.min(0) < max_depth_diff)
        )
        ok = (
            src_valid
            & (p[:, 2] > 1e-4)
            # stay a pixel inside the border (roll-based normals wrap there)
            & (u >= 1) & (u <= K.width - 2) & (v >= 1) & (v <= K.height - 2)
            & corner_ok
            & coherent
            & (jnp.abs(p[:, 2] - q[:, 2]) < max_depth_diff)
        )
        # double-where: rejected pixels can carry non-finite normals and
        # residuals (blended sentinel depths); 0 * NaN stays NaN in the
        # normal-equation sums, so zero them under the gate first
        nrm = jnp.where(ok[:, None], nrm, 0.0)
        r = jnp.sum((p - q) * nrm, axis=-1)               # point-to-plane
        r = jnp.where(ok, r, 0.0)
        # Geman-McClure IRLS: boundary pixels whose association flips at
        # depth discontinuities carry large residuals and garbage normals;
        # robust downweighting keeps them from steering the solve
        delta = 0.1 * max_depth_diff
        w = jnp.where(ok, 1.0 / (1.0 + (r / delta) ** 2), 0.0)
        J = jnp.concatenate([jnp.cross(p, nrm), nrm], axis=-1)  # [N, 6]
        A = jnp.einsum("ni,nj->ij", J * w[:, None], J, precision="highest")
        b = jnp.einsum("ni,n->i", J * w[:, None], r, precision="highest")
        A_solve, b_solve = A, b
        if use_color:
            # photometric term: r_I = I_tgt(warp(x)) - I_src(x); the image
            # gradient chains through the projective warp du/dp' so the
            # 6-dof jacobian shares the [p x g3, g3] structure of the
            # geometric row (same left-perturbation convention)
            i_q = bil_scalar(intensity_tgt)
            gx = bil_scalar(g_iu)
            gy = bil_scalar(g_iv)
            z = jnp.maximum(p[:, 2], 1e-6)
            g3 = jnp.stack(
                [gx * K.fx / z, gy * K.fy / z,
                 -(gx * K.fx * p[:, 0] + gy * K.fy * p[:, 1]) / (z * z)],
                axis=-1,
            )
            r_i = jnp.where(ok, i_q - i_src_flat, 0.0)
            g3 = jnp.where(ok[:, None], g3, 0.0)
            # Geman-McClure IRLS on the intensity residual (occlusion /
            # specular pixels), scale in intensity units
            delta_i = 0.05
            w_i = jnp.where(ok, 1.0 / (1.0 + (r_i / delta_i) ** 2), 0.0)
            J_i = jnp.concatenate([jnp.cross(p, g3), g3], axis=-1)
            A_i = jnp.einsum("ni,nj->ij", J_i * w_i[:, None], J_i,
                             precision="highest")
            b_i = jnp.einsum("ni,n->i", J_i * w_i[:, None], r_i,
                             precision="highest")
            # equal hybrid weighting (Open3D's sqrt(0.5) per-residual
            # constants square to 0.5 on the normal equations)
            A_solve = 0.5 * A + 0.5 * A_i
            b_solve = 0.5 * b + 0.5 * b_i
        xi = _cholesky_solve6(A_solve + 1e-6 * jnp.eye(6), -b_solve)
        wvec, tvec = xi[:3], xi[3:]
        th = jnp.sqrt(jnp.sum(wvec**2) + 1e-12)
        k = wvec / th
        Kx = jnp.array([
            [0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]
        ])
        Kx2 = jnp.einsum("ij,jk->ik", Kx, Kx, precision="highest")
        dR = jnp.eye(3) + jnp.sin(th) * Kx + (1 - jnp.cos(th)) * Kx2
        dT = integrate(dR, tvec)
        T_new = jnp.einsum("ij,jk->ik", dT, T, precision="highest")
        return T_new, (jnp.sum(ok.astype(jnp.float32)), A)

    T, (counts, A) = jax.lax.scan(step, T0, None, length=iters)
    n_assoc = counts[-1]
    success = n_assoc > 0.1 * jnp.sum(src_valid.astype(jnp.float32))
    return success, T, A[-1] + jnp.eye(6)


class TSDFVolume(NamedTuple):
    tsdf: jnp.ndarray     # [X, Y, Z]
    weight: jnp.ndarray   # [X, Y, Z]
    origin: jnp.ndarray   # [3] world position of voxel (0,0,0)
    voxel: float          # edge length (tsdf_cubic_size / 512)
    trunc: float          # sdf truncation (0.04 m)

    @staticmethod
    def create(dims: Sequence[int], origin, voxel: float, trunc: float = 0.04):
        return TSDFVolume(
            jnp.ones(tuple(dims), jnp.float32),
            jnp.zeros(tuple(dims), jnp.float32),
            jnp.asarray(origin, jnp.float32), float(voxel), float(trunc),
        )


@partial(jax.jit, static_argnums=(3,))
def integrate_frame(vol: TSDFVolume, depth: jnp.ndarray,
                    cam_from_world: jnp.ndarray, K: CameraIntrinsic,
                    max_depth: float = 3.0):
    """Fuse one depth frame (Curless-Levoy weighted average; one fused pass)."""
    dims = vol.tsdf.shape
    ii, jj, kk = jnp.meshgrid(*[jnp.arange(d) for d in dims], indexing="ij")
    centers = (
        jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32) + 0.5
    ) * vol.voxel + vol.origin                      # [X, Y, Z, 3] world
    R, t = cam_from_world[:3, :3], cam_from_world[:3, 3]
    pc = jnp.einsum("xyzc,dc->xyzd", centers, R, precision="highest") + t
    z = pc[..., 2]
    u = pc[..., 0] / jnp.maximum(z, 1e-6) * K.fx + K.cx
    v = pc[..., 1] / jnp.maximum(z, 1e-6) * K.fy + K.cy
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, K.width - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, K.height - 1)
    d = depth[vi, ui]
    sdf = d - z
    seen = (
        (z > 1e-4) & (d > 1e-4) & (d < max_depth)
        & (u >= 0) & (u <= K.width - 1) & (v >= 0) & (v <= K.height - 1)
        & (sdf > -vol.trunc)
    )
    tsdf_obs = jnp.clip(sdf / vol.trunc, -1.0, 1.0)
    w_obs = seen.astype(jnp.float32)
    new_w = vol.weight + w_obs
    new_t = jnp.where(
        new_w > 0,
        (vol.tsdf * vol.weight + tsdf_obs * w_obs) / jnp.maximum(new_w, 1e-6),
        vol.tsdf,
    )
    return vol._replace(tsdf=new_t, weight=new_w)


def extract_surface_points(vol: TSDFVolume, capacity: int,
                           iso_band: float = 0.2, min_weight: float = 1.0):
    """Zero-crossing voxel centers (+ central-difference normals).

    The reference's fragments are mesh VERTICES used as a point cloud
    (make_fragments.py:133-140); surface voxels within `iso_band` of the
    zero level set are the equivalent sample. Returns (points [capacity, 3],
    normals [capacity, 3], valid [capacity]).
    """
    t, w = vol.tsdf, vol.weight
    surf = (jnp.abs(t) < iso_band) & (w >= min_weight)
    gx = jnp.roll(t, -1, 0) - jnp.roll(t, 1, 0)
    gy = jnp.roll(t, -1, 1) - jnp.roll(t, 1, 1)
    gz = jnp.roll(t, -1, 2) - jnp.roll(t, 1, 2)
    g = jnp.stack([gx, gy, gz], axis=-1)
    g = g / jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-12)
    dims = t.shape
    ii, jj, kk = jnp.meshgrid(*[jnp.arange(d) for d in dims], indexing="ij")
    centers = (
        jnp.stack([ii, jj, kk], axis=-1).astype(jnp.float32) + 0.5
    ) * vol.voxel + vol.origin
    # offset along the gradient to the zero crossing (first-order)
    centers = centers - (t[..., None] * vol.trunc) * g
    flat_ok = surf.reshape(-1)
    order = jnp.argsort(~flat_ok)        # surface voxels first, stable
    sel = order[:capacity]
    pts = centers.reshape(-1, 3)[sel]
    nrm = g.reshape(-1, 3)[sel]
    valid = flat_ok[sel]
    return pts, nrm, valid


def make_fragment(
    depths: Sequence[np.ndarray],
    K: CameraIntrinsic,
    n_keyframes_per_n_frame: int = 5,
    volume_dims=(256, 256, 256),
    volume_origin=(-2.0, -2.0, 0.0),
    tsdf_cubic_size: float = 3.0,
    capacity: int = 100_000,
    max_depth: float = 3.0,
    intensities: Sequence[np.ndarray] | None = None,
):
    """Frames -> fragment point cloud + optimized per-frame poses.

    Mirrors make_posegraph_for_fragment (odometry chain edges certain,
    keyframe pairs uncertain, make_fragments.py:65-110) + the optimize +
    integrate stages. Returns (points, normals, valid, poses [F,4,4]).
    """
    F = len(depths)
    depths_j = [jnp.asarray(d, jnp.float32) for d in depths]
    ints_j = (None if intensities is None
              else [jnp.asarray(c, jnp.float32) for c in intensities])

    def _odo(s, t):
        kw = {}
        if ints_j is not None:
            kw = dict(intensity_src=ints_j[s], intensity_tgt=ints_j[t])
        return rgbd_odometry(depths_j[s], depths_j[t], K,
                             max_depth=max_depth, **kw)

    nodes = [np.eye(4)]
    edges = []
    odo = np.eye(4)
    for s in range(F - 1):
        ok, T, info = _odo(s, s + 1)
        T = np.asarray(T)          # T_{s+1 <- s}
        info = np.asarray(info)
        if not (bool(ok) and np.isfinite(T).all() and np.isfinite(info).all()):
            # reference fallback: failed odometry contributes an identity
            # edge (make_fragments.py register_one_rgbd_pair)
            T, info = np.eye(4), np.eye(6)
        odo = T @ odo              # T_{s+1 <- 0}
        nodes.append(np.linalg.inv(odo))
        # posegraph edges carry T_{i <- j} (edge residual log(T^-1 Xi^-1 Xj))
        edges.append(
            PoseGraphEdge(s, s + 1, np.linalg.inv(T), np.asarray(info), False)
        )
    for s in range(0, F, n_keyframes_per_n_frame):
        for t_ in range(s + n_keyframes_per_n_frame, F,
                        n_keyframes_per_n_frame):
            ok, T, info = _odo(s, t_)
            T = np.asarray(T)
            info = np.asarray(info)
            # same finiteness guard as the sequential edges: a near-singular
            # keyframe solve can return ok=True with a non-finite (T, info),
            # which would NaN the whole pose graph. Loop closures are
            # optional, so a failed one is simply skipped (the reference
            # adds non-adjacent edges only on success,
            # make_fragments.py register_one_rgbd_pair).
            if bool(ok) and np.isfinite(T).all() and np.isfinite(info).all():
                edges.append(
                    PoseGraphEdge(s, t_, np.linalg.inv(T), info, True)
                )
    opt_nodes, _, _ = optimize_pose_graph(np.stack(nodes), edges)
    opt_nodes = np.asarray(opt_nodes)

    vol = TSDFVolume.create(
        volume_dims, volume_origin, tsdf_cubic_size / 512.0
    )
    for i in range(F):
        cam_from_world = np.linalg.inv(opt_nodes[i])
        vol = integrate_frame(vol, depths_j[i],
                              jnp.asarray(cam_from_world, jnp.float32), K,
                              max_depth)
    pts, nrm, valid = extract_surface_points(vol, capacity)
    return np.asarray(pts), np.asarray(nrm), np.asarray(valid), opt_nodes
