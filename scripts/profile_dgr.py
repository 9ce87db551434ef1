"""Per-stage cost breakdown of the DGR register path (TPU, jitted min-of-3).

Splits DGR (solvers/dgr.py) into: feature NN, 6-D inlier-net forward,
weighted-Procrustes + Adam refine, safeguard RANSAC — to direct the
round-3 "DGR <= 3.5 s/pair" work (VERDICT r2 item 3).
"""
import sys
import time

import numpy as np


def timed(fn, *args, n=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main(cap=16384):
    import jax
    import jax.numpy as jnp

    from lidarreg.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from lidarreg.models.fcgf import ResUNetBN2C
    from lidarreg.ops import voxelize_points
    from lidarreg.ops.knn import find_nn
    from lidarreg.ops.voxelize import quantize_coords
    from lidarreg.solvers.dgr import DGRConfig, global_registration
    from lidarreg.solvers.ransac import RansacConfig, ransac_register
    from lidarreg.sparse.tensor import SparseTensor

    sys.path.insert(0, "/root/repo")
    from bench import build_pair

    rng = np.random.default_rng(51)
    ca, cb, T = build_pair(rng, n_raw=60000)
    va = voxelize_points(jnp.asarray(ca), 0.3, cap)
    vb = voxelize_points(jnp.asarray(cb), 0.3, cap)
    xyz0 = jnp.asarray(ca)[va.indices]
    xyz1 = jnp.asarray(cb)[vb.indices]
    F0 = jax.random.normal(jax.random.PRNGKey(0), (cap, 32))
    F1 = jax.random.normal(jax.random.PRNGKey(1), (cap, 32))
    print(f"cap={cap}", flush=True)

    cfg = DGRConfig()

    nn_j = jax.jit(lambda a, b, m: find_nn(a, b, mask1=m, row_tile=cfg.nn_row_tile).idx)
    ms = timed(nn_j, F0, F1, vb.valid)
    print(f"find_nn 16k x 16k:        {ms:8.1f} ms", flush=True)
    idx1 = nn_j(F0, F1, vb.valid)

    c0 = quantize_coords(xyz0, 0.3)
    c1 = quantize_coords(xyz1, 0.3)
    coords6 = jnp.concatenate([c0, c1[idx1]], axis=1)

    model = ResUNetBN2C(dim=6, out_channels=1, conv1_kernel_size=3,
                        normalize_feature=False)
    st6 = SparseTensor(coords6, jnp.ones((cap, 1)), va.valid, 1)
    ivars = model.init(jax.random.PRNGKey(2), st6, train=False)
    fwd = jax.jit(lambda v, s: model.apply(v, s, train=False).feats)
    print("compiling inlier-net forward...", flush=True)
    ms = timed(fwd, ivars, st6)
    print(f"6-D inlier-net forward:   {ms:8.1f} ms", flush=True)

    w = jax.nn.sigmoid(fwd(ivars, st6)[:, 0]) * va.valid
    greg = jax.jit(lambda s, t, w: global_registration(s, t, w)[1])
    ms = timed(greg, xyz0, xyz1[idx1], w)
    print(f"procrustes+adam refine:   {ms:8.1f} ms", flush=True)

    rcfg = RansacConfig(num_hypotheses=80_000, inlier_thresh=0.6,
                        prosac=False, use_elc=True)
    sg = jax.jit(lambda s, t, m, k: ransac_register(s, t, m, k, rcfg).transform)
    ms = timed(sg, xyz0, xyz1[idx1], va.valid, jax.random.PRNGKey(3))
    print(f"safeguard RANSAC-80k:     {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
