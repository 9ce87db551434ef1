"""Per-stage cost of the solver headline path (match + GPF + RANSAC-1M).

bench.py's solver metric sits at ~8.7-8.9 pairs/sec (~115 ms/pair); the
north star is >= 10. This splits the jitted pipeline into its stages
(forward kNN with 2nd-NN, backward kNN, GPF water-filling, RANSAC-1M with
LO) under bench.py's exact shapes (32k x 32k, min-of-5, block_until_ready)
to direct the optimization.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=5):
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


def main():
    from lidarreg.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    import bench as B
    from lidarreg.match import match_pair
    from lidarreg.ops import voxelize_points
    from lidarreg.ops.knn import find_nn
    from lidarreg.solvers import RansacConfig, ransac_register

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(51)
    cloud_a, cloud_b, T_gt = B.build_pair(rng)
    VOX, CAP = 0.3, 32768
    va = voxelize_points(jnp.asarray(cloud_a), VOX, CAP)
    vb = voxelize_points(jnp.asarray(cloud_b), VOX, CAP)
    xyz0 = jnp.asarray(cloud_a)[va.indices]
    xyz1 = jnp.asarray(cloud_b)[vb.indices]

    def feats(xyz, key, T=None):
        p = xyz if T is None else (
            xyz - jnp.asarray(T[:3, 3])
        ) @ jnp.asarray(T[:3, :3].astype(np.float32))
        f = jnp.concatenate([jnp.sin(p * s) for s in (0.11, 0.37, 0.93)], 1)
        f = f + jax.random.normal(key, f.shape) * 0.35
        return f / jnp.linalg.norm(f, axis=1, keepdims=True)

    F0 = feats(xyz0, jax.random.PRNGKey(0))
    F1 = feats(xyz1, jax.random.PRNGKey(1), T_gt)
    m0, m1 = va.valid, vb.valid

    cfg = RansacConfig(
        num_hypotheses=1_000_000, chunk_size=65_536,
        stage1_samples=512, top_k=512, refit_iters=3,
    )

    knn_fwd = jax.jit(lambda a, b, mb: find_nn(a, b, mask1=mb,
                                               return_2nd=True))
    knn_bwd = jax.jit(lambda a, b, mb: find_nn(a, b, mask1=mb,
                                               return_2nd=False))
    match_only = jax.jit(
        lambda F0, F1, m0, m1: match_pair(F0, F1, xyz0, mask0=m0,
                                          mask1=m1, mode="GPF").keep
    )

    @jax.jit
    def full(F0, F1, m0, m1, key):
        c = match_pair(F0, F1, xyz0, mask0=m0, mask1=m1, mode="GPF")
        return ransac_register(xyz0, xyz1[c.idx1], c.keep, key, cfg,
                               quality=c.quality, refit_mask=c.valid).transform

    c = match_pair(F0, F1, xyz0, mask0=m0, mask1=m1, mode="GPF")
    solve_only = jax.jit(
        lambda t1, keep, q, rv, key: ransac_register(
            xyz0, t1, keep, key, cfg, quality=q, refit_mask=rv
        ).transform
    )
    t1g, keep, qual, rvalid = xyz1[c.idx1], c.keep, c.quality, c.valid

    key = jax.random.PRNGKey(0)
    t_fwd = timed(knn_fwd, F0, F1, m1)
    t_bwd = timed(knn_bwd, F1, F0, m0)
    t_match = timed(match_only, F0, F1, m0, m1)
    t_solve = timed(solve_only, t1g, keep, qual, rvalid, key)
    t_full = timed(full, F0, F1, m0, m1, key)
    print(f"kNN fwd (2nd-NN, 32k x 32k): {t_fwd:7.1f} ms")
    print(f"kNN bwd:                     {t_bwd:7.1f} ms")
    print(f"match_pair total (GPF):      {t_match:7.1f} ms")
    print(f" -> GPF+ratio overhead:      {t_match - t_fwd - t_bwd:7.1f} ms")
    print(f"RANSAC-1M + LO:              {t_solve:7.1f} ms")
    print(f"FULL solver path:            {t_full:7.1f} ms")
    print(f" -> fusion benefit:          "
          f"{t_match + t_solve - t_full:7.1f} ms")


if __name__ == "__main__":
    main()
