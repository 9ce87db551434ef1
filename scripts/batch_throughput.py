"""Pair-batched solver throughput: pairs/sec at batch B = 1/2/4/8.

The reference scales eval throughput by running one process per GPU
(test_parallel.sh); on one TPU chip the same lever is BATCHING pairs
through a vmapped match+filter+solve program. This measures the bench.py
solver config (32k-voxel correspondences, GPF, RANSAC-1M, confidence
termination) at several batch widths. vmapped `lax.while_loop` runs every
lane until the slowest lane's confidence stop, so the batch pays the
hardest pair's budget — the win is utilization on the gather-bound stages,
not fewer hypotheses.

Usage: python scripts/batch_throughput.py [B ...]   (default 1 2 4 8)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from lidarreg.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from bench import build_pair
    from lidarreg.core import registration_success
    from lidarreg.match import match_pair
    from lidarreg.ops import voxelize_points
    from lidarreg.solvers import RansacConfig, ransac_register

    tiny = "--tiny" in sys.argv[1:]
    batches = [int(a) for a in sys.argv[1:] if a != "--tiny"] or [1, 2, 4, 8]
    VOX, CAP = 0.3, (2048 if tiny else 32768)
    cfg = RansacConfig(
        num_hypotheses=8192 if tiny else 1_000_000,
        chunk_size=2048 if tiny else 65_536,
        stage1_samples=128 if tiny else 512,
        top_k=64 if tiny else 512,
        refit_iters=3,
    )

    def feats(xyz, key, T=None):
        p = xyz if T is None else (xyz - jnp.asarray(T[:3, 3])) @ jnp.asarray(
            T[:3, :3].astype(np.float32)
        )
        f = jnp.concatenate([jnp.sin(p * s) for s in (0.11, 0.37, 0.93)], 1)
        f = f + jax.random.normal(key, f.shape) * 0.35
        return f / jnp.linalg.norm(f, axis=1, keepdims=True)

    # build the largest batch once; smaller batches slice it
    B_max = max(batches)
    X0, X1, F0, F1, M0, M1, GT = [], [], [], [], [], [], []
    for b in range(B_max):
        rng = np.random.default_rng(51 + b)
        ca, cb, T = build_pair(rng)
        va = voxelize_points(jnp.asarray(ca), VOX, CAP)
        vb = voxelize_points(jnp.asarray(cb), VOX, CAP)
        xyz0 = jnp.asarray(ca)[va.indices]
        xyz1 = jnp.asarray(cb)[vb.indices]
        X0.append(xyz0), X1.append(xyz1)
        F0.append(feats(xyz0, jax.random.PRNGKey(2 * b)))
        F1.append(feats(xyz1, jax.random.PRNGKey(2 * b + 1), T))
        M0.append(va.valid), M1.append(vb.valid)
        GT.append(T)
    X0, X1 = jnp.stack(X0), jnp.stack(X1)
    F0, F1 = jnp.stack(F0), jnp.stack(F1)
    M0, M1 = jnp.stack(M0), jnp.stack(M1)

    def one(F0, F1, xyz0, xyz1, m0, m1, key):
        c = match_pair(F0, F1, xyz0, mask0=m0, mask1=m1, mode="GPF")
        res = ransac_register(
            xyz0, xyz1[c.idx1], c.keep, key, cfg,
            quality=c.quality, refit_mask=c.valid,
        )
        return res.transform

    for B in batches:
        fn = jax.jit(jax.vmap(one)) if B > 1 else jax.jit(one)

        def call(trial):
            keys = jax.random.split(jax.random.PRNGKey(trial), B)
            if B > 1:
                return fn(F0[:B], F1[:B], X0[:B], X1[:B], M0[:B], M1[:B],
                          keys)
            return fn(F0[0], F1[0], X0[0], X1[0], M0[0], M1[0], keys[0])[None]

        out = np.asarray(call(0))
        n_ok = sum(
            bool(registration_success(jnp.asarray(out[b]),
                                      jnp.asarray(GT[b]))[0])
            for b in range(B)
        )
        times = []
        for trial in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(call(trial))
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"B={B}: {B / t:8.2f} pairs/sec  ({t * 1000 / B:7.1f} ms/pair, "
              f"batch wall {t * 1000:7.1f} ms, success {n_ok}/{B})",
              flush=True)


if __name__ == "__main__":
    main()
