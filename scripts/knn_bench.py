"""Microbench: jnp find_nn vs the fused Pallas top-2 kernel.

The solver headline path spends ~2x39 ms in 32k x 32k feature matching
(round-1 measurement, both paths equal then). The jnp path's floor is
~3 distance-matrix passes of HBM traffic; the Pallas kernel's floor is the
MXU matmul. This measures both (several dims, both directions' shapes) so
the faster one becomes find_nn's TPU default.
"""
import time

import numpy as np


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

    from lidarreg.ops.knn import find_nn

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for n, d in ((32768, 9), (32768, 32), (16384, 32)):
        F0 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        F1 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        m1 = jnp.ones((n,), bool)

        jnp2 = jax.jit(lambda a, b, m: find_nn(a, b, mask1=m,
                                               return_2nd=True))
        jnp1 = jax.jit(lambda a, b, m: find_nn(a, b, mask1=m,
                                               return_2nd=False))
        pal = jax.jit(lambda a, b, m: find_nn(a, b, mask1=m,
                                              return_2nd=True,
                                              backend="pallas"))
        t_j2 = timed(jnp2, F0, F1, m1)
        t_j1 = timed(jnp1, F0, F1, m1)
        t_p = timed(pal, F0, F1, m1)
        # correctness cross-check
        a = jnp2(F0, F1, m1)
        b = pal(F0, F1, m1)
        same = (np.array_equal(np.asarray(a.idx), np.asarray(b.idx))
                and np.allclose(np.asarray(a.dist), np.asarray(b.dist),
                                atol=1e-4))
        print(f"N={n} D={d}: jnp top2={t_j2:6.1f} ms  jnp top1={t_j1:6.1f}"
              f" ms  pallas top2={t_p:6.1f} ms  (match={same})")


if __name__ == "__main__":
    main()
