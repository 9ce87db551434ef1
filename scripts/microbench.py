"""Numerical micro-validations + kernel micro-benchmarks.

Counterpart of the reference's Experiments/misc/svd_speed.py (batched SVD
timing) and Experiments/misc/eigen.py (power iteration vs symeig numerics):
validates that the SVD-free rotation solvers agree with jnp.linalg.svd and
times the Kabsch variants at RANSAC scale on the current backend.

  python scripts/microbench.py [--batch 1000000]
"""
import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1_000_000)
    args = ap.parse_args(argv)

    from lidarreg.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from lidarreg.core.kabsch import kabsch_svd, weighted_kabsch
    from lidarreg.core.metrics import rotation_error_deg

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # --- numerics: QCP / Jacobi vs SVD (eigen.py analogue) ----------------
    # well-posed pairs (real rotation + noise): pure-noise pairs have a
    # near-degenerate covariance whose optimum is ambiguous, and ALL
    # methods (SVD included) legitimately disagree there
    from lidarreg.core.se3 import quat_to_rotation

    q = rng.normal(size=(2048, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    Rgt = np.asarray(quat_to_rotation(jnp.asarray(q.astype(np.float32))))
    A = jnp.asarray(rng.normal(size=(2048, 8, 3)).astype(np.float32) * 5)
    B = jnp.asarray(
        np.einsum("kij,knj->kni", Rgt, np.asarray(A))
        + rng.normal(size=(2048, 8, 3)) * 0.1
    ).astype(jnp.float32)
    Rq, _ = weighted_kabsch(A, B, method="qcp")
    Rj, _ = weighted_kabsch(A, B, method="jacobi")
    agree = float(jnp.max(rotation_error_deg(Rq, Rj)))
    status = "OK" if agree < 0.1 else "DIVERGED"
    print(f"qcp vs jacobi: max rotation deviation {agree:.4f} deg [{status}]")
    # informational: on TPU, jnp.linalg.svd itself is the INACCURATE one
    # (its iterative lowering deviates by degrees on tail cases while
    # qcp/jacobi agree and attain equal-or-lower objective; verified exact
    # agreement on CPU where SVD is LAPACK)
    Rs, _ = kabsch_svd(A, B)
    err = float(jnp.max(rotation_error_deg(Rq, Rs)))
    print(f"qcp vs jnp-svd ({jax.default_backend()}): max deviation {err:.4f} deg"
          " [informational]")

    # --- speed at hypothesis scale (svd_speed.py analogue) ----------------
    K = args.batch
    A = jnp.asarray(rng.normal(size=(K, 4, 3)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(K, 4, 3)).astype(np.float32))

    for method in ("qcp", "jacobi"):
        f = jax.jit(lambda a, b, m=method: weighted_kabsch(a, b, method=m))
        out = f(A, B)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(A, B)
            jax.tree.map(lambda x: x.block_until_ready(), out)
            ts.append(time.perf_counter() - t0)
        print(f"weighted_kabsch[{method}] {K} x 4pts: {min(ts) * 1000:.1f} ms")

    if jax.default_backend() == "cpu":
        print("(svd timing skipped off-TPU)")
        return
    # jnp SVD at hypothesis scale is not viable on TPU — measured: the QR
    # block inside batched SVD OOMs scoped VMEM at 65k x 3x3 ("Ran out of
    # memory in memory space vmem ... QrDecompositionBlock"). This is the
    # quantitative justification for the QCP/Jacobi design (the reference
    # hit the same wall on GPU and shipped SVD to the CPU,
    # Experiments/models/common.py:36).
    for Ks in (16_384, 65_536):
        try:
            f = jax.jit(lambda a, b: kabsch_svd(a[:Ks], b[:Ks]))
            out = f(A, B)
            jax.tree.map(lambda x: x.block_until_ready(), out)
            t0 = time.perf_counter()
            out = f(A, B)
            jax.tree.map(lambda x: x.block_until_ready(), out)
            dt = time.perf_counter() - t0
            print(f"kabsch_svd {Ks} x 4pts: {dt * 1000:.1f} ms "
                  f"(x{K // Ks} extrapolated: {dt * 1000 * K / Ks:.0f} ms)")
        except Exception as e:  # noqa: BLE001
            print(f"kabsch_svd {Ks} x 4pts: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]}...)")


if __name__ == "__main__":
    main()
