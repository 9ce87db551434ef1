"""Diagnose the FCGF matchability collapse (BASELINE.md round-3 section).

For a sweep of checkpoints (per-epoch saves retained in outputs/r3_fcgf*),
measure on one synthetic validation pair:
  * NN inlier ratio with train=False (running BatchNorm stats — the
    deployment path used by cli.test / FeaturePipeline);
  * NN inlier ratio with train=True (batch statistics — what the training
    loss actually sees); a large gap implicates running-stats drift;
  * feature effective rank (participation ratio of the covariance
    spectrum) over valid voxels — a collapse signature independent of NN.

Also prints the random-init architecture prior as the floor.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidarreg.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from lidarreg.data.adapters import make_dataset
from lidarreg.data.pipeline import pad_cloud, prepare_pair_sparse_input
from lidarreg.models.fcgf import ResUNetBN2C
from lidarreg.ops.knn import find_nn
from lidarreg.utils.checkpoint import load_variables
from lidarreg.core.se3 import transform

CAP = 32768
PCAP = 131072
VOX = 0.3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="outputs/r3_fcgf_distinct")
    ap.add_argument("--epochs", default="0,1,2,4,8,16,32,64,99")
    ap.add_argument("--extra", default="weights/fcgf_synthetic_600steps.msgpack,weights/fcgf_synthetic_25ep.msgpack")
    ap.add_argument("--pair", type=int, default=0)
    args = ap.parse_args()

    ds = make_dataset("A", phase="validation", synthetic=True)
    T_gt, cloud_a, cloud_b = ds.get_pair(args.pair)
    pad_a, na = pad_cloud(cloud_a, PCAP)
    pad_b, nb = pad_cloud(cloud_b, PCAP)
    st, xyz_a, xyz_b = prepare_pair_sparse_input(
        jnp.asarray(pad_a), jnp.asarray(pad_b), VOX, CAP,
        jnp.int32(na), jnp.int32(nb),
    )
    T_gt = jnp.asarray(T_gt.astype(np.float32))

    model = ResUNetBN2C()

    fwd_eval = jax.jit(lambda v, s: model.apply(v, s, train=False))

    @jax.jit
    def fwd_train(v, s):
        out, _ = model.apply(v, s, train=True, mutable=["batch_stats"])
        return out

    @jax.jit
    def stats(F0, m0, F1, m1, xa, xb):
        # NN inlier ratio: each valid source voxel -> feature NN among valid
        # targets; inlier if GT-aligned spatial distance < 2*voxel (0.6 m)
        nn = find_nn(F0, F1, mask1=m1)
        warped = transform(xa, T_gt)
        d = jnp.sqrt(jnp.sum((warped - xb[nn.idx]) ** 2, axis=1))
        inl = jnp.sum((d < 0.6) & m0) / jnp.maximum(jnp.sum(m0), 1)
        # effective rank of valid-voxel features (participation ratio)
        mu = jnp.sum(F0 * m0[:, None], 0) / jnp.maximum(jnp.sum(m0), 1)
        X = (F0 - mu) * m0[:, None]
        C = X.T @ X
        ev = jnp.linalg.eigvalsh(C)
        ev = jnp.maximum(ev, 0.0)
        erank = jnp.sum(ev) ** 2 / jnp.maximum(jnp.sum(ev**2), 1e-12)
        # mean feature norm (normalize_feature=True -> should be 1)
        nrm = jnp.sum(jnp.sqrt(jnp.sum(F0**2, 1)) * m0) / jnp.maximum(
            jnp.sum(m0), 1)
        return inl, erank, nrm

    def probe(variables, label):
        for mode, fwd in (("eval", fwd_eval), ("train", fwd_train)):
            out = fwd(variables, st)
            F0, m0 = out.feats[:CAP], out.valid[:CAP]
            F1, m1 = out.feats[CAP:], out.valid[CAP:]
            inl, erank, nrm = stats(F0, m0, F1, m1, xyz_a, xyz_b)
            print(f"{label:42s} {mode:5s} inlier={float(inl)*100:6.2f}% "
                  f"erank={float(erank):5.1f} norm={float(nrm):.3f}",
                  flush=True)

    # random-init floor
    var0 = model.init(jax.random.PRNGKey(0), st, train=False)
    probe(var0, "random-init")

    for p in args.extra.split(","):
        if p and os.path.exists(p):
            probe(load_variables(p), os.path.basename(p))

    for e in args.epochs.split(","):
        p = os.path.join(args.ckpt_dir, f"model_{e}.msgpack")
        if os.path.exists(p):
            probe(load_variables(p), f"{os.path.basename(args.ckpt_dir)}/ep{e}")
    print("done", flush=True)


if __name__ == "__main__":
    main()
