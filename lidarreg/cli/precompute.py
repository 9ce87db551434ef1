"""Feature precompute CLI — cal_fcgf/cal_fpfh rebuild.

Exports per-pair npz files (xyz0/xyz1/features0/features1/gt_trans) that the
precomputed datasets consume (lidarreg.data.precomputed), mirroring the
reference's offline descriptor dumps (Experiments/misc/cal_fcgf.py:12-372
process_kitti/process_3dmatch and cal_fpfh.py:7-112).

  python -m lidarreg.cli.precompute --dataset K --descriptor fcgf \\
      [--fcgf_weights_file ckpt.msgpack] [--max_samples N] --out_root DIR
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .test import str2bool


def get_args(argv=None):
    p = argparse.ArgumentParser("lidarreg precompute")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--phase", type=str, default="test")
    p.add_argument("--descriptor", type=str, default="fcgf",
                   choices=["fcgf", "fpfh"])
    p.add_argument("--fcgf_weights_file", type=str, default=None)
    p.add_argument("--synthetic", type=str2bool, default=True)
    p.add_argument("--voxel_size", type=float, default=0.3)
    p.add_argument("--capacity", type=int, default=16384)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--out_root", type=str, required=True)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from ..utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from ..data import make_dataset
    from ..data.pipeline import pad_cloud, prepare_sparse_input
    from ..data.precomputed import export_pair_npz

    ds = make_dataset(args.dataset, phase=args.phase, synthetic=args.synthetic)
    cap = args.capacity
    pt_cap = cap * 4

    if args.descriptor == "fcgf":
        from ..models.fcgf import ResUNetBN2C
        from ..sparse.tensor import SparseTensor

        model = ResUNetBN2C()
        dummy = SparseTensor(jnp.zeros((cap, 3), jnp.int32),
                             jnp.ones((cap, 1)), jnp.ones((cap,), bool), 1)
        if args.fcgf_weights_file:
            from ..utils.checkpoint import load_variables
            variables = load_variables(args.fcgf_weights_file)
        else:
            variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
        apply = jax.jit(lambda x: model.apply(variables, x, train=False))

        def describe(st, xyz):
            out = apply(st)
            return out.feats, out.valid
    else:
        from ..ops.fpfh import fpfh

        radius = args.voxel_size * 3.0  # FPFH radius convention ~3-5x voxel

        def describe(st, xyz):
            f = fpfh(xyz, st.valid, radius, 2 * cap if (cap & (cap - 1)) == 0 else None)
            return f, st.valid

    out_dir = os.path.join(args.out_root, f"{args.descriptor}_{args.phase}")
    os.makedirs(out_dir, exist_ok=True)
    n = len(ds)
    if args.max_samples:
        n = min(n, args.max_samples)
    for i in range(n):
        T, ca, cb = ds.get_pair(i)

        def prep(c):
            pad, m = pad_cloud(c, pt_cap)
            return prepare_sparse_input(jnp.asarray(pad), args.voxel_size,
                                        cap, jnp.int32(m))

        st0, x0 = prep(ca)
        st1, x1 = prep(cb)
        f0, v0 = describe(st0, x0)
        f1, v1 = describe(st1, x1)
        m0 = np.asarray(v0)
        m1 = np.asarray(v1)
        export_pair_npz(
            os.path.join(out_dir, f"pair_{i}.npz"),
            np.asarray(x0)[m0], np.asarray(x1)[m1],
            np.asarray(f0)[m0], np.asarray(f1)[m1],
            T,
        )
        if i % 20 == 0:
            print(f"exported {i}/{n}", flush=True)
    print(f"wrote {n} pairs to {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
