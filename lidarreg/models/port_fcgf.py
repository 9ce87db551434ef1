"""FCGF `.pth` checkpoint porting: reference torch/ME weights -> flax params.

The reference stores ResUNetBN2C weights as a torch state_dict
(Experiments/datasets/LidarFeatureExtractor.py:71-81 loads
`checkpoint['state_dict']`; FCGF_FAST/net/train_FCGF.py:91-121 saves both a
full `.t7` and an FCGF-compatible `.pth`). Key layout (misc/fcgf.py:229-798):

  conv{1..4}.kernel                 ME conv kernels [K^3, Cin, Cout]
  conv{4..2}_tr.kernel              ME transpose-conv kernels [27, Cin, Cout]
  conv1_tr.kernel / final.kernel    kernel_size=1 convs, stored 2-D [Cin, Cout]
  final.bias                        [1, Cout] (ME bias convention)
  norm*.bn.{weight,bias,running_mean,running_var}   MinkowskiBatchNorm
  block{n}[_tr].conv{1,2}.kernel + .norm{1,2}.bn.*  residual blocks

This module maps that layout onto models.fcgf.ResUNetBN2C's flax tree so a
published checkpoint can be benchmarked without a 400-epoch retrain
(SURVEY.md §7 step 7). ME's kernel-offset enumeration conventions are
pinned NUMERICALLY by the dense ME-semantics oracle
(`models/me_oracle.py` + `tests/test_me_oracle.py`): ME 0.5's
RegionIterator increments coordinate axis 0 innermost (`offset_order`
"xyz"), and transpose convs apply weight j to the input at
`out_coord - off_j` — the reverse of this repo's enumeration — so *_tr
kernels are ported with `transpose_flip=True`. `validate_port`
additionally replays every ported conv kernel through BOTH the repo
sparse-conv engine and the oracle on a toy coordinate set and compares
outputs numerically.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["load_torch_state", "port_fcgf_state", "validate_port"]


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint -> {key: np.ndarray}.

    Accepts a bare state_dict or a dict with 'state_dict' (the reference
    saves {'state_dict': model.state_dict(), ...} — train_FCGF.py:91-121).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    out = {}
    for k, v in blob.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


def _offset_perm(k: int, dim: int, order: str) -> np.ndarray:
    """Permutation taking OUR offset index (z-fastest) to ME's index."""
    if order == "zyx":
        return np.arange(k**dim)
    assert order == "xyz"
    # ours: index = sum over axes ax of (d_ax + r) * k^(dim-1-ax)  (z fastest)
    # ME x-fastest: index = sum of (d_ax + r) * k^ax
    ours = np.arange(k**dim)
    digits = []
    rest = ours.copy()
    for ax in range(dim):          # digit for axis ax in OUR encoding
        p = k ** (dim - 1 - ax)
        digits.append(rest // p)
        rest = rest % p
    me = np.zeros_like(ours)
    for ax, d in enumerate(digits):
        me += d * (k ** ax)
    return me


def _conv_kernel(w: np.ndarray, num_offsets: int, dim: int,
                 order: str, flip: bool) -> np.ndarray:
    """ME kernel -> [J, Cin, Cout] in this repo's offset enumeration."""
    if w.ndim == 2:                # kernel_size=1 convs are stored 2-D
        assert num_offsets == 1
        return w[None]
    assert w.shape[0] == num_offsets, (w.shape, num_offsets)
    k = round(num_offsets ** (1.0 / dim))
    perm = _offset_perm(k, dim, order)
    w = w[perm]
    if flip:
        w = w[::-1]
    return np.ascontiguousarray(w)


def _bn(state: Dict[str, np.ndarray], prefix: str):
    return (
        {"scale": state[f"{prefix}.bn.weight"],
         "bias": state[f"{prefix}.bn.bias"]},
        {"mean": state[f"{prefix}.bn.running_mean"],
         "var": state[f"{prefix}.bn.running_var"]},
    )


def port_fcgf_state(
    state: Dict[str, np.ndarray],
    conv1_kernel_size: int = 5,
    dim: int = 3,
    offset_order: str = "xyz",
    transpose_flip: bool = True,
) -> dict:
    """torch state_dict -> flax variables {'params': ..., 'batch_stats': ...}.

    Drop-in for `model.apply(variables, ...)` with models.fcgf.ResUNetBN2C.
    """
    params: dict = {}
    stats: dict = {}

    def conv(name, me_name, j, flip=False):
        params[name] = {
            "kernel": _conv_kernel(state[f"{me_name}.kernel"], j, dim,
                                   offset_order, flip)
        }
        if f"{me_name}.bias" in state:
            params[name]["bias"] = state[f"{me_name}.bias"].reshape(-1)

    def norm(name, me_name):
        p, s = _bn(state, me_name)
        params[name] = p
        stats[name] = s

    def block(name, me_name, j):
        p1 = {"kernel": _conv_kernel(state[f"{me_name}.conv1.kernel"], j,
                                     dim, offset_order, False)}
        p2 = {"kernel": _conv_kernel(state[f"{me_name}.conv2.kernel"], j,
                                     dim, offset_order, False)}
        n1p, n1s = _bn(state, f"{me_name}.norm1")
        n2p, n2s = _bn(state, f"{me_name}.norm2")
        params[name] = {"conv1": p1, "conv2": p2, "norm1": n1p, "norm2": n2p}
        stats[name] = {"norm1": n1s, "norm2": n2s}

    j3 = 3 ** dim
    conv("conv1", "conv1", conv1_kernel_size ** dim)
    norm("norm1", "norm1")
    block("block1", "block1", j3)
    for lvl in (2, 3, 4):
        conv(f"conv{lvl}", f"conv{lvl}", j3)
        norm(f"norm{lvl}", f"norm{lvl}")
        block(f"block{lvl}", f"block{lvl}", j3)
    for lvl in (4, 3, 2):
        conv(f"conv{lvl}_tr", f"conv{lvl}_tr", j3, flip=transpose_flip)
        norm(f"norm{lvl}_tr", f"norm{lvl}_tr")
        block(f"block{lvl}_tr", f"block{lvl}_tr", j3)
    conv("conv1_tr", "conv1_tr", 1)
    conv("final", "final", 1)

    return {"params": params, "batch_stats": stats}


def validate_port(
    variables: dict,
    model,
    state: Dict[str, np.ndarray] | None = None,
    transpose_flip: bool = True,
    atol: float = 1e-4,
) -> list[str]:
    """Validate the ported tree structurally AND numerically.

    Structural pass: every leaf of a freshly-initialized model exists in the
    ported tree with the same shape. Numeric pass (when the original torch
    `state` is given): every K>1 conv kernel in `state` is replayed through
    the repo sparse-conv engine (with the ported weights) and through the
    dense ME-semantics oracle (`me_oracle`, with the original weights) on a
    toy coordinate set; outputs must agree to `atol`. Returns a list of
    mismatch descriptions (empty = valid).
    """
    import jax
    import jax.numpy as jnp

    from ..sparse.tensor import SparseTensor

    coords = jnp.asarray(np.mgrid[0:8, 0:8, 0:4].reshape(3, -1).T,
                         jnp.int32)
    cap = coords.shape[0]
    x = SparseTensor(coords, jnp.ones((cap, model.in_channels), jnp.float32),
                     jnp.ones((cap,), bool), 1)
    ref = model.init(jax.random.PRNGKey(0), x, train=False)
    problems = []

    def flat(tree):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p): l for p, l in leaves}

    flat_ref = flat(ref)
    flat_got = flat(jax.tree_util.tree_map(jnp.asarray, variables))
    for key, leaf in flat_ref.items():
        if key not in flat_got:
            problems.append(f"missing {key}")
        elif tuple(flat_got[key].shape) != tuple(leaf.shape):
            problems.append(
                f"shape {key}: got {tuple(flat_got[key].shape)} "
                f"want {tuple(leaf.shape)}"
            )
    for key in flat_got:
        if key not in flat_ref:
            problems.append(f"unexpected {key}")

    if state is None or problems:
        return problems

    from ..sparse.conv import sparse_conv, sparse_conv_transpose
    from ..sparse.tensor import downsample_coords
    from .me_oracle import me_conv_dense, me_conv_transpose_dense

    rng = np.random.default_rng(0)
    toy = np.asarray(coords)
    n = len(toy)

    def repo_tensor(feats, stride=1, c=None, v=None):
        return SparseTensor(
            coords if c is None else c,
            jnp.asarray(feats),
            jnp.ones((cap,), bool) if v is None else v,
            stride,
        )

    for me_name, w in state.items():
        if not me_name.endswith(".kernel") or w.ndim != 3:
            continue
        j, cin, _ = w.shape
        k = round(j ** (1.0 / 3))
        if k**3 != j:
            continue
        feats = rng.standard_normal((n, cin)).astype(np.float32)
        is_tr = ".conv" not in me_name and me_name.endswith("_tr.kernel")
        if is_tr:
            ported = jnp.asarray(_conv_kernel(w, j, 3, "xyz", transpose_flip))
            c2, v2 = downsample_coords(coords, jnp.ones((cap,), bool), 1, cap)
            n2 = int(np.asarray(v2).sum())
            f2 = np.zeros((cap, cin), np.float32)
            f2[:n2] = feats[:n2]
            got = sparse_conv_transpose(
                repo_tensor(f2, 2, c2, v2), ported, k,
                out_coords=coords, out_valid=jnp.ones((cap,), bool),
                out_stride=1,
            )
            want = me_conv_transpose_dense(
                np.asarray(c2)[:n2], feats[:n2], toy, w, k, units=1
            )
        else:
            ported = jnp.asarray(_conv_kernel(w, j, 3, "xyz", False))
            got = sparse_conv(repo_tensor(feats), ported, k)
            want = me_conv_dense(toy, feats, toy, w, k, units=1)
        err = float(np.abs(np.asarray(got.feats)[: len(want)] - want).max())
        if err > atol:
            problems.append(f"numeric {me_name}: max err {err:.2e}")
    return problems


def main(argv=None):
    """`python -m lidarreg.models.port_fcgf IN.pth OUT.msgpack` — one-step
    migration of a reference FCGF checkpoint (the reference loads these at
    Experiments/datasets/LidarFeatureExtractor.py:71-81)."""
    import argparse

    from ..utils.checkpoint import save_variables

    p = argparse.ArgumentParser("lidarreg port_fcgf")
    p.add_argument("pth", help="reference .pth checkpoint (torch state_dict)")
    p.add_argument("out", help="output .msgpack variables file")
    p.add_argument("--conv1_kernel_size", type=int, default=5)
    p.add_argument("--no_validate", action="store_true")
    args = p.parse_args(argv)

    state = load_torch_state(args.pth)
    variables = port_fcgf_state(
        state, conv1_kernel_size=args.conv1_kernel_size
    )
    if not args.no_validate:
        from .fcgf import ResUNetBN2C

        model = ResUNetBN2C(conv1_kernel_size=args.conv1_kernel_size)
        problems = validate_port(variables, model, state=state)
        for msg in problems:
            print(f"WARN {msg}")
        if problems:
            raise SystemExit(f"{len(problems)} validation problems")
    save_variables(args.out, variables,
                   config={"ported_from": args.pth,
                           "conv1_kernel_size": args.conv1_kernel_size})
    print(f"ported {args.pth} -> {args.out}")


if __name__ == "__main__":
    main()
