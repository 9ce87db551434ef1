"""Pin port_fcgf's (offset_order, transpose_flip) against the ME oracle.

VERDICT r2 item 4: the ME kernel-offset enumeration ambiguity documented in
`models/port_fcgf.py` is resolved numerically — the dense ME-semantics
oracle (`models/me_oracle.py`) is run against the repo's hash-table sparse
conv under all four porting conventions; exactly one combination matches,
and it must be the port's default.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from lidarreg.models.me_oracle import (  # noqa: E402
    me_conv_dense,
    me_conv_transpose_dense,
)
from lidarreg.models.port_fcgf import _conv_kernel  # noqa: E402
from lidarreg.sparse.conv import (  # noqa: E402
    invert_kernel_map,
    kernel_map,
    sparse_conv,
    sparse_conv_transpose,
    table_for,
)
from lidarreg.sparse.tensor import (  # noqa: E402
    SparseTensor,
    downsample_coords,
    kernel_offsets,
)

K, CIN, COUT = 3, 4, 5
J = K**3


def _toy(seed=0, n_grid=6, keep=0.5):
    rng = np.random.default_rng(seed)
    grid = np.stack(np.meshgrid(*([np.arange(n_grid)] * 3), indexing="ij"),
                    -1).reshape(-1, 3)
    sel = rng.random(len(grid)) < keep
    coords = grid[sel].astype(np.int32)
    feats = rng.standard_normal((len(coords), CIN)).astype(np.float32)
    w_me = rng.standard_normal((J, CIN, COUT)).astype(np.float32)
    return coords, feats, w_me


def _repo_tensor(coords, feats, pad=8):
    cap = len(coords) + pad
    c = np.zeros((cap, 3), np.int32)
    c[: len(coords)] = coords
    f = np.zeros((cap, feats.shape[1]), np.float32)
    f[: len(coords)] = feats
    v = np.arange(cap) < len(coords)
    return SparseTensor(jnp.asarray(c), jnp.asarray(f), jnp.asarray(v), 1)


def _ported(w_me, order, flip):
    return jnp.asarray(_conv_kernel(w_me, J, 3, order, flip))


def test_stride1_conv_offset_order():
    coords, feats, w_me = _toy()
    x = _repo_tensor(coords, feats)
    want = me_conv_dense(coords, feats, coords, w_me, K)

    matches = {}
    for order in ("xyz", "zyx"):
        out = sparse_conv(x, _ported(w_me, order, False), K)
        got = np.asarray(out.feats)[: len(coords)]
        matches[order] = np.allclose(got, want, atol=1e-4)
    assert matches == {"xyz": True, "zyx": False}, matches


def test_stride2_down_conv_offset_order():
    coords, feats, w_me = _toy(seed=1)
    x = _repo_tensor(coords, feats)
    c2, v2 = downsample_coords(x.coords, x.valid, 1, x.capacity)
    n2 = int(np.asarray(v2).sum())
    coords2 = np.asarray(c2)[:n2]
    want = me_conv_dense(coords, feats, coords2, w_me, K, units=1)

    for order, expect in (("xyz", True), ("zyx", False)):
        out = sparse_conv(x, _ported(w_me, order, False), K, stride=2)
        got = np.asarray(out.feats)[:n2]
        assert np.allclose(got, want, atol=1e-4) == expect, order


def test_transpose_conv_flip():
    coords, feats, w_me = _toy(seed=2)
    x = _repo_tensor(coords, feats)
    # coarse set + coarse features living on it
    c2, v2 = downsample_coords(x.coords, x.valid, 1, x.capacity)
    n2 = int(np.asarray(v2).sum())
    coords2 = np.asarray(c2)[:n2]
    rng = np.random.default_rng(3)
    feats2 = rng.standard_normal((n2, CIN)).astype(np.float32)
    f2 = np.zeros((x.capacity, CIN), np.float32)
    f2[:n2] = feats2
    coarse = SparseTensor(c2, jnp.asarray(f2), v2, 2)

    want = me_conv_transpose_dense(
        coords2, feats2, coords, w_me, K, units=1
    )

    matches = {}
    for flip in (False, True):
        out = sparse_conv_transpose(
            coarse, _ported(w_me, "xyz", flip), K,
            out_coords=x.coords, out_valid=x.valid, out_stride=1,
        )
        got = np.asarray(out.feats)[: len(coords)]
        matches[flip] = np.allclose(got, want, atol=1e-4)
    assert matches == {False: False, True: True}, matches


def test_inverted_map_matches_direct_transpose():
    """invert_kernel_map (the fast path used by the U-Net) == direct lookup."""
    coords, feats, w_me = _toy(seed=4)
    x = _repo_tensor(coords, feats)
    c2, v2 = downsample_coords(x.coords, x.valid, 1, x.capacity)
    t1 = table_for(x)
    km_down = kernel_map(t1, x.valid, c2, v2, kernel_offsets(3, 1, 3))
    km_up = invert_kernel_map(km_down, x.capacity)

    n2 = int(np.asarray(v2).sum())
    rng = np.random.default_rng(5)
    f2 = np.zeros((x.capacity, CIN), np.float32)
    f2[:n2] = rng.standard_normal((n2, CIN)).astype(np.float32)
    coarse = SparseTensor(c2, jnp.asarray(f2), v2, 2)

    w = _ported(w_me, "xyz", True)
    direct = sparse_conv_transpose(
        coarse, w, K, out_coords=x.coords, out_valid=x.valid, out_stride=1
    )
    via_invert = sparse_conv_transpose(
        coarse, w, K, out_coords=x.coords, out_valid=x.valid, out_stride=1,
        kmap=km_up,
    )
    assert np.allclose(
        np.asarray(direct.feats), np.asarray(via_invert.feats), atol=1e-5
    )


def test_port_defaults_are_the_winning_convention():
    import inspect

    from lidarreg.models.port_fcgf import port_fcgf_state

    sig = inspect.signature(port_fcgf_state)
    assert sig.parameters["offset_order"].default == "xyz"
    assert sig.parameters["transpose_flip"].default is True
