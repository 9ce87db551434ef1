"""TPU verification driver: exercise the hot library paths on the REAL chip.

1. new hash table: build/lookup roundtrip exactness + flag/retry semantics
   at benchmark scale (bit-30 tricks must survive TPU int32 semantics);
2. kernel_map_stride1 (symmetric halving + packed mirror scatter) ==
   kernel_map, on TPU at 32k;
3. FCGF forward with ones_input fast path: finite, unit-norm features;
4. graph-cut LO native oracle called from the FR register path (GC preset).
"""
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from lidarreg.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
from bench import build_pair
from lidarreg.ops import voxelize_points
from lidarreg.sparse.conv import kernel_map, kernel_map_stride1, table_for
from lidarreg.sparse.hashtable import build_table, lookup
from lidarreg.sparse.tensor import SparseTensor, kernel_offsets

rng = np.random.default_rng(7)
ca, cb, T_gt = build_pair(rng)
CAP = 32768
va = voxelize_points(jnp.asarray(ca), 0.3, CAP)
st = SparseTensor(va.coords, jnp.ones((CAP, 1), jnp.float32), va.valid, 1)

# 1. table roundtrip at benchmark scale
size = 1
while size < 16 * CAP:
    size *= 2
table, placed = jax.jit(lambda c, v: build_table(c, v, size))(
    st.coords, st.valid
)
n_valid = int(st.valid.sum())
assert bool(placed[:n_valid].all()), "TPU: unplaced keys"
rows = np.asarray(jax.jit(lookup)(table, st.coords))
np.testing.assert_array_equal(rows[:n_valid], np.arange(n_valid))
absent = st.coords + jnp.asarray([99991, 3, 7], jnp.int32)
rows_a = np.asarray(jax.jit(lookup)(table, absent))
frac_found = (rows_a[:n_valid] >= 0).mean()
assert frac_found < 0.01, f"absent queries resolving: {frac_found}"
print("1. hash table roundtrip on TPU: OK", flush=True)

# 2. symmetric stride-1 map parity on TPU
offs = kernel_offsets(5, 1, 3)
t1 = jax.jit(table_for)(st)
km_ref = jax.jit(lambda t, v, c: kernel_map(t, v, c, v, offs))(
    t1, st.valid, st.coords
)
km_fast = jax.jit(lambda t, v, c: kernel_map_stride1(t, v, c, offs))(
    t1, st.valid, st.coords
)
np.testing.assert_array_equal(np.asarray(km_ref.hit), np.asarray(km_fast.hit))
nb_r = np.where(np.asarray(km_ref.hit), np.asarray(km_ref.nb), -1)
nb_f = np.where(np.asarray(km_fast.hit), np.asarray(km_fast.nb), -1)
np.testing.assert_array_equal(nb_r, nb_f)
print("2. symmetric kernel map parity on TPU: OK", flush=True)

# 3. FCGF forward, trained weights, ones-input fast path
from lidarreg.models.fcgf import ResUNetBN2C
from lidarreg.utils.checkpoint import load_variables

model = ResUNetBN2C()
params = load_variables("/root/repo/weights/fcgf_synthetic_25ep.msgpack")
F = jax.jit(lambda p, s: model.apply(p, s, train=False))(params, st)
f = np.asarray(F.feats)[:n_valid]
assert np.isfinite(f).all()
np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, atol=2e-2)
print("3. FCGF forward (trained ckpt, fast conv1): OK", flush=True)

# 4. graph-cut LO through the FR register factory (GC preset)
from lidarreg.bench.registration import FRConfig, make_fr_register
from lidarreg.core import registration_success

vb = voxelize_points(jnp.asarray(cb), 0.3, CAP)
xyz0 = jnp.asarray(ca)[va.indices]
xyz1 = jnp.asarray(cb)[vb.indices]
def feats_sur(xyz, key, T=None):
    p = xyz if T is None else (xyz - jnp.asarray(T[:3, 3])) @ jnp.asarray(
        T[:3, :3].astype(np.float32))
    ff = jnp.concatenate([jnp.sin(p * s) for s in (0.11, 0.37, 0.93)], 1)
    ff = ff + jax.random.normal(key, ff.shape) * 0.35
    return ff / jnp.linalg.norm(ff, axis=1, keepdims=True)
F0 = feats_sur(xyz0, jax.random.PRNGKey(0))
F1 = feats_sur(xyz1, jax.random.PRNGKey(1), T_gt)
fr = make_fr_register(FRConfig(iters=20000, refit_iters=0, graph_cut_lo=True))
res = fr(F0, F1, xyz0, xyz1, va.valid, vb.valid, jax.random.PRNGKey(2))
ok, re, te = registration_success(res.transform, jnp.asarray(T_gt))
assert bool(ok), (float(re), float(te))
print(f"4. GC graph-cut LO register: OK (RE={float(re):.3f} TE={float(te)*100:.2f}cm)",
      flush=True)
print("VERIFY: ALL OK", flush=True)
