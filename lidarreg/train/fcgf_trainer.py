"""FCGF trainer: hardest-contrastive metric learning (JAX, shard_map DP).

Parity target: FCGF_FAST/net/train_FCGF.py —
  * positive pairs: sample NUM_POS=1024 source voxels, pair each with target
    voxels within PAIR_SEARCH_VOXEL_SIZE = 4*voxel = 1.2 m after GT
    alignment (:145-192; static-shape variant keeps each sampled source's
    NEAREST in-radius target instead of enumerating all in-radius pairs and
    re-subsampling — same support, deterministic count);
  * hardest-negative mining over random 256-per-sample candidate sets, both
    directions, with the GT-distance validity check (:194-255);
  * losses: pos = mean relu(|f_p - f_q|^2 - POS_THRESH(0.1)),
    neg = 0.5 * (mean relu(NEG_THRESH(1.4) - d_hardest)^2 per direction);
  * SGD lr 0.1 / momentum 0.8 / weight_decay 1e-4, ExponentialLR 0.995
    (train.py:19-25, net/train_FCGF.py:65-72);
  * cross-device grad summation -> lax.pmean under shard_map (:137-143,
    280-283); per-device batch = 1 pair, global batch = mesh size.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.se3 import transform
from ..parallel.mesh import DATA_AXIS
from ..sparse.tensor import SparseTensor


class FCGFTrainerConfig(NamedTuple):
    lr: float = 0.1
    momentum: float = 0.8
    weight_decay: float = 1e-4
    scheduler_gamma: float = 0.995
    steps_per_epoch: int = 100
    num_pos: int = 1024                   # NUM_POS
    neg_search: int = 256                 # NEG_SEARCH_SET_SIZE_PER_SAMPLE
    pos_thresh: float = 0.1               # POS_THRESH (squared-distance units)
    neg_thresh: float = 1.4               # NEG_THRESH
    pair_search_dist: float = 1.2         # PAIR_SEARCH_VOXEL_SIZE (4 * 0.3)


class FCGFTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: FCGFTrainerConfig):
    schedule = optax.exponential_decay(
        cfg.lr, cfg.steps_per_epoch, cfg.scheduler_gamma, staircase=True
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum),
        optax.scale_by_learning_rate(schedule),
    )


def _rand_rows(key, valid, n):
    """n random valid row indices (with replacement; candidate sets).

    Keys for the shuffle and the picks must be independent: with threefry,
    uniform(key, (n,)) is a prefix of uniform(key, (V,)), so reusing one key
    couples each pick to the variate that positioned that row in the sort.
    """
    k_sort, k_pick = jax.random.split(key)
    order = jnp.argsort(
        jax.random.uniform(k_sort, valid.shape) + (~valid) * 1e3
    )
    count = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    pick = jnp.floor(
        jax.random.uniform(k_pick, (n,)) * count
    ).astype(jnp.int32)
    return order.astype(jnp.int32)[pick]


def _chunked_min_featdist(src_feat, cand_feat, chunk=512):
    """argmin_j |src_i - cand_j| over candidates; [Np] -> (idx, dist)."""
    sq_c = jnp.sum(cand_feat * cand_feat, axis=1)

    def one(chunk_feats):
        d2 = (
            jnp.sum(chunk_feats * chunk_feats, axis=1, keepdims=True)
            + sq_c[None]
            - 2.0 * jnp.dot(chunk_feats, cand_feat.T,
                            preferred_element_type=jnp.float32)
        )
        d2 = jnp.maximum(d2, 1e-12)  # sqrt grad stays bounded
        idx = jnp.argmin(d2, axis=1)
        return idx.astype(jnp.int32), jnp.sqrt(
            jnp.take_along_axis(d2, idx[:, None], 1)[:, 0]
        )

    n = src_feat.shape[0]
    pad = (-n) % chunk
    srcp = jnp.pad(src_feat, ((0, pad), (0, 0)))
    idx, dist = lax.map(one, srcp.reshape(-1, chunk, src_feat.shape[1]))
    return idx.reshape(-1)[:n], dist.reshape(-1)[:n]


def hardest_contrastive_loss(
    cfg: FCGFTrainerConfig,
    key,
    F0, xyz0_rot, v0,      # source features / GT-aligned coords / valid
    F1, xyz1, v1,
):
    """Positive + hardest-negative losses for one pair (train_FCGF.py:145-255)."""
    k_pos, k_n0, k_n1 = jax.random.split(key, 3)

    # ---- positives: sampled sources paired to nearest in-radius target ----
    pos_src = _rand_rows(k_pos, v0, cfg.num_pos)
    ps_xyz = xyz0_rot[pos_src]
    ps_feat = F0[pos_src]
    # nearest TARGET IN SPACE (gt-aligned) for each sampled source
    d2 = (
        jnp.sum(ps_xyz * ps_xyz, 1, keepdims=True)
        + jnp.sum(xyz1 * xyz1, 1)[None]
        - 2.0 * jnp.dot(ps_xyz, xyz1.T, precision="highest",
                        preferred_element_type=jnp.float32)
    )
    d2 = jnp.where(v1[None, :], d2, jnp.inf)
    tgt = jnp.argmin(d2, axis=1).astype(jnp.int32)
    tgt_d2 = jnp.take_along_axis(d2, tgt[:, None], 1)[:, 0]
    pos_ok = (tgt_d2 < cfg.pair_search_dist**2) & v0[pos_src]
    qt_feat = F1[tgt]
    qt_xyz = xyz1[tgt]

    pos_sq = jnp.sum((ps_feat - qt_feat) ** 2, axis=1)
    pos_loss = jnp.sum(
        jnp.maximum(pos_sq - cfg.pos_thresh, 0.0) * pos_ok
    ) / jnp.maximum(jnp.sum(pos_ok), 1)

    # ---- hardest negatives over random candidate sets --------------------
    def neg_loss(kn, s_xyz, s_feat, s_ok, cand_xyz, cand_feat, cand_valid):
        cand = _rand_rows(kn, cand_valid, cfg.neg_search)
        cf = cand_feat[cand]
        cx = cand_xyz[cand]
        idx, d = _chunked_min_featdist(s_feat, cf)
        pair_d2 = jnp.sum((s_xyz - cx[idx]) ** 2, axis=1)
        ok = (pair_d2 >= cfg.pair_search_dist**2) & s_ok
        l = jnp.maximum(cfg.neg_thresh - d, 0.0) ** 2
        return jnp.sum(l * ok) / jnp.maximum(jnp.sum(ok), 1)

    ln0 = neg_loss(k_n0, ps_xyz, ps_feat, pos_ok, xyz1, F1, v1)
    ln1 = neg_loss(k_n1, qt_xyz, qt_feat, pos_ok, xyz0_rot, F0, v0)
    negative = 0.5 * (ln0 + ln1)
    return pos_loss, negative, jnp.sum(pos_ok)


def init_state(model, cfg: FCGFTrainerConfig, example: SparseTensor, key):
    variables = model.init(key, example, train=False)
    tx = make_optimizer(cfg)
    return FCGFTrainState(
        variables["params"],
        variables.get("batch_stats", {}),
        tx.init(variables["params"]),
        jnp.zeros((), jnp.int32),
    )


def make_train_step(model, cfg: FCGFTrainerConfig, mesh: Mesh | None = None):
    """Jitted FCGF step. Per-device batch: one pair.

    batch dict: st0/st1 (SparseTensor), xyz0/xyz1 [V,3], T_gt [4,4], key.
    Under a mesh, every leaf carries a leading device-batch axis of size
    mesh.size and is sharded over DATA_AXIS.
    """
    tx = make_optimizer(cfg)

    def loss_fn(params, batch_stats, batch):
        def run(st):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                st, train=True, mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]

        out0, bs0 = run(batch["st0"])
        out1, bs1 = run(batch["st1"])
        xyz0_rot = transform(batch["xyz0"], batch["T_gt"])
        pos, neg, npos = hardest_contrastive_loss(
            cfg, batch["key"],
            out0.feats, xyz0_rot, out0.valid,
            out1.feats, batch["xyz1"], out1.valid,
        )
        new_bs = jax.tree.map(lambda a, b: 0.5 * (a + b), bs0, bs1)
        metrics = {"loss": pos + neg, "pos_loss": pos, "neg_loss": neg,
                   "num_pos": npos.astype(jnp.float32)}
        return pos + neg, (metrics, new_bs)

    def step(state: FCGFTrainState, batch):
        if mesh is not None:
            batch = jax.tree.map(lambda x: x[0], batch)  # per-device slice
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        if mesh is not None:
            grads = lax.pmean(grads, DATA_AXIS)
            metrics = lax.pmean(metrics, DATA_AXIS)
            new_bs = lax.pmean(new_bs, DATA_AXIS)
        finite = jnp.all(
            jnp.asarray([
                jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
            ])
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        pick = partial(jnp.where, finite)
        new_state = FCGFTrainState(
            jax.tree.map(pick, new_params, state.params),
            new_bs,
            jax.tree.map(pick, new_opt, state.opt_state),
            state.step + 1,
        )
        metrics["grad_finite"] = finite.astype(jnp.float32)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        shard_map(
            step, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
