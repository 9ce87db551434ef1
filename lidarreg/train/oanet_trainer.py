"""OANet trainer: classification + transformation losses under DP shard_map.

The reference benchmarks OANet alongside PointDSC
(Experiments/models/OANet.py) using the shared Trainer loop
(Experiments/libs/trainer.py:10-292); OANet has no spectral-matching head,
so the loss is balanced-BCE + transformation loss only
(libs/loss.py:12-112). Batch protocol matches the PointDSC trainer:
corr_pos [B,N,6], src/tgt_keypts [B,N,3], gt_trans [B,4,4], gt_labels [B,N].
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..models.oanet import OANet
from ..parallel.mesh import DATA_AXIS
from .losses import classification_loss, transformation_loss


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jnp.ndarray


class OANetTrainerConfig(NamedTuple):
    lr: float = 1e-4                 # ADAM 1e-4 (config.py:51-79)
    weight_decay: float = 1e-6
    steps_per_epoch: int = 1000
    gamma: float = 0.99
    weight_classification: float = 1.0
    # reference default: transformation loss is metric-only
    # (Experiments/config.py:46 weight_transformation=0.0; trainer.py:127
    # only adds it when >0). At low inlier ratios a nonzero weight diverges:
    # random early weights -> garbage weighted-Kabsch transforms -> huge
    # trans_loss gradients drown the BCE (seen at 9.7% fcgf inliers,
    # outputs/r3_oanet_fcgf: trans_loss ~2400, reg_recall 0%).
    weight_transformation: float = 0.0
    re_thresh_deg: float = 5.0
    te_thresh_cm: float = 60.0


def make_optimizer(cfg: OANetTrainerConfig) -> optax.GradientTransformation:
    sched = optax.exponential_decay(
        cfg.lr, cfg.steps_per_epoch, cfg.gamma, staircase=True
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.adam(sched),
    )


def init_state(model: OANet, cfg: OANetTrainerConfig, example_batch,
               key) -> TrainState:
    data = {k: example_batch[k]
            for k in ("corr_pos", "src_keypts", "tgt_keypts")}
    variables = model.init(key, data, train=True)
    tx = make_optimizer(cfg)
    return TrainState(
        variables["params"], variables.get("batch_stats", {}),
        tx.init(variables["params"]), jnp.zeros((), jnp.int32),
    )


def _loss_and_metrics(model, cfg, params, batch_stats, batch):
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        {k: batch[k] for k in ("corr_pos", "src_keypts", "tgt_keypts")},
        train=True,
        mutable=["batch_stats"],
    )
    cls = classification_loss(out["final_labels"], batch["gt_labels"])
    tl = transformation_loss(
        out["final_trans"], batch["gt_trans"],
        batch["src_keypts"], batch["tgt_keypts"], out["final_labels"],
        cfg.re_thresh_deg, cfg.te_thresh_cm,
    )
    loss = (
        cfg.weight_classification * cls["loss"]
        + cfg.weight_transformation * tl["loss"]
    )
    metrics = {
        "loss": loss,
        "cls_loss": cls["loss"],
        "trans_loss": tl["loss"],
        "precision": cls["precision"],
        "recall_cls": cls["recall"],
        "f1": cls["f1"],
        "reg_recall": tl["recall"],
        "RE": tl["RE"],
        "TE": tl["TE"],
    }
    return loss, (metrics, mutated["batch_stats"])


def make_train_step(model: OANet, cfg: OANetTrainerConfig, mesh=None):
    """Jitted (optionally data-parallel) train step; finite-grad guarded."""
    tx = make_optimizer(cfg)

    def step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(
            lambda p: _loss_and_metrics(model, cfg, p, state.batch_stats, batch),
            has_aux=True,
        )
        (_, (metrics, new_bs)), grads = grad_fn(state.params)
        if mesh is not None:
            grads = lax.pmean(grads, DATA_AXIS)
            metrics = lax.pmean(metrics, DATA_AXIS)
            new_bs = lax.pmean(new_bs, DATA_AXIS)
        finite = jnp.all(
            jnp.asarray(
                [jnp.all(jnp.isfinite(g))
                 for g in jax.tree_util.tree_leaves(grads)]
            )
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state_new = TrainState(
            jax.tree.map(partial(jnp.where, finite), new_params, state.params),
            new_bs,
            jax.tree.map(partial(jnp.where, finite), new_opt, state.opt_state),
            state.step + 1,
        )
        metrics["grad_finite"] = finite.astype(jnp.float32)
        return state_new, metrics

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
