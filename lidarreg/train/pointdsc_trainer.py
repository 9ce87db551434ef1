"""PointDSC trainer: one jitted step, shard_map data parallelism.

Parity target: Experiments/libs/trainer.py:10-292 + train.py:60-146 —
  * ADAM lr 1e-4, weight_decay 1e-6, ExponentialLR gamma 0.99 per epoch
    (config.py:55-59);
  * total loss = 1.0*classification + 1.0*spectral_matching +
    0.0*transformation (config.py:44-46), transformation metrics still
    reported;
  * manual cross-device gradient summation -> here `lax.pmean` inside
    `shard_map` over the `data` mesh axis (trainer.py:143-145);
  * non-finite gradient guard: the step is skipped entirely when any grad
    is NaN/inf on any device (trainer.py:147-155).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.pointdsc import PointDSC
from ..parallel.mesh import DATA_AXIS
from .losses import (
    classification_loss,
    spectral_matching_loss,
    transformation_loss,
)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class PointDSCTrainerConfig(NamedTuple):
    lr: float = 1e-4
    weight_decay: float = 1e-6
    scheduler_gamma: float = 0.99
    steps_per_epoch: int = 250
    weight_classification: float = 1.0
    weight_spectralmatching: float = 1.0
    weight_transformation: float = 0.0
    re_thresh_deg: float = 5.0
    te_thresh_cm: float = 60.0


def make_optimizer(cfg: PointDSCTrainerConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=cfg.steps_per_epoch,
        decay_rate=cfg.scheduler_gamma,
        staircase=True,
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def init_state(
    model: PointDSC,
    cfg: PointDSCTrainerConfig,
    example_batch: Dict[str, jnp.ndarray],
    key: jax.Array,
) -> TrainState:
    variables = model.init(key, example_batch, testing=False, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32))


def _loss_and_metrics(model, cfg, params, batch_stats, batch):
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        {k: batch[k] for k in ("corr_pos", "src_keypts", "tgt_keypts")},
        testing=False,
        train=True,
        mutable=["batch_stats"],
    )
    cls = classification_loss(out["final_labels"], batch["gt_labels"])
    sm = spectral_matching_loss(out["M"], batch["gt_labels"])
    tl = transformation_loss(
        out["final_trans"], batch["gt_trans"],
        batch["src_keypts"], batch["tgt_keypts"], out["final_labels"],
        cfg.re_thresh_deg, cfg.te_thresh_cm,
    )
    loss = (
        cfg.weight_classification * cls["loss"]
        + cfg.weight_spectralmatching * sm
        + cfg.weight_transformation * tl["loss"]
    )
    metrics = {
        "loss": loss,
        "cls_loss": cls["loss"],
        "sm_loss": sm,
        "trans_loss": tl["loss"],
        "precision": cls["precision"],
        "recall_cls": cls["recall"],
        "f1": cls["f1"],
        "reg_recall": tl["recall"],
        "RE": tl["RE"],
        "TE": tl["TE"],
    }
    return loss, (metrics, mutated["batch_stats"])


def make_train_step(model: PointDSC, cfg: PointDSCTrainerConfig, mesh: Mesh | None = None):
    """Build the jitted (optionally data-parallel) train step.

    batch dict fields (leading dim = per-host batch, sharded over `data`):
      corr_pos [B,N,6], src_keypts [B,N,3], tgt_keypts [B,N,3],
      gt_trans [B,4,4], gt_labels [B,N].
    """
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
        # finite-grad guard (trainer.py:147-155): skip the whole step if any
        # gradient element is non-finite on any device.
        finite = jnp.all(
            jnp.asarray(
                [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
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
            step,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
