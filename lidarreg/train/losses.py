"""Training losses for PointDSC (and shared metrics helpers).

Parity: Experiments/libs/loss.py:12-139 — TransformationLoss (recall/RE/TE +
MSE over predicted-inlier warps), balanced ClassificationLoss (BCE with
pos_weight = #neg/#pos), SpectralMatchingLoss (balanced MSE of the feature
similarity matrix vs the GT inlier outer product). All batched/jittable; the
reference's sklearn precision/recall/f1 side-stats are computed in jnp.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..core.se3 import decompose, transform


def transformation_loss(
    trans: jnp.ndarray,
    gt_trans: jnp.ndarray,
    src_keypts: jnp.ndarray,
    tgt_keypts: jnp.ndarray,
    probs: jnp.ndarray,
    re_thresh_deg: float = 5.0,
    te_thresh_cm: float = 60.0,
) -> Dict[str, jnp.ndarray]:
    """loss.py:12-63. Returns dict(loss, recall_pct, RE_deg, TE_cm, RMSE)."""
    R, t = decompose(trans)
    gt_R, gt_t = decompose(gt_trans)
    tr = jnp.einsum("...ij,...ij->...", R, gt_R, precision="highest")
    re = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)))
    te = jnp.linalg.norm(t - gt_t, axis=-1) * 100.0  # cm
    warped = transform(src_keypts, trans)
    rmse = jnp.mean(jnp.linalg.norm(warped - tgt_keypts, axis=-1), axis=-1)
    success = (te < te_thresh_cm) & (re < re_thresh_deg)

    has_inlier = jnp.sum(probs > 0, axis=-1) >= 1
    mse = jnp.mean(jnp.sum((warped - tgt_keypts) ** 2, axis=-1), axis=-1)
    loss = jnp.where(has_inlier, mse, 0.0)

    return {
        "loss": jnp.mean(loss),
        "recall": jnp.mean(success.astype(jnp.float32)) * 100.0,
        "RE": jnp.mean(re),
        "TE": jnp.mean(te),
        "RMSE": jnp.mean(rmse),
    }


def classification_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, balanced: bool = True
) -> Dict[str, jnp.ndarray]:
    """Balanced BCE on inlier logits (loss.py:66-112)."""
    gt_f = gt.astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(gt_f), 1.0)
    num_neg = jnp.maximum(jnp.sum(1.0 - gt_f), 1.0)

    # BCEWithLogits with optional pos_weight
    log_sig = -jnp.logaddexp(0.0, -pred)       # log(sigmoid(x))
    log_one_minus = -jnp.logaddexp(0.0, pred)  # log(1 - sigmoid(x))
    pos_w = (num_neg / num_pos) if balanced else 1.0
    loss = -(pos_w * gt_f * log_sig + (1.0 - gt_f) * log_one_minus)
    loss = jnp.mean(loss)

    pred_labels = pred > 0
    tp = jnp.sum(pred_labels & (gt > 0))
    precision = tp / jnp.maximum(jnp.sum(pred_labels), 1)
    recall = tp / jnp.maximum(jnp.sum(gt > 0), 1)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    logit_true = jnp.sum(pred * gt_f) / jnp.maximum(jnp.sum(gt_f), 1.0)
    logit_false = jnp.sum(pred * (1 - gt_f)) / jnp.maximum(
        jnp.sum(1 - gt_f), 1.0
    )
    return {
        "loss": loss,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "logit_true": logit_true,
        "logit_false": logit_false,
    }


def spectral_matching_loss(
    M: jnp.ndarray, gt_labels: jnp.ndarray, balanced: bool = True
) -> jnp.ndarray:
    """MSE of similarity matrix vs GT inlier outer product (loss.py:115-139)."""
    gt_M = (
        (gt_labels[:, None, :] + gt_labels[:, :, None]) == 2
    ).astype(jnp.float32)
    n = gt_M.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    gt_M = jnp.where(eye, 0.0, gt_M)
    if balanced:
        pos = jnp.sum((M - 1.0) ** 2 * gt_M, axis=(-2, -1)) / jnp.maximum(
            jnp.sum(gt_M, axis=(-2, -1)), 1.0
        )
        neg = jnp.sum(M**2 * (1.0 - gt_M), axis=(-2, -1)) / jnp.maximum(
            jnp.sum(1.0 - gt_M, axis=(-2, -1)), 1.0
        )
        return jnp.mean(0.5 * pos + 0.5 * neg)
    return jnp.mean((M - gt_M) ** 2)
