"""OANet — Order-Aware Network baseline for correspondence filtering.

Rebuild of Experiments/models/OANet.py (baseline correspondence classifier
benchmarked alongside PointDSC): PointCN residual blocks with context
normalization, a differentiable-pooling "order-aware" bottleneck (soft
cluster assignment -> cluster-space PointCN -> unpooling), and a final
inlier logit per correspondence + weighted-Kabsch pose.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..core.kabsch import rigid_transform_3d, weighted_kabsch
from ..core.se3 import integrate, transform


class ContextNorm(nn.Module):
    """Normalize each channel across the correspondence axis
    (Experiments/models/common.py:106-115)."""

    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps)


class PointCNBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Dense(self.channels)(x)
        y = ContextNorm()(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels)(y)
        y = ContextNorm()(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        if x.shape[-1] != self.channels:
            x = nn.Dense(self.channels)(x)
        return x + y


class DiffPool(nn.Module):
    """Soft-assignment pooling to `clusters` order-aware nodes."""

    clusters: int

    @nn.compact
    def __call__(self, x):  # [B, N, C] -> ([B, K, C], assign [B, N, K])
        logits = nn.Dense(self.clusters)(x)
        assign = nn.softmax(logits, axis=1)  # normalize over points
        pooled = jnp.einsum("bnk,bnc->bkc", assign, x)
        return pooled, assign


class OANet(nn.Module):
    """Order-aware correspondence classifier (Experiments/models/OANet.py)."""

    num_channels: int = 128
    num_layers: int = 6
    clusters: int = 500
    inlier_threshold: float = 1.2

    @nn.compact
    def __call__(self, data, train: bool = False):
        corr_pos = data["corr_pos"]       # [B, N, 6]
        src = data["src_keypts"]
        tgt = data["tgt_keypts"]

        x = nn.Dense(self.num_channels)(corr_pos)
        for _ in range(self.num_layers // 2):
            x = PointCNBlock(self.num_channels)(x, train)

        pooled, assign = DiffPool(self.clusters)(x)
        y = pooled
        for _ in range(2):
            y = PointCNBlock(self.num_channels)(y, train)
        # unpool: distribute cluster features back to points
        x = x + jnp.einsum("bnk,bkc->bnc", assign, y)

        for _ in range(self.num_layers - self.num_layers // 2):
            x = PointCNBlock(self.num_channels)(x, train)

        logits = nn.Dense(1)(x)[..., 0]   # [B, N]
        weights = nn.relu(nn.tanh(logits))
        trans = rigid_transform_3d(src, tgt, weights)
        if not train:
            trans = self.post_refinement(trans, src, tgt, weights)
        return {"final_trans": trans, "final_labels": logits,
                "weights": weights}

    def post_refinement(self, initial_trans, src_keypts, tgt_keypts, prior):
        """Annealed IRLS over the classifier's inlier prior (eval only).

        One weighted Kabsch over relu(tanh(logits)) cannot survive the
        benchmark operating point: the classifier runs at ~0.4 precision
        on ~25%-inlier correspondence sets, so >half the weighted mass is
        outliers and the direct regression lands meters off (rotation is
        near-correct, translation is not). The reference's own OANet head
        is dead code (Experiments/models/OANet.py:158 returns before it),
        so the eval protocol here follows PointDSC's post_refinement
        (PointDSC.py:403-438) with a GNC-style annealed threshold: start
        at 16x the inlier radius (capturing the meters-off initial pose),
        tighten 2x every other round to 1x, then polish. The classifier
        prior multiplies the Cauchy weight throughout, so the learned
        signal — not geometry alone — steers which consensus basin wins.
        """
        thr_final = self.inlier_threshold

        def body(k, trans):
            # 16x -> 1x over 8 rounds, then 12 polish rounds at 1x
            thr = thr_final * jnp.maximum(2.0 ** (4.0 - 0.5 * k), 1.0)
            warped = transform(src_keypts, trans)
            L2 = jnp.sqrt(
                jnp.sum((warped - tgt_keypts) ** 2, axis=-1) + 1e-12
            )  # [B, N]
            inlier = L2 < thr
            w = prior * (1.0 / (1.0 + (L2 / thr) ** 2)) * inlier
            n_in = jnp.sum(inlier & (prior > 0.0), axis=-1)  # [B]
            R, t = weighted_kabsch(src_keypts, tgt_keypts, w, method="jacobi")
            new = integrate(R, t)
            # keep previous transform for degenerate (<3 inliers) batches
            good = (n_in >= 3)[:, None, None]
            return jnp.where(good, new, trans)

        return lax.fori_loop(0, 20, body, initial_trans)
