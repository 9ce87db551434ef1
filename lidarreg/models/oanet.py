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

from ..core.kabsch import rigid_transform_3d


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
        return {"final_trans": trans, "final_labels": logits,
                "weights": weights}
