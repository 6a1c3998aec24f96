"""Loss library (reference: src/models/simulators.py:141-249).

All losses are pure functions over masked fixed-shape arrays.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def reduction(values: jax.Array, mode: str) -> jax.Array:
    if mode == "sum":
        return jnp.sum(values)
    if mode == "mean":
        return jnp.mean(values)
    if mode == "none":
        return values
    raise NotImplementedError(mode)


def mse_loss(pred: jax.Array, labels: jax.Array, mode: str = "none") -> jax.Array:
    return reduction((pred - labels) ** 2, mode)


def l1_reg_loss(embeddings: jax.Array, weight: float = 1e-3,
                mode: str = "none") -> jax.Array:
    return reduction(weight * jnp.abs(embeddings), mode)


def time_decay_weights(t_len: int, time_decay: float, reverse: bool = False,
                       dtype=jnp.float32) -> jax.Array:
    """Exponential decay weights over the window (simulators.py:186-191)."""
    t = jnp.arange(t_len, dtype=dtype)
    if not reverse:
        return time_decay ** (t_len - t - 1)
    return time_decay ** t


def multiple_rollout_mse_loss(pred: jax.Array, labels: jax.Array,
                              time_decay: float, mode: str = "none",
                              reverse: bool = False) -> jax.Array:
    """Squared error with exponential time decay (simulators.py:172-193).
    pred/labels: (c, t, n, 2)."""
    loss = (pred - labels) ** 2
    decay = time_decay_weights(pred.shape[1], time_decay, reverse, pred.dtype)
    loss = loss * decay.reshape(1, -1, 1, 1)
    return reduction(loss, mode)


def multiple_rollout_collision_avoidance_loss(
    pred: jax.Array, labels: jax.Array, time_decay: float, mode: str = "none"
) -> jax.Array:
    """Error projected perpendicular to each agent's window chord
    (simulators.py:227-249): removes the along-track component so the penalty
    targets lateral avoidance behavior."""
    ni = labels[:, -1:, :, :] - labels[:, 0:1, :, :]
    ni = ni / (jnp.linalg.norm(ni, axis=-1, keepdims=True) + 1e-6)  # c,1,n,2
    pred_perp = pred - jnp.sum(pred * ni, axis=-1, keepdims=True) * ni
    labels_perp = labels - jnp.sum(labels * ni, axis=-1, keepdims=True) * ni
    return multiple_rollout_mse_loss(pred_perp, labels_perp, time_decay, mode)


def multiple_rollout_collision_loss(
    pred: jax.Array, labels: jax.Array, time_decay: float,
    collisions: jax.Array, mode: str = "none",
    abnormal_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Perpendicular loss gated to agents that collided anywhere in the window
    (simulators.py:195-225).  The reference computes an MSE term it then
    discards (simulators.py:215-219) — reproduced by simply not computing it.

    collisions: (c, t, n) per-step contact counts.
    """
    w = (jnp.sum(collisions, axis=1) > 0).astype(pred.dtype)  # c, n
    w = w[:, None, :, None]  # c, 1, n, 1
    focus = multiple_rollout_collision_avoidance_loss(pred, labels, time_decay)
    loss = w * focus
    if abnormal_mask is not None:
        loss = loss * abnormal_mask.reshape(1, 1, -1, 1)
    return reduction(loss, mode)


def binary_cross_entropy(pred: jax.Array, target: jax.Array,
                         mode: str = "sum", eps: float = 1e-7) -> jax.Array:
    """torch.F.binary_cross_entropy on probabilities (clamped for stability)."""
    p = jnp.clip(pred, eps, 1 - eps)
    loss = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
    return reduction(loss, mode)
