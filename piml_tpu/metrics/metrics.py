"""Evaluation metrics: masked MAE, Sinkhorn OT, multi-kernel MMD, collisions.

Reference: src/functions/metrics.py.  The reference loops over frames in
Python and calls a torch Sinkhorn with data-dependent point counts; here both
OT and MMD are masked fixed-shape kernels vmapped over frames so the whole
metric suite jits (padded marginals carry zero mass).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from piml_tpu.physics import collision_detection


def collision_count(position: jax.Array, threshold: float,
                    real_position: Optional[jax.Array] = None,
                    mode: str = "sum") -> jax.Array:
    """Contact count with friends filtering (reference: metrics.py:16-26)."""
    coll = collision_detection(position, threshold, real_position)
    if mode == "sum":
        return jnp.sum(coll)
    if mode == "mean":
        return jnp.mean(coll)
    return coll


def mae_with_time_mask(p: jax.Array, q: jax.Array, mask: jax.Array,
                       mode: str = "mean") -> jax.Array:
    """Masked mean/sum of per-agent L2 displacement error
    (reference: metrics.py:29-42)."""
    err = jnp.linalg.norm(jnp.where(mask[..., None] == 1, p - q, 0.0), axis=-1)
    total = jnp.sum(err)
    if mode == "sum":
        return total
    count = jnp.maximum(jnp.sum(mask == 1), 1)
    return total / count


# ---------------------------------------------------------------------------
# Sinkhorn OT
# ---------------------------------------------------------------------------

def _masked_cost(x, y, mask_x, mask_y, pad_cost=0.0):
    """|x_i - y_j|^2 cost with padded rows/cols set to ``pad_cost``."""
    c = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    valid = mask_x[:, None] * mask_y[None, :]
    return jnp.where(valid == 1, c, pad_cost)


def sinkhorn_masked(
    x: jax.Array, y: jax.Array, mask_x: jax.Array, mask_y: jax.Array,
    eps: float = 0.1, max_iter: int = 100, thresh: float = 1e-1,
) -> jax.Array:
    """Entropic OT between masked point clouds (reference: metrics.py:107-203).

    Log-domain updates identical to the reference, with padded marginals of
    zero mass (``mu = 1/n`` on valid points).  Stops at ``max_iter`` or when
    the mean |Δu| falls below ``thresh`` — matched via ``lax.while_loop`` so a
    whole trajectory of frames can be vmapped.
    """
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    y = jnp.where(jnp.isfinite(y), y, 0.0)
    C = _masked_cost(x, y, mask_x, mask_y)
    nx = jnp.maximum(jnp.sum(mask_x), 1.0)
    ny = jnp.maximum(jnp.sum(mask_y), 1.0)
    mu = mask_x / nx
    nu = mask_y / ny

    # -inf potential on padded points keeps them out of the logsumexp
    neg_big = -1e9

    def M(u, v):
        m = (-C + u[:, None] + v[None, :]) / eps
        valid = (mask_x[:, None] * mask_y[None, :]) == 1
        return jnp.where(valid, m, neg_big)

    def cond(carry):
        u, v, err, it = carry
        return (err >= thresh) & (it < max_iter)

    def body(carry):
        u, v, _, it = carry
        u1 = u
        u = eps * (jnp.log(mu + 1e-8) - jax.scipy.special.logsumexp(M(u, v), axis=-1)) + u
        v = eps * (jnp.log(nu + 1e-8) - jax.scipy.special.logsumexp(M(u, v), axis=-2)) + v
        err = jnp.mean(jnp.sum(jnp.abs((u - u1) * mask_x), axis=-1) / 1.0)
        return u, v, err, it + 1

    u0 = jnp.zeros_like(mu)
    v0 = jnp.zeros_like(nu)
    u, v, _, _ = jax.lax.while_loop(cond, body, (u0, v0, jnp.inf, 0))
    pi = jnp.exp(M(u, v)) * (mask_x[:, None] * mask_y[None, :])
    return jnp.sum(pi * C)


@partial(jax.jit, static_argnames=("mode",))
def ot_with_time_mask(p: jax.Array, q: jax.Array, mask: jax.Array,
                      mode: str = "mean") -> jax.Array:
    """Per-frame Sinkhorn OT between predicted and real crowds
    (reference: metrics.py:45-67).  Frames with ≤1 present agent are skipped.

    p/q: (t, N, 2) (leading channel axes must be reshaped in by the caller);
    mask: (t, N).
    """
    per_frame = jax.vmap(
        lambda xp, xq, m: sinkhorn_masked(xp, xq, m, m)
    )(p, q, (mask == 1).astype(p.dtype))
    active = jnp.sum(mask == 1, axis=-1) > 1
    per_frame = jnp.where(active, per_frame, 0.0)
    if mode == "sum":
        return jnp.sum(per_frame)
    return jnp.sum(per_frame) / jnp.maximum(jnp.sum(active), 1)


# ---------------------------------------------------------------------------
# MMD
# ---------------------------------------------------------------------------

def mmd_masked(source: jax.Array, target: jax.Array, mask_s: jax.Array,
               mask_t: jax.Array, kernel_mul: float = 2.0,
               kernel_num: int = 5) -> jax.Array:
    """Multi-kernel Gaussian MMD between masked point sets
    (reference: metrics.py:207-273).  Bandwidth = mean pairwise L2 over valid
    pairs, spread over ``kernel_num`` scales."""
    source = jnp.where(jnp.isfinite(source), source, 0.0)
    target = jnp.where(jnp.isfinite(target), target, 0.0)
    total = jnp.concatenate([source, target], axis=0)
    mask = jnp.concatenate([mask_s, mask_t], axis=0)
    valid = mask[:, None] * mask[None, :]

    l2 = jnp.sum((total[:, None, :] - total[None, :, :]) ** 2, axis=-1)
    l2 = l2 * valid
    n_samples = jnp.maximum(jnp.sum(mask), 2.0)
    bandwidth = jnp.sum(l2) / (n_samples ** 2 - n_samples)
    bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))
    # degenerate identical clouds: the reference divides by a zero bandwidth
    # (NaN); floor it so MMD(x, x) = 0 instead
    bandwidth = jnp.maximum(bandwidth, 1e-12)

    kernels = jnp.zeros_like(l2)
    for i in range(kernel_num):
        kernels = kernels + jnp.exp(-l2 / (bandwidth * kernel_mul ** i))
    kernels = kernels * valid

    n = source.shape[0]
    ns = jnp.maximum(jnp.sum(mask_s), 1.0)
    nt = jnp.maximum(jnp.sum(mask_t), 1.0)
    xx = jnp.sum(kernels[:n, :n]) / (ns * ns)
    yy = jnp.sum(kernels[n:, n:]) / (nt * nt)
    xy = jnp.sum(kernels[:n, n:]) / (ns * nt)
    yx = jnp.sum(kernels[n:, :n]) / (nt * ns)
    return xx + yy - xy - yx


@partial(jax.jit, static_argnames=("mode",))
def mmd_with_time_mask(p: jax.Array, q: jax.Array, mask: jax.Array,
                       mode: str = "mean") -> jax.Array:
    """Per-frame MMD (reference: metrics.py:70-91); channels reshape into the
    frame axis like the reference does."""
    if mask.ndim > 2:
        mask = mask.reshape(-1, mask.shape[-1])
        p = p.reshape(mask.shape[0], p.shape[-2], p.shape[-1])
        q = q.reshape(mask.shape[0], q.shape[-2], q.shape[-1])
    m = (mask == 1).astype(p.dtype)
    per_frame = jax.vmap(lambda xp, xq, mm: mmd_masked(xp, xq, mm, mm))(p, q, m)
    active = jnp.sum(mask == 1, axis=-1) > 1
    per_frame = jnp.where(active, per_frame, 0.0)
    if mode == "sum":
        return jnp.sum(per_frame)
    return jnp.sum(per_frame) / jnp.maximum(jnp.sum(active), 1)
