"""Analytic social-force equations.

The framework models every simulator — pure social force, the PINNSF neural
family, and the discovered MLAPM — as a sum of interchangeable force terms.
This module provides the analytic terms:

- :func:`goal_force` — Helbing relaxation toward the desired velocity
  (reference: src/models/model.py:780-787).
- :func:`pairwise_acceleration` — the fitted exponential repulsion family
  v0/v1/v2 used both for message supervision (``pinnsf_interaction='loss'``)
  and as the social-force generator core
  (reference: src/utils/utils.py:31-100).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# Fitted constants per dataset (reference: src/utils/utils.py:47-93)
SF_CONSTANTS: Dict[str, Dict[str, Tuple[float, ...]]] = {
    "v0": {"gc1560": (8.75, -2.5), "gc2344": (8.75, -2.5), "ucy": (10.67, -3.33)},
    "v1": {"gc1560": (8.75, -2.5, 0.0), "gc2344": (8.75, -2.5, 0.0), "ucy": (10.67, -3.33, 0.0)},
    "v2": {"gc2344": (9.00, -2.75, 0.06, -0.3, 10 * 3.1415 / 180)},
}


def goal_force(
    dest_vec: jax.Array,
    velocity: jax.Array,
    desired_speed: jax.Array,
    tau: float,
    norm_axis: int = -1,
) -> jax.Array:
    """``(v0 * unit(dest - p) - v) / tau`` with the 0.1 zero-norm guard.

    ``norm_axis`` exists to reproduce the reference's ``torch.norm(..., dim=1)``
    on 3-D inputs (a latent axis bug; see PIMLConfig.compat_dest_norm_axis1).
    """
    norm = jnp.linalg.norm(dest_vec, axis=norm_axis, keepdims=True)
    norm = jnp.where(norm == 0, norm + 0.1, norm)
    direction = dest_vec / norm
    return (desired_speed * direction - velocity) / tau


def pairwise_acceleration(
    relative_data: jax.Array,
    version: str = "v0",
    dataset: str = "gc1560",
    eps: float = 1e-6,
    dv_from_velocity: bool = False,
) -> jax.Array:
    """Acceleration on agent i from neighbor j given relative (p, v) features.

    relative_data: (..., 4+) with [0:2] = p_j - p_i, [2:4] = v_j - v_i.
    Matches the reference exactly, including its quirk that ``dv`` is read
    from the *position* channels for v1/v2 (src/utils/utils.py:67,84 —
    ``dv = relative_data[..., 0:2]``), making ``cos`` identically ~1.
    Returns (..., 2).

    ``dv_from_velocity=True`` computes cos from the actual relative-velocity
    channels instead.  With the reference quirk, cos ≡ 1 degenerates the v2
    family to ``(A·e^C)·exp((B+D)·r)`` — C and D are unidentifiable from
    the supervised messages no matter the fit; only the quirk-free variant
    makes the direction terms recoverable (see sr.fit.fit_vector_force_law).
    """
    dr = relative_data[..., 0:2]
    r = jnp.linalg.norm(dr, axis=-1, keepdims=True) + eps
    direction = dr / r

    if version == "v0":
        A, B = SF_CONSTANTS["v0"][dataset]
        acc = A * jnp.exp(B * r)
        return -acc * direction

    # The reference reads dv from the position channels; keep bit-parity.
    dv = relative_data[..., 2:4] if dv_from_velocity else relative_data[..., 0:2]
    v = jnp.linalg.norm(dv, axis=-1, keepdims=True) + eps
    cos = jnp.sum(dr * dv, axis=-1, keepdims=True) / r / v

    if version == "v1":
        A, B, C = SF_CONSTANTS["v1"][dataset]
        acc = A * jnp.exp(B * r + C * cos)
        return -acc * direction

    if version == "v2":
        A, B, C, D, theta = SF_CONSTANTS["v2"][dataset]
        acc = A * jnp.exp(B * r + C * cos + D * r * cos)
        rot = jnp.array(
            [[math.cos(theta), -math.sin(theta)], [math.sin(theta), math.cos(theta)]],
            relative_data.dtype,
        )
        direction = jnp.einsum("ij,...j->...i", rot, direction)
        return -acc * direction

    raise NotImplementedError(version)


def physical_pair_force(
    rel_pos: jax.Array,
    intensity: float,
    radius: float,
) -> jax.Array:
    """Classic Helbing exponential repulsion ``A * exp(-r / B) * (-r̂)`` used by
    the synthetic social-force generator (the component referenced but missing
    from the reference repo; knobs from src/configs/socialforce.yaml:72-80).

    rel_pos: (..., 2) = p_other - p_self (NaN-safe: NaN rows → zero force).
    """
    finite = jnp.all(jnp.isfinite(rel_pos), axis=-1, keepdims=True)
    rel = jnp.where(finite, rel_pos, 1.0)
    r = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    r_safe = jnp.maximum(r, 1e-6)
    force = -intensity * jnp.exp(-r_safe / radius) * rel / r_safe
    return jnp.where(finite & (r > 0), force, 0.0)
