"""Polar-coordinate transforms for rotation-invariant features.

Reference: src/data/data.py:866-955 (``TimeIndexedPedDataPolarCoor``).
The polar frame uses each agent's (normalized) heading as the polar axis;
``r >= 0`` and ``theta`` in [-pi, pi].  NaN inputs propagate to NaN outputs,
matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cart_to_polar(points: jax.Array, base: jax.Array) -> jax.Array:
    """Cartesian → polar about the normalized ``base`` axis.

    points/base: (..., 2) → (..., 2) as (r, theta)
    (reference: src/data/data.py:872-900; acos clamped to ±(1-1e-6), sign via
    the z-component of base × point).
    """
    volume = jnp.linalg.norm(points, axis=-1, keepdims=True)
    volume_safe = jnp.where(volume == 0, volume + 0.1, volume)

    p = points / volume_safe
    cos_p, sin_p = p[..., 0], p[..., 1]
    cos_b, sin_b = base[..., 0], base[..., 1]
    sign = jnp.sign(sin_p * cos_b - cos_p * sin_b)[..., None]

    cos_theta = jnp.sum(points * base, axis=-1, keepdims=True) / volume_safe
    cos_theta = jnp.clip(cos_theta, -1 + 1e-6, 1 - 1e-6)
    theta = jnp.arccos(cos_theta) * sign
    return jnp.concatenate([volume, theta], axis=-1)


def polar_to_cart(points: jax.Array, base: jax.Array) -> jax.Array:
    """Polar (about ``base``) → Cartesian (reference: src/data/data.py:903-920).

    Adds the base's own polar angle (w.r.t. the x-axis) to theta, then maps
    (r, theta) to (x, y).
    """
    cart_base = jnp.zeros_like(base).at[..., 0].set(1.0)
    base_polar = cart_to_polar(base, cart_base)
    theta = points[..., 1] + base_polar[..., 1]
    r = points[..., 0]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def features_to_polar(features: jax.Array, heading: jax.Array) -> jax.Array:
    """Rewrite (..., k, 6) relative (p, v, a) features into the heading-aligned
    polar frame (reference: src/data/data.py:922-955)."""
    base = heading[..., None, :]  # broadcast over the k axis
    base = jnp.broadcast_to(base, features[..., :2].shape)
    return jnp.concatenate(
        [
            cart_to_polar(features[..., 0:2], base),
            cart_to_polar(features[..., 2:4], base),
            cart_to_polar(features[..., 4:6], base),
        ],
        axis=-1,
    )
