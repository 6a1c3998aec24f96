"""MLAPM — the discovered symbolic force model, as pure JAX force terms.

Reference: src/models/mlapm.py:5-58 and the fitted constants in
src/main_mlapm.py:16 (GC: tau=0.5, A=7.55, B=-3.00, C=0.2, D=-0.3, theta=56°)
and src/utils/utils.py:47-93.  Three discovered force laws:

- ``raw``: ``A * exp(B * r)`` along -r̂, gated to the front half-plane;
- ``GC``: ``A * exp(B*r + C*cosθ + D*r*cosθ)`` with the repulsion direction
  rotated by the fitted angular bias ``theta``;
- ``UCY``: the exponential gated on a predicted collision within 1 s
  (minimum-distance-of-approach test).

``step`` integrates ``v' = v + F·dt`` and the caller advances
``p' = p + v'·dt`` (non-lagged, unlike the NN rollout — see
src/main_mlapm.py:26 vs src/models/simulators.py:602-604).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MLAPMParams:
    version: str = "GC"
    tau: float = 0.5
    A: float = 7.55
    B: float = -3.00
    C: float = 0.2
    D: float = -0.3
    theta: float = 56.0  # degrees
    # UCY-version gating compat: the reference formula (mlapm.py:53) gives a
    # CONSTANT repulsion A·exp(0)=A to every in-view non-colliding pair
    # (coll=0 zeroes the exponent, not the magnitude), so crowds never settle;
    # the branch is unrunnable as shipped so this was never observed there.
    # True reproduces that formula; False applies the evident intent —
    # repulsion only when a collision is predicted within 1 s.
    ucy_gate_compat: bool = True

    @classmethod
    def gc_paper(cls) -> "MLAPMParams":
        """main_mlapm.py:16 constants."""
        return cls()

    @classmethod
    def gc2344_v2(cls) -> "MLAPMParams":
        """utils.py:80 constants (v2 iteration fit)."""
        return cls(version="GC", tau=0.5, A=9.00, B=-2.75, C=0.06, D=-0.3, theta=10.0)

    @classmethod
    def ucy_v0(cls) -> "MLAPMParams":
        """utils.py:52 constants as the UCY-gated variant."""
        return cls(version="UCY", tau=5 / 6, A=10.67, B=-3.33, C=0.0, D=0.0, theta=10.0)


def _normalize(x, eps=1e-12):
    """torch.nn.functional.normalize semantics: x / max(|x|, eps)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def mlapm_force(
    params: MLAPMParams,
    position: jax.Array,
    velocity: jax.Array,
    desired_speed: jax.Array,
    destination: jax.Array,
    radius: float = 0.3,
) -> jax.Array:
    """Total force on each agent; NaN positions (absent agents) yield zero
    pairwise terms and NaN goal terms exactly like the reference (callers mask).

    position/velocity/destination: (N, 2); desired_speed: (N, 1) or (N,).
    """
    if desired_speed.ndim == 1:
        desired_speed = desired_speed[:, None]

    ed = _normalize(destination - position)
    force = (desired_speed * ed - velocity) / params.tau

    vr = position[None, :, :] - position[:, None, :]  # N, N, 2 (j - i)
    finite = jnp.all(jnp.isfinite(vr), axis=-1, keepdims=True)
    vr_safe = jnp.where(finite, vr, 0.0)
    r = jnp.linalg.norm(vr_safe, axis=-1, keepdims=True)  # N, N, 1
    # front-view gate: v_i · (p_j - p_i) > 0 (mlapm.py:27)
    view = (jnp.einsum("nk,nmk->nm", jnp.where(jnp.isfinite(velocity), velocity, 0.0),
                       vr_safe) > 0)[..., None]
    gate = view & finite & (r > 0)
    direc = _normalize(vr_safe)

    if params.version == "raw":
        mag = params.A * jnp.exp(params.B * r)
    elif params.version in {"GC", "UCY"}:
        vv = jnp.where(jnp.isfinite(velocity), velocity, 0.0)
        vv = vv[None, :, :] - vv[:, None, :]  # N, N, 2
        theta = (
            -jnp.sign(vr_safe[..., 0] * ed[:, None, 1] - vr_safe[..., 1] * ed[:, None, 0])
            * params.theta / 180.0 * jnp.pi
        )
        theta = jnp.where(theta == 0, params.theta / 180.0 * jnp.pi, theta)
        c, s = jnp.cos(theta), jnp.sin(theta)
        direc = jnp.stack(
            [c * direc[..., 0] - s * direc[..., 1],
             s * direc[..., 0] + c * direc[..., 1]],
            axis=-1,
        )
        if params.version == "GC":
            na = jnp.maximum(jnp.linalg.norm(vr_safe, axis=-1), 1e-8)
            nb = jnp.maximum(jnp.linalg.norm(vv, axis=-1), 1e-8)
            cos = (jnp.sum(vr_safe * vv, axis=-1) / (na * nb))[..., None]
            mag = params.A * jnp.exp(params.B * r + params.C * cos + params.D * r * cos)
        else:  # UCY: collision-within-1s gate (mlapm.py:42-46)
            r2 = r[..., 0]
            coll = r2 < radius * 2
            coll |= jnp.linalg.norm(vr_safe + vv * 1.0, axis=-1) < radius * 2
            vv2 = jnp.maximum(jnp.sum(vv * vv, axis=-1), 1e-12)
            tmin = -jnp.sum(vr_safe * vv, axis=-1) / vv2
            dmin2 = jnp.sum(vr_safe * vr_safe, axis=-1) - (
                jnp.sum(vr_safe * vv, axis=-1) ** 2
            ) / vv2
            dmin = jnp.sqrt(jnp.maximum(dmin2, 0.0))
            coll |= (tmin > 0) & (tmin < 1) & (dmin < radius * 2)
            coll_f = coll.astype(r.dtype)[..., None]
            mag = params.A * jnp.exp(params.B * r * coll_f + params.C * coll_f)
            if not params.ucy_gate_compat:
                # intent gating: no predicted collision → no repulsion
                mag = mag * coll_f
    else:
        raise NotImplementedError(params.version)

    repulsion = jnp.sum(jnp.where(gate, mag * direc, 0.0), axis=1)
    return force - repulsion


def mlapm_step(
    params: MLAPMParams,
    position: jax.Array,
    velocity: jax.Array,
    desired_speed: jax.Array,
    destination: jax.Array,
    dt: float,
    radius: float = 0.3,
) -> jax.Array:
    """One velocity update ``v' = v + F·dt`` (reference: mlapm.py:57)."""
    f = mlapm_force(params, position, velocity, desired_speed, destination, radius)
    return velocity + f * dt
