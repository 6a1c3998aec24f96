"""The social-force synthetic-data generator — the component the reference
uses but never shipped (SURVEY.md §2.5: ``models.socialforce.simulator`` is
imported by src/data/scenarios.py:34 and configured by
src/configs/socialforce.yaml:72-80, but absent from the repo).

TPU-native design: instead of dynamically growing tensors frame by frame
(``SocialForceData.add_frame``), a scenario pre-samples its entire Poisson
arrival schedule into fixed-capacity ``(T, N_cap)`` spawn arrays and the whole
simulation runs as one ``lax.scan`` over masked slots.  The physics is the
classic Helbing model with the reference's config knobs:

- goal force ``intensity · (v0·ê − v)`` (``desired_speed_intensity``; the
  reference's ``SocialForceData.default_tau = 0.5`` corresponds to
  intensity 2.0),
- ped-ped repulsion ``A·exp(−r/B)`` inside the sight cone
  (``pedped_repulsive_intensity/radius``, ``sight_angle_ped``),
- ped-obstacle repulsion ``A·exp(−r/B)`` (``pedobs_repulsive_*``),
- ``oversampling`` integration sub-steps per recorded frame,
- speed clamp at ``max_speed_multiplier · v0``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piml_tpu.scene import Scene


@dataclasses.dataclass(frozen=True)
class SFParams:
    """Knobs named after src/configs/socialforce.yaml."""

    desired_speed_intensity: float = 2.0
    pedped_repulsive_intensity: float = 3.3
    pedped_repulsive_radius: float = 0.4
    pedobs_repulsive_intensity: float = 10.0
    pedobs_repulsive_radius: float = 0.2
    oversampling: int = 10
    max_speed_multiplier: float = 1.4
    sight_angle_ped: float = 90.0
    time_unit: float = 0.08
    arrive_distance: float = 1.0  # waypoint-advance radius (scenarios.py:68)


class SpawnSchedule(NamedTuple):
    """Pre-sampled arrivals for ``T`` frames over ``N_cap`` slots."""

    spawn_frame: jax.Array     # (N_cap,) int32 — frame at which slot activates (T = never)
    position: jax.Array        # (N_cap, 2)
    velocity: jax.Array        # (N_cap, 2)
    waypoints: jax.Array       # (D, N_cap, 2) NaN-padded
    dest_num: jax.Array        # (N_cap,)
    desired_speed: jax.Array   # (N_cap,)


class GenState(NamedTuple):
    p: jax.Array          # (N, 2) NaN when inactive
    v: jax.Array
    dest_idx: jax.Array   # (N,) int32
    active: jax.Array     # (N,) 0/1


def social_force(
    params: SFParams,
    p: jax.Array,
    v: jax.Array,
    dest: jax.Array,
    desired_speed: jax.Array,
    obstacles: jax.Array,
) -> jax.Array:
    """Total force on each agent; NaN-safe (inactive slots give 0)."""
    ed_raw = dest - p
    ed = ed_raw / jnp.maximum(jnp.linalg.norm(ed_raw, axis=-1, keepdims=True), 1e-8)
    goal = params.desired_speed_intensity * (desired_speed[:, None] * ed - v)

    # ped-ped repulsion inside the sight cone
    rel = p[None, :, :] - p[:, None, :]   # i→j
    finite = jnp.all(jnp.isfinite(rel), axis=-1, keepdims=True)
    rel_s = jnp.where(finite, rel, 1.0)
    r = jnp.linalg.norm(rel_s, axis=-1, keepdims=True)
    r_safe = jnp.maximum(r, 1e-6)
    heading = jnp.where(
        jnp.linalg.norm(v, axis=-1, keepdims=True) > 0, v, ed
    )
    cos = jnp.sum(rel_s * heading[:, None, :], axis=-1, keepdims=True) / (
        r_safe * jnp.maximum(jnp.linalg.norm(heading, axis=-1, keepdims=True), 1e-8)[:, None]
    )
    in_sight = cos >= math.cos(math.pi * params.sight_angle_ped / 180.0)
    mag = params.pedped_repulsive_intensity * jnp.exp(
        -r_safe / params.pedped_repulsive_radius
    )
    pair = -mag * rel_s / r_safe  # repulsion pushes i away from j
    pair = jnp.where(finite & (r > 0) & in_sight, pair, 0.0)
    rep_ped = jnp.sum(pair, axis=1)

    # ped-obstacle repulsion (no sight gating — walls act from all sides)
    relo = obstacles[None, :, :] - p[:, None, :]
    finite_o = jnp.all(jnp.isfinite(relo), axis=-1, keepdims=True)
    relo_s = jnp.where(finite_o, relo, 1.0)
    ro = jnp.maximum(jnp.linalg.norm(relo_s, axis=-1, keepdims=True), 1e-6)
    mago = params.pedobs_repulsive_intensity * jnp.exp(
        -ro / params.pedobs_repulsive_radius
    )
    pairo = jnp.where(finite_o, -mago * relo_s / ro, 0.0)
    rep_obs = jnp.sum(pairo, axis=1)

    return goal + rep_ped + rep_obs


@functools.partial(
    jax.jit, static_argnames=("params", "num_frames", "retire_fn", "advance_fn")
)
def simulate(
    params: SFParams,
    schedule: SpawnSchedule,
    obstacles: jax.Array,
    num_frames: int,
    retire_fn: Optional[Callable] = None,
    advance_fn: Optional[Callable] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the generator; returns (position (T,N,2) NaN-masked, velocity,
    active mask (T,N)).

    ``retire_fn(p, dest_idx, dest_num, waypoints) -> (N,) bool`` marks agents
    leaving the scene (defaults to final-waypoint arrival);
    ``advance_fn(p, dest) -> (N,) bool`` triggers waypoint advance (defaults
    to ``|p−dest| < arrive_distance``).

    Jitted with the schedule/obstacles as real arguments — closure-captured
    device arrays become XLA constants pinned to slow memory on TPU.
    """
    from piml_tpu.engine.rollout import select_waypoint

    n_cap = schedule.position.shape[0]
    dt = params.time_unit / params.oversampling

    def current_dest(dest_idx):
        return select_waypoint(
            schedule.waypoints,
            jnp.clip(dest_idx, 0, schedule.waypoints.shape[0] - 1),
        )

    def step(state: GenState, t):
        # spawn slots whose frame has come
        spawn_now = (schedule.spawn_frame == t)
        active = jnp.maximum(state.active, spawn_now.astype(state.active.dtype))
        p = jnp.where(spawn_now[:, None], schedule.position, state.p)
        v = jnp.where(spawn_now[:, None], schedule.velocity, state.v)
        dest_idx = jnp.where(spawn_now, 0, state.dest_idx)

        dest = current_dest(dest_idx)

        def substep(carry, _):
            p, v = carry
            f = social_force(params, p, v, dest, schedule.desired_speed, obstacles)
            v2 = v + f * dt
            speed = jnp.linalg.norm(v2, axis=-1, keepdims=True)
            cap = params.max_speed_multiplier * schedule.desired_speed[:, None]
            v2 = jnp.where(speed > cap, v2 / jnp.maximum(speed, 1e-8) * cap, v2)
            p2 = p + v2 * dt
            keep = (active == 1)[:, None]
            return (jnp.where(keep, p2, p), jnp.where(keep, v2, v)), None

        (p, v), _ = jax.lax.scan(substep, (p, v), None, length=params.oversampling)

        # waypoint advance + retirement
        if advance_fn is None:
            adv = jnp.linalg.norm(p - dest, axis=-1) < params.arrive_distance
        else:
            adv = advance_fn(p, dest)
        adv = adv & (active == 1)
        dest_idx = dest_idx + adv.astype(dest_idx.dtype)
        done = dest_idx > schedule.dest_num - 1
        if retire_fn is not None:
            done = done | retire_fn(p, dest_idx, schedule.dest_num, schedule.waypoints)
        dest_idx = jnp.where(done, schedule.dest_num - 1, dest_idx)
        active = jnp.where(done, 0.0, active)
        p = jnp.where((active == 1)[:, None], p, jnp.nan)

        new_state = GenState(p=p, v=v, dest_idx=dest_idx, active=active)
        return new_state, (p, v, active)

    init = GenState(
        p=jnp.full((n_cap, 2), jnp.nan),
        v=jnp.zeros((n_cap, 2)),
        dest_idx=jnp.zeros(n_cap, jnp.int32),
        active=jnp.zeros(n_cap),
    )
    _, (ps, vs, actives) = jax.lax.scan(step, init, jnp.arange(num_frames))
    return ps, vs, actives


def to_scene(
    params: SFParams,
    schedule: SpawnSchedule,
    obstacles_out: np.ndarray,
    ps: jax.Array,
    actives: jax.Array,
    meta: Optional[dict] = None,
) -> Scene:
    """Package a generator run as a :class:`Scene` (v2.2-compatible).

    Velocity/acceleration are re-derived by the same forward differences the
    codec uses, so a save/load round trip is exact.
    """
    ps = np.asarray(ps)
    actives = np.asarray(actives)
    T, N, _ = ps.shape
    # keep only slots that ever activated
    used = actives.sum(0) > 1  # ≥2 frames so velocity exists
    ps = ps[:, used]
    actives = actives[:, used]
    wps = np.asarray(schedule.waypoints)[:, used]
    dn = np.asarray(schedule.dest_num)[used]
    N = ps.shape[1]

    dt = params.time_unit
    mask_p = (actives > 0).astype(np.float32)
    mask_v = mask_p.copy()
    mask_a = mask_p.copy()
    for n in range(N):
        frames = np.nonzero(mask_p[:, n])[0]
        if frames.size:
            mask_v[frames[-1], n] = 0
            mask_a[frames[-1], n] = 0
            if frames.size >= 2:
                mask_a[frames[-2], n] = 0

    vel = (np.concatenate([ps[1:], ps[-1:]], 0) - ps) / dt
    vel[mask_v == 0] = 0
    vel = np.nan_to_num(vel)
    acc = (np.concatenate([vel[1:], vel[-1:]], 0) - vel) / dt
    acc[mask_a == 0] = 0
    acc = np.nan_to_num(acc)

    # dense destination track from dest_idx reconstruction: first active
    # waypoint per frame — approximate with waypoint 0 until arrival radius
    dest = np.full_like(ps, np.nan)
    dest_idx = np.zeros((T, N), np.int64)
    cur = np.zeros(N, np.int64)
    for t in range(T):
        present = mask_p[t] > 0
        d = wps[np.clip(cur, 0, wps.shape[0] - 1), np.arange(N)]
        adv = present & (np.linalg.norm(np.nan_to_num(ps[t]) - d, axis=-1)
                         < params.arrive_distance)
        cur = np.minimum(cur + adv, dn - 1)
        dest[t][present] = wps[cur[present], np.nonzero(present)[0]]
        dest_idx[t] = cur

    meta = dict(meta or {})
    meta.setdefault("time_unit", params.time_unit)
    meta.setdefault("source", "piml_tpu.gen.socialforce")
    meta["version"] = "v2.2"
    return Scene.from_arrays(dict(
        meta_data=meta, position=ps.astype(np.float32),
        velocity=vel.astype(np.float32), acceleration=acc.astype(np.float32),
        destination=dest.astype(np.float32), waypoints=wps.astype(np.float32),
        dest_idx=dest_idx, dest_num=dn,
        obstacles=np.asarray(obstacles_out, np.float32).reshape(-1, 2),
        mask_p=mask_p, mask_v=mask_v, mask_a=mask_a,
    ))
