"""Closed-loop simulation with the discovered MLAPM force model.

Reference: src/main_mlapm.py — 7 agents on a circle swapping positions under
MLAPM-GC, with per-step arrival masking.  Here the loop is one ``lax.scan``
over masked fixed-capacity state, and the same driver regenerates synthetic
scenario ``.npy`` files (the reference's "simulation" datasets in
data/synthetic_data/) by pairing MLAPM with a scenario spawn schedule.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piml_tpu.gen.socialforce import SFParams, SpawnSchedule, to_scene
from piml_tpu.models.mlapm import MLAPMParams, mlapm_step
from piml_tpu.scene import Scene


def circle_demo(n: int = 7, num_frames: int = 200, dt: float = 0.08,
                radius: float = 0.3, seed: int = 0,
                params: Optional[MLAPMParams] = None):
    """The reference demo (main_mlapm.py:5-36): agents on a circle of radius
    10 walk to their antipodes.  Returns (positions (T,N,2) NaN-masked,
    alive mask (T,N))."""
    params = params or MLAPMParams.gc_paper()
    theta = jnp.linspace(0, 2 * jnp.pi * (1 - 1.0 / n), n)
    p0 = jnp.stack([10 * jnp.cos(theta), 10 * jnp.sin(theta)], axis=-1)
    key = jax.random.PRNGKey(seed)
    v0 = jax.random.uniform(key, (n, 2))
    ds = jnp.full((n, 1), 1.5)

    @functools.partial(jax.jit, static_argnames=())
    def run(p0, v0, ds, dest):
        def step(carry, _):
            p, v, alive = carry
            v2 = mlapm_step(params, p, v, ds, dest, dt, radius)
            p2 = p + v2 * dt
            keep = alive[:, None] == 1
            p2 = jnp.where(keep, p2, p)
            v2 = jnp.where(keep, v2, v)
            arrived = jnp.linalg.norm(
                jnp.where(jnp.isnan(p2), 0.0, p2) - dest, axis=-1
            ) < radius
            alive2 = jnp.where(arrived, 0.0, alive)
            p2 = jnp.where(alive2[:, None] == 1, p2, jnp.nan)
            return (p2, v2, alive2), (p2, alive2)

        init = (p0, v0, jnp.ones(n))
        _, out = jax.lax.scan(step, init, None, length=num_frames)
        return out

    ps, alive = run(p0, v0, ds, -p0)
    return ps, alive


@functools.partial(
    jax.jit,
    static_argnames=("params", "num_frames", "dt", "radius", "arrive_distance"),
)
def simulate_mlapm(
    params: MLAPMParams,
    schedule: SpawnSchedule,
    num_frames: int,
    dt: float = 0.08,
    radius: float = 0.3,
    arrive_distance: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run MLAPM over a scenario spawn schedule (masked fixed slots).

    Integration is the MLAPM convention ``v' = v + F·dt; p' = p + v'·dt``
    (main_mlapm.py:26), not the lagged NN-rollout Euler.
    """
    from piml_tpu.engine.rollout import select_waypoint

    n_cap = schedule.position.shape[0]

    def step(carry, t):
        p, v, dest_idx, active = carry
        spawn_now = schedule.spawn_frame == t
        active = jnp.maximum(active, spawn_now.astype(active.dtype))
        p = jnp.where(spawn_now[:, None], schedule.position, p)
        v = jnp.where(spawn_now[:, None], schedule.velocity, v)
        dest_idx = jnp.where(spawn_now, 0, dest_idx)

        dest = select_waypoint(
            schedule.waypoints,
            jnp.clip(dest_idx, 0, schedule.waypoints.shape[0] - 1),
        )
        v2 = mlapm_step(params, p, v, schedule.desired_speed[:, None], dest,
                        dt, radius)
        p2 = p + v2 * dt
        keep = (active == 1)[:, None]
        p2 = jnp.where(keep, p2, p)
        v2 = jnp.where(keep, v2, jnp.zeros_like(v2))

        adv = (jnp.linalg.norm(jnp.where(jnp.isnan(p2), 1e4, p2) - dest, axis=-1)
               < arrive_distance) & (active == 1)
        dest_idx = dest_idx + adv.astype(dest_idx.dtype)
        done = dest_idx > schedule.dest_num - 1
        dest_idx = jnp.where(done, schedule.dest_num - 1, dest_idx)
        active = jnp.where(done, 0.0, active)
        p2 = jnp.where((active == 1)[:, None], p2, jnp.nan)
        return (p2, v2, dest_idx, active), (p2, v2, active)

    init = (
        jnp.full((n_cap, 2), jnp.nan),
        jnp.zeros((n_cap, 2)),
        jnp.zeros(n_cap, jnp.int32),
        jnp.zeros(n_cap),
    )
    _, (ps, vs, actives) = jax.lax.scan(step, init, jnp.arange(num_frames))
    return ps, vs, actives


def regenerate_scenario_npy(
    scenario_name: str, num_frames: int, out_path: str,
    mlapm_params: Optional[MLAPMParams] = None, seed: int = 0,
    time_unit: float = 0.08,
) -> Scene:
    """Regenerate a synthetic scenario with MLAPM and write a v2.2 ``.npy``
    (the reference's ``*_simulation.npy`` datasets)."""
    from piml_tpu.gen.scenarios import SCENARIOS

    sched, obstacles = SCENARIOS[scenario_name](num_frames, seed=seed)
    params = mlapm_params or MLAPMParams.gc_paper()
    ps, vs, actives = simulate_mlapm(params, sched, num_frames, dt=time_unit)
    sf = SFParams(time_unit=time_unit)
    scene = to_scene(sf, sched, obstacles, ps, actives,
                     meta={"source": f"piml_tpu mlapm {scenario_name}"})
    if out_path:
        scene.save(out_path)
    return scene
