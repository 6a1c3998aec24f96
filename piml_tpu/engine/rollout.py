"""The rollout engine: one jitted ``lax.scan`` step for every closed loop.

The reference maintains four near-copies of the per-frame simulation loop —
evaluation rollout (src/models/simulators.py:595-652), differentiable training
rollout (:699-779), the MLAPM demo loop (src/main_mlapm.py:19-36) and the
missing social-force generator.  Here there is exactly one step function; the
variants differ only in the force model plugged in and two boolean switches
(arrival retirement, collision bookkeeping).

Semantics reproduced exactly (SURVEY.md §2.6):

- lagged explicit Euler: ``v' = v + a_prev·dt``, ``p' = p + v·dt`` where
  ``a_prev`` is the *previous* model output (simulators.py:602-604) — the
  non-lagged MLAPM variant (``v' = v + F·dt; p' = p + v'·dt``) is selected by
  ``lagged=False``;
- waypoint advance when distance < 0.5, with clamping at the last waypoint
  (simulators.py:607-616);
- arrival retirement to NaN (eval/generation) vs. keep-alive (training);
- ground-truth teleport-in of newly appearing agents (simulators.py:629-639);
- per-step O(N²) feature rebuild with single-frame heading
  (simulators.py:642-651);
- rolling history-velocity window in the self features (simulators.py:624-626).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from piml_tpu.physics import (
    NeighborConfig,
    collision_detection_single_frame,
    collision_label,
    heading_direction,
    relative_features,
)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static rollout configuration."""

    neighbor: NeighborConfig = NeighborConfig()
    time_unit: float = 0.08
    lagged: bool = True             # reference Euler lag (simulators.py:602-604)
    retire_on_arrival: bool = True  # eval/gen: NaN out arrived agents
    track_collisions: bool = False  # training: per-step contact counts
    collision_threshold: float = 0.5
    track_collision_labels: bool = False  # pinnsf_bm multitask bookkeeping
    remat: bool = True              # checkpoint the step for BPTT memory
    unroll: int = 1                 # lax.scan unroll factor — short BPTT
                                    # windows are latency-bound (~200 small
                                    # kernels/step at paper size); unrolling
                                    # lets XLA fuse across time steps
    shard_agents: bool = False      # agent-sharded pair pass
                                    # (parallel/agent_shard.py): the O(N)
                                    # banded kernel per shard vs the
                                    # all-gathered table when
                                    # neighbor.use_grid_topk engages at
                                    # scale (ring-pass fallback inside),
                                    # else the ICI-ring streaming pass;
                                    # requires a mesh passed to
                                    # make_step/rollout and N divisible by
                                    # the mesh axis


@struct.dataclass
class EngineState:
    """Scan carry — one scene frame's live state (agent axis N).

    ``ped_f``/``obs_f``/``self_f`` are the *next* model inputs; they are part
    of the carry because the reference seeds the first step with the
    dataset-built features (whose heading uses the full-trajectory fill) and
    recomputes thereafter (simulators.py:571-572,642-651).
    """

    p: jax.Array          # (N, 2) NaN = absent
    v: jax.Array          # (N, 2)
    a: jax.Array          # (N, 2)
    dest: jax.Array       # (N, 2)
    dest_idx: jax.Array   # (N,) int32
    hist_v: jax.Array     # (N, 2*h)
    ped_f: jax.Array      # (N, k1, 6)
    obs_f: jax.Array      # (N, k2, 6)
    self_f: jax.Array     # (N, 2 + 2h + 2 + 1)


class StepOutputs(NamedTuple):
    """Per-frame recorded outputs (stacked by scan along the time axis)."""

    p: jax.Array
    v: jax.Array
    a: jax.Array
    mask: jax.Array                 # presence at recording time
    collisions: jax.Array           # (N,) soft contact counts (or zeros)
    hard_collisions: jax.Array
    coll_pred: jax.Array            # (N, k1) per-edge collision predictions
    true_coll: jax.Array            # (N, k1) labels recomputed from features
    msg_l1: jax.Array               # scalar sum |ped_msgs| for L1 reg


class SpawnFrame(NamedTuple):
    """Ground-truth teleport-in data for one frame (scanned xs)."""

    new: jax.Array        # (N,) 0/1 — agents appearing at this frame
    p: jax.Array
    v: jax.Array
    a: jax.Array
    dest: jax.Array
    dest_idx: jax.Array
    hist_v: jax.Array


ForceFn = Callable[..., Any]  # (params, ped_f, obs_f, self_f) -> ModelOutput-like


def select_waypoint(waypoints: jax.Array, dest_idx: jax.Array) -> jax.Array:
    """Per-agent waypoint lookup ``waypoints[dest_idx[n], n]`` as a select
    over the small static D axis — a dynamic gather from a D-row table hits a
    pathological TPU lowering (~500× slower).  NaN-padded waypoint rows
    contribute zero (they are only addressed for inactive slots)."""
    d_ids = jnp.arange(waypoints.shape[0])[:, None]              # D, 1
    onehot = dest_idx[None, :].astype(jnp.int32) == d_ids        # D, N
    return jnp.sum(
        jnp.where(onehot[..., None], jnp.nan_to_num(waypoints), 0.0), axis=0
    )


def make_features_fn(
    cfg: EngineConfig,
    obstacles: jax.Array,
    desired_speed: jax.Array,
    mesh=None,
    mesh_axis: str = "ap",
    obstacle_index=None,
    batched: bool = False,
):
    """Build the per-step feature rebuild ``(p, v, a, dest, hist_v, k1, k2)
    -> (ped_f, obs_f, self_f)``.

    Handles rank-2 ``(N, 2)`` single-frame inputs (the scan step) and
    rank-3 ``(C, N, 2)`` channel-batched inputs (:func:`batched_rollout`'s
    hoisted feature pass — ``relative_features`` then routes the banded
    selector with the exactness ``lax.cond`` ABOVE the channel axis)."""

    if cfg.shard_agents and mesh is None:
        raise ValueError("EngineConfig.shard_agents requires a mesh")

    def features_for(p, v, a, dest, hist_v, k1, k2):
        # single-frame heading: the temporal fill degenerates to the guarded
        # normalization (the reference passes a singleton time axis,
        # simulators.py:642-646; rank-2 inputs give identical semantics and a
        # far better TPU layout than a (1, N, ·) batch axis).
        # k1/k2 clamp the neighbor axes to the dataset-seeded feature widths:
        # on an agent-padded scene (pad_agents) min(topk, N) would otherwise
        # widen mid-scan and break the carry shape.
        ncfg = cfg.neighbor._replace(topk_ped=k1, topk_obs=k2)
        if cfg.shard_agents:
            # same engagement policy as the single-chip path
            # (physics/features.py): the banded O(N) kernel once the pair
            # grid is large enough to amortize its support ops, on TPU
            # (off-TPU it would run in slow interpret mode); exactness
            # failures fall back to the always-correct ring pass inside
            use_banded = (
                ncfg.use_grid_topk
                and p.shape[0] * p.shape[0] >= 2 ** 21
                and jax.default_backend() == "tpu"
            )
            if use_banded:
                from piml_tpu.parallel.agent_shard import (
                    sharded_banded_features as _sharded_features,
                )
            else:
                from piml_tpu.parallel.agent_shard import (
                    sharded_relative_features as _sharded_features,
                )

            ped_f, obs_f, dest_f = _sharded_features(
                p, v, a, dest, obstacles, ncfg, mesh, axis=mesh_axis
            )
        else:
            # explicit single-frame heading: with a rank-3 (C, N, 2) batch,
            # relative_features' default heading would otherwise treat the
            # CHANNEL axis as time and fill headings across channels
            v0 = jnp.where(jnp.isnan(v), 0.0, v)
            ped_f, obs_f, dest_f = relative_features(
                p, v, a, dest, obstacles, ncfg,
                heading=heading_direction(v0, time_axis=False),
                obstacle_index=obstacle_index, batched=batched,
            )
        ds = desired_speed
        if p.ndim == 3 and ds.ndim == 2:
            ds = jnp.broadcast_to(ds[None], p.shape[:1] + ds.shape)
        self_f = jnp.concatenate([dest_f, hist_v, a, ds], axis=-1)
        return ped_f, obs_f, self_f

    return features_for


def make_step(
    apply_fn: ForceFn,
    cfg: EngineConfig,
    waypoints: jax.Array,      # (D, N, 2)
    dest_num: jax.Array,       # (N,)
    obstacles: jax.Array,      # (M, 2)
    desired_speed: jax.Array,  # (N, 1)
    stochastic: bool = False,
    mesh=None,
    mesh_axis: str = "ap",
    obstacle_index=None,
    rebuild_features: bool = True,
):
    """Build the scan step ``(params, state, xs) -> (state, outputs)``.

    ``stochastic=True``: xs is ``(spawn, rng)`` and the model forward draws
    fresh dropout masks each frame — the reference finetunes under
    ``model.train()``, so dropout is live inside the differentiable rollout
    (simulators.py:295,659-832); ``apply_fn`` must then accept a trailing
    rng argument.

    ``cfg.shard_agents`` + ``mesh``: the per-step O(N²) feature rebuild runs
    agent-sharded over ``mesh_axis`` (parallel/agent_shard.py) — the
    supported path for scenes past one chip's HBM.

    ``rebuild_features=False``: the step returns the carry with STALE model
    inputs (``ped_f``/``obs_f``/``self_f`` unchanged) — used by
    :func:`batched_rollout`, which rebuilds them for the whole channel
    batch outside the vmap so the banded selector's exactness ``lax.cond``
    stays a real branch."""

    dt = cfg.time_unit

    features_for = make_features_fn(
        cfg, obstacles, desired_speed, mesh=mesh, mesh_axis=mesh_axis,
        obstacle_index=obstacle_index,
    )

    def step(params, state: EngineState, xs):
        spawn, rng = xs if stochastic else (xs, None)
        # ---- record current state ------------------------------------------
        present = (~jnp.isnan(state.p[..., 0])).astype(state.p.dtype)

        # ---- model forward -------------------------------------------------
        if stochastic:
            out = apply_fn(params, state.ped_f, state.obs_f, state.self_f, rng)
        else:
            out = apply_fn(params, state.ped_f, state.obs_f, state.self_f)
        a_next = out.pred_acc
        msg_l1 = jnp.sum(jnp.abs(out.ped_msgs)) if out.ped_msgs is not None else jnp.zeros(())

        # ---- collision bookkeeping (stop-grad, simulators.py:708) ----------
        if cfg.track_collisions:
            p_sg = jax.lax.stop_gradient(state.p)
            coll = collision_detection_single_frame(p_sg, cfg.collision_threshold)
            hard = collision_detection_single_frame(p_sg, cfg.collision_threshold / 2)
        else:
            coll = jnp.zeros_like(present)
            hard = jnp.zeros_like(present)

        if cfg.track_collision_labels and out.coll_pred is not None:
            coll_pred = out.coll_pred
            true_coll = collision_label(state.ped_f)
        else:
            k1 = state.ped_f.shape[-2]
            coll_pred = jnp.zeros(state.p.shape[:-1] + (k1,), state.p.dtype)
            true_coll = jnp.zeros_like(coll_pred)

        # ---- integrate (lagged Euler by default) ---------------------------
        if cfg.lagged:
            v_next = state.v + state.a * dt
            p_next = state.p + state.v * dt
        else:
            v_next = state.v + a_next * dt
            p_next = state.p + v_next * dt

        # ---- waypoint advance ---------------------------------------------
        dis = jnp.linalg.norm(state.p - state.dest, axis=-1)
        dest_idx = state.dest_idx + (dis < 0.5).astype(state.dest_idx.dtype)
        arrived = dest_idx > dest_num - 1
        if cfg.retire_on_arrival:
            p_next = jnp.where(arrived[..., None], jnp.nan, p_next)
        dest_idx = jnp.where(arrived, dest_idx - 1, dest_idx)
        dest_next = select_waypoint(waypoints, dest_idx)  # (N, 2)

        # ---- rolling history velocities ------------------------------------
        hist_v = jnp.concatenate([state.hist_v[..., 2:], v_next], axis=-1)

        # ---- teleport-in newly appearing agents ----------------------------
        new = spawn.new[..., None]
        p_next = jnp.where(new == 1, spawn.p, p_next)
        v_next = jnp.where(new == 1, spawn.v, v_next)
        a_next = jnp.where(new == 1, spawn.a, a_next)
        dest_next = jnp.where(new == 1, spawn.dest, dest_next)
        dest_idx = jnp.where(spawn.new == 1, spawn.dest_idx, dest_idx)
        hist_v = jnp.where(new == 1, spawn.hist_v, hist_v)

        # ---- rebuild features ----------------------------------------------
        if rebuild_features:
            ped_f, obs_f, self_f = features_for(
                p_next, v_next, a_next, dest_next, hist_v,
                state.ped_f.shape[-2], state.obs_f.shape[-2],
            )
        else:
            ped_f, obs_f, self_f = state.ped_f, state.obs_f, state.self_f

        new_state = EngineState(
            p=p_next, v=v_next, a=a_next, dest=dest_next, dest_idx=dest_idx,
            hist_v=hist_v, ped_f=ped_f, obs_f=obs_f, self_f=self_f,
        )
        outputs = StepOutputs(
            p=state.p, v=state.v, a=state.a, mask=present,
            collisions=coll, hard_collisions=hard,
            coll_pred=coll_pred, true_coll=true_coll, msg_l1=msg_l1,
        )
        return new_state, outputs

    if cfg.remat:
        step = jax.checkpoint(step)
    return step


def init_state(
    p, v, a, dest, dest_idx, ped_f, obs_f, self_f
) -> EngineState:
    """Seed the carry from dataset tensors at ``t_start``.

    ``self_f`` is the dataset-built self feature row whose slice [2:-3] holds
    the history velocities (simulators.py:571-573,624).
    """
    hist_v = self_f[..., 2:-3]
    return EngineState(
        p=p, v=v, a=a, dest=dest, dest_idx=dest_idx.astype(jnp.int32),
        hist_v=hist_v, ped_f=ped_f, obs_f=obs_f, self_f=self_f,
    )


def rollout(
    params,
    apply_fn: ForceFn,
    cfg: EngineConfig,
    state: EngineState,
    spawns: SpawnFrame,        # time-leading pytree, length T_roll
    waypoints: jax.Array,
    dest_num: jax.Array,
    obstacles: jax.Array,
    desired_speed: jax.Array,
    step_rngs: Optional[jax.Array] = None,   # (T_roll,) key array: live dropout
    mesh=None,
    mesh_axis: str = "ap",
) -> Tuple[EngineState, StepOutputs]:
    """Run the scan: ``T_roll`` steps from ``state``; outputs are time-major."""
    stochastic = step_rngs is not None
    # obstacles are static for the whole rollout: build the banded
    # selector's cell index ONCE here (a loop constant of the scan) so the
    # per-frame cost inside the scan is the kernel alone
    obstacle_index = None
    if not cfg.shard_agents:
        from piml_tpu.physics.features import prepare_obstacle_index

        # mirror features_for exactly: the scan rebuilds features with the
        # state-seeded neighbor widths, not the config's
        ncfg_k = cfg.neighbor._replace(
            topk_ped=state.ped_f.shape[-2],
            topk_obs=state.obs_f.shape[-2],
        )
        obstacle_index = prepare_obstacle_index(
            state.p.shape[-2], obstacles, ncfg_k)
    step = make_step(apply_fn, cfg, waypoints, dest_num, obstacles,
                     desired_speed, stochastic=stochastic,
                     mesh=mesh, mesh_axis=mesh_axis,
                     obstacle_index=obstacle_index)

    def body(carry, xs):
        return step(params, carry, xs)

    return jax.lax.scan(body, state,
                        (spawns, step_rngs) if stochastic else spawns,
                        unroll=cfg.unroll)


def batched_rollout(
    params,
    apply_fn: ForceFn,
    cfg: EngineConfig,
    state: EngineState,        # channel-batched: every leaf (C, ...)
    spawns: SpawnFrame,        # channel-leading (C, T_roll, ...)
    waypoints: jax.Array,      # (D, N, 2) shared across channels
    dest_num: jax.Array,
    obstacles: jax.Array,
    desired_speed: jax.Array,  # (N, 1) shared
    step_rngs: Optional[jax.Array] = None,   # (C, T_roll) key array
) -> Tuple[EngineState, StepOutputs]:
    """Channel-batched rollout: ``lax.scan`` over TIME with the channel
    vmap INSIDE each step — output-equivalent to
    ``jax.vmap(rollout)`` over channels (tested), but the per-step feature
    rebuild runs once for the whole ``(C, N)`` batch, so the banded
    cell-list selector's exactness decision is ONE real ``lax.cond`` per
    frame instead of a per-channel cond that vmap would degrade to a
    select (executing both the banded kernel AND its dense fallback).

    This is what makes the O(N) neighbor kernels usable inside the
    channeled BPTT finetune at dense N (the reference's training hot loop,
    src/models/simulators.py:659-832, is a per-frame Python loop with a
    dense O(N²) rebuild).  Outputs are returned channel-leading
    ``(C, T, ...)`` to match the vmapped form.
    """
    stochastic = step_rngs is not None
    from piml_tpu.physics.features import prepare_obstacle_index

    ncfg_k = cfg.neighbor._replace(
        topk_ped=state.ped_f.shape[-2],
        topk_obs=state.obs_f.shape[-2],
    )
    obstacle_index = prepare_obstacle_index(
        state.p.shape[-2], obstacles, ncfg_k)

    # the inner step keeps stale features (rebuilt below for the batch) and
    # no remat — the checkpoint wraps the WHOLE body incl. the feature pass
    inner_cfg = dataclasses.replace(cfg, remat=False)
    inner = make_step(apply_fn, inner_cfg, waypoints, dest_num, obstacles,
                      desired_speed, stochastic=stochastic,
                      obstacle_index=obstacle_index, rebuild_features=False)
    features_for = make_features_fn(cfg, obstacles, desired_speed,
                                    obstacle_index=obstacle_index,
                                    batched=True)
    k1 = state.ped_f.shape[-2]
    k2 = state.obs_f.shape[-2]

    def body(carry, xs):
        new_state, outs = jax.vmap(
            lambda s, x: inner(params, s, x))(carry, xs)
        ped_f, obs_f, self_f = features_for(
            new_state.p, new_state.v, new_state.a, new_state.dest,
            new_state.hist_v, k1, k2,
        )
        new_state = new_state.replace(ped_f=ped_f, obs_f=obs_f,
                                      self_f=self_f)
        return new_state, outs

    if cfg.remat:
        body = jax.checkpoint(body)

    # time-major xs for the scan
    xs = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, 1), spawns)
    if stochastic:
        xs = (xs, jnp.moveaxis(step_rngs, 0, 1))
    final, outs = jax.lax.scan(body, state, xs, unroll=cfg.unroll)
    outs = jax.tree_util.tree_map(lambda x: jnp.moveaxis(x, 0, 1), outs)
    return final, outs


def spawn_frames_from_scene(
    position, velocity, acceleration, destination, dest_idx, self_features,
    mask_p, mask_p_pred, t_start: int,
) -> SpawnFrame:
    """Build the teleport-in schedule from ground truth.

    ``new_peds_flag = mask_p − mask_p_pred`` marks frames where an agent exists
    but is not yet predictable (simulators.py:593).  At loop step ``t`` the
    reference injects frame ``t+1``'s ground truth; the scanned xs therefore
    carry frames ``t_start+1 .. T`` with a zero-pad final frame.
    """
    new_flag = (mask_p - mask_p_pred).astype(position.dtype)  # T, N

    def shift(x):
        tail = x[t_start + 1:]
        pad = jnp.zeros_like(x[:1])
        return jnp.concatenate([tail, pad], axis=0)

    return SpawnFrame(
        new=shift(new_flag),
        p=shift(jnp.where(jnp.isnan(position), 0.0, position)),
        v=shift(velocity),
        a=shift(acceleration),
        dest=shift(jnp.where(jnp.isnan(destination), 0.0, destination)),
        dest_idx=shift(dest_idx).astype(jnp.int32),
        hist_v=shift(self_features[..., 2:-3]),
    )
