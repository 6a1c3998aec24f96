"""Simulator orchestration: eval rollouts, differentiable training rollouts,
and the rollout metric suite.

Reference: src/models/simulators.py — ``get_multiple_rollouts`` (:556),
``test_multiple_rollouts`` (:465) and ``test_multiple_rollouts_for_training``
(:659).  Here each becomes a thin assembly over the single scan engine in
:mod:`piml_tpu.engine.rollout`; the training rollout is vmapped over window
channels and differentiated end-to-end by ``jax.grad`` through the scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piml_tpu.config import PIMLConfig
from piml_tpu.data.views import ChanneledData, TimeIndexedData, neighbor_config
from piml_tpu.engine.rollout import (
    EngineConfig,
    EngineState,
    SpawnFrame,
    batched_rollout,
    init_state,
    rollout,
    spawn_frames_from_scene,
)
from piml_tpu.metrics import (
    collision_count,
    mae_with_time_mask,
    mmd_with_time_mask,
    ot_with_time_mask,
)
from piml_tpu.physics import collision_detection_single_frame
from piml_tpu.train import losses  # module import only — no package __init__ cycle


def engine_config(cfg: PIMLConfig, *, retire: bool, track_collisions: bool,
                  track_labels: bool, shard_agents: bool = False,
                  unroll: int = 1) -> EngineConfig:
    # remat only matters under grad (the finetune path resolves its own
    # auto policy); forward-only rollouts treat jax.checkpoint as a no-op
    remat = True if cfg.remat_features is None else cfg.remat_features
    return EngineConfig(
        neighbor=neighbor_config(cfg),
        time_unit=cfg.time_unit,
        lagged=cfg.compat_lagged_euler,
        retire_on_arrival=retire,
        track_collisions=track_collisions,
        collision_threshold=cfg.collision_threshold,
        track_collision_labels=track_labels,
        remat=remat,
        unroll=unroll,
        shard_agents=shard_agents,
    )


class RolloutResult(NamedTuple):
    position: jax.Array   # (T, N, 2) — GT before t_start, predictions after
    velocity: jax.Array
    acceleration: jax.Array
    mask_p: jax.Array     # (T, N)


# ---------------------------------------------------------------------------
# evaluation rollout (get_multiple_rollouts, simulators.py:556-657)
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("apply_fn", "ecfg", "t_start", "mesh", "mesh_axis"))
def eval_rollout(
    params, apply_fn, ecfg: EngineConfig, data: TimeIndexedData, t_start: int,
    mesh=None, mesh_axis: str = "ap",
) -> RolloutResult:
    """Closed-loop rollout from ``t_start`` with ground-truth teleport-in and
    arrival retirement; returns full dense trajectories.

    With ``ecfg.shard_agents`` and a ``mesh``, the per-step pair pass runs
    agent-sharded over ``mesh_axis`` (N must divide the axis — use
    ``data.pad_agents`` upstream)."""
    state = init_state(
        p=data.position[t_start],
        v=data.velocity[t_start],
        a=data.acceleration[t_start],
        dest=data.destination[t_start],
        dest_idx=data.dest_idx[t_start],
        ped_f=data.ped_features[t_start],
        obs_f=data.obs_features[t_start],
        self_f=data.self_features[t_start],
    )
    spawns = spawn_frames_from_scene(
        data.position, data.velocity, data.acceleration, data.destination,
        data.dest_idx, data.self_features, data.mask_p, data.mask_p_pred,
        t_start,
    )
    # scan over frames t_start .. T-1
    take = jax.tree_util.tree_map(lambda x: x[: data.num_frames - t_start], spawns)
    _, outs = rollout(
        params, apply_fn, ecfg, state, take,
        data.waypoints, data.dest_num, data.obstacles,
        data.desired_speed[:, None], mesh=mesh, mesh_axis=mesh_axis,
    )

    prefix = lambda gt, roll: jnp.concatenate([gt[:t_start], roll], axis=0)
    return RolloutResult(
        position=prefix(data.position, outs.p),
        velocity=prefix(data.velocity, outs.v),
        acceleration=prefix(data.acceleration, outs.a),
        mask_p=prefix(data.mask_p, outs.mask),
    )


@partial(jax.jit, static_argnames=("t_start",))
def _scene_eval_scalars(data: TimeIndexedData, position: jax.Array,
                        mask_p: jax.Array, t_start: int, coll_thr):
    """Fused per-scene eval scalars: collision sweeps (XLA fuses the
    (t, N, N) contact reductions — nothing is materialized), arrival
    post-processing, masked MSE, and the row/frame denominators — one
    dispatch, one host sync."""
    coll = collision_count(position[t_start:], coll_thr)
    hard = collision_count(position[t_start:], coll_thr / 2)
    p_post = post_process(data, position, mask_p, data.mask_p_pred)
    labels = data.labels[..., :2]
    m = (data.mask_p_pred == 1)[..., None]
    mse = jnp.sum(jnp.where(m, (p_post - labels) ** 2, 0.0))
    rows = jnp.sum(data.mask_p_pred == 1)
    frames = jnp.sum(jnp.sum(data.mask_p_pred, axis=-1) > 0)
    return coll, hard, mse, p_post, rows, frames


def post_process(data: TimeIndexedData, pred_pos: jax.Array,
                 pred_mask_p: jax.Array, mask_p: jax.Array) -> jax.Array:
    """Clamp agents that arrived early in the prediction to their final
    waypoint (reference: simulators.py:443-463)."""
    final_idx = jnp.maximum(data.dest_num - 1, 0)
    agent_ids = jnp.arange(data.waypoints.shape[1])
    final_wp = data.waypoints[final_idx, agent_ids]  # N, 2
    fix = ((mask_p == 1) & (pred_mask_p == 0))[..., None]
    return jnp.where(fix, final_wp[None], pred_pos)


@dataclasses.dataclass
class RolloutMetrics:
    loss: float
    mse: float
    mae: float
    ot: float
    mmd: float
    collision: float
    hard_collision: float


def evaluate_rollouts(
    params, apply_fn, cfg: PIMLConfig, datasets, *, test_flag: bool = True,
    mesh=None, mesh_axis: str = "ap",
) -> RolloutMetrics:
    """Rollout + metric suite over a list of scenes
    (reference: simulators.py:465-554, list branch).

    ``mesh``: agent-shard the rollout's N² pair pass over ``mesh_axis``
    (scenes are padded to the axis size; metrics are unaffected — padded
    slots carry zero masks)."""
    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False, shard_agents=mesh is not None)
    if isinstance(datasets, TimeIndexedData):
        datasets = [datasets]

    mae_sum = mse_sum = ot_sum = mmd_sum = 0.0
    coll_sum = hard_sum = loss_sum = 0.0
    n_rows = 0
    n_frames = 0
    for data in datasets:
        if mesh is not None:
            from piml_tpu.data.views import pad_agents

            data = pad_agents(data, mesh.shape[mesh_axis])
        res = eval_rollout(params, apply_fn, ecfg, data, cfg.skip_frames,
                           mesh=mesh, mesh_axis=mesh_axis)
        # one fused program for the per-scene scalar metrics: the two
        # collision sweeps would otherwise run EAGERLY, materializing
        # (t, N, N) contact tensors op-by-op — at the paper validation
        # shape that alone dominated the finetune epoch (VERDICT r3
        # item 2; epoch_breakdown.json)
        coll, hard, mse, p_post, rows, frames = _scene_eval_scalars(
            data, res.position, res.mask_p, cfg.skip_frames,
            cfg.collision_threshold)

        mask_pred = data.mask_p_pred
        labels = data.labels[..., :2]
        # ONE host sync per scene: every per-scene scalar (the fused eval
        # scalars and, under test_flag, the three metric programs — all
        # dispatched asynchronously above/here) is fetched as one stacked
        # device vector.  Individual float() fetches each pay the tunnel's
        # ~28 ms round trip; at 3 validation scenes × 8 scalars that was
        # ~0.7 s of the finetune epoch's validation phase.
        scal = [coll, hard, mse, rows, frames]
        if test_flag:
            scal += [mae_with_time_mask(p_post, labels, mask_pred, "sum"),
                     ot_with_time_mask(p_post, labels, mask_pred, "sum"),
                     mmd_with_time_mask(p_post, labels, mask_pred, "sum")]
        vals = np.asarray(jnp.stack(
            [jnp.asarray(s, jnp.float32) for s in scal]))
        coll, hard, mse = float(vals[0]), float(vals[1]), float(vals[2])
        coll_sum += coll
        hard_sum += hard
        loss = mse
        if not test_flag:
            loss = loss + cfg.val_coll_weight * (coll + hard)
        else:
            mae_sum += float(vals[5])
            ot_sum += float(vals[6])
            mmd_sum += float(vals[7])
        n_rows += int(vals[3])
        n_frames += int(vals[4])
        loss_sum += loss
        mse_sum += mse

    n_rows = max(n_rows, 1)
    n_frames = max(n_frames, 1)
    return RolloutMetrics(
        loss=loss_sum / n_rows, mse=mse_sum / n_rows, mae=mae_sum / n_rows,
        ot=ot_sum / n_frames, mmd=mmd_sum / n_frames,
        collision=coll_sum, hard_collision=hard_sum,
    )


# ---------------------------------------------------------------------------
# differentiable training rollout (simulators.py:659-832)
# ---------------------------------------------------------------------------

class TrainingRolloutLoss(NamedTuple):
    loss: jax.Array
    mse_loss: jax.Array
    collision_loss: jax.Array
    hard_collision_loss: jax.Array
    collision_pred_loss: jax.Array
    collision_pred_acc: jax.Array
    reg_loss: jax.Array
    collision_count: jax.Array
    hard_collision_count: jax.Array


def training_rollout_loss(
    params, apply_fn, cfg: PIMLConfig, batch: ChanneledData,
    rng: Optional[jax.Array] = None,
) -> TrainingRolloutLoss:
    """Full finetune loss through the differentiable rollout.

    vmapped over the channel axis; the scan runs the whole window and the
    loss stack mirrors simulators.py:781-832: time-decayed rollout MSE +
    collision-gated perpendicular penalties (v0/v2) + optional teacher
    acc-MSE (reverse decay) + BCE collision prediction + L1 message reg.

    ``rng``: when given, dropout is live inside the rollout with fresh masks
    per frame/channel — the reference trains under ``model.train()``
    (simulators.py:295), so the finetune rollout is stochastic; ``apply_fn``
    must then accept a trailing rng argument.
    """
    # Auto fusion policy (measured, train_step_fusion.json): the paper-size
    # step (C=32, N=122) is kernel-launch bound — full BPTT unroll + no
    # remat cuts 14.4 -> 10.5 ms/step.  At dense sizes the unrolled,
    # live-activation program would blow compile time and HBM, so keep the
    # scanned + rematerialized form there.  TPU only: XLA:CPU pays the
    # unrolled compile without the dispatch-latency win (tests and the
    # virtual-mesh dryrun run on CPU).
    # threshold measured on v5e: C=128 x N=122 (15,616 slots) still wins
    # unrolled (57 vs 70 ms/step); C=512 x 122 blows compile size.  Under
    # channel-DP the loss traces with GLOBAL shapes while each device only
    # executes its shard — judge the per-device work.
    per_dev_channels = batch.num_channels / max(cfg.n_devices, 1)
    small = (per_dev_channels * batch.position.shape[2] <= 16384
             and jax.default_backend() == "tpu")
    remat = cfg.remat_features
    if remat is None:
        remat = not small
    # r5 wall-aware amendment to the fusion policy: full unroll buys
    # ~3.9 ms/step at paper scale but the unrolled program serializes to
    # ~60 MB per batch-shape group — 234 s of cold XLA compile and, through
    # a remote-device tunnel, ~112 s of compile-cache RETRIEVAL per run
    # (compile_attrib_r5cold/r5warm.json), against ~0.4 s/epoch of steady-
    # state savings.  Break-even is ~20 epochs with a local on-disk cache
    # and ~300 through the tunnel — and with early stopping the configured
    # cap wildly overpredicts actual epochs (the paper finetune caps at
    # 1000 and stops at ~22), so auto ALWAYS takes the scanned small-
    # program form; long-run users and steady-state throughput benches pin
    # cfg.bptt_unroll (= the window length) explicitly.
    unroll = cfg.bptt_unroll or 1
    ecfg = dataclasses.replace(
        engine_config(
            cfg, retire=False, track_collisions=True,
            track_labels=cfg.collision_pred_weight > 0,
            unroll=unroll,
        ),
        remat=remat,
    )
    # Channel-batching strategy for the differentiable rollout:
    # - Dense N on TPU: scan over TIME with the channel vmap inside each
    #   step (batched_rollout) — the per-step feature rebuild runs once
    #   for the whole (C, N) batch with the banded cell-list selector's
    #   exactness decision hoisted to ONE real lax.cond per frame, so the
    #   O(N) kernels are usable inside BPTT.
    # - Paper scale: vmap(scan) per channel (the measured, fusion-tuned
    #   path).  There a per-channel lax.cond would degrade to select
    #   under vmap — executing BOTH the banded probe AND its dense
    #   fallback — so the grid selector is disabled outright.
    n_agents = batch.position.shape[2]
    use_batched = cfg.channel_batched_bptt
    if use_batched is None:
        use_batched = (
            ecfg.neighbor.use_grid_topk
            and n_agents * n_agents >= 2 ** 21
            and jax.default_backend() == "tpu"
        )
    if not use_batched:
        ecfg = dataclasses.replace(
            ecfg, neighbor=ecfg.neighbor._replace(use_grid_topk=False))

    def one_channel(p0, v0, a0, dest0, didx0, pf0, of0, sf0, spawns, rngs):
        state = init_state(p0, v0, a0, dest0, didx0, pf0, of0, sf0)
        return rollout(
            params, apply_fn, ecfg, state, spawns,
            batch.waypoints, batch.dest_num, batch.obstacles,
            batch.desired_speed[:, None], step_rngs=rngs,
        )[1]

    C, T = batch.num_channels, batch.num_frames
    spawns = jax.vmap(
        lambda p, v, a, d, di, sf, mp, mpp: spawn_frames_from_scene(
            p, v, a, d, di, sf, mp, mpp, 0
        )
    )(batch.position, batch.velocity, batch.acceleration, batch.destination,
      batch.dest_idx, batch.self_features, batch.mask_p, batch.mask_p_pred)

    step_rngs = None
    if rng is not None:
        step_rngs = jax.random.split(rng, C * T).reshape(C, T, -1)

    if use_batched:
        states0 = jax.vmap(init_state)(
            batch.position[:, 0], batch.velocity[:, 0],
            batch.acceleration[:, 0], batch.destination[:, 0],
            batch.dest_idx[:, 0], batch.ped_features[:, 0],
            batch.obs_features[:, 0], batch.self_features[:, 0],
        )
        outs = batched_rollout(
            params, apply_fn, ecfg, states0, spawns,
            batch.waypoints, batch.dest_num, batch.obstacles,
            batch.desired_speed[:, None], step_rngs=step_rngs,
        )[1]
    else:
        outs = jax.vmap(one_channel)(
            batch.position[:, 0], batch.velocity[:, 0],
            batch.acceleration[:, 0],
            batch.destination[:, 0], batch.dest_idx[:, 0],
            batch.ped_features[:, 0], batch.obs_features[:, 0],
            batch.self_features[:, 0], spawns, step_rngs,
        )  # StepOutputs with shapes (C, T, ...)

    mask_pred = batch.mask_p_pred  # C, T, N
    # frames with no predictable agents record nothing (simulators.py:707)
    frame_active = (jnp.sum(mask_pred, axis=-1, keepdims=True) > 0)  # C,T,1

    p_res = jnp.where((mask_pred == 1)[..., None], outs.p, 0.0)
    p_res = jnp.where(jnp.isnan(p_res), 0.0, p_res)
    labels_p = jnp.where((mask_pred == 1)[..., None], batch.labels[..., :2], 0.0)
    labels_p = jnp.where(jnp.isnan(labels_p), 0.0, labels_p)

    mse = losses.multiple_rollout_mse_loss(p_res, labels_p, cfg.time_decay, "sum")
    loss = mse

    reg = jnp.sum(outs.msg_l1 * frame_active[..., 0]) * cfg.reg_weight
    if cfg.reg_weight > 0:
        loss = loss + reg

    collisions = outs.collisions * frame_active
    hard_collisions = outs.hard_collisions * frame_active

    # label collisions from ground-truth next-step positions
    lab_pos = batch.labels[..., :2]
    label_coll = collision_detection_single_frame(lab_pos, cfg.collision_threshold)
    label_hard = collision_detection_single_frame(lab_pos, cfg.collision_threshold / 2)
    label_coll = label_coll * frame_active
    label_hard = label_hard * frame_active

    if cfg.new_collision_loss_flag:
        any_lc = jnp.sum(label_coll, axis=-2, keepdims=True) > 0   # C,1,N
        any_lh = jnp.sum(label_hard, axis=-2, keepdims=True) > 0
        collisions = jnp.where(any_lc, 0.0, collisions)
        hard_collisions = jnp.where(any_lh, 0.0, hard_collisions)

    coll_count = jnp.sum(collisions)
    hard_count = jnp.sum(hard_collisions)

    coll_loss = jnp.zeros(())
    hard_loss = jnp.zeros(())
    if cfg.collision_loss_weight > 0:
        abnormal = batch.abnormal_mask if cfg.collision_loss_version == "v2" else None
        coll_loss = losses.multiple_rollout_collision_loss(
            p_res, labels_p, cfg.time_decay, collisions, "sum", abnormal
        ) * cfg.collision_loss_weight
        hard_loss = losses.multiple_rollout_collision_loss(
            p_res, labels_p, cfg.time_decay, hard_collisions, "sum", abnormal
        ) * cfg.collision_loss_weight * cfg.hard_collision_penalty
        loss = loss + coll_loss + hard_loss

    if cfg.teacher_weight > 0:
        a_res = jnp.where((mask_pred == 1)[..., None], outs.a, 0.0)
        a_res = jnp.where(jnp.isnan(a_res), 0.0, a_res)
        labels_a = jnp.where((mask_pred == 1)[..., None], batch.labels[..., 4:6], 0.0)
        a_mse = losses.multiple_rollout_mse_loss(
            a_res, labels_a, cfg.time_decay, "sum", reverse=True
        )
        loss = loss + a_mse * cfg.teacher_weight

    cp_loss = jnp.zeros(())
    cp_acc = jnp.zeros(())
    if cfg.collision_pred_weight > 0:
        # gate per-slot by the engine's own liveness mask: the reference's
        # dynamic tensors hold ONLY live agents (simulators.py:781-832), so
        # rows for not-yet-spawned / padded capacity slots must not reach
        # the BCE — a zero-feature row contributes -log(1-sigmoid(b)) > 0
        # per slot otherwise (caught by the unify_train_slots parity test:
        # padding doubled collision_pred_loss before this mask)
        live = outs.mask * frame_active  # (C, T, N)
        pred_c = outs.coll_pred * live[..., None]
        true_c = outs.true_coll * live[..., None]
        cp_loss = losses.binary_cross_entropy(pred_c, true_c, "sum") * cfg.collision_pred_weight
        n_live = jnp.maximum(jnp.sum(live), 1.0) * outs.coll_pred.shape[-1]
        cp_acc = jnp.sum(
            (jnp.round(pred_c) == true_c).astype(jnp.float32)
            * live[..., None]) / n_live
        loss = loss + cp_loss

    return TrainingRolloutLoss(
        loss=loss, mse_loss=mse, collision_loss=coll_loss,
        hard_collision_loss=hard_loss, collision_pred_loss=cp_loss,
        collision_pred_acc=cp_acc, reg_loss=reg,
        collision_count=coll_count, hard_collision_count=hard_count,
    )
