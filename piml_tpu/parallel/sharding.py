"""Multi-chip parallelism: mesh construction and sharded training steps.

The reference's only parallelism is single-process ``nn.DataParallel`` batch
scatter (src/models/simulators.py:64-65,103-106).  The TPU-native equivalent
is SPMD over a ``jax.sharding.Mesh``:

- **data parallel** over the pointwise-row / rollout-channel batch axis
  (``PartitionSpec('dp')`` on batch arrays, replicated params) — XLA inserts
  the gradient ``psum`` over ICI automatically when the jitted step's outputs
  are required replicated;
- **agent-axis sharding** for the O(N²) pair pass at very large N (the agent
  axis is the "long context" here; see ``piml_tpu.ops.pairwise``).

Everything works on an ``xla_force_host_platform_device_count`` virtual CPU
mesh for testing; the driver's ``dryrun_multichip`` uses exactly this module.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from piml_tpu.config import PIMLConfig
from piml_tpu.data.views import ChanneledData, PointwiseData
from piml_tpu.engine.simulator import training_rollout_loss


def make_mesh(n_devices: int = 0, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices <= 0:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (axis,))


def shard_leading(tree: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Place every array with a leading batch axis on the mesh, sharded on
    that axis; scalars/static leaves are replicated."""
    n = mesh.shape[axis]

    def put(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.shape[0] % n != 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def pad_channels(batch: ChanneledData, multiple: int) -> ChanneledData:
    """Pad the window-channel axis to a multiple with inert channels (NaN
    positions, zero masks): every loss term is a mask-gated sum, so padded
    channels contribute exactly zero and gradients are unchanged."""
    import numpy as np

    c = batch.num_channels
    extra = -c % multiple
    if extra == 0:
        return batch
    per_channel = {
        "ped_features", "obs_features", "self_features", "labels",
        "mask_p", "mask_v", "mask_a", "mask_p_pred", "mask_v_pred",
        "mask_a_pred", "velocity", "acceleration", "dest_idx",
    }
    nan_fields = {"position", "destination"}

    def pad(x, value):
        widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    fields = {}
    for name in per_channel:
        fields[name] = pad(getattr(batch, name), 0)
    for name in nan_fields:
        fields[name] = pad(getattr(batch, name), np.nan)
    return batch.replace(**fields)


def pad_channels_stacked(stacked: ChanneledData, multiple: int) -> ChanneledData:
    """:func:`pad_channels` for a STACKED scan input (leading axis =
    batches-per-epoch, second axis = window channels): pads axis 1 with the
    same inert channels, so ``pad_channels_stacked(stack(bs))`` equals
    ``stack([pad_channels(b) for b in bs])`` leaf-for-leaf."""
    import numpy as np

    c = stacked.ped_features.shape[1]
    extra = -c % multiple
    if extra == 0:
        return stacked
    per_channel = {
        "ped_features", "obs_features", "self_features", "labels",
        "mask_p", "mask_v", "mask_a", "mask_p_pred", "mask_v_pred",
        "mask_a_pred", "velocity", "acceleration", "dest_idx",
    }
    nan_fields = {"position", "destination"}

    def pad(x, value):
        widths = [(0, 0), (0, extra)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, widths, constant_values=value)

    fields = {}
    for name in per_channel:
        fields[name] = pad(getattr(stacked, name), 0)
    for name in nan_fields:
        fields[name] = pad(getattr(stacked, name), np.nan)
    return stacked.replace(**fields)


def shard_channeled_batch(batch: ChanneledData, mesh: Mesh,
                          axis: str = "dp") -> ChanneledData:
    """Shard the window-channel axis across devices; per-scene statics
    (waypoints, obstacles, dest_num, ...) are replicated.  Ragged channel
    counts are padded up with inert channels (:func:`pad_channels`) so the
    shard is always even."""
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(axis))
    batch = pad_channels(batch, n)
    c = batch.num_channels

    def put(x, name):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == c \
                and name not in {"dest_num", "waypoints", "obstacles",
                                 "desired_speed", "abnormal_mask"}:
            return jax.device_put(x, dp)
        return jax.device_put(x, repl)

    fields = {
        name: put(getattr(batch, name), name)
        for name in (
            "ped_features", "obs_features", "self_features", "labels",
            "mask_p", "mask_v", "mask_a", "mask_p_pred", "mask_v_pred",
            "mask_a_pred", "position", "velocity", "acceleration",
            "destination", "dest_idx", "abnormal_mask", "dest_num",
            "waypoints", "obstacles", "desired_speed",
        )
    }
    return batch.replace(**fields)


def make_dp_finetune_step(cfg: PIMLConfig, apply_fn, tx, mesh: Mesh):
    """Data-parallel finetune train step: batch channels sharded over the
    mesh, parameters/optimizer state replicated; XLA inserts the gradient
    all-reduce over ICI because the updated (replicated) params depend on all
    shards' gradients."""

    @partial(jax.jit,
             out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                            None))
    def step(params, opt_state, batch: ChanneledData):
        def loss_fn(p):
            out = training_rollout_loss(p, apply_fn, cfg, batch)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        import optax

        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, out

    return step


def make_dp_pointwise_step(cfg: PIMLConfig, model, tx, mesh: Mesh):
    """Data-parallel pointwise pretrain step (rows sharded over the mesh)."""
    import optax

    @partial(jax.jit,
             out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                            None))
    def step(params, opt_state, ped, obs, self_f, labels, rng):
        def loss_fn(p):
            out = model.apply(p, ped, obs, self_f, deterministic=False,
                              rngs={"dropout": rng})
            return jnp.sum((out.pred_acc - labels[:, 4:6]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    return step


def shard_stacked_channeled(stacked: ChanneledData, mesh: Mesh,
                            axis: str = "dp") -> ChanneledData:
    """Shard a STACKED scan input of window batches (leading axis =
    batches-per-epoch, second axis = window channels) over the mesh's
    channel axis: per-channel tensors get P(None, axis), per-scene statics
    replicate.  Channels must already divide the axis (pad each batch with
    :func:`pad_channels` before stacking)."""
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(None, axis))
    c = jax.tree_util.tree_leaves(stacked.ped_features)[0].shape[1]
    assert c % n == 0, f"stacked channel axis {c} must divide mesh ({n})"

    statics = {"dest_num", "waypoints", "obstacles", "desired_speed",
               "abnormal_mask"}

    def put(x, name):
        if name not in statics and hasattr(x, "ndim") and x.ndim >= 2 \
                and x.shape[1] == c:
            return jax.device_put(x, dp)
        return jax.device_put(x, repl)

    fields = {
        name: put(getattr(stacked, name), name)
        for name in (
            "ped_features", "obs_features", "self_features", "labels",
            "mask_p", "mask_v", "mask_a", "mask_p_pred", "mask_v_pred",
            "mask_a_pred", "position", "velocity", "acceleration",
            "destination", "dest_idx", "abnormal_mask", "dest_num",
            "waypoints", "obstacles", "desired_speed",
        )
    }
    return stacked.replace(**fields)
