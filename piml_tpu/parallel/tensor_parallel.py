"""Tensor parallelism for the wide-model regime (GSPMD/Megatron style).

The reference has no model parallelism at all — its only parallelism is a
single-process ``nn.DataParallel`` batch scatter
(reference: src/models/simulators.py:64-65,103-106).  On TPU the place
where model sharding pays is the WIDE regime the scaling bench exposes
(train_step_scaling.json: a 512-wide model drives the train step to
39%/52% MFU — MXU-bound): there the encoder/processor/decoder matmuls
are large enough that splitting them over a ``tp`` mesh axis divides the
per-chip FLOPs and weight bytes while the activations ride ICI.

Design — idiomatic XLA GSPMD rather than hand-written collectives:

- We place :class:`~jax.sharding.PartitionSpec` s on the PARAMETERS only,
  with the Megatron alternation inside every dense stack: even layers
  column-parallel ``P(None, 'tp')`` (bias ``P('tp')``), odd layers
  row-parallel ``P('tp', None)`` (bias replicated).  A column→row pair
  needs exactly one all-reduce, which the partitioner inserts; activation
  shardings are propagated, never annotated by hand.
- Dims that do not divide the ``tp`` axis stay replicated (the tiny
  2-wide predictor heads, the scalar ``tau_delta``) — GSPMD remains
  correct under any mix of sharded and replicated operands.
- Composes with data parallelism over a 2-D ``('dp', 'tp')`` mesh: the
  window-channel batch axis is sharded on ``dp`` (reusing
  :func:`piml_tpu.parallel.sharding.shard_channeled_batch`), params are
  sharded on ``tp`` and replicated across ``dp``; the gradient ``psum``
  over ``dp`` and the activation collectives over ``tp`` are both
  XLA-inserted because the updated params are constrained back to the
  param specs (replicated on ``dp``).

Correctness is proven on the virtual 8-device CPU mesh
(tests/test_tensor_parallel.py): forward equivalence at tp=8 and a
multi-step dp×tp finetune trajectory equal to single-device within fp
reduction-order tolerance.  The driver's ``dryrun_multichip`` runs the
dp×tp step as its tp segment.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DENSE_RE = re.compile(r"^dense_(\d+)$")


def _path_keys(path) -> list:
    keys = []
    for entry in path:
        k = getattr(entry, "key", None)
        if k is None:
            k = getattr(entry, "name", None)
        if k is None:
            k = getattr(entry, "idx", None)
        keys.append(str(k))
    return keys


def tp_param_spec(path, leaf, tp: int) -> P:
    """PartitionSpec for one param leaf under the Megatron alternation.

    ``path`` is a ``tree_map_with_path`` key path; the innermost
    ``dense_<i>`` module decides the parity (even → column-parallel,
    odd → row-parallel).  Any dim that does not divide ``tp`` replicates.
    """
    keys = _path_keys(path)
    dense_idx = None
    for k in keys:
        m = _DENSE_RE.match(k)
        if m:
            dense_idx = int(m.group(1))
    if dense_idx is None or leaf.ndim == 0:
        return P()
    name = keys[-1]
    col = dense_idx % 2 == 0
    if name == "kernel" and leaf.ndim == 2:
        if col and leaf.shape[1] % tp == 0:
            return P(None, "tp")
        if not col and leaf.shape[0] % tp == 0:
            return P("tp", None)
        return P()
    if name == "bias" and leaf.ndim == 1:
        if col and leaf.shape[0] % tp == 0:
            return P("tp")
        return P()
    return P()


def tp_param_shardings(params: Any, mesh: Mesh, axis: str = "tp") -> Any:
    """Pytree of :class:`NamedSharding` matching ``params`` — Megatron
    alternation on the ``axis`` mesh axis, everything else replicated
    (including across any other mesh axes, e.g. ``dp``)."""
    tp = mesh.shape[axis]

    def one(path, leaf):
        spec = tp_param_spec(path, leaf, tp)
        if axis != "tp":
            spec = P(*[axis if s == "tp" else s for s in spec])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_tp(params: Any, mesh: Mesh,
                    axis: str = "tp") -> Tuple[Any, Any]:
    """Place ``params`` tensor-sharded on the mesh; returns
    ``(sharded_params, shardings)`` (the shardings tree is reused as the
    step's output constraint)."""
    shardings = tp_param_shardings(params, mesh, axis)
    return jax.device_put(params, shardings), shardings


def make_tp_dp_finetune_step(cfg, apply_fn, tx, mesh: Mesh,
                             param_shardings: Any):
    """Finetune train step over a 2-D ``('dp', 'tp')`` mesh: batch
    channels sharded on ``dp`` (see
    :func:`~piml_tpu.parallel.sharding.shard_channeled_batch`), params
    tensor-sharded per ``param_shardings``.  XLA inserts the gradient
    all-reduce over ``dp`` and the activation collectives over ``tp``
    because the updated params are constrained back to
    ``param_shardings`` (dp-replicated, tp-sharded)."""
    import optax

    from piml_tpu.engine.simulator import training_rollout_loss

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            out = training_rollout_loss(p, apply_fn, cfg, batch)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        params2 = jax.lax.with_sharding_constraint(params2, param_shardings)
        return params2, opt_state2, out

    return step


def make_tp_apply(model, mesh: Mesh, params: Any, axis: str = "tp"):
    """Tensor-shard ``params`` and return ``(apply_jit, sharded_params)``
    for sharded inference: ``apply_jit(p, ped, obs, self_f)`` runs the
    forward pass with the weight matmuls split over the ``axis`` devices
    (inputs replicated, output replicated)."""
    sharded, _ = shard_params_tp(params, mesh, axis)

    @jax.jit
    def apply_jit(p, ped, obs, self_f):
        return model.apply(p, ped, obs, self_f)

    return apply_jit, sharded
