"""Training loops: pointwise pretraining and differentiable rollout finetune.

Reference: src/models/simulators.py:291-428.  Torch Adam + L2 weight decay
maps to ``optax.chain(add_decayed_weights, scale_by_adam, scale(-lr))`` (torch
adds ``wd·θ`` to the gradient *before* the Adam moments).  The finetune
optimizer reproduces the per-group learning rates (corrector branch at
``lr·ft_lr_decay2``, pretrained weights at ``lr·finetune_lr_decay``,
simulators.py:108-131) via ``optax.multi_transform`` over parameter paths.
Early stopping keeps the reference's swapped-patience quirk behind
``compat_swapped_patience`` (simulators.py:393).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from piml_tpu.config import PIMLConfig
from piml_tpu.data.views import ChanneledData, PointwiseData, TimeIndexedData
from piml_tpu.engine.simulator import (
    evaluate_rollouts,
    training_rollout_loss,
)
from piml_tpu.models import (
    ModelSpec,
    build_finetune_model,
    build_model,
    pretrain_model_name,
)
from piml_tpu.physics import forces
from piml_tpu.train import losses
from piml_tpu.utils import compile_attrib
from piml_tpu.utils.logging import MetricLogger


def _configure_prng(cfg: PIMLConfig) -> None:
    """Select the PRNG implementation for the training streams (dropout,
    random-walk noise).  TPU auto-defaults to the hardware 'rbg' generator:
    threefry costs ~50% of the paper-config BPTT step (15.1 -> 11.3 ms/step
    measured, prng_rbg.json).  Raw PRNG keys are interpreted through the
    global default impl, so this must run before any key is created; keys
    are never checkpointed (epoch streams are re-derived by fold_in), so
    the choice does not affect resume."""
    impl = cfg.prng_impl or (
        "rbg" if jax.default_backend() == "tpu" else "")
    if impl:
        jax.config.update("jax_default_prng_impl", impl)


def make_optimizer(cfg: PIMLConfig, finetune: bool = False) -> optax.GradientTransformation:
    lr = cfg.learning_rate
    wd = cfg.weight_decay
    if not finetune:
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(),
            optax.scale(-lr),
        )
    if cfg.model in {"base", "pinnsf_res"}:
        # per-group LRs by parameter path (simulators.py:108-124)
        def label_fn(params):
            def label(path, _):
                joined = "/".join(str(p) for p in path)
                return "corrector" if "corrector" in joined else "pretrained"
            return jax.tree_util.tree_map_with_path(label, params)

        group = lambda mult: optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(),
            optax.scale(-lr * mult),
        )
        return optax.multi_transform(
            {"corrector": group(cfg.ft_lr_decay2),
             "pretrained": group(cfg.finetune_lr_decay)},
            label_fn,
        )
    return optax.chain(
        optax.add_decayed_weights(wd * cfg.finetune_wd_aug),
        optax.scale_by_adam(),
        optax.scale(-lr * cfg.finetune_lr_decay),
    )


def make_batches(n: int, batch_size: int, rng: np.random.RandomState,
                 shuffle: bool = True, drop_last: bool = True) -> List[np.ndarray]:
    """Shuffled index chunks (reference: src/utils/data_loader.py:14-38)."""
    idx = np.arange(n)
    if shuffle:
        idx = idx[rng.permutation(n)]
    batches = [idx[i * batch_size:(i + 1) * batch_size]
               for i in range(n // batch_size)]
    if not drop_last and n % batch_size:
        batches.append(idx[n - n % batch_size:])
    return batches


def _chunk_pointwise(data: PointwiseData, chunk: int):
    """Pad-and-reshape a pointwise set into (n_chunks, chunk, ...) device
    arrays plus a validity mask, for chunked single-program validation."""
    n = len(data)
    pad = (-n) % chunk
    def prep(x):
        x = np.asarray(x)
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return jnp.asarray(x.reshape((-1, chunk) + x.shape[1:]))
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    chunks = (prep(data.ped_features), prep(data.obs_features),
              prep(data.self_features), prep(data.labels),
              jnp.asarray(mask.reshape(-1, chunk)))
    return chunks, n


# ---------------------------------------------------------------------------
# checkpointing (reference: simulators.py:251-289 naming contract)
# ---------------------------------------------------------------------------

def checkpoint_path(cfg: PIMLConfig, finetuned: bool) -> str:
    os.makedirs(cfg.save_dir, exist_ok=True)
    path = os.path.join(cfg.save_dir, f"{cfg.exp_name}_{cfg.model_name_suffix}")
    if finetuned:
        path += "_finetuned"
    return path


def save_params(path: str, params) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def merge_pretrained(ft_params, pretrained) -> Any:
    """Partial parameter-tree warm start: copy every pretrained leaf whose
    path exists in the finetune model (reference: simulators.py:417-422)."""
    flat_ft = dict(jax.tree_util.tree_flatten_with_path(ft_params)[0])
    flat_pre = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    merged = {
        path: flat_pre.get(path, leaf) if flat_pre.get(path) is not None
        and flat_pre[path].shape == leaf.shape else leaf
        for path, leaf in flat_ft.items()
    }
    treedef = jax.tree_util.tree_structure(ft_params)
    ordered = [merged[p] for p, _ in jax.tree_util.tree_flatten_with_path(ft_params)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered)


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

@dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: int = 0
    best_val: float = float("inf")
    patience: int = 0


def _resume_dir(cfg: PIMLConfig, finetuned: bool) -> str:
    return checkpoint_path(cfg, finetuned) + "_resume"


def _save_resumable(cfg: PIMLConfig, state: TrainState, finetuned: bool) -> None:
    from piml_tpu.train import checkpoint as ckpt

    ckpt.save_train_state(
        _resume_dir(cfg, finetuned), state.epoch, state.params, state.opt_state,
        extra={"best_val": state.best_val, "patience": state.patience,
               "epoch": state.epoch},
    )


def _try_resume(cfg: PIMLConfig, state: TrainState, finetuned: bool,
                logger: MetricLogger) -> int:
    """Restore the latest full TrainState; returns the epoch to start from.

    Epoch-granular by design: with scanned epochs the epoch is the atomic
    dispatch unit, and per-epoch derived RNGs make the continuation
    bit-identical to an uninterrupted run."""
    from piml_tpu.train import checkpoint as ckpt

    template = {
        "params": state.params, "opt_state": state.opt_state,
        "extra": {"best_val": 0.0, "patience": 0, "epoch": 0},
    }
    restored = ckpt.restore_train_state(_resume_dir(cfg, finetuned), template)
    if restored is None:
        return 0
    state.params = restored["params"]
    state.opt_state = restored["opt_state"]
    state.best_val = float(restored["extra"]["best_val"])
    state.patience = int(restored["extra"]["patience"])
    start = int(restored["extra"]["epoch"]) + 1
    logger.info(f"resumed from epoch {start - 1} "
                f"(best_val={state.best_val:.6f}, patience={state.patience})")
    return start


class Trainer:
    """Pretrain / finetune driver (reference: BaseSimulator.train/finetune)."""

    def __init__(self, cfg: PIMLConfig, logger: Optional[MetricLogger] = None):
        self.cfg = cfg
        self.logger = logger or MetricLogger()
        self.finetune_flag = False
        _configure_prng(cfg)  # before any key is created
        spec = ModelSpec.from_config(cfg, name=pretrain_model_name(cfg.model))
        self.model = build_model(spec)
        self.rng = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------
    def init_params(self, sample: PointwiseData):
        self.rng, key = jax.random.split(self.rng)
        # jit the init: flax otherwise dispatches every layer's RNG-derive +
        # initializer as its own eager device op (~seconds of per-op tunnel
        # latency for a deep ResDNN stack); one compiled program instead
        params = jax.jit(self.model.init)(
            key, sample.ped_features[:1], sample.obs_features[:1],
            sample.self_features[:1],
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        self.logger.info(f"#Trainable Parameters: {n}")
        return params

    def apply_fn(self, params, pf, of, sf):
        return self.model.apply(params, pf, of, sf)

    # ------------------------------------------------------------------
    def _pointwise_step_fn(self):
        @jax.jit
        def step(params, opt_state, ped, obs, self_f, labels, rng):
            def loss_fn(p):
                return self._pointwise_loss_terms(
                    p, ped, obs, self_f, labels, rng)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        return step

    def _pointwise_loss_terms(self, params, ped, obs, self_f, labels, rng):
        """Shared pretrain loss stack (reference: simulators.py:327-359)."""
        cfg = self.cfg
        out = self.model.apply(params, ped, obs, self_f, deterministic=False,
                               rngs={"dropout": rng})
        pred, p_msg = out.pred_acc, out.ped_msgs
        if cfg.pinnsf_interaction == "loss":
            sf_version = "v2" if cfg.iter_flag else "v0"
            analytic = forces.pairwise_acceleration(
                ped, sf_version, cfg.dataset_name,
                dv_from_velocity=cfg.sf_dv_from_velocity)
            mse = (jnp.sum((p_msg - analytic) ** 2)
                   + cfg.true_label_weight
                   * jnp.sum((pred - labels[:, 4:6]) ** 2))
        else:
            mse = jnp.sum((pred - labels[:, 4:6]) ** 2)
        loss = mse
        reg = jnp.zeros(())
        if cfg.reg_weight > 0 and p_msg is not None:
            reg = losses.l1_reg_loss(p_msg, cfg.reg_weight, "sum")
            loss = loss + reg
        cp_loss = jnp.zeros(())
        cp_acc = jnp.zeros(())
        if cfg.collision_pred_weight > 0 and out.coll_pred is not None \
                and cfg.model == "pinnsf_bm":
            target = labels[:, 6:]
            cp_loss = losses.binary_cross_entropy(out.coll_pred, target, "sum")
            cp_acc = jnp.mean(
                (jnp.round(out.coll_pred) == target).astype(jnp.float32)
            )
            # reference pretrain adds the BCE UNWEIGHTED (simulators.py:354;
            # the weight only gates) — compat default reproduces that
            w = 1.0 if cfg.compat_unweighted_coll_pred else cfg.collision_pred_weight
            loss = loss + w * cp_loss
        return loss, (mse, reg, cp_loss, cp_acc)

    def _epoch_fn(self, val_chunk: int):
        """One jitted program per epoch: lax.scan over shuffled batches plus
        chunked full-validation — a single host sync per epoch instead of one
        per batch (the axon tunnel costs ~28 ms per dispatch, which dominated
        round-1 pretraining; see RESULTS.md round-1 'host dispatch' note).

        Validation runs in fixed-size chunks via ``lax.map`` so the full
        valid set never materializes its (R, k, 6) activations at once."""
        tx = self.tx

        # no buffer donation: best_params/checkpointing hold references to
        # earlier epochs' outputs, which donation would invalidate
        @partial(jax.jit, static_argnames=("n_valid",))
        def epoch(params, opt_state, train, valid, batch_idx, rng,
                  n_valid: int):
            def body(carry, xs):
                params, opt_state = carry
                idx, key = xs
                def loss_fn(p):
                    return self._pointwise_loss_terms(
                        p,
                        jnp.take(train.ped_features, idx, axis=0),
                        jnp.take(train.obs_features, idx, axis=0),
                        jnp.take(train.self_features, idx, axis=0),
                        jnp.take(train.labels, idx, axis=0),
                        key,
                    )

                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                mse, reg, cp, cp_acc = aux
                return (params, opt_state), jnp.stack(
                    [loss, mse, reg, cp, cp_acc * idx.shape[0]]
                )

            keys = jax.random.split(rng, batch_idx.shape[0])
            (params, opt_state), stats = jax.lax.scan(
                body, (params, opt_state), (batch_idx, keys)
            )

            cfg = self.cfg
            supervise_msgs = (cfg.val_on_train_objective
                              and cfg.pinnsf_interaction == "loss")

            def val_chunk_fn(args):
                ped, obs, sf, lab, m = args
                out = self.model.apply(params, ped, obs, sf)
                if supervise_msgs:
                    # validate on the actual training objective (message
                    # supervision), not the reference's acc-MSE — the
                    # misaligned signal stops message fitting ~100× early
                    sf_version = "v2" if cfg.iter_flag else "v0"
                    analytic = forces.pairwise_acceleration(
                        ped, sf_version, cfg.dataset_name,
                        dv_from_velocity=cfg.sf_dv_from_velocity)
                    err = jnp.sum((out.ped_msgs - analytic) ** 2,
                                  axis=(-2, -1)) * m
                else:
                    err = jnp.sum((out.pred_acc - lab[:, 4:6]) ** 2,
                                  axis=-1) * m
                return jnp.sum(err)

            sq_sum = jnp.sum(jax.lax.map(val_chunk_fn, valid))
            val_mse = sq_sum / (2.0 * n_valid)
            return params, opt_state, jnp.sum(stats, axis=0), val_mse

        return epoch

    # ------------------------------------------------------------------
    def train_pointwise(
        self,
        train_data: PointwiseData,
        valid_data: PointwiseData,
        params=None,
    ) -> TrainState:
        """Pointwise pretraining with early stopping
        (reference: simulators.py:291-393, tensor-batch branch)."""
        cfg = self.cfg
        self.tx = make_optimizer(cfg, finetune=False)
        if params is None:
            params = self.init_params(train_data)
        # one program, not an eager zeros_like per leaf (same deferred-op
        # backlog class as the finetune setup stall — see finetune())
        opt_state = jax.jit(self.tx.init)(params)
        state = TrainState(params, opt_state)
        best_params = params
        patience_limit = cfg.ft_patience if cfg.compat_swapped_patience else cfg.patience
        start_epoch = _try_resume(cfg, state, False, self.logger) if cfg.resume else 0
        if start_epoch and os.path.exists(checkpoint_path(cfg, False)):
            best_params = load_params(checkpoint_path(cfg, False), params)

        # device-resident data + whole-epoch jitted program: ONE host sync per
        # epoch (train scan + chunked validation) instead of one per batch
        n = len(train_data)
        n_batches = max(n // cfg.batch_size, 1)
        batch_size = min(cfg.batch_size, n)
        train_dev = jax.device_put(train_data)
        val_chunk = min(8192, max(len(valid_data), 1))
        valid_chunks, n_valid = _chunk_pointwise(valid_data, val_chunk)
        epoch_fn = self._epoch_fn(val_chunk)

        start = time.time()
        for epoch in range(start_epoch, cfg.epochs):
            state.epoch = epoch
            # per-epoch derived RNGs: shuffling and dropout depend only on
            # (seed, epoch), so a resumed run continues bit-identically
            perm = np.random.RandomState(cfg.seed + epoch).permutation(n)[
                :n_batches * batch_size]
            batch_idx = jnp.asarray(
                perm.reshape(n_batches, batch_size), jnp.int32
            )
            key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch)
            state.params, state.opt_state, stats, val_mse = epoch_fn(
                state.params, state.opt_state, train_dev, valid_chunks,
                batch_idx, key, n_valid=n_valid,
            )
            # single host sync for the whole epoch; plain floats for the logger
            stats = [float(s) for s in np.asarray(stats)]
            n_train = n_batches * batch_size
            self.logger.log(
                epoch=epoch, time=time.time() - start,
                train_loss=stats[0] / n_train, train_mse=stats[1] / n_train,
                coll_pred=stats[3] / n_train, acc_pred=stats[4] / n_train,
            )
            val_loss = float(val_mse)
            self.logger.log(epoch=epoch, val_loss=val_loss, val_mse=val_loss)

            if val_loss < state.best_val:
                self.logger.info(f"model saved at epoch {epoch}")
                save_params(checkpoint_path(cfg, self.finetune_flag), state.params)
                best_params = state.params
                state.best_val = val_loss
                state.patience = 0
            else:
                state.patience += 1
                if state.patience > patience_limit:
                    break
            if cfg.resume and epoch % max(cfg.resume_every, 1) == 0:
                _save_resumable(cfg, state, False)
        # the reference evaluates the best-validation checkpoint, not the
        # last epoch (load_model=True in test_multiple_rollouts,
        # simulators.py:563-564)
        state.params = best_params
        return state

    # ------------------------------------------------------------------
    def finetune(
        self,
        train_batches: Optional[List[ChanneledData]] = None,
        valid_data: List[TimeIndexedData] = None,
        test_data: Optional[List[TimeIndexedData]] = None,
        pretrained=None,
        *,
        train_scenes: Optional[List[ChanneledData]] = None,
        shuffle: bool = True,
    ) -> TrainState:
        """Rollout finetuning (reference: simulators.py:409-428): fresh
        finetune model, partial warm start, BPTT through the scan.

        Pass EITHER ``train_batches`` (a :func:`channel_batches` list —
        legacy path, one device slice per batch) or ``train_scenes`` (the
        channeled scenes themselves): the scene path builds the stacked
        epoch-scan inputs with :func:`stacked_channel_batches` — one fused
        gather per field per scene, identical batch composition
        (``RandomState(cfg.seed)``, ``shuffle``) and bit-identical stacks,
        but without the per-batch device-op storm that cost 136 s of setup
        through the TPU tunnel at the GC paper shape."""
        cfg = self.cfg
        t_setup = time.time()
        assert (train_batches is None) != (train_scenes is None), \
            "pass exactly one of train_batches / train_scenes"
        spec = ModelSpec.from_config(cfg)
        self.model = build_finetune_model(spec)
        self.finetune_flag = True
        self.tx = make_optimizer(cfg, finetune=True)

        sample = train_batches[0] if train_batches is not None \
            else train_scenes[0]
        self.rng, key = jax.random.split(self.rng)
        if pretrained is None:
            pre_path = checkpoint_path(cfg, finetuned=False)
            if os.path.exists(pre_path):
                spec_pre = ModelSpec.from_config(cfg, name=pretrain_model_name(cfg.model))
                pre_model = build_model(spec_pre)
                # structure-only template: load_params needs the tree shape,
                # not materialized arrays
                template = jax.eval_shape(
                    pre_model.init, jax.random.PRNGKey(0),
                    sample.ped_features[0, 0], sample.obs_features[0, 0],
                    sample.self_features[0, 0])
                pretrained = load_params(pre_path, template)
        t_init = time.time()

        # ONE fused program for the whole state setup: model init + partial
        # warm-start merge + optimizer init.  The eager form dispatched a
        # few hundred per-leaf device ops whose deferred executions the
        # first validation sync then absorbed — a 873-1216 s stall through
        # the tunnel (compile_attrib_r5new_*.json; faulthandler stall trace
        # pins the wait at evaluate_rollouts' first host sync).  merge
        # decisions are shape-static, so the merge traces to pure data flow.
        def _setup(k, pf, of, sf, pre):
            p = self.model.init(k, pf, of, sf)
            if pre is not None:
                p = merge_pretrained(p, pre)
            return p, self.tx.init(p)

        params, opt_state = jax.jit(_setup)(
            key, sample.ped_features[0, 0], sample.obs_features[0, 0],
            sample.self_features[0, 0], pretrained)
        state = TrainState(params, opt_state)
        compile_attrib.mark("ft_init_warmstart")

        # dropout is LIVE during the finetune rollout (the reference trains
        # under model.train(), simulators.py:295); rng=None falls back to the
        # deterministic forward used by validation/eval
        def apply_fn(p, pf, of, sf, rng=None):
            if rng is None or cfg.dropout <= 0:
                return self.model.apply(p, pf, of, sf)
            return self.model.apply(p, pf, of, sf, deterministic=False,
                                    rngs={"dropout": rng})

        stochastic = cfg.dropout > 0

        # NOT separately jitted: ft_step only runs inside ft_epoch's scan
        # body, and a nested jit traces the full BPTT loss a second time
        # (~5.8 s of the finetune setup, compile_attrib_r5cold.json
        # per_program: ft_step and ft_epoch_fn each ~5.8 s of trace)
        def ft_step(params, opt_state, batch: ChanneledData, rng):
            def loss_fn(p):
                out = training_rollout_loss(
                    p, apply_fn, cfg, batch, rng=rng if stochastic else None)
                return out.loss, out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state2 = self.tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, out

        def ft_epoch_fn(params, opt_state, stacked: ChanneledData, epoch_key):
            """lax.scan over a same-shape stack of window batches: one
            dispatch + one host sync per group per epoch instead of per
            batch (the reference's per-batch loop is simulators.py:317-326;
            here the whole epoch is one XLA program)."""
            n_batches = jax.tree_util.tree_leaves(stacked)[0].shape[0]
            keys = jax.random.split(epoch_key, n_batches)

            def body(carry, xs):
                batch, key = xs
                params, opt_state = carry
                params, opt_state, out = ft_step(params, opt_state, batch, key)
                return (params, opt_state), out

            (params, opt_state), outs = jax.lax.scan(
                body, (params, opt_state), (stacked, keys)
            )
            return params, opt_state, jax.tree_util.tree_map(
                lambda x: jnp.sum(x), outs
            )

        ft_epoch = jax.jit(ft_epoch_fn)

        def validate() -> float:
            # under channel-DP the params live replicated on the mesh while
            # the eval data is uncommitted — mixing the two in one jit
            # raises a device-assignment error, so pull them to host first;
            # single-device skips the D2H roundtrip (dp_mesh is assigned
            # before the first validate() call)
            p = jax.device_get(state.params) if dp_mesh is not None \
                else state.params
            m = evaluate_rollouts(p, apply_fn,
                                  cfg, valid_data, test_flag=False)
            self.logger.log(val_loss=m.loss, val_mse=m.mse,
                            val_coll=m.collision, val_hard_coll=m.hard_collision)
            return m.loss

        patience_limit = cfg.patience if cfg.compat_swapped_patience else cfg.ft_patience
        # epoch-0 checkpoint + baseline validation (simulators.py:298-304)
        dp_mesh = None  # set for real below; validate() closes over it
        t_ck = time.time()
        start_epoch = _try_resume(cfg, state, True, self.logger) if cfg.resume else 0
        if start_epoch:
            best_params = load_params(checkpoint_path(cfg, True), state.params) \
                if os.path.exists(checkpoint_path(cfg, True)) else state.params
        else:
            save_params(checkpoint_path(cfg, True), state.params)
            best_params = state.params
            t_ck = time.time()
            # the epoch-0 checkpoint write is the first hard sync point of
            # the finetune: it absorbs every async dispatch above it
            # (params init/merge, opt init), so attribute it separately
            # from the baseline validation
            compile_attrib.mark("ft_epoch0_ckpt")
            state.best_val = validate()
            self.logger.info(
                f"finetune setup: init+warm-start {t_init - t_setup:.1f} s, "
                f"epoch-0 checkpoint {t_ck - t_init:.1f} s, "
                f"baseline validation {time.time() - t_ck:.1f} s")
        compile_attrib.mark("ft_baseline_validate")
        t_stack = time.time()

        # group same-shape window batches into stacked scan inputs; batch
        # composition is fixed across epochs, matching the reference's
        # loader-built-once batches (src/main.py:131, data_loader.py:41).
        # meta_data is a static pytree field that differs per source scene
        # (begin_frame etc.) — normalize it so same-shape batches from
        # different scenes stack into one scan.
        if cfg.n_devices > 1:
            # channel data parallel over a device mesh: batches pad their
            # channel axis to the mesh size (inert channels, loss-neutral),
            # stacked scan inputs shard P(None, 'dp'), params/opt replicate —
            # XLA inserts the gradient all-reduce over ICI
            from piml_tpu.parallel import make_mesh, pad_channels, replicate

            dp_mesh = make_mesh(cfg.n_devices)
            self.logger.info(f"finetune: channel-DP over {cfg.n_devices} devices")
            if train_batches is not None:
                train_batches = [pad_channels(b, cfg.n_devices)
                                 for b in train_batches]
            state.params = replicate(state.params, dp_mesh)
            state.opt_state = replicate(state.opt_state, dp_mesh)

        if train_scenes is not None:
            from piml_tpu.data.datasets import stacked_channel_batches

            stacks, n_train_dev = stacked_channel_batches(
                train_scenes, cfg.ft_batch_size,
                np.random.RandomState(cfg.seed), shuffle=shuffle,
                time_unit_default=cfg.time_unit)
            if dp_mesh is not None:
                from piml_tpu.parallel import pad_channels_stacked

                stacks = [pad_channels_stacked(s, cfg.n_devices)
                          for s in stacks]
            n_train = max(int(np.asarray(n_train_dev)), 1)
        else:
            groups: Dict[tuple, list] = {}
            for batch in train_batches:
                tu = batch.meta_data.get("time_unit", cfg.time_unit)
                batch = batch.replace(meta_data={"time_unit": tu})
                groups.setdefault(
                    tuple(batch.ped_features.shape) + (tu,), []
                ).append(batch)
            stacks = [
                jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
                for bs in groups.values()
            ]
            n_train = max(sum(
                int(np.sum(np.asarray(b.mask_p_pred) == 1))
                for b in train_batches
            ), 1)
        if dp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from piml_tpu.parallel import shard_stacked_channeled

            stacks = [shard_stacked_channeled(s, dp_mesh) for s in stacks]
            repl = NamedSharding(dp_mesh, P())
            ft_epoch = jax.jit(ft_epoch_fn, out_shardings=(repl, repl, None))
        jax.block_until_ready(stacks)
        self.logger.info(
            f"finetune setup: batch stacking + n_train scan "
            f"{time.time() - t_stack:.1f} s ({len(stacks)} shape groups)")
        compile_attrib.mark("ft_stacking")

        start = time.time()
        for epoch in range(start_epoch, cfg.epochs):
            state.epoch = epoch
            log = dict(loss=0.0, mse=0.0, coll=0.0, hard=0.0, cp=0.0, reg=0.0,
                       coll_count=0.0, hard_count=0.0)
            # epoch/stack-derived keys: a resumed run replays the identical
            # dropout stream (same property as the pretrain loop)
            ep_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), epoch)
            for si, stacked in enumerate(stacks):
                state.params, state.opt_state, out = ft_epoch(
                    state.params, state.opt_state, stacked,
                    jax.random.fold_in(ep_key, si),
                )
                # one host sync per shape group: eight separate float()
                # fetches each pay the tunnel round trip (~28 ms) — at a
                # handful of groups that was ~1 s/epoch of pure latency
                vals = np.asarray(jnp.stack([
                    jnp.asarray(s, jnp.float32) for s in (
                        out.collision_count, out.hard_collision_count,
                        out.loss, out.mse_loss, out.collision_loss,
                        out.hard_collision_loss, out.collision_pred_loss,
                        out.reg_loss)]))
                for k, v in zip(("coll_count", "hard_count", "loss", "mse",
                                 "coll", "hard", "cp", "reg"), vals):
                    log[k] += float(v)

            self.logger.log(
                epoch=epoch, time=time.time() - start,
                train_loss=log["loss"] / n_train, train_mse=log["mse"] / n_train,
                coll_loss=log["coll"] / n_train, hard_coll_loss=log["hard"] / n_train,
                coll_count=log["coll_count"], hard_coll_count=log["hard_count"],
            )

            val_loss = validate()
            if epoch == start_epoch:
                compile_attrib.mark("ft_first_epoch")
            if val_loss < state.best_val:
                self.logger.info(f"model saved at epoch {epoch}")
                save_params(checkpoint_path(cfg, True), state.params)
                best_params = state.params
                state.best_val = val_loss
                state.patience = 0
            else:
                state.patience += 1
                if state.patience > patience_limit:
                    break
            if cfg.resume and epoch % max(cfg.resume_every, 1) == 0:
                _save_resumable(cfg, state, True)
        compile_attrib.mark("ft_steady_epochs")

        # final evaluation uses the best-validation checkpoint
        # (reference: finetune → test_multiple_rollouts with load_model=True,
        # simulators.py:427,563-564).  device_get: hand back host arrays so
        # callers are indifferent to whether channel-DP placed the params on
        # a mesh
        state.params = jax.device_get(best_params)
        state.opt_state = jax.device_get(state.opt_state)
        if test_data:
            m = evaluate_rollouts(state.params, apply_fn, cfg, test_data,
                                  test_flag=True)
            self.logger.log(test_loss=m.loss, test_mse=m.mse, test_mae=m.mae,
                            test_ot=m.ot, test_mmd=m.mmd,
                            test_coll=m.collision, test_hard_coll=m.hard_collision)
        return state
