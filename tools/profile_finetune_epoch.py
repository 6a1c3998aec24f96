"""Attribute the finetune epoch's wall-clock (VERDICT r3 item 2).

RESULTS.md's paper-budget finetune runs ~11.7 s/epoch steady-state while
the measured train step accounts for ~0.7 s.  This tool reproduces one
steady-state epoch at the paper GC config with per-phase timers:

  * train      — the scanned ft_epoch programs (one per shape group)
  * host_sync  — pulling the per-epoch scalars to host
  * val_rollout— the jitted closed-loop validation rollout
  * val_coll   — the two collision_count sweeps (soft + hard)
  * val_rest   — post_process + masked MSE + host pulls

Writes epoch_breakdown.json and prints one line per phase.  Run on the
TPU (the ambient backend); ~2 min warm.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def block(x):
    jax.block_until_ready(x)
    return x


def main():
    from piml_tpu.data import FinetuneDataset, channel_batches
    from piml_tpu.engine import (engine_config, eval_rollout, evaluate_rollouts,
                                 post_process)
    from piml_tpu.engine.simulator import spawn_frames_from_scene  # noqa: F401
    from piml_tpu.metrics import collision_count, mae_with_time_mask
    from piml_tpu.models import ModelSpec, build_finetune_model
    from piml_tpu.train import Trainer
    from piml_tpu.utils import MetricLogger

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from run_gc_experiment import paper_cfg

    cfg = paper_cfg(epochs=1)
    real = FinetuneDataset()
    real.load_data(cfg.ft_data_config)
    cfg = real.build_dataset(cfg)
    rng = np.random.RandomState(cfg.seed)
    batches = channel_batches(real.train_data, cfg.ft_batch_size, rng,
                              shuffle=True)
    print(f"channels/scene: {[b.num_channels for b in batches[:4]]}... "
          f"({len(batches)} batches), valid scenes: {len(real.valid_data)} "
          f"N={real.valid_data[0].position.shape[-2]} "
          f"T={real.valid_data[0].num_frames}")

    trainer = Trainer(cfg, MetricLogger())
    # run ONE epoch through the real path to build+compile everything,
    # then time the steady state phase by phase
    import io
    from contextlib import redirect_stdout

    t0 = time.time()
    with redirect_stdout(io.StringIO()):
        state = trainer.finetune(batches, real.valid_data, None)
    t_first = time.time() - t0
    print(f"first epoch(s) incl. compile: {t_first:.1f} s "
          f"(epochs ran: {state.epoch + 1})")

    # ---- steady-state phases ------------------------------------------
    params = state.params
    apply_fn = lambda p, pf, of, sf: trainer.model.apply(p, pf, of, sf)
    out = {}

    # validation rollout
    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)
    data = real.valid_data[0]
    r = block(eval_rollout(params, apply_fn, ecfg, data, cfg.skip_frames))
    t0 = time.time()
    r = block(eval_rollout(params, apply_fn, ecfg, data, cfg.skip_frames))
    out["val_rollout_s"] = time.time() - t0

    p_pred = r.position
    t0 = time.time()
    c1 = float(collision_count(p_pred[cfg.skip_frames:], cfg.collision_threshold))
    c2 = float(collision_count(p_pred[cfg.skip_frames:], cfg.collision_threshold / 2))
    out["val_coll_s"] = time.time() - t0

    t0 = time.time()
    p_post = post_process(data, p_pred, r.mask_p, data.mask_p_pred)
    labels = data.labels[..., :2]
    import jax.numpy as jnp

    m = (data.mask_p_pred == 1)[..., None]
    mse = float(jnp.sum(jnp.where(m, (p_post - labels) ** 2, 0.0)))
    out["val_rest_s"] = time.time() - t0

    t0 = time.time()
    m_all = evaluate_rollouts(params, apply_fn, cfg, real.valid_data,
                              test_flag=False)
    out["validate_total_s"] = time.time() - t0

    # train phase: rebuild the epoch program exactly as finetune does
    # (reuse the trainer's jitted objects by timing one more epoch of the
    # real loop with validation disabled via a huge patience... simpler:
    # time the full loop epoch and subtract validate_total)
    cfg2 = cfg.replace(epochs=state.epoch + 3, resume=False)
    trainer.cfg = cfg2
    t0 = time.time()
    with redirect_stdout(io.StringIO()):
        state2 = trainer.finetune(batches, real.valid_data, None,
                                  pretrained=params)
    wall = time.time() - t0
    epochs_ran = state2.epoch + 1
    out["full_epoch_s"] = wall / max(epochs_ran, 1)
    out["train_plus_host_s"] = out["full_epoch_s"] - out["validate_total_s"]
    out["epochs_timed"] = epochs_ran
    out["collision_sanity"] = [c1, c2, mse, m_all.loss]

    print(json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "epoch_breakdown.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
