"""Attribute the finetune epoch's wall-clock (VERDICT r3 item 2).

RESULTS.md's paper-budget finetune ran ~11.7 s/epoch steady-state while
the measured train step accounts for ~0.7 s.  Measured attribution (first
run of this tool): the per-epoch closed-loop validation dominated, and
inside it the two EAGER collision sweeps alone were ~12 s (each frame's
(N, N) contact reduction dispatched op-by-op through the tunnel).  The
fix (engine/simulator.py::_scene_eval_scalars) fuses the collision
sweeps + post_process + masked MSE + denominators into ONE jitted
program per scene; this tool now measures both the fused path and the
per-phase timings, and derives the steady-state epoch wall from the
trainer's OWN per-epoch log records inside a single finetune call (a
second call with a different epoch cap would recompile the scanned epoch
program and contaminate the timing).

Writes epoch_breakdown.json.  Run on the TPU; needs the pretrain
checkpoint for --suffix (default shared1 — produced by
tools/run_gc_experiment.py --stage pretrain --set model_name_suffix=shared1).
"""

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def block(x):
    jax.block_until_ready(x)
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="shared1",
                    help="model_name_suffix whose PRETRAIN checkpoint warm-"
                         "starts the finetune")
    ap.add_argument("--epochs", type=int, default=5)
    cli = ap.parse_args()

    from piml_tpu.data import FinetuneDataset, channel_batches
    from piml_tpu.data.views import to_pointwise
    from piml_tpu.engine import engine_config, eval_rollout, evaluate_rollouts
    from piml_tpu.engine.simulator import _scene_eval_scalars, post_process
    from piml_tpu.metrics import collision_count
    from piml_tpu.train import Trainer
    from piml_tpu.utils import MetricLogger

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from run_gc_experiment import load_pretrained, paper_cfg

    cfg = paper_cfg(epochs=cli.epochs).replace(
        model_name_suffix=cli.suffix, resume=False)
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

    jsonl = os.path.join(ROOT, "epoch_breakdown_log.jsonl")
    if os.path.exists(jsonl):
        os.remove(jsonl)
    logger = MetricLogger(jsonl_path=jsonl, stream=io.StringIO())
    trainer = Trainer(cfg, logger)
    pretrained = load_pretrained(cfg, trainer, to_pointwise(real.valid_data[0]))

    # ONE finetune call at a fixed epoch cap: per-epoch walls come from the
    # trainer's own cumulative time= records
    t0 = time.time()
    state = trainer.finetune(batches, real.valid_data, None,
                             pretrained=pretrained)
    wall = time.time() - t0
    with open(jsonl) as f:
        recs = [json.loads(l) for l in f]
    epoch_t = [r["time"] for r in recs if "epoch" in r and "time" in r]
    diffs = np.diff(epoch_t)
    out = {
        "epochs_ran": state.epoch + 1,
        "finetune_wall_s": wall,
        "first_epoch_incl_compile_s": epoch_t[0] if epoch_t else None,
        "steady_epoch_s": float(np.median(diffs)) if len(diffs) else None,
        # everything before the trainer's own epoch clock starts (model
        # init + warm-start merge + epoch-0 checkpoint + baseline
        # validation + stacking the batch groups) plus the post-loop
        # device_get — measured ~100 s at the paper config
        "outside_epoch_loop_s": wall - (epoch_t[-1] if epoch_t else 0.0),
        "train_loss_finite": bool(np.isfinite(
            [r for r in recs if "train_loss" in r][-1]["train_loss"])),
    }

    # ---- phase timings at the trained params --------------------------
    params = state.params
    apply_fn = lambda p, pf, of, sf: trainer.model.apply(p, pf, of, sf)

    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)
    data = real.valid_data[0]
    r = block(eval_rollout(params, apply_fn, ecfg, data, cfg.skip_frames))
    t0 = time.time()
    r = block(eval_rollout(params, apply_fn, ecfg, data, cfg.skip_frames))
    out["val_rollout_s"] = time.time() - t0

    # fused per-scene scalar program (the round-4 fix)
    fused = _scene_eval_scalars(data, r.position, r.mask_p, cfg.skip_frames,
                                cfg.collision_threshold)
    block(fused)
    t0 = time.time()
    fused = block(_scene_eval_scalars(data, r.position, r.mask_p,
                                      cfg.skip_frames,
                                      cfg.collision_threshold))
    out["val_scalars_fused_s"] = time.time() - t0

    # the pre-fix eager path, for the published before/after
    p_pred = r.position
    t0 = time.time()
    c1 = float(collision_count(p_pred[cfg.skip_frames:],
                               cfg.collision_threshold))
    c2 = float(collision_count(p_pred[cfg.skip_frames:],
                               cfg.collision_threshold / 2))
    p_post = post_process(data, p_pred, r.mask_p, data.mask_p_pred)
    import jax.numpy as jnp

    m = (data.mask_p_pred == 1)[..., None]
    mse = float(jnp.sum(jnp.where(m, (p_post - data.labels[..., :2]) ** 2,
                                  0.0)))
    out["val_scalars_eager_prefix_s"] = time.time() - t0

    t0 = time.time()
    m_all = evaluate_rollouts(params, apply_fn, cfg, real.valid_data,
                              test_flag=False)
    out["validate_total_s"] = time.time() - t0
    out["sanity"] = {"coll_fused": float(fused[0]), "coll_eager": c1,
                     "hard_fused": float(fused[1]), "hard_eager": c2,
                     "mse_fused": float(fused[2]), "mse_eager": mse,
                     "val_loss": m_all.loss}
    if out["steady_epoch_s"] is not None:
        out["train_plus_host_s"] = out["steady_epoch_s"] - out["validate_total_s"]

    print(json.dumps(out, indent=2))
    with open(os.path.join(ROOT, "epoch_breakdown.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
