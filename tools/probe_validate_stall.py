"""Probe the unattributed baseline-validation stall (round 5).

compile_attrib_r5warm.json shows ft_baseline_validate at 431 s wall with
~0 s of attributed compile/trace/cache-retrieval, while the identical phase
took 53 s in the cold run and 2.3 s in an earlier session — the variance
points at the axon tunnel layer, not at our program structure.  This tool
times the phase's constituent calls one by one, repeated, so the stall (if
it reproduces) is pinned to a specific dispatch.

    python tools/probe_validate_stall.py [--suffix shared1] [--reps 3]

Writes validate_stall_probe.json at the repo root.
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="shared1")
    ap.add_argument("--reps", type=int, default=3)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from piml_tpu.data import FinetuneDataset
    from piml_tpu.engine import evaluate_rollouts
    from piml_tpu.engine.simulator import (_scene_eval_scalars, engine_config,
                                           eval_rollout)
    from piml_tpu.train import Trainer
    from piml_tpu.utils import MetricLogger

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from run_gc_experiment import load_pretrained, paper_cfg

    out = {}

    def mark(name, t0):
        dt = round(time.time() - t0, 3)
        out.setdefault(name, []).append(dt)
        print(f"{name}: {dt}s", flush=True)
        return time.time()

    t0 = time.time()
    cfg = paper_cfg(epochs=6).replace(model_name_suffix=cli.suffix,
                                      resume=False)
    real = FinetuneDataset()
    real.load_data(cfg.ft_data_config)
    cfg = real.build_dataset(cfg)
    jax.block_until_ready([jax.tree_util.tree_leaves(x)
                           for x in (real.train_data, real.valid_data)])
    t0 = mark("dataset", t0)

    trainer = Trainer(cfg, MetricLogger(stream=io.StringIO()))
    params = load_pretrained(cfg, trainer)
    params = jax.block_until_ready(jax.device_put(params))
    t0 = mark("load_pretrained", t0)

    def apply_fn(p, pf, of, sf, rng=None):
        return trainer.model.apply(p, pf, of, sf)

    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)
    data = real.valid_data[0]
    for rep in range(cli.reps):
        t0 = time.time()
        res = jax.block_until_ready(
            eval_rollout(params, apply_fn, ecfg, data, cfg.skip_frames))
        t0 = mark("eval_rollout", t0)
        scal = jax.block_until_ready(_scene_eval_scalars(
            data, res.position, res.mask_p, cfg.skip_frames,
            cfg.collision_threshold))
        t0 = mark("scene_eval_scalars", t0)
        m = evaluate_rollouts(params, apply_fn, cfg, real.valid_data,
                              test_flag=False)
        t0 = mark("evaluate_rollouts_full", t0)
        out.setdefault("val_loss", []).append(float(m.loss))

    path = os.path.join(ROOT, "validate_stall_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
