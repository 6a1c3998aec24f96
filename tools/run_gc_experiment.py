"""Full GC experiment: pretrain on synthetic social-force simulations,
finetune on a real GC window, report rollout metrics (the reference's
headline benchmark workflow: src/main.py + exp_configs/piml-gcdata.yaml).

Writes RESULTS.md at the repo root.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from piml_tpu.config import PIMLConfig
from piml_tpu.data import FinetuneDataset, PointwiseDataset, channel_batches
from piml_tpu.engine import evaluate_rollouts
from piml_tpu.train import Trainer
from piml_tpu.utils import MetricLogger

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--data_config", default="configs/data_configs/gc.yaml")
    ap.add_argument("--epochs", type=int, default=60)
    cli = ap.parse_args()
    t_all = time.time()
    logger = MetricLogger(jsonl_path=os.path.join(ROOT, "gc_experiment.jsonl"))
    # Paper hyper-parameters (reference: exp_configs/piml-gcdata.yaml)
    cfg = PIMLConfig(
        exp_name="piml-gc", model="pinnsf_bm", dataset_name="gc2344",
        data_config=os.path.join(ROOT, cli.data_config),
        ft_data_config=os.path.join(ROOT, "configs/data_configs/gc_finetune.yaml"),
        epochs=cli.epochs, patience=20, ft_patience=5, batch_size=128, ft_batch_size=32,
        learning_rate=2e-4, weight_decay=1e-6, finetune_lr_decay=0.02,
        valid_steps=10, skip_frames=25,
        collision_pred_weight=5e-2, collision_loss_weight=200.0,
        collision_focus_weight=1.0, hard_collision_penalty=2.0,
        val_coll_weight=30.0, time_decay=0.9, reg_weight=1e-2,
        collision_loss_version="v2",
        dropout=0.5, shuffle=True,
        save_dir=os.path.join(ROOT, "saved_model"),
        compat_swapped_patience=False,  # use the sane patience mapping
    )

    # ---- pretrain on synthetic simulations --------------------------------
    synth = PointwiseDataset()
    synth.load_data(cfg.data_config)
    cfg = synth.build_dataset(cfg)
    logger.info(f"pretrain rows: train={len(synth.train_data)} "
                f"valid={len(synth.valid_data)} test_scenes={len(synth.test_data)}")
    trainer = Trainer(cfg, logger)
    t0 = time.time()
    state = trainer.train_pointwise(synth.train_data, synth.valid_data)
    pretrain_time = time.time() - t0

    apply_fn = lambda p, pf, of, sf: trainer.model.apply(p, pf, of, sf)
    t0 = time.time()
    pre_metrics = evaluate_rollouts(state.params, apply_fn, cfg,
                                    synth.test_data, test_flag=True)
    pre_eval_time = time.time() - t0
    logger.log(stage="pretrain_test", mse=pre_metrics.mse, mae=pre_metrics.mae,
               ot=pre_metrics.ot, mmd=pre_metrics.mmd,
               coll=pre_metrics.collision, hard=pre_metrics.hard_collision)

    # ---- finetune on the real GC window -----------------------------------
    real = FinetuneDataset()
    real.load_data(cfg.ft_data_config)
    cfg = real.build_dataset(cfg)
    rng = np.random.RandomState(cfg.seed)
    batches = channel_batches(real.train_data, cfg.ft_batch_size, rng,
                              shuffle=True)
    logger.info(f"finetune batches: {len(batches)}")
    cfg = cfg.replace(epochs=20)
    trainer.cfg = cfg
    t0 = time.time()
    ft_state = trainer.finetune(batches, real.valid_data, None,
                                pretrained=state.params)
    finetune_time = time.time() - t0

    ft_apply = lambda p, pf, of, sf: trainer.model.apply(p, pf, of, sf)
    ft_metrics = evaluate_rollouts(ft_state.params, ft_apply, cfg,
                                   real.test_data, test_flag=True)
    logger.log(stage="finetune_test", mse=ft_metrics.mse, mae=ft_metrics.mae,
               ot=ft_metrics.ot, mmd=ft_metrics.mmd,
               coll=ft_metrics.collision, hard=ft_metrics.hard_collision)

    results = {
        "pretrain": {
            "val_mse": state.best_val, "wall_s": pretrain_time,
            "test": vars(pre_metrics), "eval_wall_s": pre_eval_time,
        },
        "finetune": {
            "val_loss": ft_state.best_val, "wall_s": finetune_time,
            "test": vars(ft_metrics),
        },
        "total_wall_s": time.time() - t_all,
    }
    with open(os.path.join(ROOT, "gc_experiment.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)

    with open(os.path.join(ROOT, "RESULTS.md"), "w") as f:
        f.write(f"""# RESULTS — GC experiment (one TPU v5e chip)

Reference workflow (src/main.py defaults + exp_configs/piml-gcdata.yaml
shape): pretrain `pinnsf_bm` pointwise on synthetic GC social-force
simulations, evaluate closed-loop rollouts on a held-out real GC window,
finetune with the differentiable 10-step rollout loss on real data.

## Pretrain (synthetic → real-window rollout test)

| metric | value |
|---|---|
| best val MSE (pointwise acc) | {state.best_val:.5f} |
| rollout test MSE | {pre_metrics.mse:.4f} |
| rollout test MAE (m) | {pre_metrics.mae:.4f} |
| rollout test Sinkhorn OT | {pre_metrics.ot:.4f} |
| rollout test MMD | {pre_metrics.mmd:.6f} |
| soft / hard collisions | {pre_metrics.collision:.0f} / {pre_metrics.hard_collision:.0f} |
| pretrain wall time | {pretrain_time:.1f} s |

## Finetune (differentiable rollout, 10-step windows)

| metric | value |
|---|---|
| best val loss | {ft_state.best_val:.4f} |
| rollout test MSE | {ft_metrics.mse:.4f} |
| rollout test MAE (m) | {ft_metrics.mae:.4f} |
| rollout test Sinkhorn OT | {ft_metrics.ot:.4f} |
| rollout test MMD | {ft_metrics.mmd:.6f} |
| soft / hard collisions | {ft_metrics.collision:.0f} / {ft_metrics.hard_collision:.0f} |
| finetune wall time | {finetune_time:.1f} s |

Total wall time: {results['total_wall_s']:.1f} s.

The reference publishes no benchmark numbers (BASELINE.md); these anchor the
framework's end-to-end trainability on the paper's own data and metric suite.
Throughput comparisons vs the reference architecture are in `bench.py` /
BENCH_r*.json.
""")
    logger.info("wrote RESULTS.md")


if __name__ == "__main__":
    main()
