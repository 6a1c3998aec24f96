"""Full UCY experiment at the paper's layout: pretrain on 3 synthetic UCY
social-force windows, finetune with differentiable 10-step rollouts on 2 real
windows, evaluate pretrained vs finetuned on the held-out real window 162-216.

Reference: exp_configs/0206-pinnsf_bm-ucydata-new_tau-ps.yaml with
data_pretrain3.yaml / data_finetune3.yaml; tau = 5/6 via dataset_name='ucy'
(model.py:1151-1154).  Writes ucy_experiment.json + the UCY section of
RESULTS.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from piml_tpu.config import PIMLConfig
from piml_tpu.exp.experiment import (
    read_state,
    results_table_md,
    run_staged_experiment,
)
from piml_tpu.utils import MetricLogger

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(ROOT, "ucy_experiment.json")


def ucy_cfg(epochs: int) -> PIMLConfig:
    """Reference UCY hyper-parameters (0206-pinnsf_bm-ucydata-new_tau-ps.yaml)."""
    return PIMLConfig(
        exp_name="piml-ucy", model="pinnsf_bm", dataset_name="ucy",
        model_name_suffix="ucy0",
        data_config=os.path.join(ROOT, "configs/data_configs/ucy_pretrain.yaml"),
        ft_data_config=os.path.join(ROOT, "configs/data_configs/ucy_finetune.yaml"),
        epochs=epochs, patience=25, ft_patience=5, batch_size=128,
        ft_batch_size=64,
        learning_rate=2e-4, weight_decay=1e-6, finetune_lr_decay=0.02,
        valid_steps=10, skip_frames=25,
        collision_pred_weight=5e-2, collision_loss_weight=20.0,
        collision_focus_weight=1.0, hard_collision_penalty=1.0,
        val_coll_weight=10.0, time_decay=0.9, reg_weight=1e-3,
        collision_loss_version="v2",
        dropout=0.5, shuffle=True,
        save_dir=os.path.join(ROOT, "saved_model"),
        # reference-shipped swapped-patience semantics (simulators.py:393):
        # pretrain early-stops on patience_finetune(5), finetune on patience(25)
        compat_swapped_patience=True,
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["all", "pretrain", "finetune", "evaluate"])
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="override any PIMLConfig field (for ablations)")
    ap.add_argument("--state", default=STATE)
    cli = ap.parse_args()
    logger = MetricLogger(jsonl_path=os.path.join(ROOT, "ucy_experiment.jsonl"))
    cfg = ucy_cfg(cli.epochs)
    if cli.set:
        import dataclasses as _dc

        fields = {f.name: f for f in _dc.fields(type(cfg))}
        overrides = {}
        for kv in cli.set:
            k, v = kv.split("=", 1)
            overrides[k] = type(cfg).coerce_field(fields[k], v)
        cfg = cfg.replace(**overrides)
    results = run_staged_experiment(cfg, cli.stage, cli.state, logger)
    if "finetune_test" in results and cli.state == STATE:
        with open(os.path.join(ROOT, "RESULTS_UCY.md"), "w") as f:
            f.write(
                "# RESULTS — UCY experiment (one TPU v5e chip)\n\n"
                "Reference workflow (0206-pinnsf_bm-ucydata-new_tau-ps.yaml"
                " + data_pretrain3/data_finetune3): pretrain `pinnsf_bm`"
                " (tau=5/6) on 3 synthetic UCY windows, finetune on real"
                " UCY 0-108, evaluate on held-out real window 162-216.\n\n"
                + results_table_md(results) + "\n"
            )
        logger.info("wrote RESULTS_UCY.md")


if __name__ == "__main__":
    main()
