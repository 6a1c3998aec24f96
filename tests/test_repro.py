"""Smoke test of the one-command paper-reproduction driver
(piml_tpu/exp/repro.py — VERDICT r4 item 7).

Only the generation stages run here (the train stages at paper budget are
exercised on TPU by tools/run_gc_experiment.py and recorded in repro.json);
this proves the CLI surface, stage resume, and the consolidated table."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_repro_smoke_generation_stages(tmp_path):
    out = tmp_path / "repro_state.json"
    env = {**os.environ, "PIML_PLATFORM": "cpu"}
    proc = subprocess.run(
        [sys.executable, "-m", "piml_tpu.exp.repro", "--smoke",
         "--stages", "pure_sf,mlapm_sim", "--out", str(out)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    state = json.loads(out.read_text())
    for stage in ("pure_sf", "mlapm_sim"):
        assert state[stage]["rc"] == 0
        assert state[stage]["n_pedestrians"] > 0
        assert state[stage]["frames"] == 100

    # resume: a second run must skip both completed stages
    proc2 = subprocess.run(
        [sys.executable, "-m", "piml_tpu.exp.repro", "--smoke",
         "--stages", "pure_sf,mlapm_sim", "--out", str(out)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=120,
    )
    assert proc2.returncode == 0, proc2.stdout + proc2.stderr
    assert proc2.stdout.count("cached (rc=0), skipping") == 2


def test_repro_md_writer(tmp_path):
    from piml_tpu.exp.repro import write_md

    results = {
        "budget": "paper", "total_wall_s": 123.0,
        "pure_sf": {"rc": 0, "n_pedestrians": 40, "frames": 750, "wall_s": 5.0},
        "finetune": {
            "rc": 0,
            "pretrain": {"val_mse": 0.1, "epochs_ran": 10, "wall_s": 50.0},
            "finetune": {"val_loss": 5.0, "epochs_ran": 6, "wall_s": 40.0},
            "pretrain_test": {"mse": 1.0, "mae": 0.5, "ot": 0.2, "mmd": 0.01,
                              "collision": 100.0, "hard_collision": 10.0},
            "finetune_test": {"mse": 0.9, "mae": 0.45, "ot": 0.15, "mmd": 0.008,
                              "collision": 60.0, "hard_collision": 5.0},
            "gt_test": {"collision": 50.0, "hard_collision": 3.0},
        },
        "mlapm_sim": {"rc": 0, "n_pedestrians": 40, "frames": 750, "wall_s": 4.0},
        "sr_grid": {"rc": 0, "grid_commands": 12, "wall_s": 30.0},
    }
    path = tmp_path / "REPRO.md"
    write_md(results, str(path))
    text = path.read_text()
    assert "pure social-force rollout" in text
    assert "0.4500" in text  # finetuned MAE
    assert "12 grid commands" in text
