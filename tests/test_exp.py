"""Experiment-layer tests: CLI pipeline smoke, grid expansion, config system,
checkpoint/resume, checkify guards."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from piml_tpu.config import PIMLConfig
from piml_tpu.exp.grid import task_queue, yaml_to_grid_params
from piml_tpu.train import checkpoint
from piml_tpu.utils.checks import assert_finite, checked


def test_config_roundtrip(tmp_path):
    cfg = PIMLConfig(model="pinnsf_bm", learning_rate=1e-3, finetune_flag=True)
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    cfg2 = PIMLConfig.load(path)
    assert cfg2.model == "pinnsf_bm"
    assert cfg2.learning_rate == 1e-3
    assert cfg2.finetune_flag is True
    assert cfg2.model_name_suffix == cfg.model_name_suffix


def test_config_legacy_aliases():
    cfg = PIMLConfig.from_dict({"f_batch_size": 7, "patience_finetune": 9,
                                "model": "pinnsf"})
    assert cfg.ft_batch_size == 7
    assert cfg.ft_patience == 9


def test_config_cli():
    cfg = PIMLConfig.from_cli([
        "--model", "pinnsf_bm", "--learning_rate", "0.01",
        "--finetune_flag", "1", "--f_batch_size", "5",
    ])
    assert cfg.model == "pinnsf_bm"
    assert cfg.learning_rate == 0.01
    assert cfg.finetune_flag is True
    assert cfg.ft_batch_size == 5


def test_grid_expansion(tmp_path):
    p = tmp_path / "grid.yaml"
    p.write_text("exp_name: g\nlearning_rate:\n  - 0.1\n  - 0.2\n"
                 "batch_size:\n  - 8\n  - 16\nmodel: pinnsf\n")
    cmds = yaml_to_grid_params(str(p))
    assert len(cmds) == 4  # cartesian product
    assert all("--exp_name g" in c and "--model pinnsf" in c for c in cmds)
    lrs = {c.split("--learning_rate ")[1].split(" ")[0] for c in cmds}
    assert lrs == {"0.1", "0.2"}


def test_task_queue_retry():
    # first command fails twice then... always fails → 0; true → 1
    assert task_queue(["false"], num_retries=2, interval=0.01) == 0
    assert task_queue(["true"], num_retries=2, interval=0.01) == 1


def test_checkpoint_resume(tmp_path):
    params = {"w": jnp.arange(4.0)}
    opt = {"m": jnp.zeros(4)}
    d = str(tmp_path / "ckpt")
    checkpoint.save_train_state(d, 3, params, opt, {"epoch": 3})
    checkpoint.save_train_state(d, 7, params, opt, {"epoch": 7})
    assert checkpoint.latest_step(d) == 7
    template = {"params": params, "opt_state": opt, "extra": {"epoch": 0}}
    restored = checkpoint.restore_train_state(d, template)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               [0, 1, 2, 3])
    assert int(restored["extra"]["epoch"]) == 7


def test_checkify_guards():
    def f(x):
        assert_finite(x, "x")
        return x * 2

    g = checked(f)
    np.testing.assert_allclose(np.asarray(g(jnp.ones(3))), 2.0)
    with pytest.raises(Exception):
        g(jnp.array([1.0, jnp.nan]))


@pytest.mark.slow
def test_cli_pipeline_smoke(tmp_path, toy_paths):
    """End-to-end `exp.main.run` on the toy dataset (tiny model, 1 epoch)."""
    import yaml

    from piml_tpu.exp.main import run
    from piml_tpu.utils import MetricLogger

    data_cfg = tmp_path / "data.yaml"
    data_cfg.write_text(yaml.safe_dump({
        "train": [toy_paths[0]], "valid": [toy_paths[1]],
    }))
    cfg = PIMLConfig(
        data_config=str(data_cfg), model="pinnsf_m", epochs=1, batch_size=16,
        skip_frames=5, dropout=0.0, encoder_hidden_size=16,
        encoder_hidden_layers=2, processor_hidden_size=16,
        processor_hidden_layers=2, decoder_hidden_size=8,
        decoder_hidden_layers=2, save_dir=str(tmp_path / "ckpt"),
    )
    results = run(cfg, MetricLogger(stream=open(os.devnull, "w")))
    assert np.isfinite(results["pretrain_val"])
    assert os.path.exists(os.path.join(cfg.save_dir,
                                       f"{cfg.exp_name}_{cfg.model_name_suffix}"))


@pytest.mark.slow
def test_piml_iteration_driver(tmp_path, toy_paths):
    """One turn of the closed PIML loop: train → extract → fit (exp/iterate)."""
    import yaml

    from piml_tpu.data import PointwiseDataset
    from piml_tpu.exp.iterate import run_iteration
    from piml_tpu.utils import MetricLogger

    data_cfg = tmp_path / "data.yaml"
    # toy3 is the only toy window with in-threshold neighbor pairs (toy1/2
    # agents never come within 4 m, so their edge rows are all zeroed and
    # the padding-free extraction is rightly empty)
    data_cfg.write_text(yaml.safe_dump({
        "train": [toy_paths[2]], "valid": [toy_paths[1]],
    }))
    cfg = PIMLConfig(
        model="pinnsf_bm", epochs=1, batch_size=16, skip_frames=5,
        dropout=0.0, encoder_hidden_size=16, encoder_hidden_layers=2,
        processor_hidden_size=16, processor_hidden_layers=2,
        decoder_hidden_size=8, decoder_hidden_layers=2,
        save_dir=str(tmp_path / "ckpt"), collision_pred_weight=0.0,
    )
    ds = PointwiseDataset()
    ds.load_data(str(data_cfg))
    cfg = ds.build_dataset(cfg)
    result, params = run_iteration(
        cfg, ds, MetricLogger(stream=open(os.devnull, "w"))
    )
    assert np.isfinite(result.val_loss)
    assert np.isfinite(result.fit_A) and result.fit_A > 0
    mp = result.mlapm_params()
    assert mp.A == result.fit_A


@pytest.mark.slow
def test_cli_pipeline_polar_mode(tmp_path, toy_paths):
    """End-to-end polar training mode (training_mode='polar' routes the
    polar dataset views + pinnsf_pb per-edge polar decoding)."""
    import yaml

    from piml_tpu.exp.main import run
    from piml_tpu.utils import MetricLogger

    data_cfg = tmp_path / "data.yaml"
    data_cfg.write_text(yaml.safe_dump({
        "train": [toy_paths[2]], "valid": [toy_paths[1]],
    }))
    cfg = PIMLConfig(
        data_config=str(data_cfg), model="pinnsf_pb", training_mode="polar",
        epochs=1, batch_size=16, skip_frames=5, dropout=0.0,
        encoder_hidden_size=16, encoder_hidden_layers=2,
        processor_hidden_size=16, processor_hidden_layers=2,
        decoder_hidden_size=8, decoder_hidden_layers=2,
        save_dir=str(tmp_path / "ckpt"),
    )
    results = run(cfg, MetricLogger(stream=open(os.devnull, "w")))
    assert np.isfinite(results["pretrain_val"])


def test_cli_tristate_and_set_coercion():
    """Optional[bool] fields (remat_features) parse correctly from the CLI
    and --set-style string overrides (regression: 'false' parsed as a
    truthy string, silently forcing remat ON)."""
    import dataclasses

    from piml_tpu.config import PIMLConfig

    assert PIMLConfig.from_cli(["--remat_features", "false"]).remat_features is False
    assert PIMLConfig.from_cli(["--remat_features", "true"]).remat_features is True
    assert PIMLConfig.from_cli(["--remat_features", "auto"]).remat_features is None
    assert PIMLConfig.from_cli([]).remat_features is None
    fields = {f.name: f for f in dataclasses.fields(PIMLConfig)}
    assert PIMLConfig.coerce_field(fields["remat_features"], "false") is False
    assert PIMLConfig.coerce_field(fields["bptt_unroll"], "10") == 10
    assert PIMLConfig.coerce_field(fields["shuffle"], "yes") is True
    assert PIMLConfig.coerce_field(fields["collision_loss_weight"], "200") == 200.0
    assert PIMLConfig.coerce_field(fields["model"], "pinnsf_bm") == "pinnsf_bm"


def test_transcribed_grid_configs_current_and_parseable():
    """The shipped exp_configs must (a) be exactly what
    tools/transcribe_exp_configs.py derives from the reference grids (no
    silent drift) and (b) expand via yaml_to_grid_params into commands
    whose every flag PIMLConfig.from_cli accepts with the intended value."""
    import shlex
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import transcribe_exp_configs as tx

    names = sorted(n for n in os.listdir(tx.REF_DIR) if n.endswith(".yaml"))
    assert len(names) >= 25
    for name in names:
        expected = tx.transcribe_one(os.path.join(tx.REF_DIR, name))
        with open(os.path.join(tx.OUT_DIR, name)) as f:
            assert f.read() == expected, f"{name} drifted; re-run the tool"

    # every transcribed grid (+ the hand-written front-door configs) must
    # produce CLI commands the config surface fully understands
    extra = ["piml-ucy.yaml", "piml-gc-calibrated.yaml",
             "piml-ucy-calibrated.yaml", "piml-gc.yaml", "toy-smoke.yaml"]
    for name in names + extra:
        cmds = yaml_to_grid_params(os.path.join(tx.OUT_DIR, name))
        assert cmds
        for cmd in cmds[:2]:  # first points of the sweep are representative
            argv = shlex.split(cmd)[3:]  # strip "python -m piml_tpu.exp.main"
            cfg = PIMLConfig.from_cli(argv)
            # spot-check a mapped alias landed
            flags = dict(zip(argv[0::2], argv[1::2]))
            if "--ft_batch_size" in flags:
                assert cfg.ft_batch_size == int(flags["--ft_batch_size"])
            if "--data_config" in flags:
                assert os.path.exists(flags["--data_config"]), name
            if "--ft_data_config" in flags:
                assert os.path.exists(flags["--ft_data_config"]), name


@pytest.mark.slow
def test_piml_closed_loop_cli(tmp_path, toy_paths):
    """The full closed loop as ONE CLI command (exp/iterate.main): iter-0
    pretrain -> extract -> fit -> REGENERATE synthetic data by simulating
    the fitted MLAPM -> iter-1 pretrain on the regenerated scenes -> fit.
    Constants per iteration land in the JSON artifact."""
    import json
    import yaml

    from piml_tpu.exp.iterate import main as loop_main

    data_cfg = tmp_path / "data.yaml"
    data_cfg.write_text(yaml.safe_dump({
        "train": [toy_paths[2]], "valid": [toy_paths[1]],
    }))
    out = tmp_path / "loop.json"
    rc = loop_main([
        "--data_config", str(data_cfg), "--iterations", "2",
        "--scenario", "basic_unit1", "--frames", "160",
        "--work_dir", str(tmp_path), "--out", str(out),
        # tiny budget PIMLConfig passthrough
        "--model", "pinnsf_bm", "--epochs", "1", "--batch_size", "16",
        "--skip_frames", "5", "--dropout", "0.0",
        "--encoder_hidden_size", "16", "--encoder_hidden_layers", "2",
        "--processor_hidden_size", "16", "--processor_hidden_layers", "2",
        "--decoder_hidden_size", "8", "--decoder_hidden_layers", "2",
        "--collision_pred_weight", "0.0",
        "--save_dir", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    payload = json.loads(out.read_text())
    its = payload["iterations"]
    assert [r["iteration"] for r in its] == [0, 1]
    for r in its:
        assert np.isfinite(r["fit_A"]) and np.isfinite(r["val_loss"])
    # the regenerated scenes actually exist and fed iteration 1
    assert (tmp_path / "regen_iter0_train.npy").exists()
    assert (tmp_path / "regen_iter0_valid.npy").exists()
    regen = yaml.safe_load((tmp_path / "regen_iter0.yaml").read_text())
    assert regen["train"][0].endswith("regen_iter0_train.npy")


def test_set_process_title():
    """Reference src/main.py:123 labels the process exp_name@user_name; the
    PR_SET_NAME fallback must set the kernel comm (truncated to 15 bytes)."""
    from piml_tpu.config import PIMLConfig
    from piml_tpu.exp.main import set_process_title

    cfg = PIMLConfig(exp_name="ptitle_check", user_name="u")
    title = set_process_title(cfg)
    assert title == "ptitle_check@u"
    try:
        with open("/proc/self/comm") as f:
            comm = f.read().strip()
    except OSError:
        return  # non-Linux: setproctitle path already returned the title
    assert comm == title.encode()[:15].decode(errors="replace")
