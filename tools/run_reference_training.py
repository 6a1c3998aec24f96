"""Run the ACTUAL torch reference (in place, nothing copied) through its
paper GC pipeline — pretrain on synthetic social-force windows, channeled
differentiable-rollout finetune on real windows, closed-loop evaluation on
the held-out window — to produce the trained-reference accuracy row that
RESULTS.md compares piml_tpu against (VERDICT r2 item 2).

Reference entry semantics: /root/reference/src/main.py:126-174 with the
paper grid config configs/exp_configs/piml-gcdata.yaml.  Two documented
surface drifts are patched at runtime (the reference files are NOT edited):

- ``main.py:153`` reads ``args.f_batch_size`` but argparse defines
  ``ft_batch_size`` (SURVEY §2.6) — we set the attribute on the namespace.
- the shipped finetune block instantiates ``PointwisePedDataset`` for the
  real data (main.py:150), which can never reach the channeled rollout
  finetune that the paper config's ``valid_steps/collision_loss_weight``
  knobs drive (``train`` dispatches on batch type, simulators.py:317-326);
  the channeled path requires ``TimeIndexedPedDataset`` (dataset.py:341-343).
  We use TimeIndexedPedDataset for the finetune dataset, as the grid
  configs intend.

Writes into /root/repo/refrun/ (cwd is refrun/src with a ``data`` symlink
to the reference's data tree so the yaml-relative paths and the
``../saved_model`` checkpoint path resolve inside the repo).

Usage:
    python tools/run_reference_training.py --pretrain_epochs 2 \
        --finetune_epochs 2 --tag calibrate     # cost calibration
    python tools/run_reference_training.py --tag full   # the real run
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
RUN_DIR = os.path.join(REPO, "refrun")


def setup_rundir():
    src = os.path.join(RUN_DIR, "src")
    os.makedirs(src, exist_ok=True)
    data_dir = os.path.join(RUN_DIR, "data")
    if os.path.islink(data_dir):
        os.unlink(data_dir)
    os.makedirs(data_dir, exist_ok=True)
    ref_data = "/root/reference/data"
    for sub in os.listdir(ref_data):
        link = os.path.join(data_dir, sub)
        if not os.path.islink(link):
            os.symlink(os.path.join(ref_data, sub), link)
    # the shipped yamls use 'GC_dataset' (lowercase d) while the tree ships
    # 'GC_Dataset' — the reference clearly ran on a case-insensitive mount
    alias = os.path.join(data_dir, "GC_dataset")
    if not os.path.islink(alias):
        os.symlink(os.path.join(ref_data, "GC_Dataset"), alias)
    return src


# Per-dataset paper protocols over the reference's own argparse surface.
# UCY: exp_configs/0206-pinnsf_bm-ucydata-new_tau-ps.yaml (first grid row)
# with data_pretrain3/data_finetune3.
DATASET_ARGS = {
    "gc": [
        "--data_config", REF_SRC + "/configs/data_configs/data_pretrain2.yaml",
        "--ft_data_config", REF_SRC + "/configs/data_configs/data_finetune2.yaml",
        "--dataset_name", "gc2344",
        "--ft_batch_size", "32",
        "--patience", "20",
        "--reg_weight", "1e-2",
        "--collision_loss_weight", "200",
        "--val_coll_weight", "30",
        "--hard_collision_penalty", "2",
    ],
    "ucy": [
        "--data_config", REF_SRC + "/configs/data_configs/data_pretrain3.yaml",
        "--ft_data_config", REF_SRC + "/configs/data_configs/data_finetune3.yaml",
        "--dataset_name", "ucy",
        "--ft_batch_size", "64",
        "--patience", "25",
        "--reg_weight", "1e-3",
        "--collision_loss_weight", "20",
        "--val_coll_weight", "10",
        "--hard_collision_penalty", "1",
    ],
}


def build_args(main_mod, overrides, dataset="gc"):
    """Paper config (piml-gcdata.yaml / 0206-ucydata.yaml) expressed over
    the reference's own argparse surface (grid keys f_batch_size/
    patience_finetune/data_path/finetune_data_path map to ft_batch_size/
    ft_patience/data_config/ft_data_config — the documented drift)."""
    # dataset-specific args go LAST: argparse takes the final occurrence,
    # so they override the GC-protocol defaults listed below
    argv = [
        "main.py",
        "--exp_name", "PIMLREF",
        "--seed", "666",
        "--finetune_flag",
        "--data_config", REF_SRC + "/configs/data_configs/data_pretrain2.yaml",
        "--ft_data_config", REF_SRC + "/configs/data_configs/data_finetune2.yaml",
        "--model", "pinnsf_bm",
        "--device", "cpu",
        "--gpus", "",
        "--learning_rate", "0.0002",
        "--batch_size", "128",
        "--ft_batch_size", "32",
        "--shuffle",
        "--weight_decay", "1e-6",
        "--dropout", "0.5",
        "--patience", "20",
        "--ft_patience", "5",
        "--topk_ped", "6", "--topk_obs", "10",
        "--sight_angle_ped", "90", "--sight_angle_obs", "90",
        "--dist_threshold_ped", "4", "--dist_threshold_obs", "4",
        "--encoder_hidden_size", "128", "--processor_hidden_size", "128",
        "--decoder_hidden_size", "64",
        "--encoder_hidden_layers", "3", "--processor_hidden_layers", "16",
        "--decoder_hidden_layers", "2",
        "--finetune_lr_decay", "0.02",
        "--num_history_velocity", "1",
        "--skip_frames", "25",
        "--valid_steps", "10",
        "--time_decay", "0.9",
        "--training_mode", "normal",
        "--reg_weight", "1e-2",
        "--collision_threshold", "0.5",
        "--collision_loss_weight", "200",
        "--val_coll_weight", "30",
        "--hard_collision_penalty", "2",
        "--teacher_weight", "0",
        "--collision_pred_weight", "5e-2",
        "--collision_focus_weight", "1",
        "--new_collision_loss_flag", "0",
        "--pinnsf_interaction", "sim",
        "--dataset_name", "gc2344",
        "--true_label_weight", "0",
        "--collision_loss_version", "v2",
    ] + DATASET_ARGS[dataset]
    old_argv = sys.argv
    sys.argv = argv
    try:
        args = main_mod.get_args()
    finally:
        sys.argv = old_argv
    for k, v in overrides.items():
        setattr(args, k, v)
    # main.py:153 drift: the pipeline reads f_batch_size
    args.f_batch_size = args.ft_batch_size
    # deterministic, dataset-scoped suffix so the checkpoint path is
    # reproducible and UCY runs never clobber the GC checkpoints
    args.model_name_suffix = "refrun" if dataset == "gc" else f"refrun_{dataset}"
    return args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain_epochs", type=int, default=200)
    ap.add_argument("--finetune_epochs", type=int, default=60)
    ap.add_argument("--tag", type=str, default="full")
    ap.add_argument("--dataset", choices=sorted(DATASET_ARGS), default="gc")
    ap.add_argument("--skip_pretrain", action="store_true",
                    help="reuse the existing pretrain checkpoint")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip all training; evaluate the existing pretrain "
                         "and finetuned checkpoints on the test window")
    ap.add_argument("--resume_finetune", action="store_true",
                    help="continue finetuning from the saved *_finetuned "
                         "checkpoint for --finetune_epochs more epochs "
                         "(fresh Adam state — documented deviation, used "
                         "only to complete a run interrupted by the host)")
    cli = ap.parse_args()
    if cli.eval_only or cli.resume_finetune:
        cli.skip_pretrain = True

    cwd = setup_rundir()
    os.chdir(cwd)
    sys.path.insert(0, REF_SRC)

    try:
        import setproctitle  # noqa: F401
    except ImportError:  # stub: reference imports it unconditionally
        import types

        sys.modules["setproctitle"] = types.SimpleNamespace(
            setproctitle=lambda *a, **k: None
        )

    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    import main as ref_main  # /root/reference/src/main.py (argparse + seeding)
    import data.data as DATA
    import data.dataset as DATASET
    import models.simulators as SIMULATOR
    import utils.data_loader as LOADER

    import functions.metrics as METRIC

    args = build_args(ref_main, {"epochs": cli.pretrain_epochs},
                      dataset=cli.dataset)
    ref_main.set_exp_configs(args)

    out = {"tag": cli.tag, "config": "piml-gcdata.yaml",
           "pretrain_epochs_cap": cli.pretrain_epochs,
           "finetune_epochs_cap": cli.finetune_epochs}
    t_all = time.time()

    def eval_row(simulator, test_data):
        """Closed-loop eval on the held-out window, capturing the soft/hard
        collision counts that the reference only prints
        (simulators.py:509-514: collision_sum locals)."""
        counts = []
        orig = METRIC.collision_count

        def recording(*a, **k):
            r = orig(*a, **k)
            counts.append(float(r))
            return r

        METRIC.collision_count = recording
        try:
            simulator.model.eval()
            loss, mse, mae, ot, mmd = simulator.test_multiple_rollouts(
                test_data, load_model=False)
        finally:
            METRIC.collision_count = orig
        return {"loss": float(loss), "mse": float(mse), "mae": float(mae),
                "ot": float(ot), "mmd": float(mmd),
                "collision_soft": sum(counts[0::2]),
                "collision_hard": sum(counts[1::2])}

    # ---- pretrain (main.py:134-146) ----
    t0 = time.time()
    synthetic_dataset = DATASET.PointwisePedDataset()
    synthetic_dataset.load_data(args.data_config)
    synthetic_dataset.build_dataset(args)
    out["pretrain_build_s"] = time.time() - t0
    train_loaders = LOADER.data_loader(
        synthetic_dataset.train_data, args.batch_size, args.seed,
        shuffle=args.shuffle, drop_last=True)
    simulator = SIMULATOR.BaseSimulator(args)
    # validate() prints self.time_iter, which only exists once an epoch has
    # run (simulators.py:364); finetune's pre-epoch validation would crash
    # on a freshly loaded checkpoint
    simulator.time_iter = 0.0

    ckpt = os.path.join(RUN_DIR, "saved_model",
                        f"{args.exp_name}_{args.model_name_suffix}")
    if cli.skip_pretrain and os.path.exists(ckpt):
        simulator.load_model(args, set_model=False, finetune_flag=False)
        out["pretrain_s"] = 0.0
        print("(skipped pretrain, loaded checkpoint)")
    else:
        t0 = time.time()
        simulator.train(train_loaders, synthetic_dataset.valid_data)
        out["pretrain_s"] = time.time() - t0
        # train() keeps the best-val weights on disk; reload them
        simulator.load_model(args, set_model=False, finetune_flag=False)

    # ---- channeled finetune (grid-config intent; see module docstring) ----
    args.epochs = cli.finetune_epochs
    t0 = time.time()
    real_dataset = DATASET.TimeIndexedPedDataset()
    real_dataset.load_data(args.ft_data_config)
    real_dataset.build_dataset(args)
    out["finetune_build_s"] = time.time() - t0

    # pretrained row: closed-loop on the held-out real window (2344-2404)
    t0 = time.time()
    out["pretrained_eval"] = eval_row(simulator, real_dataset.test_data)
    out["pretrained_eval_s"] = time.time() - t0
    print("pretrained:", json.dumps(out["pretrained_eval"]))
    _save(out, cli.tag)

    if cli.eval_only:
        simulator.load_model(args, set_model=True, finetune_flag=True)
        simulator.finetune_flag = True
        out["finetuned_eval"] = eval_row(simulator, real_dataset.test_data)
        print("finetuned:", json.dumps(out["finetuned_eval"]))
        out["total_s"] = time.time() - t_all
        _save(out, cli.tag)
        return

    ft_loaders = LOADER.data_loader(
        real_dataset.train_data, args.f_batch_size, args.seed,
        shuffle=args.shuffle, drop_last=True)
    # The shipped channeled-'split' validation windows are valid_steps=10
    # frames long, but the rollout starts at skip_frames=25 → IndexError
    # (simulators.py:571 on dataset.py:342's 10-frame windows).  The
    # commented-out alternative at dataset.py:343 — validate on the full
    # un-channeled windows — is the only runnable semantics; use it (it is
    # also what validate()'s list branch + val_coll_weight expects).
    ft_valid = real_dataset.dataset["valid"]
    t0 = time.time()
    if cli.resume_finetune:
        # finetune() body (simulators.py:409-428) with the warm start taken
        # from the saved *_finetuned* checkpoint instead of the pretrain one
        simulator.set_ft_model(args)
        simulator.set_ft_optimizer(args)
        simulator.set_ft_scheduler(args)
        simulator.load_model(args, set_model=False, finetune_flag=True)
        simulator.finetune_flag = True
        simulator.train(ft_loaders, ft_valid, real_dataset.test_data)
        simulator.test_multiple_rollouts(real_dataset.test_data)
        simulator.finetune_flag = False
    else:
        simulator.finetune(ft_loaders, ft_valid, real_dataset.test_data)
    out["finetune_s"] = time.time() - t0

    # finetuned row from the best finetuned checkpoint
    simulator.load_model(args, set_model=True, finetune_flag=True)
    simulator.finetune_flag = True
    t0 = time.time()
    out["finetuned_eval"] = eval_row(simulator, real_dataset.test_data)
    out["finetuned_eval_s"] = time.time() - t0
    print("finetuned:", json.dumps(out["finetuned_eval"]))

    out["total_s"] = time.time() - t_all
    _save(out, cli.tag)
    print("wrote", os.path.join(RUN_DIR, f"reference_{cli.tag}.json"))


def _save(out, tag):
    path = os.path.join(RUN_DIR, f"reference_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
