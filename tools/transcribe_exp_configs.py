"""Transcribe the reference's shipped experiment grids onto this repo's
config surface (reference: src/configs/exp_configs/*.yaml — the ~30 named
paper/ablation grids driven by grid_search.py + run_experiments.py).

Hyper-parameter VALUES are the experiment definitions themselves and are
kept verbatim; everything else is mapped to this framework:
  * legacy key names -> the PIMLConfig canonical names
    (data_path -> data_config, f_batch_size -> ft_batch_size, ...)
  * reference data-config paths -> this repo's data configs (which point at
    the same shipped npy windows)
  * torch-runner-only keys are dropped: device/num_workers (no CUDA pool on
    TPU; the host owns its chip), data_aug (a DEAD flag in the reference —
    parsed by main.py but data_augmentation() is never called; PARITY §2.1)

Deterministic: re-running writes identical files (tests/test_exp.py guards
against drift between the shipped configs and the reference's).
"""

import os

import yaml

REF_DIR = "/root/reference/src/configs/exp_configs"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "configs", "exp_configs")

KEY_MAP = {
    "data_path": "data_config",
    "finetune_data_path": "ft_data_config",
    "f_batch_size": "ft_batch_size",
    "patience_finetune": "ft_patience",
    "add_noise": "add_noise_flag",
    "save_configs_flag": "save_configs",
}

DROP = {"device", "num_workers", "data_aug"}

DATA_MAP = {
    "data_pretrain2.yaml": "configs/data_configs/gc_pretrain_paper.yaml",
    "data_finetune2.yaml": "configs/data_configs/gc_finetune_paper.yaml",
    "data_pretrain3.yaml": "configs/data_configs/ucy_pretrain.yaml",
    "data_finetune3.yaml": "configs/data_configs/ucy_finetune.yaml",
    "data_pretrain4.yaml": "configs/data_configs/gc_iter0_pretrain.yaml",
    "data_pretrain5.yaml": "configs/data_configs/gc_real_pretrain.yaml",
    "data_pretrain3_1.yaml": "configs/data_configs/ucy_real_pretrain.yaml",
    "data_pretrain_wo_ft.yaml": "configs/data_configs/gc_wo_ft_pretrain.yaml",
    "data_finetune.yaml": "configs/data_configs/gc_finetune_early.yaml",
}


def transcribe_one(src_path: str) -> str:
    with open(src_path) as f:
        data = yaml.safe_load(f)
    out = {}
    for k, v in data.items():
        if k in DROP:
            continue
        k = KEY_MAP.get(k, k)
        if k in ("data_config", "ft_data_config"):
            def map_path(p):
                base = os.path.basename(str(p))
                if base not in DATA_MAP:
                    raise KeyError(f"{src_path}: unmapped data config {base}")
                return DATA_MAP[base]
            v = [map_path(x) for x in v] if isinstance(v, list) else map_path(v)
        out[k] = v
    name = os.path.basename(src_path)
    header = (
        f"# Transcribed from the reference grid exp_configs/{name}\n"
        f"# (values verbatim; keys/data-paths mapped to this framework —\n"
        f"# see tools/transcribe_exp_configs.py).  Run via\n"
        f"#   python -m piml_tpu.exp.grid -p configs/exp_configs/{name}\n"
    )
    return header + yaml.safe_dump(out, sort_keys=False, default_flow_style=False)


def main() -> int:
    os.makedirs(OUT_DIR, exist_ok=True)
    names = sorted(n for n in os.listdir(REF_DIR) if n.endswith(".yaml"))
    for name in names:
        text = transcribe_one(os.path.join(REF_DIR, name))
        with open(os.path.join(OUT_DIR, name), "w") as f:
            f.write(text)
        print(f"wrote configs/exp_configs/{name}")
    return len(names)


if __name__ == "__main__":
    main()
