"""One coherent configuration dataclass for the whole framework.

The reference spreads configuration over ~60 argparse flags
(reference: src/main.py:26-112), YAML data configs (src/data/dataset.py:45-53)
and YAML grid configs (src/utils/grid_search.py:30-54), with documented drift
between the flag names used by the shipped configs and the argparse surface
(e.g. ``f_batch_size`` vs ``ft_batch_size``, src/main.py:40,153).  Here a single
dataclass serves all three roles; YAML and CLI overrides map onto its fields,
and legacy aliases are accepted on load.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

# Aliases from the reference's drifted flag surface (src/main.py vs exp_configs/*.yaml)
_LEGACY_ALIASES = {
    "f_batch_size": "ft_batch_size",
    "patience_finetune": "ft_patience",
    "save_configs_flag": "save_configs",
    "finetune_data_path": "ft_data_config",
    "data_path": "data_config",
    "noise_std": "add_noise_std",
    "add_noise": "add_noise_flag",
    "precision": "compute_dtype",  # pre-round-2 name for the NN-path dtype
}


@dataclass
class PIMLConfig:
    # ----- experiment -----
    exp_name: str = "pedsim_debug"
    user_name: str = "piml"
    seed: int = 666
    tags: str = ""
    model_name_suffix: str = ""        # random 8-char suffix if empty
    save_configs: bool = False
    save_dir: str = "saved_model"      # checkpoints root
    config_dir: str = "saved_configs"
    jsonl_log: str = ""                # metrics JSONL path; '' = per-run
                                       # metrics_<suffix>.jsonl (lets grid
                                       # sweeps append to one shared log)

    # ----- data -----
    data_config: str = "configs/data_configs/toy.yaml"
    ft_data_config: str = "configs/data_configs/toy_f.yaml"
    finetune_flag: bool = False
    train_ratio: float = 0.6
    val_ratio: float = 0.2
    test_ratio: float = 0.2
    add_noise_flag: bool = False
    add_noise_std: float = 0.05
    # rotate/mirror augmentation, comma-separated angles in radians applied to
    # the splits named in augment_splits (reference: src/data/dataset.py:55-72,
    # src/utils/data_augmentation.py — present but never CLI-wired there)
    augment_thetas: str = ""
    augment_mirrors: str = ""
    augment_splits: str = "train"
    time_unit: float = 0.08            # overwritten from dataset metadata

    # ----- neighborhood / features (src/main.py:52-57) -----
    topk_ped: int = 6
    topk_obs: int = 10
    sight_angle_ped: float = 90.0
    sight_angle_obs: float = 90.0
    dist_threshold_ped: float = 4.0
    dist_threshold_obs: float = 4.0
    num_history_velocity: int = 1
    skip_frames: int = 25              # frames skipped for desired-speed estimation

    # ----- model (src/main.py:62-67) -----
    model: str = "pinnsf_m"
    dataset_name: str = "ucy"          # gc1560, gc2344, ucy — selects tau / SF constants
    activation: str = "relu"
    dropout: float = 0.5
    encoder_hidden_size: int = 128
    processor_hidden_size: int = 128
    decoder_hidden_size: int = 64
    encoder_hidden_layers: int = 3
    processor_hidden_layers: int = 16
    decoder_hidden_layers: int = 2
    res_hidden_layers: int = 3
    correction_hidden_layers: int = 1
    # feature dims are published by dataset build (reference: src/data/dataset.py:144-146)
    ped_feature_dim: int = 6
    obs_feature_dim: int = 6
    self_feature_dim: int = 7
    # NN-branch compute dtype: '' = f32 everywhere; 'bfloat16' runs the edge
    # MLPs on the bf16 MXU path (params, goal force and integration stay f32)
    compute_dtype: str = ""

    # ----- compat flags for reference quirks (SURVEY.md §2.6) -----
    # True reproduces the reference bit-for-bit; False enables the fixed behavior.
    compat_resdnn_last_block_only: bool = True   # ResDNN ignores all but last block (model.py:115-119)
    compat_dest_norm_axis1: bool = False         # torch.norm(..., dim=1) on 3-D inputs (model.py:781)
    compat_lagged_euler: bool = True             # v'=v+a_prev*dt; p'=p+v*dt (simulators.py:602-604)

    # ----- optimization (src/main.py:38-50) -----
    learning_rate: float = 2e-3
    batch_size: int = 3
    ft_batch_size: int = 4
    shuffle: bool = False
    weight_decay: float = 5e-4
    epochs: int = 2
    patience: int = 1
    ft_patience: int = 5
    finetune_lr_decay: float = 1.0
    finetune_wd_aug: float = 1.0
    unify_train_slots: bool = True     # pad finetune train scenes' agent
                                       # axis to a common slot count so all
                                       # window batches share ONE shape —
                                       # one ft_epoch program instead of
                                       # one per scene (3x less trace/
                                       # compile/cache traffic at the GC
                                       # paper config; the padded slots are
                                       # inert NaN rows, loss-neutral).
                                       # Costs ~13% extra slots on a
                                       # dispatch-latency-bound step.
    ft_lr_decay2: float = 0.0          # corrector-branch LR multiplier (pinnsf_res / base)
    # The reference swaps patience/ft_patience inside train() (simulators.py:393).
    compat_swapped_patience: bool = True
    # The reference's PRETRAIN path adds the BCE collision-prediction loss
    # UNWEIGHTED (simulators.py:350-354 — collision_pred_weight only gates
    # it there, unlike the finetune path which multiplies).  The unscaled
    # sum-BCE dwarfs the message-supervision MSE ~30×, which is why
    # `pinnsf_interaction='loss'` runs underfit their messages.  False
    # applies the weight (the evident intent).
    compat_unweighted_coll_pred: bool = True
    # Validate pretrain on the full training objective instead of the
    # reference's plain acceleration MSE (simulators.py:430-441) — the
    # acc-MSE is a misaligned stopping signal for message-supervised runs.
    val_on_train_objective: bool = False

    # ----- rollout training (src/main.py:78-96) -----
    valid_steps: int = 5
    time_decay: float = 1.0
    training_mode: str = "normal"      # normal, mttrain, polar, ft_pointwise
    reg_weight: float = 0.0
    collision_threshold: float = 0.5
    collision_loss_weight: float = 10.0
    val_coll_weight: float = 30.0
    hard_collision_penalty: float = 10.0
    teacher_weight: float = 0.0
    collision_pred_weight: float = 10.0
    collision_focus_weight: float = 10.0
    new_collision_loss_flag: bool = False
    collision_loss_version: str = "v0"  # v0 | v2 (abnormal-mask gated)
    pinnsf_interaction: str = "sim"    # sim | loss (analytic-SF message supervision)
    sf_dv_from_velocity: bool = False  # quirk-free v2 supervision: cos from the
                                       # velocity channels (reference reads dv
                                       # from dr, utils.py:67,84 — cos ≡ 1, so
                                       # C/D are unidentifiable; see PARITY §2.6)
    true_label_weight: float = 0.0
    iter_flag: bool = False            # SR-iteration flag: v2 supervision constants
    iter_model_name_suffix: str = ""

    # ----- resume (beyond the reference: simulators.py has no optimizer-state
    # or mid-run resume, SURVEY §5) -----
    resume: bool = False               # restore latest full TrainState and continue
    resume_every: int = 1              # save a resumable checkpoint every N epochs

    # ----- TPU execution -----
    # (NN-path compute dtype is `compute_dtype` above; this section holds
    # device-level knobs)
    n_devices: int = 0                 # >1: channel data-parallel finetune over a
                                       # device mesh (Trainer.finetune); 0/1 = single
                                       # device.  Pointwise pretrain stays single-
                                       # device (72 s at paper budget — not worth
                                       # the gather/all-reduce restructuring)
    donate_state: bool = True
    # Dropout/noise PRNG implementation for training streams: '' = auto
    # (hardware 'rbg' generator on TPU, JAX-default threefry elsewhere).
    # threefry is counted-flop-heavy: the paper-config (dropout 0.5) BPTT
    # step measures 15.1 ms/step threefry vs 11.3 ms rbg (prng_rbg.json).
    # Set 'threefry2x32' for the cross-backend-reproducible stream.
    prng_impl: str = ""
    remat_features: Optional[bool] = None  # jax.checkpoint on the rollout step
                                       # for BPTT; None = auto (off for small
                                       # steps, which are kernel-launch bound;
                                       # on at dense sizes where live
                                       # activations would dominate HBM)
    bptt_unroll: int = 0               # scan unroll for the finetune BPTT
                                       # rollout; 0 = auto = scanned (1).
                                       # Full unroll (= window length) buys
                                       # ~3.9 ms/step at paper size
                                       # (train_step_fusion.json) but costs
                                       # a ~60 MB program per batch shape
                                       # (234 s cold compile / 112 s cache
                                       # retrieval through a device tunnel,
                                       # compile_attrib_r5*.json): opt in
                                       # explicitly for long fixed-epoch
                                       # runs
    channel_batched_bptt: Optional[bool] = None
                                       # finetune rollout loop nesting:
                                       # True = scan over time with the
                                       # channel vmap inside each step
                                       # (batched_rollout — hoists the
                                       # banded selector's exactness cond
                                       # above the channel axis, enabling
                                       # the O(N) kernels in BPTT);
                                       # False = vmap(scan) per channel
                                       # (the paper-scale fusion-tuned
                                       # path); None = auto (batched at
                                       # dense N on TPU)

    def __post_init__(self):
        if not self.model_name_suffix:
            import random
            import string
            rng = random.Random(self.seed)
            chars = string.ascii_lowercase + string.digits
            self.model_name_suffix = "".join(rng.sample(chars, 8))

    # ------------------------------------------------------------------
    @property
    def tau(self) -> float:
        """Per-model / per-dataset goal-force relaxation time.

        Reference: model.py:733 (pinnsf: 2), model.py:1151-1154 (pinnsf_bm:
        5/6 for ucy else 2), model.py:1237-1240 (pinnsf_m: 5/6 ucy else 0.5).
        """
        if self.model in {"pinnsf_bm"}:
            return 5.0 / 6.0 if self.dataset_name == "ucy" else 2.0
        if self.model in {"pinnsf_m"}:
            return 5.0 / 6.0 if self.dataset_name == "ucy" else 0.5
        return 2.0

    # ------------------------------------------------------------------
    def replace(self, **kw) -> "PIMLConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "PIMLConfig":
        with open(path) as f:
            if path.endswith((".yaml", ".yml")):
                raw = yaml.safe_load(f)
            else:
                raw = json.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "PIMLConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        clean: Dict[str, Any] = {}
        for k, v in raw.items():
            k = _LEGACY_ALIASES.get(k, k)
            if k in names:
                clean[k] = v
        return cls(**clean)

    @staticmethod
    def coerce_field(f: "dataclasses.Field", v: Any) -> Any:
        """Coerce a string override (CLI / --set KEY=VALUE) to the field's
        type.  Tri-state bools (Optional[bool] fields like remat_features)
        accept ''/'none'/'auto' for None in addition to true/false."""
        if not isinstance(v, str):
            return v
        tri = "bool" in str(f.type) and not isinstance(f.default, bool)
        if isinstance(f.default, bool) or tri:
            s = v.strip().lower()
            if tri and s in {"", "none", "auto"}:
                return None
            return s in {"1", "true", "yes"}
        if isinstance(f.default, bool):
            return v.strip().lower() in {"1", "true", "yes"}
        if isinstance(f.default, int):
            return int(v)
        if isinstance(f.default, float):
            return float(v)
        if f.default is None or isinstance(f.default, str):
            return v
        return type(f.default)(v)

    @classmethod
    def from_cli(cls, argv: Optional[List[str]] = None) -> "PIMLConfig":
        """argparse surface mirroring the reference CLI (src/main.py:26-112)."""
        import argparse

        parser = argparse.ArgumentParser(description="TPU-native pedestrian simulation")
        for f in dataclasses.fields(cls):
            name = "--" + f.name
            if f.type == "bool" or isinstance(f.default, bool):
                parser.add_argument(name, type=lambda s: s.lower() in {"1", "true", "yes"},
                                    default=None)
            elif isinstance(f.default, int):
                parser.add_argument(name, type=int, default=None)
            elif isinstance(f.default, float):
                parser.add_argument(name, type=float, default=None)
            else:
                parser.add_argument(name, type=str, default=None)
        # legacy aliases
        parser.add_argument("-f", dest="finetune_flag", action="store_const", const=True)
        for legacy in _LEGACY_ALIASES:
            parser.add_argument("--" + legacy, dest=_LEGACY_ALIASES[legacy], default=None)
        ns, _ = parser.parse_known_args(argv)
        overrides = {k: v for k, v in vars(ns).items() if v is not None}
        # coerce string-captured values (legacy aliases, Optional[bool]
        # tri-state fields like remat_features — argparse parses those as
        # str since their default is not a bool)
        names = {f.name: f for f in dataclasses.fields(cls)}
        for k, v in list(overrides.items()):
            f = names.get(k)
            if f is not None:
                overrides[k] = cls.coerce_field(f, v)
        return cls(**overrides)
