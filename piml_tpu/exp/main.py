"""CLI entry point: pretrain → test → optional finetune → collision eval.

Reference pipeline: src/main.py:126-174.  Run as
``python -m piml_tpu.exp.main --model pinnsf_m --data_config ... [--finetune_flag 1]``.
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

import jax
import numpy as np

from piml_tpu.config import PIMLConfig
from piml_tpu.data import FinetuneDataset, PointwiseDataset, VisDataset
from piml_tpu.engine import evaluate_rollouts
from piml_tpu.models import ModelSpec, build_finetune_model, build_model, pretrain_model_name
from piml_tpu.train import Trainer, checkpoint_path, load_params
from piml_tpu.utils import MetricLogger


def set_exp_seed(cfg: PIMLConfig) -> None:
    """Seeding (reference: src/main.py:115-123) — JAX PRNG keys flow from
    cfg.seed inside the trainer; numpy seeding covers host-side shuffles."""
    np.random.seed(cfg.seed)


def set_process_title(cfg: PIMLConfig) -> str:
    """Label the process ``exp_name@user_name`` (reference: src/main.py:123,
    utils.py) so sweep runs are identifiable in ps/top.  Uses setproctitle
    when installed; otherwise falls back to the kernel's PR_SET_NAME comm
    field via ctypes (truncated to 15 bytes — the Linux limit).  Never
    fatal: observability nicety only."""
    title = f"{cfg.exp_name}@{cfg.user_name}"
    try:
        import setproctitle  # not in the baked image; optional

        setproctitle.setproctitle(title)
    except Exception:
        try:
            import ctypes

            libc = ctypes.CDLL(None, use_errno=True)
            libc.prctl(15, title.encode()[:15], 0, 0, 0)  # PR_SET_NAME
        except Exception:
            pass
    return title


def run(cfg: PIMLConfig, logger: Optional[MetricLogger] = None) -> dict:
    logger = logger or MetricLogger()
    set_exp_seed(cfg)
    set_process_title(cfg)
    if cfg.save_configs:
        os.makedirs(cfg.config_dir, exist_ok=True)
        cfg.save(os.path.join(cfg.config_dir, f"config_{cfg.model_name_suffix}.json"))
    start = time.time()
    results = {}

    # ---- pretrain on synthetic data (main.py:134-146) ---------------------
    polar = cfg.training_mode == "polar"
    synthetic = PointwiseDataset(polar=polar)
    synthetic.load_data(cfg.data_config)
    logger.info(f"number of training dataset: {len(synthetic.raw.get('train', []))}")
    cfg = synthetic.build_dataset(cfg)
    logger.info(f"train {len(synthetic.train_data)}, valid {len(synthetic.valid_data)}")

    trainer = Trainer(cfg, logger)
    state = trainer.train_pointwise(synthetic.train_data, synthetic.valid_data)
    results["pretrain_val"] = state.best_val

    if synthetic.test_data:
        apply_fn = lambda p, pf, of, sf: trainer.model.apply(p, pf, of, sf)
        m = evaluate_rollouts(state.params, apply_fn, cfg, synthetic.test_data)
        logger.log(test_loss=m.loss, test_mse=m.mse, test_mae=m.mae,
                   test_ot=m.ot, test_mmd=m.mmd,
                   test_coll=m.collision, test_hard_coll=m.hard_collision)
        results["pretrain_test_mae"] = m.mae

    # ---- finetune on real data (main.py:148-155) --------------------------
    if cfg.finetune_flag:
        real = FinetuneDataset(polar=polar)
        real.load_data(cfg.ft_data_config)
        cfg = real.build_dataset(cfg)
        trainer.cfg = cfg  # real-data feature dims / time unit
        # scene path: the trainer builds the stacked scan inputs with one
        # fused gather per field per scene — bit-identical composition to
        # channel_batches(RandomState(cfg.seed), shuffle=cfg.shuffle)
        ft_state = trainer.finetune(None, real.valid_data, real.test_data,
                                    pretrained=state.params,
                                    train_scenes=real.train_data,
                                    shuffle=cfg.shuffle)
        results["finetune_val"] = ft_state.best_val
        state = ft_state

    logger.info(f"Total train time: {time.time() - start:.1f}s")
    results["train_time_s"] = time.time() - start
    return results


def collision_eval(cfg: PIMLConfig, vis_config: str,
                   logger: Optional[MetricLogger] = None) -> List[dict]:
    """Rollout collision counting on visualization scenes
    (reference: src/main.py:159-173)."""
    import jax.numpy as jnp

    from piml_tpu.engine import engine_config, eval_rollout
    from piml_tpu.metrics import collision_count

    logger = logger or MetricLogger()
    vis = VisDataset()
    vis.load_data(vis_config)
    cfg = vis.build_dataset(cfg)

    spec = ModelSpec.from_config(
        cfg, name=None if cfg.finetune_flag else pretrain_model_name(cfg.model)
    )
    model = build_finetune_model(spec) if cfg.finetune_flag else build_model(spec)
    sample = next(iter(vis.dataset.values()))[0]
    template = model.init(jax.random.PRNGKey(0), sample.ped_features[0],
                          sample.obs_features[0], sample.self_features[0])
    params = load_params(checkpoint_path(cfg, cfg.finetune_flag), template)
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)
    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)

    out = []
    for split, datas in vis.dataset.items():
        for data in datas:
            res = eval_rollout(params, apply_fn, ecfg, data, cfg.skip_frames)
            soft = float(collision_count(res.position, 0.5))
            hard = float(collision_count(res.position, 0.25))
            logger.info(f"#collisions soft/hard: {soft} / {hard}")
            out.append({"split": split, "soft": soft, "hard": hard})
    return out


def main(argv=None):
    cfg = PIMLConfig.from_cli(argv)
    logger = MetricLogger(
        jsonl_path=cfg.jsonl_log or f"metrics_{cfg.model_name_suffix}.jsonl")
    run(cfg, logger)


if __name__ == "__main__":
    main()
