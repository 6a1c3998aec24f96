"""Slow end-to-end tests: the full pretrain → finetune pipeline and the
polar training mode, on the toy dataset."""

import os

import numpy as np
import pytest

from piml_tpu.config import PIMLConfig
from piml_tpu.data import (
    FinetuneDataset,
    PointwiseDataset,
    channel_batches,
)
from piml_tpu.train import Trainer, checkpoint_path
from piml_tpu.utils import MetricLogger

# (previously file-wide slow-marked when the marker was decorative; with
# addopts excluding slow these ~35 s of toy-scale e2e coverage belong in
# the default path)


def _write_cfg(tmp_path, toy_paths, name="data.yaml", test_split=True):
    import yaml

    d = {"train": [toy_paths[0]], "valid": [toy_paths[1]]}
    if test_split:
        d["test"] = [toy_paths[2]]
    p = tmp_path / name
    p.write_text(yaml.safe_dump(d))
    return str(p)


def tiny_cfg(tmp_path, **kw):
    base = dict(
        skip_frames=5, valid_steps=4, epochs=1, batch_size=16, ft_batch_size=2,
        learning_rate=1e-3, dropout=0.0, encoder_hidden_size=16,
        encoder_hidden_layers=2, processor_hidden_size=16,
        processor_hidden_layers=2, decoder_hidden_size=8,
        decoder_hidden_layers=2, save_dir=str(tmp_path / "ckpt"),
        patience=10, ft_patience=10,
    )
    base.update(kw)
    return PIMLConfig(**base)


def test_full_finetune_pipeline(tmp_path, toy_paths):
    """pretrain (pointwise) → finetune (differentiable rollout) with warm
    start, rollout validation and test metrics — the reference main.py path
    (src/main.py:126-155)."""
    logger = MetricLogger(stream=open(os.devnull, "w"))
    cfg = tiny_cfg(tmp_path, model="pinnsf_bm", collision_pred_weight=10.0,
                   collision_loss_weight=1.0)

    synth = PointwiseDataset()
    synth.load_data(_write_cfg(tmp_path, toy_paths))
    cfg = synth.build_dataset(cfg)
    trainer = Trainer(cfg, logger)
    pre_state = trainer.train_pointwise(synth.train_data, synth.valid_data)
    assert os.path.exists(checkpoint_path(cfg, finetuned=False))

    real = FinetuneDataset()
    real.load_data(_write_cfg(tmp_path, toy_paths, "ft.yaml"))
    cfg = real.build_dataset(cfg)
    rng = np.random.RandomState(0)
    batches = channel_batches(real.train_data, cfg.ft_batch_size, rng)
    assert batches, "toy scene must yield at least one channel batch"
    ft_state = trainer.finetune(batches[:2], real.valid_data,
                                real.test_data, pretrained=pre_state.params)
    assert np.isfinite(ft_state.best_val)
    assert os.path.exists(checkpoint_path(cfg, finetuned=True))


def test_polar_training_mode(tmp_path, toy_paths):
    """Polar dataset build + pinnsf_pb forward path
    (reference: dataset.py:454, model.py:1452)."""
    logger = MetricLogger(stream=open(os.devnull, "w"))
    cfg = tiny_cfg(tmp_path, model="pinnsf_pb", training_mode="polar",
                   collision_pred_weight=0.0)
    ds = PointwiseDataset(polar=True)
    ds.load_data(_write_cfg(tmp_path, toy_paths, test_split=False))
    cfg = ds.build_dataset(cfg)
    # polar features: r >= 0 in the radial channels
    r = np.asarray(ds.train_data.ped_features[..., 0])
    assert (r >= 0).all()
    trainer = Trainer(cfg, logger)
    state = trainer.train_pointwise(ds.train_data, ds.valid_data)
    assert np.isfinite(state.best_val)


def test_collision_eval_path(tmp_path, toy_paths):
    """The main.py collision-eval tail (src/main.py:159-173)."""
    import yaml

    from piml_tpu.exp.main import collision_eval, run

    logger = MetricLogger(stream=open(os.devnull, "w"))
    cfg = tiny_cfg(tmp_path, model="pinnsf_m")
    cfg = cfg.replace(data_config=_write_cfg(tmp_path, toy_paths))
    run(cfg, logger)
    vis_cfg = tmp_path / "vis.yaml"
    vis_cfg.write_text(yaml.safe_dump({"vis": [toy_paths[0]]}))
    out = collision_eval(cfg, str(vis_cfg), logger)
    assert len(out) == 1
    assert out[0]["soft"] >= 0
