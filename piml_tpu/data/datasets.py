"""YAML-driven dataset orchestration (reference: src/data/dataset.py).

A data config YAML maps split names (train/valid/test/vis) to lists of v2.2
``.npy`` paths.  The orchestrators below mirror the reference classes:

- :class:`PointwiseDataset` ← ``PointwisePedDataset`` (dataset.py:106): the
  main path — train/valid pointwise, test time-indexed.
- :class:`FinetuneDataset` ← ``TimeIndexedPedDataset`` (dataset.py:312):
  train = channeled 'slice' windows, valid = channeled 'split' → here valid
  stays a list of time-indexed scenes evaluated by rollout (the reference's
  ``TimeIndexedPedDataset2`` variant, dataset.py:399, which the shipped
  configs use).
- :class:`VisDataset` ← ``TimeIndexedPedDatasetforVis`` (dataset.py:423).
- Polar variants via ``polar=True`` ← ``*Polar`` classes (dataset.py:454,503).

Feature dims are published back onto the config
(reference side effect, dataset.py:144-146).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml

from piml_tpu.config import PIMLConfig
from piml_tpu.data.views import (
    ChanneledData,
    PointwiseData,
    TimeIndexedData,
    make_time_indexed,
    merge_pointwise,
    to_channeled,
    to_pointwise,
)
from piml_tpu.scene import Scene, mirror, rotate


def load_scenes(data_config_path: str) -> Dict[str, List[Scene]]:
    """Read the split→paths YAML and decode every scene
    (reference: dataset.py:45-53)."""
    with open(data_config_path) as f:
        split_paths = yaml.safe_load(f)
    scenes: Dict[str, List[Scene]] = defaultdict(list)
    base = os.path.dirname(os.path.abspath(data_config_path))
    for split, paths in split_paths.items():
        for path in paths:
            if not os.path.isabs(path):
                # reference configs use paths relative to src/; try both
                for cand in (path, os.path.join(base, path)):
                    if os.path.exists(cand):
                        path = cand
                        break
            scenes[split].append(Scene.load(path))
    return dict(scenes)


def augment_scenes(scenes: List[Scene], thetas: Optional[Sequence[float]] = None,
                   mirrors: Optional[Sequence[float]] = None) -> List[Scene]:
    """Rotation/mirror augmentation (reference: dataset.py:55-72)."""
    out = list(scenes)
    for s in scenes:
        for th in thetas or []:
            out.append(rotate(s, th))
        for th in mirrors or []:
            out.append(mirror(s, th))
    return out


def _check_time_unit(scenes: Dict[str, List[Scene]]) -> float:
    units = {s.time_unit for split in scenes.values() for s in split}
    assert len(units) == 1, f"inconsistent time units: {units}"
    return units.pop()


def _publish_dims(cfg: PIMLConfig, data: TimeIndexedData) -> PIMLConfig:
    p, o, s = data.feature_dims
    return cfg.replace(ped_feature_dim=p, obs_feature_dim=o, self_feature_dim=s)


class PointwiseDataset:
    """Main pretraining path: pointwise train/valid, time-indexed test."""

    def __init__(self, polar: bool = False):
        self.polar = polar
        self.raw: Dict[str, List[Scene]] = {}
        self.train_data: Optional[PointwiseData] = None
        self.valid_data: Optional[PointwiseData] = None
        self.test_data: List[TimeIndexedData] = []

    def load_data(self, data_config_path: str) -> None:
        self.raw = load_scenes(data_config_path)

    def build_dataset(self, cfg: PIMLConfig) -> PIMLConfig:
        assert self.raw, "must load raw data before build_dataset"
        cfg = cfg.replace(time_unit=_check_time_unit(self.raw))
        dataset: Dict[str, list] = defaultdict(list)
        ti_sample = None
        for split, scenes in self.raw.items():
            for scene in scenes:
                ti = make_time_indexed(cfg, scene, polar=self.polar)
                ti_sample = ti
                if split in {"train", "valid"}:
                    dataset[split].append(to_pointwise(ti))
                else:
                    dataset[split].append(ti)
        self.train_data = merge_pointwise(dataset["train"])
        self.valid_data = merge_pointwise(dataset["valid"])
        self.test_data = dataset.get("test", [])
        return _publish_dims(cfg, ti_sample)


class FinetuneDataset:
    """Rollout finetuning path: channeled train windows, rollout validation."""

    def __init__(self, polar: bool = False):
        self.polar = polar
        self.raw: Dict[str, List[Scene]] = {}
        self.train_data: List[ChanneledData] = []
        self.valid_data: List[TimeIndexedData] = []
        self.test_data: List[TimeIndexedData] = []

    def load_data(self, data_config_path: str) -> None:
        self.raw = load_scenes(data_config_path)

    def build_dataset(self, cfg: PIMLConfig) -> PIMLConfig:
        assert self.raw, "must load raw data before build_dataset"
        cfg = cfg.replace(time_unit=_check_time_unit(self.raw))
        ti_sample = None
        for split, scenes in self.raw.items():
            for scene in scenes:
                ti = make_time_indexed(cfg, scene, polar=self.polar)
                ti_sample = ti
                if split == "train":
                    self.train_data.append(
                        to_channeled(ti, cfg.valid_steps, "slice")
                    )
                elif split == "valid":
                    self.valid_data.append(ti)
                else:
                    self.test_data.append(ti)
        return _publish_dims(cfg, ti_sample)


class VisDataset:
    """Visualization / collision-metric scenes, all splits time-indexed."""

    def __init__(self):
        self.raw: Dict[str, List[Scene]] = {}
        self.dataset: Dict[str, List[TimeIndexedData]] = {}

    def load_data(self, data_config_path: str) -> None:
        self.raw = load_scenes(data_config_path)

    def build_dataset(self, cfg: PIMLConfig) -> PIMLConfig:
        assert self.raw, "must load raw data before build_dataset"
        cfg = cfg.replace(time_unit=_check_time_unit(self.raw))
        self.dataset = {
            split: [make_time_indexed(cfg, s) for s in scenes]
            for split, scenes in self.raw.items()
        }
        sample = next(iter(self.dataset.values()))[0]
        return _publish_dims(cfg, sample)


def channel_batches(data: List[ChanneledData], batch_size: int,
                    rng: np.random.RandomState, shuffle: bool = False,
                    drop_last: bool = True) -> List[ChanneledData]:
    """Channel-sliced batch list (reference: src/utils/data_loader.py:41-53)."""
    out = []
    for d in data:
        n = d.num_channels
        steps = n // batch_size
        order = rng.permutation(n) if shuffle else np.arange(n)
        for i in range(steps):
            out.append(d.slice_channels(order[i * batch_size:(i + 1) * batch_size]))
    return out
