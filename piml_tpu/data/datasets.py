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
    slice_frames,
    to_channeled,
    to_pointwise,
)
from piml_tpu.scene import Scene, mirror, random_walk_noise, rotate


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


def _parse_floats(s: str) -> List[float]:
    return [float(x) for x in s.split(",") if x.strip()] if s else []


def apply_config_augmentation(raw: Dict[str, List[Scene]],
                              cfg: PIMLConfig) -> Dict[str, List[Scene]]:
    """Apply the config's rotate/mirror augmentation to the named splits
    (reference: BaseDataset.data_augmentation, dataset.py:68-73)."""
    thetas = _parse_floats(cfg.augment_thetas)
    mirrors = _parse_floats(cfg.augment_mirrors)
    if not thetas and not mirrors:
        return raw
    out = dict(raw)
    for split in (s.strip() for s in cfg.augment_splits.split(",")):
        if split in out:
            out[split] = augment_scenes(out[split], thetas, mirrors)
    return out


def perturb_velocity(scene: Scene, std: float, seed: int) -> Scene:
    """Random-walk velocity perturbation for noise-robust training
    (reference: dataset.py:222-228 + src/functions/noises.py:9-19).

    The reference adds the noise to the raw velocities and rebuilds the whole
    dataset from them, so features and labels both see the perturbation."""
    import jax

    noise = random_walk_noise(
        jax.random.PRNGKey(seed), scene.velocity, scene.mask_v, std
    )
    return scene.replace(velocity=scene.velocity + noise)


def _maybe_noisy(scene: Scene, cfg: PIMLConfig, idx: int) -> Scene:
    if not cfg.add_noise_flag:
        return scene
    return perturb_velocity(scene, cfg.add_noise_std, cfg.seed + idx)


def split_train_val_test(n: int, train_ratio: float, val_ratio: float,
                         test_ratio: float, seed: int, shuffle: bool = False):
    """Frame-index ratio split (reference: dataset.py:75-95).

    Faithful to the reference, including its quirky ``shuffle`` branch that
    permutes only the first ``int(n * val_ratio)`` indices; the test block is
    always the contiguous tail."""
    if abs(train_ratio + val_ratio + test_ratio - 1.0) > 1e-9:
        raise ValueError("illegal train valid test split!")
    idx_all = np.arange(n)
    if shuffle:
        rnd = np.random.RandomState(seed)
        head = int(n * val_ratio)
        idx_all[:head] = rnd.permutation(head)
    n_train = int(n * train_ratio)
    n_val = int(n * (train_ratio + val_ratio))
    return idx_all[:n_train], idx_all[n_train:n_val], idx_all[n_val:]


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
        raw = apply_config_augmentation(self.raw, cfg)
        cfg = cfg.replace(time_unit=_check_time_unit(raw))
        dataset: Dict[str, list] = defaultdict(list)
        ti_sample = None
        for split, scenes in raw.items():
            for i, scene in enumerate(scenes):
                if split in {"train", "valid"}:
                    # add_noise rebuilds features/labels from perturbed
                    # velocities for train+valid, test stays clean
                    # (reference: dataset.py:222-243)
                    ti = make_time_indexed(
                        cfg, _maybe_noisy(scene, cfg, i), polar=self.polar
                    )
                    dataset[split].append(to_pointwise(ti))
                else:
                    ti = make_time_indexed(cfg, scene, polar=self.polar)
                    dataset[split].append(ti)
                ti_sample = ti
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
        raw = apply_config_augmentation(self.raw, cfg)
        cfg = cfg.replace(time_unit=_check_time_unit(raw))
        ti_sample = None
        train_ti = []
        for split, scenes in raw.items():
            for scene in scenes:
                ti = make_time_indexed(cfg, scene, polar=self.polar)
                ti_sample = ti
                if split == "train":
                    train_ti.append(ti)
                elif split == "valid":
                    self.valid_data.append(ti)
                else:
                    self.test_data.append(ti)
        if cfg.unify_train_slots and len(train_ti) > 1:
            # one batch shape across scenes → ONE ft_epoch program (the
            # per-scene slot counts at the GC paper config are 192/219/248;
            # three shape groups cost 3x the BPTT trace + compile + a
            # 3-entry compile-cache footprint, compile_attrib_r5cold.json).
            # pad_agents' inert NaN slots never spawn, are never selected
            # as neighbors, and carry zero prediction masks, so losses and
            # metrics are unchanged (allclose, not bit-equal: masked sums
            # reduce over a longer zero-padded axis).
            from .views import pad_agents

            n_max = max(t.num_pedestrians for t in train_ti)
            train_ti = [pad_agents(t, n_max) for t in train_ti]
        self.train_data = [to_channeled(t, cfg.valid_steps, "slice")
                           for t in train_ti]
        return _publish_dims(cfg, ti_sample)


class RatioSplitDataset:
    """Single-scene train/val/test by frame-index ratio (reference:
    ``PointwisePedDataset.old_build_dataset`` dataset.py:208-255 +
    ``split_train_val_test`` dataset.py:75-95).

    The scene's frames are ratio-split; train/valid become pointwise rows
    drawn from the (optionally noise-perturbed, dataset.py:222-228) dataset,
    test is the clean contiguous tail as a time-indexed view."""

    def __init__(self, polar: bool = False):
        self.polar = polar
        self.scene: Optional[Scene] = None
        self.train_data: Optional[PointwiseData] = None
        self.valid_data: Optional[PointwiseData] = None
        self.test_data: List[TimeIndexedData] = []

    def load_data(self, path_or_config: str) -> None:
        if path_or_config.endswith(".npy"):
            self.scene = Scene.load(path_or_config)
        else:
            raw = load_scenes(path_or_config)
            scenes = [s for split in raw.values() for s in split]
            assert len(scenes) == 1, (
                "RatioSplitDataset splits a single scene by ratio; got "
                f"{len(scenes)} scenes"
            )
            self.scene = scenes[0]

    def build_dataset(self, cfg: PIMLConfig) -> PIMLConfig:
        assert self.scene is not None, "must load raw data before build_dataset"
        cfg = cfg.replace(time_unit=self.scene.time_unit)
        clean = make_time_indexed(cfg, self.scene, polar=self.polar)
        noisy = clean
        if cfg.add_noise_flag:
            noisy = make_time_indexed(
                cfg, perturb_velocity(self.scene, cfg.add_noise_std, cfg.seed),
                polar=self.polar,
            )
        train_idx, valid_idx, test_idx = split_train_val_test(
            clean.num_frames, cfg.train_ratio, cfg.val_ratio, cfg.test_ratio,
            cfg.seed, shuffle=cfg.shuffle,
        )
        self.train_data = to_pointwise(noisy, frames=train_idx)
        self.valid_data = to_pointwise(noisy, frames=valid_idx)
        self.test_data = (
            [slice_frames(clean, int(test_idx[0]), int(test_idx[-1]) + 1)]
            if len(test_idx) else []
        )
        return _publish_dims(cfg, clean)


class SceneListSplitDataset:
    """Ratio split over a LIST of scenes by scene index (reference:
    ``PointwisePedDataset.build_dataset_with_list`` dataset.py:155-206):
    train/valid scenes are merged pointwise, test is the first test-block
    scene as a time-indexed view (the reference keeps only ``test_data[0]``,
    dataset.py:194-195).  Uses the same ``split_train_val_test`` index
    semantics (no shuffle at this call site, dataset.py:170-172)."""

    def __init__(self, polar: bool = False):
        self.polar = polar
        self.scenes: List[Scene] = []
        self.train_data: Optional[PointwiseData] = None
        self.valid_data: Optional[PointwiseData] = None
        self.test_data: List[TimeIndexedData] = []

    def load_data(self, path_or_config) -> None:
        if isinstance(path_or_config, (list, tuple)):
            self.scenes = [Scene.load(p) for p in path_or_config]
        else:
            raw = load_scenes(path_or_config)
            self.scenes = [s for split in raw.values() for s in split]

    def build_dataset(self, cfg: PIMLConfig) -> PIMLConfig:
        assert self.scenes, "must load raw data before build_dataset"
        units = {s.time_unit for s in self.scenes}
        assert len(units) == 1, f"inconsistent time units: {units}"
        cfg = cfg.replace(time_unit=units.pop())
        views = [make_time_indexed(cfg, s, polar=self.polar)
                 for s in self.scenes]
        train_idx, valid_idx, test_idx = split_train_val_test(
            len(views), cfg.train_ratio, cfg.val_ratio, cfg.test_ratio,
            cfg.seed, shuffle=False,
        )
        self.train_data = merge_pointwise(
            [to_pointwise(views[i]) for i in train_idx])
        self.valid_data = merge_pointwise(
            [to_pointwise(views[i]) for i in valid_idx])
        self.test_data = [views[test_idx[0]]] if len(test_idx) else []
        return _publish_dims(cfg, views[0])


class OnlyTrainingDataset:
    """Train-only orchestration (reference: ``PointwisePedDatasetOnlyTraining``
    dataset.py:256-310): train pointwise; valid channeled-'split' windows when
    finetuning, else pointwise; test time-indexed.

    The reference's ``pointwise_set.union({'valid'})`` is a no-op (the result
    is discarded, dataset.py:275-277) yet it still merges valid as pointwise
    at dataset.py:289 — we implement the evident intent."""

    def __init__(self, polar: bool = False):
        self.polar = polar
        self.raw: Dict[str, List[Scene]] = {}
        self.train_data: Optional[PointwiseData] = None
        self.valid_data = None  # PointwiseData | List[ChanneledData]
        self.test_data: List[TimeIndexedData] = []

    def load_data(self, data_config_path: str) -> None:
        self.raw = load_scenes(data_config_path)

    def build_dataset(self, cfg: PIMLConfig) -> PIMLConfig:
        assert self.raw, "must load raw data before build_dataset"
        raw = apply_config_augmentation(self.raw, cfg)
        cfg = cfg.replace(time_unit=_check_time_unit(raw))
        ti_sample = None
        train, valid, test = [], [], []
        for split, scenes in raw.items():
            for i, scene in enumerate(scenes):
                if split == "train":
                    ti = make_time_indexed(
                        cfg, _maybe_noisy(scene, cfg, i), polar=self.polar
                    )
                    train.append(to_pointwise(ti))
                elif split == "valid":
                    ti = make_time_indexed(cfg, scene, polar=self.polar)
                    if cfg.finetune_flag:
                        valid.append(to_channeled(ti, cfg.valid_steps, "split"))
                    else:
                        valid.append(to_pointwise(ti))
                else:
                    ti = make_time_indexed(cfg, scene, polar=self.polar)
                    test.append(ti)
                ti_sample = ti
        self.train_data = merge_pointwise(train)
        self.valid_data = valid if cfg.finetune_flag else merge_pointwise(valid)
        self.test_data = test
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


# the 15 fields slice_channels gathers (leading window-channel axis);
# the remaining array fields (abnormal_mask, dest_num, waypoints,
# obstacles, desired_speed) are per-scene constants
_CHANNEL_FIELDS = (
    "ped_features", "obs_features", "self_features", "labels",
    "mask_p", "mask_v", "mask_a", "mask_p_pred", "mask_v_pred",
    "mask_a_pred", "position", "velocity", "acceleration", "destination",
    "dest_idx",
)
_SCENE_CONST_FIELDS = (
    "abnormal_mask", "dest_num", "waypoints", "obstacles", "desired_speed",
)


def stacked_channel_batches(
    data: List[ChanneledData], batch_size: int, rng: np.random.RandomState,
    shuffle: bool = False, time_unit_default=None,
):
    """Scan-ready stacked batch groups, equal LEAF-FOR-LEAF (same values,
    same order) to grouping the :func:`channel_batches` list by batch shape
    and ``jnp.stack``-ing each group — but built with ONE (steps, B)-indexed
    gather per array field per scene instead of one slice per batch.

    The per-batch form dispatches ~20 small device ops per batch; through
    the TPU tunnel's per-op overhead that dominated finetune setup
    (measured 136.6 s at the GC paper shape, 69 batches — vs ~1 s fused).

    Returns ``(stacks, n_train)``: ``stacks`` is a list of ChanneledData
    whose leading axis is batches-per-epoch (grouped by per-batch shape +
    time_unit, concatenated across scenes in scene order, exactly like the
    legacy grouping), and ``n_train`` is the on-device count of predicted
    rows (``mask_p_pred == 1``) over the kept batches — fetch it with one
    host sync instead of one ``np.sum`` per batch.

    RNG consumption matches :func:`channel_batches` exactly: one
    ``rng.permutation(n)`` per scene, in scene order, even for scenes too
    small to yield a batch — so shuffled compositions are bit-identical.
    """
    import jax
    import jax.numpy as jnp

    groups: Dict[tuple, list] = {}
    n_train = None
    for d in data:
        n = d.num_channels
        steps = n // batch_size
        order = rng.permutation(n) if shuffle else np.arange(n)
        if steps == 0:
            continue
        idx = jnp.asarray(
            np.ascontiguousarray(order[: steps * batch_size])
            .reshape(steps, batch_size))
        tu = d.meta_data.get("time_unit", time_unit_default)
        d = d.replace(meta_data={"time_unit": tu})
        fields = {f: getattr(d, f)[idx] for f in _CHANNEL_FIELDS}
        fields.update({
            f: jnp.broadcast_to(getattr(d, f),
                                (steps,) + getattr(d, f).shape)
            for f in _SCENE_CONST_FIELDS
        })
        stacked = d.replace(**fields)
        nt = jnp.sum(stacked.mask_p_pred == 1)
        n_train = nt if n_train is None else n_train + nt
        key = tuple(fields["ped_features"].shape[1:]) + (tu,)
        groups.setdefault(key, []).append(stacked)

    stacks = [
        bs[0] if len(bs) == 1 else jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *bs)
        for bs in groups.values()
    ]
    if n_train is None:
        n_train = jnp.asarray(0)
    return stacks, n_train
