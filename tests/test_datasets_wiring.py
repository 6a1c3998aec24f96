"""Orchestrator wiring tests: ratio split, add_noise, augmentation config,
OnlyTraining — the config flags must actually change the built datasets
(reference: src/data/dataset.py:75-95, 208-310)."""

import os
import sys

import numpy as np
import pytest
import yaml

from piml_tpu.config import PIMLConfig
from piml_tpu.data import (
    OnlyTrainingDataset,
    PointwiseDataset,
    RatioSplitDataset,
    split_train_val_test,
)

REF = "/root/reference/src"
TOY = "/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy"


def _cfg(**kw):
    base = dict(skip_frames=5, valid_steps=4, seed=7)
    base.update(kw)
    return PIMLConfig(**base)


def _write_config(tmp_path, mapping):
    p = tmp_path / "data.yaml"
    p.write_text(yaml.safe_dump(mapping))
    return str(p)


def test_split_train_val_test_matches_reference():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    sys.path.insert(0, REF)
    try:
        from data.dataset import BaseDataset
    finally:
        sys.path.remove(REF)
    for n, shuffle, seed in [(100, False, 0), (57, False, 3), (100, True, 5)]:
        ref = BaseDataset.split_train_val_test(n, 0.6, 0.2, 0.2, seed, shuffle)
        got = split_train_val_test(n, 0.6, 0.2, 0.2, seed, shuffle)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_split_rejects_bad_ratios():
    with pytest.raises(ValueError):
        split_train_val_test(10, 0.5, 0.2, 0.2, 0)


def test_ratio_split_dataset(toy_path):
    ds = RatioSplitDataset()
    ds.load_data(toy_path)
    cfg = ds.build_dataset(_cfg())
    assert len(ds.train_data) > 0 and len(ds.valid_data) > 0
    assert len(ds.test_data) == 1
    # test tail is time-indexed with the right frame count
    total = ds.scene.num_steps
    n_test = total - int(total * 0.8)
    assert ds.test_data[0].num_frames == n_test
    # pointwise rows from disjoint frame sets never exceed the full set
    full = RatioSplitDataset()
    full.load_data(toy_path)
    full_cfg = full.build_dataset(_cfg(train_ratio=1.0, val_ratio=0.0,
                                       test_ratio=0.0))
    assert len(ds.train_data) + len(ds.valid_data) <= len(full.train_data)
    assert cfg.self_feature_dim == full_cfg.self_feature_dim


def test_add_noise_flag_changes_training_rows(tmp_path, toy_path):
    path = _write_config(tmp_path, {"train": [toy_path], "valid": [toy_path],
                                    "test": [toy_path]})
    clean, noisy = PointwiseDataset(), PointwiseDataset()
    clean.load_data(path)
    noisy.load_data(path)
    clean.build_dataset(_cfg())
    noisy.build_dataset(_cfg(add_noise_flag=True, add_noise_std=0.1))
    assert len(clean.train_data) == len(noisy.train_data)
    # the perturbation must actually reach the built features/labels ...
    assert not np.allclose(np.asarray(clean.train_data.self_features),
                           np.asarray(noisy.train_data.self_features))
    # ... but never the test split (reference keeps test clean, dataset.py:243)
    np.testing.assert_allclose(
        np.asarray(clean.test_data[0].position),
        np.asarray(noisy.test_data[0].position),
    )


def test_augmentation_config_wiring(tmp_path, toy_path):
    path = _write_config(tmp_path, {"train": [toy_path], "valid": [toy_path]})
    plain, aug = PointwiseDataset(), PointwiseDataset()
    plain.load_data(path)
    aug.load_data(path)
    plain.build_dataset(_cfg())
    aug.build_dataset(_cfg(augment_thetas=str(np.pi), augment_mirrors="0.0",
                           augment_splits="train"))
    # rotate + mirror triple the train scenes; valid untouched
    assert len(aug.train_data) == 3 * len(plain.train_data)
    assert len(aug.valid_data) == len(plain.valid_data)


def test_only_training_dataset(tmp_path, toy_path):
    path = _write_config(tmp_path, {"train": [toy_path, toy_path],
                                    "valid": [toy_path], "test": [toy_path]})
    ds = OnlyTrainingDataset()
    ds.load_data(path)
    ds.build_dataset(_cfg())
    assert len(ds.train_data) > 0
    assert hasattr(ds.valid_data, "labels")  # pointwise when not finetuning
    assert len(ds.test_data) == 1

    ft = OnlyTrainingDataset()
    ft.load_data(path)
    ft.build_dataset(_cfg(finetune_flag=True))
    assert isinstance(ft.valid_data, list)  # channeled windows when finetuning
    assert ft.valid_data[0].num_channels >= 1


def test_feature_cache_roundtrip(tmp_path, monkeypatch):
    """Cached make_time_indexed returns bit-identical views and hits disk."""
    import os

    import jax
    import numpy as np

    from piml_tpu.config import PIMLConfig
    from piml_tpu.data.views import _CACHE_FIELDS, make_time_indexed
    from piml_tpu.scene import Scene

    monkeypatch.setenv("PIML_FEATURE_CACHE", str(tmp_path))
    cfg = PIMLConfig(skip_frames=5)
    scene = Scene.load("/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy")
    a = make_time_indexed(cfg, scene)
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].endswith(".npz")
    b = make_time_indexed(cfg, scene)  # cache hit
    for k in _CACHE_FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(a, k)),
                                      np.asarray(getattr(b, k)))
    assert a.meta_data["time_unit"] == b.meta_data["time_unit"]

    # different neighbor params -> different cache entry
    cfg2 = cfg.replace(topk_ped=4)
    make_time_indexed(cfg2, scene)
    assert len(os.listdir(tmp_path)) == 2


def test_scene_list_split_dataset(toy_paths):
    """build_dataset_with_list semantics (reference dataset.py:155-206):
    scene-index ratio split, pointwise train/valid, first test scene only."""
    from piml_tpu.data import SceneListSplitDataset

    ds = SceneListSplitDataset()
    paths = list(toy_paths) + [toy_paths[0], toy_paths[1]]  # 5 scenes
    ds.load_data(paths)
    cfg = ds.build_dataset(_cfg())
    # 5 scenes at 0.6/0.2/0.2: train=[0,1,2], valid=[3], test=[4]
    assert len(ds.test_data) == 1
    assert len(ds.train_data) > len(ds.valid_data) > 0
    assert cfg.self_feature_dim > 0


def test_stacked_channel_batches_matches_legacy(tmp_path, toy_paths):
    """The fused epoch-stack builder (one gather per field per scene) must
    equal the legacy form — channel_batches sliced per batch, grouped by
    shape, jnp.stack per group — LEAF-FOR-LEAF: same rng consumption, same
    meta normalization, same cross-scene group order, same n_train.  This
    is what lets Trainer.finetune's scene path replace the per-batch device
    -op storm (136 s of setup through the TPU tunnel at the GC shape)
    without changing a single training bit."""
    import jax
    import jax.numpy as jnp

    from piml_tpu.data import (
        FinetuneDataset,
        channel_batches,
        stacked_channel_batches,
    )

    cfg_file = tmp_path / "two_scene.yaml"
    cfg_file.write_text(yaml.safe_dump(
        {"train": [toy_paths[0], toy_paths[1]], "valid": [toy_paths[2]]}))
    real = FinetuneDataset()
    real.load_data(str(cfg_file))
    cfg = real.build_dataset(_cfg(valid_steps=4, skip_frames=5))
    bsz = 2

    batches = channel_batches(real.train_data, bsz,
                              np.random.RandomState(3), shuffle=True)
    assert len(batches) >= 4, "need multiple batches per scene"
    groups = {}
    for b in batches:
        tu = b.meta_data.get("time_unit", cfg.time_unit)
        b = b.replace(meta_data={"time_unit": tu})
        groups.setdefault(tuple(b.ped_features.shape) + (tu,), []).append(b)
    legacy = [jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
              for bs in groups.values()]

    fused, n_train = stacked_channel_batches(
        real.train_data, bsz, np.random.RandomState(3), shuffle=True,
        time_unit_default=cfg.time_unit)

    assert len(fused) == len(legacy)
    for lg, fs in zip(legacy, fused):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), lg, fs)
    expect = sum(int(np.sum(np.asarray(b.mask_p_pred) == 1)) for b in batches)
    assert int(np.asarray(n_train)) == expect


def test_pad_channels_stacked_matches_per_batch(tmp_path, toy_path):
    """pad_channels_stacked(stack(bs)) == stack([pad_channels(b)]) — the
    DP channel padding commutes with stacking."""
    import jax
    import jax.numpy as jnp

    from piml_tpu.data import FinetuneDataset, channel_batches
    from piml_tpu.parallel import pad_channels, pad_channels_stacked

    cfg_file = tmp_path / "one_scene.yaml"
    cfg_file.write_text(yaml.safe_dump(
        {"train": [toy_path], "valid": [toy_path]}))
    real = FinetuneDataset()
    real.load_data(str(cfg_file))
    real.build_dataset(_cfg(valid_steps=4, skip_frames=5))
    bs = channel_batches(real.train_data, 3, np.random.RandomState(0))[:2]
    bs = [b.replace(meta_data={"time_unit": 0.5}) for b in bs]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)
    want = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[pad_channels(b, 4) for b in bs])
    got = pad_channels_stacked(stacked, 4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg="padded stack"), want, got)


def test_unify_train_slots_loss_neutral(tmp_path, toy_paths):
    """unify_train_slots pads every finetune train scene to one slot count
    (ONE ft_epoch program instead of one per scene — the three GC paper
    scenes' 192/219/248 slots cost 3x the BPTT trace/compile/cache traffic,
    compile_attrib_r5cold.json).  The padded slots are inert: real-slot
    data is bit-identical and the full training-rollout loss is allclose."""
    import jax

    from piml_tpu.data import FinetuneDataset, channel_batches
    from piml_tpu.engine.simulator import training_rollout_loss
    from piml_tpu.models import ModelSpec, build_finetune_model

    from piml_tpu.scene import Scene

    # the toy scenes share a slot count — double one scene's agents (the
    # copies walk a parallel track 5 m away) so the two train scenes
    # genuinely differ (as the GC paper scenes do: 192/219/248)
    s1 = Scene.load(toy_paths[1])
    off = np.float32(5.0)

    def dup(x, axis, shift=False):
        y = x + off if shift else x
        return np.concatenate([np.asarray(x), np.asarray(y)], axis=axis)

    grown = s1.replace(
        position=dup(s1.position, 1, True), velocity=dup(s1.velocity, 1),
        acceleration=dup(s1.acceleration, 1),
        destination=dup(s1.destination, 1, True),
        waypoints=dup(s1.waypoints, 1, True), dest_idx=dup(s1.dest_idx, 1),
        dest_num=dup(s1.dest_num, 0), mask_p=dup(s1.mask_p, 1),
        mask_v=dup(s1.mask_v, 1), mask_a=dup(s1.mask_a, 1))
    shrunk_path = str(tmp_path / "toy1_grown.npy")
    grown.save(shrunk_path)

    def build(unify):
        cfg_file = tmp_path / f"unify_{unify}.yaml"
        cfg_file.write_text(yaml.safe_dump(
            {"train": [toy_paths[0], shrunk_path], "valid": [toy_paths[2]]}))
        ds = FinetuneDataset()
        ds.load_data(str(cfg_file))
        cfg = ds.build_dataset(_cfg(valid_steps=4, skip_frames=5,
                                    unify_train_slots=unify,
                                    collision_pred_weight=0.5,
                                    collision_loss_weight=1.0))
        return ds, cfg

    base_ds, cfg = build(False)
    uni_ds, _ = build(True)
    ns = {d.position.shape[2] for d in base_ds.train_data}
    assert len(ns) >= 2, "widened scene must differ in slot count"
    n_max = max(ns)
    assert {d.position.shape[2] for d in uni_ds.train_data} == {n_max}

    # real-slot content is bit-identical after padding
    for b, u in zip(base_ds.train_data, uni_ds.train_data):
        n = b.position.shape[2]
        np.testing.assert_array_equal(np.asarray(b.position),
                                      np.asarray(u.position[:, :, :n]))
        np.testing.assert_array_equal(np.asarray(b.mask_p_pred),
                                      np.asarray(u.mask_p_pred[:, :, :n]))
        # padded slots are inert: NaN positions, zero prediction masks
        assert np.isnan(np.asarray(u.position[:, :, n:])).all()
        assert (np.asarray(u.mask_p_pred[:, :, n:]) == 0).all()

    model = build_finetune_model(ModelSpec.from_config(cfg))
    b0 = channel_batches(base_ds.train_data, 2, np.random.RandomState(3))[0]
    u0 = channel_batches(uni_ds.train_data, 2, np.random.RandomState(3))[0]
    params = model.init(jax.random.PRNGKey(0), b0.ped_features[0, 0],
                        b0.obs_features[0, 0], b0.self_features[0, 0])
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)
    lb = training_rollout_loss(params, apply_fn, cfg, b0)
    lu = training_rollout_loss(params, apply_fn, cfg, u0)
    np.testing.assert_allclose(float(lb.loss), float(lu.loss), rtol=1e-5)
    np.testing.assert_allclose(float(lb.mse_loss), float(lu.mse_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(lb.collision_count),
                               float(lu.collision_count), rtol=1e-6)
