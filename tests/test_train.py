"""End-to-end training tests on the toy dataset: loss decreases, finetune
warm-start works, checkpoints round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piml_tpu.config import PIMLConfig
from piml_tpu.data import (
    PointwiseDataset,
    make_time_indexed,
    to_channeled,
    to_pointwise,
)
from piml_tpu.scene import Scene
from piml_tpu.train import (
    Trainer,
    checkpoint_path,
    load_params,
    make_batches,
    make_optimizer,
    merge_pretrained,
    save_params,
)
from piml_tpu.utils import MetricLogger


def tiny_cfg(tmp_path, **kw):
    base = dict(
        skip_frames=5, valid_steps=4, epochs=3, batch_size=16,
        ft_batch_size=2, learning_rate=1e-3, dropout=0.0,
        encoder_hidden_size=16, encoder_hidden_layers=2,
        processor_hidden_size=16, processor_hidden_layers=2,
        decoder_hidden_size=8, decoder_hidden_layers=2,
        model="pinnsf_m", save_dir=str(tmp_path / "ckpt"),
        collision_pred_weight=0.0, patience=10, ft_patience=10,
    )
    base.update(kw)
    return PIMLConfig(**base)


@pytest.fixture(scope="module")
def toy_view():
    cfg = PIMLConfig(skip_frames=5)
    scene = Scene.load("/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy")
    return make_time_indexed(cfg, scene)


def test_pointwise_training_loss_decreases(tmp_path, toy_view):
    cfg = tiny_cfg(tmp_path)
    data = to_pointwise(toy_view)
    cfg = cfg.replace(self_feature_dim=int(data.self_features.shape[-1]))
    trainer = Trainer(cfg, MetricLogger(stream=open(os.devnull, "w")))
    params = trainer.init_params(data)
    trainer.tx = make_optimizer(cfg)
    opt_state = trainer.tx.init(params)
    step = trainer._pointwise_step_fn()

    losses = []
    rng = np.random.RandomState(0)
    for epoch in range(8):
        total = 0.0
        for idx in make_batches(len(data), cfg.batch_size, rng):
            idx = jnp.asarray(idx)
            key = jax.random.PRNGKey(epoch)
            params, opt_state, loss, _ = step(
                params, opt_state, data.ped_features[idx],
                data.obs_features[idx], data.self_features[idx],
                data.labels[idx], key,
            )
            total += float(loss)
        losses.append(total)
    assert losses[-1] < losses[0] * 0.9, losses


def test_trainer_full_pointwise_path(tmp_path, toy_view):
    cfg = tiny_cfg(tmp_path, epochs=2)
    data = to_pointwise(toy_view)
    cfg = cfg.replace(self_feature_dim=int(data.self_features.shape[-1]))
    trainer = Trainer(cfg, MetricLogger(stream=open(os.devnull, "w")))
    state = trainer.train_pointwise(data, data)
    assert np.isfinite(state.best_val)
    ckpt = checkpoint_path(cfg, finetuned=False)
    assert os.path.exists(ckpt)
    # checkpoint round-trip is exact
    loaded = load_params(ckpt, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(state.params)):
        assert a.shape == b.shape


def test_trainer_resume_bit_identical(tmp_path, toy_view):
    """Interrupted-then-resumed pretraining equals an uninterrupted run:
    full TrainState (params+opt+counters) restores and per-epoch derived
    RNGs replay the same shuffles/dropout (beyond the reference, which has
    no optimizer-state resume — simulators.py:278-289)."""
    data = to_pointwise(toy_view)

    def fresh(dirname, epochs, resume):
        cfg = tiny_cfg(tmp_path / dirname, epochs=epochs, resume=resume)
        cfg = cfg.replace(self_feature_dim=int(data.self_features.shape[-1]))
        trainer = Trainer(cfg, MetricLogger(stream=open(os.devnull, "w")))
        return trainer, cfg

    # uninterrupted 4-epoch run
    trainer_a, _ = fresh("a", 4, resume=False)
    state_a = trainer_a.train_pointwise(data, data)

    # interrupted: 2 epochs, then resume to 4 in a new trainer
    trainer_b, _ = fresh("b", 2, resume=True)
    trainer_b.train_pointwise(data, data)
    trainer_b2, _ = fresh("b", 4, resume=True)
    state_b = trainer_b2.train_pointwise(data, data)

    assert np.isclose(state_a.best_val, state_b.best_val, rtol=1e-6), (
        state_a.best_val, state_b.best_val)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_merge_pretrained_partial_tree():
    a = {"params": {"enc": jnp.ones((3,)), "head": jnp.zeros((2,))}}
    b = {"params": {"enc": jnp.full((3,), 7.0)}}
    merged = merge_pretrained(a, b)
    np.testing.assert_allclose(np.asarray(merged["params"]["enc"]), 7.0)
    np.testing.assert_allclose(np.asarray(merged["params"]["head"]), 0.0)


def test_finetune_rollout_training_decreases(tmp_path, toy_view):
    cfg = tiny_cfg(tmp_path, model="pinnsf_bm", collision_pred_weight=10.0,
                   collision_loss_weight=1.0, epochs=1)
    cfg = cfg.replace(self_feature_dim=int(toy_view.self_features.shape[-1]))
    from piml_tpu.engine import training_rollout_loss
    from piml_tpu.models import ModelSpec, build_finetune_model
    import optax

    batch = to_channeled(toy_view, stride=cfg.valid_steps).slice_channels(
        np.arange(4)
    )
    model = build_finetune_model(ModelSpec.from_config(cfg))
    params = model.init(jax.random.PRNGKey(0), batch.ped_features[0, 0],
                        batch.obs_features[0, 0], batch.self_features[0, 0])
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)
    tx = make_optimizer(cfg, finetune=True)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: training_rollout_loss(p, apply_fn, cfg, batch).loss
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_optimizer_groups_for_corrector(tmp_path):
    cfg = tiny_cfg(tmp_path, model="pinnsf_res", ft_lr_decay2=0.0,
                   finetune_lr_decay=1.0)
    tx = make_optimizer(cfg, finetune=True)
    params = {
        "params": {
            "corrector_head": {"w": jnp.ones((2, 2))},
            "ped_encoder": {"w": jnp.ones((2, 2))},
        }
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # corrector group LR multiplier is 0 → zero update; pretrained moves
    assert float(jnp.abs(updates["params"]["corrector_head"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["params"]["ped_encoder"]["w"]).max()) > 0.0


def test_message_supervision_flags(tmp_path, toy_paths):
    """pinnsf_interaction='loss' with the weighted-BCE fix and aligned
    validation: training runs and the message objective improves."""
    import yaml

    from piml_tpu.data import PointwiseDataset
    from piml_tpu.train import Trainer
    from piml_tpu.utils import MetricLogger

    data_cfg = tmp_path / "d.yaml"
    data_cfg.write_text(yaml.safe_dump({
        "train": [toy_paths[2]], "valid": [toy_paths[2]],
    }))
    cfg = PIMLConfig(
        model="pinnsf_bm", epochs=6, batch_size=16, skip_frames=5,
        dropout=0.0, encoder_hidden_size=16, encoder_hidden_layers=2,
        processor_hidden_size=16, processor_hidden_layers=2,
        decoder_hidden_size=8, decoder_hidden_layers=2,
        pinnsf_interaction="loss", iter_flag=False,
        collision_pred_weight=0.05, compat_unweighted_coll_pred=False,
        val_on_train_objective=True, patience=10,
        compat_swapped_patience=False,
        save_dir=str(tmp_path / "ckpt"),
    )
    ds = PointwiseDataset()
    ds.load_data(str(data_cfg))
    cfg = ds.build_dataset(cfg)
    logger = MetricLogger(stream=open(os.devnull, "w"))
    tr = Trainer(cfg, logger)
    state = tr.train_pointwise(ds.train_data, ds.valid_data)
    assert np.isfinite(state.best_val)

    # the weighted path must shrink the BCE contribution vs the compat path
    import jax

    rows = ds.train_data
    rng = jax.random.PRNGKey(0)
    params = tr.init_params(rows)
    ped, obs, sf, lab = (rows.ped_features[:16], rows.obs_features[:16],
                         rows.self_features[:16], rows.labels[:16])
    loss_w, _ = tr._pointwise_loss_terms(params, ped, obs, sf, lab, rng)
    tr2 = Trainer(cfg.replace(compat_unweighted_coll_pred=True), logger)
    tr2.model = tr.model
    loss_u, _ = tr2._pointwise_loss_terms(params, ped, obs, sf, lab, rng)
    assert float(loss_u) > float(loss_w)


def test_prng_impl_knob():
    """TPU training streams default to the hardware RBG generator
    (threefry costs ~50% of the dropout-on BPTT step, prng_rbg.json);
    CPU keeps the JAX default, and the knob can force either."""
    from piml_tpu.train.trainer import _configure_prng

    default = jax.config.jax_default_prng_impl
    try:
        # auto on CPU: no flip (tests run on the forced-CPU mesh)
        _configure_prng(PIMLConfig(prng_impl=""))
        assert jax.config.jax_default_prng_impl == default
        # explicit rbg: keys become the 4-word rbg format and still drive
        # dropout splits/fold_ins
        _configure_prng(PIMLConfig(prng_impl="rbg"))
        key = jax.random.PRNGKey(0)
        assert key.shape == (4,)
        k2 = jax.random.fold_in(key, 3)
        sub = jax.random.split(k2, 5)
        assert sub.shape == (5, 4)
        x = jax.random.bernoulli(sub[0], 0.5, (8,))
        assert x.shape == (8,)
        _configure_prng(PIMLConfig(prng_impl="threefry2x32"))
        assert jax.random.PRNGKey(0).shape == (2,)
    finally:
        jax.config.update("jax_default_prng_impl", default)


def test_finetune_scene_path_matches_batch_path(tmp_path, toy_view):
    """Trainer.finetune(train_scenes=...) — the fused stacking that removes
    the per-batch device-op storm from setup — must train bit-identically
    to the legacy channel_batches path: identical stacks feed an identical
    epoch scan, so the final params and best validation loss are equal."""
    from piml_tpu.data import channel_batches

    cfg = tiny_cfg(tmp_path, model="pinnsf_bm", epochs=1, ft_batch_size=2,
                   collision_pred_weight=10.0, collision_loss_weight=1.0)
    cfg = cfg.replace(self_feature_dim=int(toy_view.self_features.shape[-1]))
    scene = to_channeled(toy_view, stride=cfg.valid_steps).slice_channels(
        np.arange(6))
    states = {}
    for name in ("legacy", "scenes"):
        c = cfg.replace(save_dir=str(tmp_path / name))
        tr = Trainer(c, MetricLogger(stream=open(os.devnull, "w")))
        if name == "legacy":
            batches = channel_batches(
                [scene], c.ft_batch_size, np.random.RandomState(c.seed),
                shuffle=True)
            states[name] = tr.finetune(batches, [toy_view], None,
                                       pretrained=None)
        else:
            states[name] = tr.finetune(None, [toy_view], None,
                                       pretrained=None,
                                       train_scenes=[scene], shuffle=True)
    assert states["legacy"].best_val == states["scenes"].best_val
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        states["legacy"].params, states["scenes"].params)
