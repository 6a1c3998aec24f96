"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from piml_tpu.parallel import (
    make_dp_finetune_step,
    make_mesh,
    replicate,
    shard_channeled_batch,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (xla_force_host_platform_device_count)")
    return jax.devices()[:8]


@pytest.mark.slow
def test_graft_dryrun(eight_devices):
    """In-process dryrun (slow variant — the default path covers the same
    program via test_multichip_entry.py's fresh-interpreter invocation,
    which is the shape the driver actually uses)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dp_matches_single_device(eight_devices):
    """Data-parallel step must produce the same updated params as single-device
    (modulo float reduction order)."""
    import __graft_entry__ as g
    import optax

    from piml_tpu.models import ModelSpec, build_finetune_model
    from piml_tpu.train.trainer import make_optimizer
    from piml_tpu.engine import training_rollout_loss

    cfg = g._tiny_cfg().replace(ft_batch_size=8)
    key = jax.random.PRNGKey(0)
    batch = g._tiny_batchdata(cfg, key)

    spec = ModelSpec.from_config(cfg)
    model = build_finetune_model(spec)
    params = model.init(key, batch.ped_features[0, 0], batch.obs_features[0, 0],
                        batch.self_features[0, 0])
    tx = make_optimizer(cfg, finetune=True)
    opt_state = tx.init(params)
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)

    # single device
    def single_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: training_rollout_loss(p, apply_fn, cfg, batch).loss
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    p_single, loss_single = jax.jit(single_step)(params, opt_state, batch)

    # 8-way dp
    mesh = make_mesh(8)
    step = make_dp_finetune_step(cfg, apply_fn, tx, mesh)
    p_dp, _, out = step(replicate(params, mesh), replicate(opt_state, mesh),
                        shard_channeled_batch(batch, mesh))

    assert float(out.loss) == pytest.approx(float(loss_single), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_single),
                    jax.tree_util.tree_leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_agent_axis_ring_features_match_single_device():
    import jax.numpy as jnp
    """The ring-exchange agent-sharded pair pass (parallel/agent_shard.py)
    equals the single-device relative_features frame on an 8-way virtual
    mesh — the N²-beyond-one-chip scaling path (SURVEY §5)."""
    from piml_tpu.data.views import neighbor_config
    from piml_tpu.parallel import make_mesh
    from piml_tpu.parallel.agent_shard import sharded_relative_features
    from piml_tpu.physics.features import heading_direction, relative_features
    from piml_tpu.config import PIMLConfig

    rng = np.random.RandomState(11)
    n = 64  # divisible by 8
    pos = rng.randn(n, 2).astype(np.float32) * 5
    pos[5] = np.nan  # absent agents
    pos[41] = np.nan
    vel = rng.randn(n, 2).astype(np.float32)
    acc = rng.randn(n, 2).astype(np.float32) * 0.3
    dest = rng.randn(n, 2).astype(np.float32) * 10
    obstacles = rng.randn(7, 2).astype(np.float32) * 4

    cfg = PIMLConfig(skip_frames=5)
    ncfg = neighbor_config(cfg)

    vel_z = np.where(np.isnan(pos), 0.0, vel)
    heading = heading_direction(jnp.asarray(vel_z), time_axis=False)
    ped_ref, obs_ref, dest_ref = relative_features(
        jnp.asarray(pos), jnp.asarray(vel_z), jnp.asarray(acc),
        jnp.asarray(dest), jnp.asarray(obstacles), ncfg, heading=heading,
    )

    mesh = make_mesh(8, axis="ap")
    ped_got, obs_got, dest_got = sharded_relative_features(
        jnp.asarray(pos), jnp.asarray(vel_z), jnp.asarray(acc),
        jnp.asarray(dest), jnp.asarray(obstacles), ncfg, mesh,
    )

    # neighbor slot order may differ on fp ties → compare sorted along k
    np.testing.assert_allclose(
        np.sort(np.asarray(ped_got), axis=1),
        np.sort(np.asarray(ped_ref), axis=1), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(obs_got), axis=1),
        np.sort(np.asarray(obs_ref), axis=1), atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(dest_got), np.asarray(dest_ref),
                               atol=1e-5)


def test_ragged_channel_padding_loss_neutral(eight_devices):
    """Cheap default-path half of the DP soak: padding a ragged channel
    batch (12 % 8 != 0) to the mesh size must not change the training
    rollout loss (the inert-channel contract shard_channeled_batch relies
    on).  The multi-step DP trajectory equality is the slow variant."""
    import __graft_entry__ as g
    from piml_tpu.engine import training_rollout_loss
    from piml_tpu.models import ModelSpec, build_finetune_model
    from piml_tpu.parallel.sharding import pad_channels

    cfg = g._tiny_cfg().replace(ft_batch_size=12)
    key = jax.random.PRNGKey(3)
    batch = g._tiny_batchdata(cfg, key)
    model = build_finetune_model(ModelSpec.from_config(cfg))
    params = model.init(key, batch.ped_features[0, 0],
                        batch.obs_features[0, 0], batch.self_features[0, 0])
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)
    l_raw = float(training_rollout_loss(params, apply_fn, cfg, batch).loss)
    l_pad = float(training_rollout_loss(
        params, apply_fn, cfg, pad_channels(batch, 8)).loss)
    assert l_pad == pytest.approx(l_raw, rel=1e-6)


@pytest.mark.slow
def test_dp_soak_multi_epoch_ragged_channels(eight_devices):
    """Multi-step DP finetune convergence vs single device (VERDICT r2
    item 6): identical loss trajectory within fp tolerance over several
    optimizer steps, with a channel count NOT divisible by the mesh
    (exercises the inert-channel padding in shard_channeled_batch)."""
    import optax

    import __graft_entry__ as g
    from piml_tpu.engine import training_rollout_loss
    from piml_tpu.models import ModelSpec, build_finetune_model
    from piml_tpu.parallel.sharding import pad_channels
    from piml_tpu.train.trainer import make_optimizer

    cfg = g._tiny_cfg().replace(ft_batch_size=12)  # 12 % 8 != 0
    key = jax.random.PRNGKey(3)
    batch = g._tiny_batchdata(cfg, key)
    assert batch.num_channels == 12

    spec = ModelSpec.from_config(cfg)
    model = build_finetune_model(spec)
    params = model.init(key, batch.ped_features[0, 0],
                        batch.obs_features[0, 0], batch.self_features[0, 0])
    tx = make_optimizer(cfg, finetune=True)
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)

    # padding itself must not change the loss
    l_raw = float(training_rollout_loss(params, apply_fn, cfg, batch).loss)
    l_pad = float(training_rollout_loss(
        params, apply_fn, cfg, pad_channels(batch, 8)).loss)
    assert l_pad == pytest.approx(l_raw, rel=1e-6)

    # single-device trajectory
    def single_step(params, opt_state, b):
        loss, grads = jax.value_and_grad(
            lambda p: training_rollout_loss(p, apply_fn, cfg, b).loss
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    single_step = jax.jit(single_step)
    p_s, o_s = params, tx.init(params)
    losses_single = []
    for _ in range(5):
        p_s, o_s, loss = single_step(p_s, o_s, batch)
        losses_single.append(float(loss))
    assert losses_single[-1] < losses_single[0]  # it actually converges

    # 8-way DP trajectory on the ragged batch
    mesh = make_mesh(8)
    step = make_dp_finetune_step(cfg, apply_fn, tx, mesh)
    p_d = replicate(params, mesh)
    o_d = replicate(tx.init(params), mesh)
    sharded = shard_channeled_batch(batch, mesh)
    assert sharded.num_channels == 16  # padded up from 12
    losses_dp = []
    for _ in range(5):
        p_d, o_d, out = step(p_d, o_d, sharded)
        losses_dp.append(float(out.loss))

    np.testing.assert_allclose(losses_dp, losses_single, rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_trainer_finetune_channel_dp(eight_devices, tmp_path):
    """cfg.n_devices wires channel-DP through Trainer.finetune end-to-end:
    same best-val trajectory as single-device on the toy pipeline."""
    import jax.numpy as jnp

    from piml_tpu.config import PIMLConfig
    from piml_tpu.data import make_time_indexed, to_channeled
    from piml_tpu.scene import Scene
    from piml_tpu.train import Trainer
    from piml_tpu.utils import MetricLogger

    def run(n_devices, tag):
        cfg = PIMLConfig(
            skip_frames=5, valid_steps=5, encoder_hidden_size=16,
            encoder_hidden_layers=2, processor_hidden_size=16,
            processor_hidden_layers=2, decoder_hidden_size=8,
            decoder_hidden_layers=2, dropout=0.0, model="pinnsf_bm",
            epochs=2, ft_batch_size=4, collision_pred_weight=0.0,
            reg_weight=0.0, n_devices=n_devices,
            save_dir=str(tmp_path / tag), model_name_suffix=tag,
        )
        scene = Scene.load("/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy")
        data = make_time_indexed(cfg, scene)
        cfg = cfg.replace(self_feature_dim=int(data.self_features.shape[-1]),
                          ped_feature_dim=int(data.ped_features.shape[-1]),
                          obs_feature_dim=int(data.obs_features.shape[-1]))
        ch = to_channeled(data, cfg.valid_steps, "slice")
        batch = ch.slice_channels(np.arange(4))
        trainer = Trainer(cfg, MetricLogger())
        st = trainer.finetune([batch], [data], None, pretrained=None)
        return float(st.best_val), st.params

    val_1, p_1 = run(0, "single")
    val_8, p_8 = run(8, "dp8")
    assert val_8 == pytest.approx(val_1, rel=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(p_1),
                    jax.tree_util.tree_leaves(p_8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_trainer_finetune_dp_scene_path_matches_batches(eight_devices, tmp_path):
    """Under channel-DP, finetune(train_scenes=...) (stacked gathers +
    pad_channels_stacked) must equal the legacy per-batch path (pad_channels
    then stack) bit-for-bit — both run the same sharded epoch scan."""
    import jax.numpy as jnp

    from piml_tpu.config import PIMLConfig
    from piml_tpu.data import channel_batches, make_time_indexed, to_channeled
    from piml_tpu.scene import Scene
    from piml_tpu.train import Trainer
    from piml_tpu.utils import MetricLogger

    def run(tag, use_scenes):
        cfg = PIMLConfig(
            skip_frames=5, valid_steps=5, encoder_hidden_size=16,
            encoder_hidden_layers=2, processor_hidden_size=16,
            processor_hidden_layers=2, decoder_hidden_size=8,
            decoder_hidden_layers=2, dropout=0.0, model="pinnsf_bm",
            epochs=1, ft_batch_size=2, collision_pred_weight=0.0,
            reg_weight=0.0, n_devices=8,
            save_dir=str(tmp_path / tag), model_name_suffix=tag,
        )
        scene = Scene.load(
            "/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy")
        data = make_time_indexed(cfg, scene)
        cfg = cfg.replace(
            self_feature_dim=int(data.self_features.shape[-1]),
            ped_feature_dim=int(data.ped_features.shape[-1]),
            obs_feature_dim=int(data.obs_features.shape[-1]))
        ch = to_channeled(data, cfg.valid_steps, "slice").slice_channels(
            np.arange(4))
        trainer = Trainer(cfg, MetricLogger(stream=None))
        if use_scenes:
            st = trainer.finetune(None, [data], None, pretrained=None,
                                  train_scenes=[ch], shuffle=True)
        else:
            batches = channel_batches([ch], cfg.ft_batch_size,
                                      np.random.RandomState(cfg.seed),
                                      shuffle=True)
            st = trainer.finetune(batches, [data], None, pretrained=None)
        return st

    a = run("dpbatch", False)
    b = run("dpscene", True)
    assert a.best_val == b.best_val
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
