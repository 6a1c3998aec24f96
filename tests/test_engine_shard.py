"""Agent-axis sharded rollout (EngineConfig.shard_agents): the supported
multi-chip rollout path (VERDICT r2 item 5).  A toy scene rolled out with the
pair pass sharded 8 ways over the virtual CPU mesh must reproduce the
single-device trajectory (up to fp summation order in the neighbor pool)."""

import jax
import numpy as np
import pytest

from piml_tpu.config import PIMLConfig
from piml_tpu.data import make_time_indexed
from piml_tpu.data.views import pad_agents
from piml_tpu.engine import engine_config, eval_rollout
from piml_tpu.engine.simulator import evaluate_rollouts
from piml_tpu.models import ModelSpec, build_model
from piml_tpu.parallel import make_mesh
from piml_tpu.scene import Scene


@pytest.fixture(scope="module")
def toy_pipeline():
    cfg = PIMLConfig(
        skip_frames=5, valid_steps=5, encoder_hidden_size=16,
        encoder_hidden_layers=2, processor_hidden_size=16,
        processor_hidden_layers=2, decoder_hidden_size=8,
        decoder_hidden_layers=2, dropout=0.0, model="pinnsf_m",
    )
    scene = Scene.load("/root/reference/data/GC_Dataset/GC_Dataset_toy1.npy")
    data = make_time_indexed(cfg, scene)
    cfg = cfg.replace(self_feature_dim=int(data.self_features.shape[-1]))
    spec = ModelSpec.from_config(cfg)
    model = build_model(spec)
    params = model.init(jax.random.PRNGKey(0), data.ped_features[0],
                        data.obs_features[0], data.self_features[0])
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)
    return cfg, data, params, apply_fn


def test_pad_agents_inert(toy_pipeline):
    cfg, data, params, apply_fn = toy_pipeline
    padded = pad_agents(data, 8)
    assert padded.num_pedestrians % 8 == 0
    n = data.num_pedestrians
    assert np.all(np.asarray(padded.mask_p_pred[:, n:]) == 0)
    assert np.all(np.isnan(np.asarray(padded.position[:, n:])))
    # unpadded prefix untouched
    np.testing.assert_array_equal(np.asarray(padded.labels[:, :n]),
                                  np.asarray(data.labels))


def test_sharded_rollout_matches_single_device(toy_pipeline):
    cfg, data, params, apply_fn = toy_pipeline
    mesh = make_mesh(8, axis="ap")
    padded = pad_agents(data, 8)

    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)
    ref = eval_rollout(params, apply_fn, ecfg, padded, cfg.skip_frames)

    ecfg_sh = engine_config(cfg, retire=True, track_collisions=False,
                            track_labels=False, shard_agents=True)
    got = eval_rollout(params, apply_fn, ecfg_sh, padded, cfg.skip_frames,
                       mesh=mesh, mesh_axis="ap")

    np.testing.assert_array_equal(np.asarray(ref.mask_p),
                                  np.asarray(got.mask_p))
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(got.position)),
        np.nan_to_num(np.asarray(ref.position)), atol=1e-4)
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(got.velocity)),
        np.nan_to_num(np.asarray(ref.velocity)), atol=1e-4)


def test_evaluate_rollouts_sharded_metrics_match(toy_pipeline):
    cfg, data, params, apply_fn = toy_pipeline
    mesh = make_mesh(8, axis="ap")
    # toy1 has N not divisible by 8 — exercises the auto-padding path
    base = evaluate_rollouts(params, apply_fn, cfg, [data])
    shard = evaluate_rollouts(params, apply_fn, cfg, [data], mesh=mesh)
    assert shard.collision == base.collision
    assert shard.hard_collision == base.hard_collision
    assert shard.mae == pytest.approx(base.mae, rel=1e-3, abs=1e-5)
    assert shard.mse == pytest.approx(base.mse, rel=1e-3, abs=1e-5)
