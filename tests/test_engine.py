"""Engine semantics tests: Euler integration, waypoint advance, retirement,
spawn-in, and gradient flow through the training rollout."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piml_tpu.config import PIMLConfig
from piml_tpu.data import make_time_indexed, to_channeled
from piml_tpu.engine import (
    EngineConfig,
    engine_config,
    eval_rollout,
    init_state,
    rollout,
    spawn_frames_from_scene,
    training_rollout_loss,
)
from piml_tpu.models import ModelOutput, ModelSpec, build_model
from piml_tpu.physics import NeighborConfig
from piml_tpu.scene import Scene


class ZeroModel:
    """Force model returning zero acceleration — isolates the integrator."""

    def apply(self, params, ped_f, obs_f, self_f):
        n = self_f.shape[-2] if self_f.ndim > 1 else self_f.shape[0]
        return ModelOutput(jnp.zeros(self_f.shape[:-1] + (2,)),
                           jnp.zeros(ped_f.shape))


def simple_setup(T=6, N=2, dt=0.1):
    """Two agents moving +x at 1 m/s; far apart."""
    waypoints = jnp.array([[[100.0, 0.0], [100.0, 50.0]]])  # D=1, N, 2
    dest_num = jnp.array([1, 1])
    obstacles = jnp.full((2, 2), 1e4)
    ds = jnp.ones((N, 1))
    p0 = jnp.array([[0.0, 0.0], [0.0, 50.0]])
    v0 = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    a0 = jnp.zeros((N, 2))
    dest0 = waypoints[0]
    didx0 = jnp.zeros(N, jnp.int32)
    ncfg = NeighborConfig(topk_ped=2, topk_obs=2)
    ecfg = EngineConfig(neighbor=ncfg, time_unit=dt, lagged=True,
                        retire_on_arrival=True, remat=False)
    from piml_tpu.physics import relative_features

    pf, of, df = relative_features(p0[None], v0[None], a0[None], dest0[None],
                                   obstacles, ncfg)
    sf = jnp.concatenate([df[0], v0, a0, ds], axis=-1)
    state = init_state(p0, v0, a0, dest0, didx0, pf[0], of[0], sf)
    spawns = jax.tree_util.tree_map(
        lambda x: jnp.zeros((T,) + x.shape, x.dtype),
        spawn_frame_proto(N, pf.shape[-2], sf.shape[-1]),
    )
    return ecfg, state, spawns, waypoints, dest_num, obstacles, ds


def spawn_frame_proto(N, k1, sdim):
    from piml_tpu.engine import SpawnFrame

    return SpawnFrame(
        new=jnp.zeros(N), p=jnp.zeros((N, 2)), v=jnp.zeros((N, 2)),
        a=jnp.zeros((N, 2)), dest=jnp.zeros((N, 2)),
        dest_idx=jnp.zeros(N, jnp.int32), hist_v=jnp.zeros((N, sdim - 5)),
    )


def test_lagged_euler_constant_velocity():
    ecfg, state, spawns, wp, dn, obs, ds = simple_setup()
    model = ZeroModel()
    _, outs = rollout(None, model.apply, ecfg, state, spawns, wp, dn, obs, ds)
    # zero acceleration: p(t) = p0 + v0 * t * dt exactly
    t = np.arange(6)
    np.testing.assert_allclose(
        np.asarray(outs.p[:, 0, 0]), t * 0.1, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(outs.v[:, 0, 0]), 1.0, atol=1e-6)


def test_lagged_vs_unlagged():
    class ConstAccModel:
        def apply(self, params, ped_f, obs_f, self_f):
            return ModelOutput(jnp.full(self_f.shape[:-1] + (2,), 2.0),
                               jnp.zeros(ped_f.shape))

    ecfg, state, spawns, wp, dn, obs, ds = simple_setup(T=3)
    m = ConstAccModel()
    _, lag = rollout(None, m.apply, ecfg, state, spawns, wp, dn, obs, ds)
    ecfg2 = dataclasses.replace(ecfg, lagged=False)
    _, unlag = rollout(None, m.apply, ecfg2, state, spawns, wp, dn, obs, ds)
    # lagged: p[1] = p0 + v0*dt (ignores fresh acc); unlagged: p[1] = p0 + v1*dt
    assert float(lag.p[1, 0, 0]) == pytest.approx(0.1, abs=1e-6)
    assert float(unlag.p[1, 0, 0]) == pytest.approx((1.0 + 0.2) * 0.1, abs=1e-6)


def test_arrival_retirement():
    ecfg, state, spawns, wp, dn, obs, ds = simple_setup(T=6)
    # destination 0.3 ahead of agent 0 → arrives (dist < 0.5) at t=0 → NaN next
    wp = wp.at[0, 0].set(jnp.array([0.3, 0.0]))
    state = state.replace(dest=wp[0])
    model = ZeroModel()
    _, outs = rollout(None, model.apply, ecfg, state, spawns, wp, dn, obs, ds)
    assert np.isnan(np.asarray(outs.p[1, 0])).all()   # retired
    assert np.isfinite(np.asarray(outs.p[1, 1])).all()  # other agent lives
    assert float(outs.mask[1, 0]) == 0.0
    # training mode keeps arrived agents alive
    ecfg2 = dataclasses.replace(ecfg, retire_on_arrival=False)
    _, outs2 = rollout(None, model.apply, ecfg2, state, spawns, wp, dn, obs, ds)
    assert np.isfinite(np.asarray(outs2.p[1:, 0])).all()


def test_waypoint_advance():
    ecfg, state, spawns, wp, dn, obs, ds = simple_setup(T=8)
    # two waypoints for agent 0: first 0.3 ahead, then far away
    wp = jnp.array([[[0.3, 0.0], [100.0, 50.0]],
                    [[50.0, 0.0], [jnp.nan, jnp.nan]]])
    dn = jnp.array([2, 1])
    state = state.replace(dest=wp[0])
    model = ZeroModel()
    _, outs = rollout(None, model.apply, ecfg, state, spawns, wp, dn, obs, ds)
    # agent 0 advances to waypoint 2 and keeps walking (not retired)
    assert np.isfinite(np.asarray(outs.p[:, 0])).all()


def test_spawn_in():
    ecfg, state, spawns, wp, dn, obs, ds = simple_setup(T=6)
    # start agent 1 absent; spawn at step 3 from "ground truth"
    state = state.replace(p=state.p.at[1].set(jnp.nan))
    spawns = spawns._replace(
        new=spawns.new.at[2, 1].set(1.0),
        p=spawns.p.at[2, 1].set(jnp.array([5.0, 5.0])),
        v=spawns.v.at[2, 1].set(jnp.array([0.5, 0.0])),
        dest=spawns.dest.at[2, 1].set(jnp.array([100.0, 50.0])),
    )
    model = ZeroModel()
    _, outs = rollout(None, model.apply, ecfg, state, spawns, wp, dn, obs, ds)
    assert np.isnan(np.asarray(outs.p[2, 1])).all()     # still absent at t=2
    np.testing.assert_allclose(np.asarray(outs.p[3, 1]), [5.0, 5.0], atol=1e-6)
    # spawned agent then walks with its GT velocity
    np.testing.assert_allclose(np.asarray(outs.p[4, 1]), [5.05, 5.0], atol=1e-6)


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


def test_eval_rollout_toy(toy_pipeline):
    cfg, data, params, apply_fn = toy_pipeline
    ecfg = engine_config(cfg, retire=True, track_collisions=False,
                         track_labels=False)
    res = eval_rollout(params, apply_fn, ecfg, data, cfg.skip_frames)
    assert res.position.shape == data.position.shape
    # ground truth preserved before t_start
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(res.position[: cfg.skip_frames])),
        np.nan_to_num(np.asarray(data.position[: cfg.skip_frames])),
        atol=1e-6,
    )
    # prediction masks only mark present agents
    present = np.asarray(res.mask_p) == 1
    assert np.isfinite(np.asarray(res.position)[present]).all()


def test_training_rollout_grad(toy_pipeline):
    cfg, data, params, apply_fn = toy_pipeline
    batch = to_channeled(data, stride=cfg.valid_steps).slice_channels(
        np.arange(2)
    )
    loss_fn = lambda p: training_rollout_loss(p, apply_fn, cfg, batch).loss
    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    norms = [float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads)]
    assert np.isfinite(norms).all()
    assert sum(norms) > 0


def test_bptt_unroll_and_remat_equivalence(toy_pipeline):
    """The auto fusion policy (simulator.py: full unroll + no remat for
    small steps) is a scheduling choice only — loss and grads must match
    the scanned + rematerialized form exactly."""
    cfg, data, params, apply_fn = toy_pipeline
    batch = to_channeled(data, stride=cfg.valid_steps).slice_channels(
        np.arange(2)
    )

    def lg(c):
        loss_fn = lambda p: training_rollout_loss(p, apply_fn, c, batch).loss
        return jax.value_and_grad(loss_fn)(params)

    base_l, base_g = lg(cfg.replace(bptt_unroll=1, remat_features=True))
    for unroll, remat in [(batch.num_frames, False), (2, True)]:
        l, g = lg(cfg.replace(bptt_unroll=unroll, remat_features=remat))
        np.testing.assert_allclose(float(l), float(base_l), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(base_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_batched_rollout_matches_vmapped(toy_pipeline):
    """scan(vmap(step)) with the hoisted batch feature pass must equal
    vmap(scan(step)) — same math, different loop nesting; this is what
    lets the channeled BPTT use the banded O(N) selector (its exactness
    lax.cond hoists above the channel axis instead of degrading to a
    select per channel)."""
    from piml_tpu.engine.rollout import batched_rollout

    cfg, data, params, apply_fn = toy_pipeline
    batch = to_channeled(data, stride=cfg.valid_steps).slice_channels(
        np.arange(3)
    )
    ecfg = engine_config(cfg, retire=False, track_collisions=True,
                         track_labels=False)

    spawns = jax.vmap(
        lambda p, v, a, d, di, sf, mp, mpp: spawn_frames_from_scene(
            p, v, a, d, di, sf, mp, mpp, 0
        )
    )(batch.position, batch.velocity, batch.acceleration, batch.destination,
      batch.dest_idx, batch.self_features, batch.mask_p, batch.mask_p_pred)
    states0 = jax.vmap(init_state)(
        batch.position[:, 0], batch.velocity[:, 0],
        batch.acceleration[:, 0], batch.destination[:, 0],
        batch.dest_idx[:, 0], batch.ped_features[:, 0],
        batch.obs_features[:, 0], batch.self_features[:, 0],
    )
    args = (batch.waypoints, batch.dest_num, batch.obstacles,
            batch.desired_speed[:, None])

    def one_channel(s, sp):
        return rollout(params, apply_fn, ecfg, s, sp, *args)[1]

    ref = jax.vmap(one_channel)(states0, spawns)
    got = batched_rollout(params, apply_fn, ecfg, states0, spawns, *args)[1]
    for r, g, name in zip(ref, got, ref._fields):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-7, err_msg=name)


def test_batched_rollout_grad_matches(toy_pipeline):
    """Gradients through the batched form equal the vmapped form."""
    import dataclasses as dc

    from piml_tpu.engine.rollout import batched_rollout

    cfg, data, params, apply_fn = toy_pipeline
    batch = to_channeled(data, stride=cfg.valid_steps).slice_channels(
        np.arange(2)
    )
    ecfg = engine_config(cfg, retire=False, track_collisions=False,
                         track_labels=False)

    spawns = jax.vmap(
        lambda p, v, a, d, di, sf, mp, mpp: spawn_frames_from_scene(
            p, v, a, d, di, sf, mp, mpp, 0
        )
    )(batch.position, batch.velocity, batch.acceleration, batch.destination,
      batch.dest_idx, batch.self_features, batch.mask_p, batch.mask_p_pred)
    states0 = jax.vmap(init_state)(
        batch.position[:, 0], batch.velocity[:, 0],
        batch.acceleration[:, 0], batch.destination[:, 0],
        batch.dest_idx[:, 0], batch.ped_features[:, 0],
        batch.obs_features[:, 0], batch.self_features[:, 0],
    )
    args = (batch.waypoints, batch.dest_num, batch.obstacles,
            batch.desired_speed[:, None])
    mask = (batch.mask_p_pred == 1)[..., None]

    def loss_vmapped(p):
        outs = jax.vmap(
            lambda s, sp: rollout(p, apply_fn, ecfg, s, sp, *args)[1]
        )(states0, spawns)
        return jnp.sum(jnp.where(mask & jnp.isfinite(outs.p), outs.p, 0.0) ** 2)

    def loss_batched(p):
        outs = batched_rollout(p, apply_fn, ecfg, states0, spawns, *args)[1]
        return jnp.sum(jnp.where(mask & jnp.isfinite(outs.p), outs.p, 0.0) ** 2)

    # remat on in the batched form must also agree
    l0, g0 = jax.value_and_grad(loss_vmapped)(params)
    for remat in (False, True):
        e2 = dc.replace(ecfg, remat=remat)

        def lb(p, e2=e2):
            outs = batched_rollout(p, apply_fn, e2, states0, spawns, *args)[1]
            return jnp.sum(
                jnp.where(mask & jnp.isfinite(outs.p), outs.p, 0.0) ** 2)

        l1, g1 = jax.value_and_grad(lb)(params)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)
