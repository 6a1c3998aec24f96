"""Model zoo tests: shapes, physics terms, and variant behaviors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piml_tpu.models import (
    MLAPMParams,
    ModelSpec,
    build_finetune_model,
    build_model,
    mlapm_step,
)
from piml_tpu.models.zoo import goal_acceleration

ALL_MODELS = [
    "base", "base1", "base2", "base3", "base4", "base5", "base6", "base7",
    "base_nd", "base_test", "pinnsf", "pinnsf2", "pinnsf_polar",
    "pinnsf_bottleneck", "pinnsf_pb", "pinnsf_pbc", "pinnsf_bm", "pinnsf_m",
    "pinnsf_res",
]


def tiny_spec(name):
    return ModelSpec(
        name=name, encoder_hidden_size=16, encoder_hidden_layers=2,
        processor_hidden_size=16, processor_hidden_layers=2,
        decoder_hidden_size=8, decoder_hidden_layers=2, dropout=0.0,
    )


def make_inputs(rng, batch=4, k1=3, k2=2):
    ped = jnp.asarray(rng.randn(batch, k1, 6), jnp.float32)
    obs = jnp.asarray(rng.randn(batch, k2, 6), jnp.float32)
    self_f = jnp.asarray(rng.randn(batch, 7), jnp.float32)
    return ped, obs, self_f


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_shapes(name, rng):
    spec = tiny_spec(name)
    model = build_model(spec)
    ped, obs, self_f = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), ped, obs, self_f)
    out = model.apply(params, ped, obs, self_f)
    assert out.pred_acc.shape == (4, 2)
    assert np.isfinite(np.asarray(out.pred_acc)).all()
    if name == "pinnsf_bm":
        assert out.coll_pred.shape == (4, 3)  # per-edge
        v = np.asarray(out.coll_pred)
        assert ((v >= 0) & (v <= 1)).all()
    if name in {"pinnsf_bottleneck", "pinnsf_bm", "pinnsf_pb"}:
        assert out.ped_msgs.shape == (4, 3, 2)  # per-edge 2-D forces


@pytest.mark.parametrize("name", ["base", "pinnsf_res"])
def test_finetune_models(name, rng):
    spec = tiny_spec(name)
    model = build_finetune_model(spec)
    ped, obs, self_f = make_inputs(rng)
    params = model.init(jax.random.PRNGKey(0), ped, obs, self_f)
    out = model.apply(params, ped, obs, self_f)
    assert out.pred_acc.shape == (4, 2)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("corrector" in n for n in names)


def test_goal_force_exact():
    # dest at +x, desired speed 2, v = (1, 0), tau = 2 → a = ((2,0)-(1,0))/2
    sf = jnp.array([[3.0, 0.0, 1.0, 0.0, 0.0, 0.0, 2.0]])
    acc = goal_acceleration(sf, 2.0, False)
    np.testing.assert_allclose(np.asarray(acc), [[0.5, 0.0]], atol=1e-6)
    # zero dest vector → 0.1 guard, direction = 0
    sf0 = jnp.array([[0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 2.0]])
    acc0 = goal_acceleration(sf0, 2.0, False)
    np.testing.assert_allclose(np.asarray(acc0), [[-0.5, 0.0]], atol=1e-6)


def test_goal_force_dominates_pinnsf_far_field(rng):
    """With zero neighbor/obstacle features, PINNSF output = NN bias terms +
    goal force; check the goal force term responds linearly to velocity."""
    spec = tiny_spec("pinnsf")
    model = build_model(spec)
    ped = jnp.zeros((2, 3, 6))
    obs = jnp.zeros((2, 2, 6))
    sf1 = jnp.array([[10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]] * 2)
    sf2 = sf1.at[:, 2].set(1.0)
    params = model.init(jax.random.PRNGKey(0), ped, obs, sf1)
    a1 = model.apply(params, ped, obs, sf1).pred_acc
    a2 = model.apply(params, ped, obs, sf2).pred_acc
    # only the goal term differs: Δa = -Δv/tau = -0.5
    np.testing.assert_allclose(np.asarray(a2 - a1), [[-0.5, 0.0]] * 2, atol=1e-5)


def test_channeled_leading_dims(rng):
    """Models must accept (c, n, k, 6) rollout-training shapes."""
    spec = tiny_spec("pinnsf_bm")
    model = build_model(spec)
    ped = jnp.asarray(rng.randn(2, 5, 3, 6), jnp.float32)
    obs = jnp.asarray(rng.randn(2, 5, 2, 6), jnp.float32)
    sf = jnp.asarray(rng.randn(2, 5, 7), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ped, obs, sf)
    out = model.apply(params, ped, obs, sf)
    assert out.pred_acc.shape == (2, 5, 2)
    assert out.coll_pred.shape == (2, 5, 3)


def test_mlapm_head_on():
    """Two agents walking at each other: GC repulsion pushes them apart."""
    p = MLAPMParams.gc_paper()
    pos = jnp.array([[0.0, 0.0], [1.0, 0.0]])
    vel = jnp.array([[1.0, 0.0], [-1.0, 0.0]])
    ds = jnp.array([[1.5], [1.5]])
    dest = jnp.array([[10.0, 0.0], [-10.0, 0.0]])
    v2 = mlapm_step(p, pos, vel, ds, dest, dt=0.08)
    assert np.isfinite(np.asarray(v2)).all()
    # the goal force alone would accelerate each agent forward; repulsion must
    # reduce agent 0's forward speed gain relative to the no-neighbor case
    v2_solo = mlapm_step(p, pos.at[1].set(jnp.nan), vel, ds, dest, dt=0.08)
    assert float(v2[0, 0]) < float(v2_solo[0, 0])


def test_mlapm_absent_agents_zeroed():
    p = MLAPMParams.gc_paper()
    pos = jnp.array([[0.0, 0.0], [jnp.nan, jnp.nan]])
    vel = jnp.array([[1.0, 0.0], [0.0, 0.0]])
    ds = jnp.array([[1.5], [1.5]])
    dest = jnp.array([[10.0, 0.0], [0.0, 0.0]])
    v2 = mlapm_step(p, pos, vel, ds, dest, dt=0.08)
    assert np.isfinite(np.asarray(v2[0])).all()


def test_mlapm_versions_run():
    for p in [MLAPMParams(version="raw"), MLAPMParams.gc2344_v2(), MLAPMParams.ucy_v0()]:
        pos = jnp.array([[0.0, 0.0], [0.5, 0.1], [3.0, -1.0]])
        vel = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0]])
        ds = jnp.full((3, 1), 1.34)
        dest = jnp.array([[5.0, 0.0], [-5.0, 0.0], [0.0, 5.0]])
        v2 = mlapm_step(p, pos, vel, ds, dest, dt=0.08)
        assert np.isfinite(np.asarray(v2)).all()


def test_collision_rules_braking():
    """pinnsf_pbc: head-on imminent collision triggers the braking rule."""
    from piml_tpu.models.zoo import apply_collision_rules

    # agent at origin moving +x; neighbor 0.3 ahead moving -x
    pred = jnp.array([[1.0, 0.0]])
    ped = jnp.zeros((1, 2, 6)).at[0, 0, :].set(
        jnp.array([0.3, 0.0, -2.0, 0.0, 0.0, 0.0])
    )
    sf = jnp.array([[1.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.34]])
    out = apply_collision_rules(pred, ped, sf, 0.5, 0.08)
    # braking: x-acceleration must drop far below the raw prediction
    assert float(out[0, 0]) < float(pred[0, 0])


def test_bf16_compute_dtype_close_to_f32():
    """compute_dtype='bfloat16' runs the NN branches on the bf16 path with
    f32 params and f32 goal force; predictions stay close to full-f32 and
    all outputs come back f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from piml_tpu.models import ModelSpec, build_model

    rng = np.random.RandomState(0)
    pf = jnp.asarray(rng.randn(32, 6, 6).astype(np.float32))
    of = jnp.asarray(rng.randn(32, 10, 6).astype(np.float32))
    sf = jnp.asarray(rng.randn(32, 7).astype(np.float32))

    spec32 = ModelSpec(name="pinnsf_bm", dropout=0.0)
    spec16 = ModelSpec(name="pinnsf_bm", dropout=0.0,
                       compute_dtype="bfloat16")
    m32, m16 = build_model(spec32), build_model(spec16)
    params = m32.init(jax.random.PRNGKey(0), pf, of, sf)
    # identical parameter trees: bf16 is a compute path, not a storage format
    chex = jax.tree_util.tree_structure(params)
    assert chex == jax.tree_util.tree_structure(
        m16.init(jax.random.PRNGKey(0), pf, of, sf))

    out32 = m32.apply(params, pf, of, sf)
    out16 = m16.apply(params, pf, of, sf)
    assert out16.pred_acc.dtype == jnp.float32
    assert out16.coll_pred.dtype == jnp.float32
    err = np.max(np.abs(np.asarray(out16.pred_acc - out32.pred_acc)))
    scale = np.max(np.abs(np.asarray(out32.pred_acc)))
    assert err < 0.03 * max(scale, 1.0), (err, scale)
    # the goal-force term is exactly f32 in both: zero interaction inputs
    out16z = m16.apply(params, jnp.zeros_like(pf), jnp.zeros_like(of), sf)
    out32z = m32.apply(params, jnp.zeros_like(pf), jnp.zeros_like(of), sf)
    bias16 = out16z.pred_acc - out32z.pred_acc
    # NN bias paths may differ by bf16 rounding, but goal force contributes
    # identically — difference must be tiny relative to the goal force itself
    assert np.max(np.abs(np.asarray(bias16))) < 0.05
