"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh.

The reference has no model parallelism (its only parallelism is the
nn.DataParallel batch scatter, src/models/simulators.py:64-65); TP here
is TPU-native added capability for the wide-model regime — see
piml_tpu/parallel/tensor_parallel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from piml_tpu.parallel import (
    make_tp_apply,
    make_tp_dp_finetune_step,
    replicate,
    shard_channeled_batch,
    shard_params_tp,
    tp_param_shardings,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (xla_force_host_platform_device_count)")
    return jax.devices()[:8]


def _model_and_inputs(key, width=64):
    """pinnsf_bm at a tp-divisible width (64 % 8 == 0)."""
    import __graft_entry__ as g
    from piml_tpu.models import ModelSpec, build_model

    cfg = g._tiny_cfg().replace(
        encoder_hidden_size=width, processor_hidden_size=width,
        decoder_hidden_size=width // 2,
    )
    spec = ModelSpec.from_config(cfg)
    model = build_model(spec)
    ks = jax.random.split(key, 4)
    B, k1, k2 = 16, 6, 10
    ped = jax.random.normal(ks[0], (B, k1, 6))
    obs = jax.random.normal(ks[1], (B, k2, 6))
    self_f = jnp.concatenate(
        [jax.random.normal(ks[2], (B, 6)), jnp.ones((B, 1))], axis=-1)
    params = model.init(ks[3], ped, obs, self_f)
    return model, params, (ped, obs, self_f)


def test_tp_specs_megatron_alternation(eight_devices):
    """Even dense layers column-parallel, odd row-parallel, non-divisible
    dims replicated — checked on the real pinnsf_bm param tree."""
    model, params, _ = _model_and_inputs(jax.random.PRNGKey(0))
    mesh = Mesh(np.array(eight_devices), ("tp",))
    sh = tp_param_shardings(params, mesh)
    enc = sh["params"]["ped_encoder"]
    assert enc["dense_0"]["kernel"].spec == P(None, "tp")   # 6 -> 64
    assert enc["dense_0"]["bias"].spec == P("tp")
    assert enc["dense_1"]["kernel"].spec == P("tp", None)   # 64 -> 64 odd
    assert enc["dense_1"]["bias"].spec == P()
    dec = sh["params"]["ped_decoder"]
    assert dec["dense_0"]["kernel"].spec == P(None, "tp")   # even again (64 -> 32)
    assert dec["dense_1"]["kernel"].spec == P("tp", None)   # odd (32 -> 32)
    # the 2-wide predictor head: out dim does not divide 8 -> replicated
    pred = sh["params"]["ped_predictor"]["dense_0"]
    assert pred["kernel"].spec == P()
    # processor ResBlock hidden matmul is sharded
    blk = sh["params"]["ped_processor"]["block_0"]["MLP_0"]["dense_0"]
    assert blk["kernel"].spec == P(None, "tp")


def test_tp_forward_matches_replicated(eight_devices):
    """model.apply with tensor-sharded params equals the replicated apply
    (modulo collective reduction order)."""
    model, params, (ped, obs, self_f) = _model_and_inputs(jax.random.PRNGKey(1))
    ref = model.apply(params, ped, obs, self_f).pred_acc

    mesh = Mesh(np.array(eight_devices), ("tp",))
    apply_jit, params_tp = make_tp_apply(model, mesh, params)
    got = apply_jit(params_tp, ped, obs, self_f).pred_acc
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_tp_dp_finetune_matches_single_device(eight_devices):
    """Multi-step dp×tp (2×4) finetune trajectory equals single-device
    within fp reduction-order tolerance — params stay tp-sharded and
    dp-replicated across steps."""
    import optax

    import __graft_entry__ as g
    from piml_tpu.engine import training_rollout_loss
    from piml_tpu.models import ModelSpec, build_finetune_model
    from piml_tpu.train.trainer import make_optimizer

    cfg = g._tiny_cfg().replace(ft_batch_size=8)
    key = jax.random.PRNGKey(0)
    batch = g._tiny_batchdata(cfg, key)

    spec = ModelSpec.from_config(cfg)
    model = build_finetune_model(spec)
    params = model.init(key, batch.ped_features[0, 0],
                        batch.obs_features[0, 0], batch.self_features[0, 0])
    tx = make_optimizer(cfg, finetune=True)
    apply_fn = lambda p, pf, of, sf: model.apply(p, pf, of, sf)

    def single_step(params, opt_state, b):
        loss, grads = jax.value_and_grad(
            lambda p: training_rollout_loss(p, apply_fn, cfg, b).loss
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    single_step = jax.jit(single_step)
    p_s, o_s = params, tx.init(params)
    losses_single = []
    for _ in range(3):
        p_s, o_s, loss = single_step(p_s, o_s, batch)
        losses_single.append(float(loss))

    mesh = Mesh(np.array(eight_devices).reshape(2, 4), ("dp", "tp"))
    p_tp, shardings = shard_params_tp(params, mesh)
    o_tp = jax.jit(tx.init)(p_tp)  # opt moments inherit the param shardings
    b_tp = shard_channeled_batch(batch, mesh, axis="dp")
    step = make_tp_dp_finetune_step(cfg, apply_fn, tx, mesh, shardings)
    losses_tp = []
    for _ in range(3):
        p_tp, o_tp, out = step(p_tp, o_tp, b_tp)
        losses_tp.append(float(out.loss))
    # params must still be tp-sharded after the steps (not silently gathered)
    enc0 = p_tp["params"]["ped_encoder"]["dense_0"]["kernel"]
    assert enc0.sharding.spec == P(None, "tp")

    np.testing.assert_allclose(losses_tp, losses_single, rtol=2e-4)
    flat_s = jax.tree_util.tree_leaves(p_s)
    flat_tp = jax.tree_util.tree_leaves(p_tp)
    for a, b in zip(flat_s, flat_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
