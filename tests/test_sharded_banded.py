"""Agent-sharded banded (O(N) multi-chip) feature pass on the virtual
8-device CPU mesh: must equal the single-device dense pass exactly.

The banded kernel runs in interpret mode off-TPU, so these tests verify
the sharding + exactness-reduction logic; the kernel itself has its own
on-TPU guards (tests/test_banded.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from piml_tpu.parallel.agent_shard import (
    sharded_banded_features,
    sharded_relative_features,
)
from piml_tpu.physics.features import NeighborConfig, relative_features


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(jax.devices()[:8]), ("ap",))


def _scene(key, n=160, n_obs=24, absent_frac=0.2, spread=32.0):
    kp, kv, ka, kd, ko, km = jax.random.split(key, 6)
    p = jax.random.uniform(kp, (n, 2), minval=0.0, maxval=spread)
    v = jax.random.normal(kv, (n, 2))
    a = 0.1 * jax.random.normal(ka, (n, 2))
    dest = jax.random.uniform(kd, (n, 2), minval=0.0, maxval=spread)
    obs = jax.random.uniform(ko, (n_obs, 2), minval=0.0, maxval=spread)
    absent = jax.random.uniform(km, (n,)) < absent_frac
    p = jnp.where(absent[:, None], jnp.nan, p)
    v = jnp.where(absent[:, None], jnp.nan, v)
    a = jnp.where(absent[:, None], jnp.nan, a)
    return p, v, a, dest, obs


# dense (non-Pallas) single-device reference path
CFG = NeighborConfig(use_pallas_topk=False, use_grid_topk=False)


@pytest.mark.parametrize("seed", [0, 3])
def test_matches_single_device(mesh8, seed):
    p, v, a, dest, obs = _scene(jax.random.PRNGKey(seed))
    ref = relative_features(p, v, a, dest, obs, CFG)
    got = sharded_banded_features(p, v, a, dest, obs, CFG, mesh8)
    for r, g, name in zip(ref, got, ["ped", "obs", "dest"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0, atol=0, err_msg=name)


def test_exact_path_engages(mesh8):
    """On a well-spread scene the banded branch itself (not the ring
    fallback) must produce the result — checked by comparing against the
    ring pass's outputs, whose tie semantics are the same here, and by
    asserting the reduced exactness flag directly."""
    from functools import partial

    from jax import lax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from piml_tpu.ops.banded import banded_params, build_object_index, \
        topk_neighbors_banded
    from piml_tpu.physics.features import heading_direction

    p, v, a, dest, obs = _scene(jax.random.PRNGKey(1), absent_frac=0.0)
    n = p.shape[0]
    m_loc = n // 8
    k1 = min(CFG.topk_ped, n)
    g_p, w_p = banded_params(m_loc, n, k1, fine=True)
    v0 = jnp.where(jnp.isnan(v), 0.0, v)
    a0 = jnp.where(jnp.isnan(a), 0.0, a)
    heading = heading_direction(v0, time_axis=False)
    state = jnp.concatenate([p, v0, a0], axis=-1)

    @partial(shard_map, mesh=mesh8, in_specs=(P("ap"), P("ap")),
             out_specs=P(), check_vma=False)
    def exact_flag(state_tile, heading_tile):
        my = lax.axis_index("ap")
        gstate = lax.all_gather(state_tile, "ap", axis=0, tiled=True)
        index = build_object_index(gstate[:, :2], g_p, w_p)
        _, _, exact = topk_neighbors_banded(
            state_tile[:, :2], heading_tile, k1, CFG.sight_angle_ped,
            objects=gstate[:, :2], same_objects=False, grid_dim=g_p,
            window=w_p, dist_threshold=CFG.dist_threshold_ped, index=index,
            self_ids=my * m_loc + jnp.arange(m_loc),
        )
        return lax.psum(exact.astype(jnp.int32), "ap") == 8

    assert bool(exact_flag(state, heading))


def test_matches_ring_pass(mesh8):
    """Both sharded paths agree (the ring pass is the fallback branch)."""
    p, v, a, dest, obs = _scene(jax.random.PRNGKey(7), n=128)
    ring = sharded_relative_features(p, v, a, dest, obs, CFG, mesh8)
    banded = sharded_banded_features(p, v, a, dest, obs, CFG, mesh8)
    for r, g, name in zip(ring, banded, ["ped", "obs", "dest"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-6, err_msg=name)


def test_fallback_on_unprovable_exactness(mesh8):
    """A clustered scene (all agents in one cell neighborhood, k-th
    neighbor outside the provable bound for a coarse forced grid) must
    still return the correct answer via the ring fallback."""
    key = jax.random.PRNGKey(11)
    n = 128
    # tight cluster: the k-th neighbor distance exceeds the 5×5-cell in-box
    # bound for most agents (verified: 6/8 devices fail the proof), so the
    # composed pass must route through the ring fallback.  The cluster sits
    # at the ORIGIN: at large |p| the matmul distance expansion used by the
    # dense/ring passes carries ~|p|²·eps_f32 cancellation noise that
    # reorders near-equal neighbors between two valid implementations
    # (the banded kernel differences coordinates directly and is immune).
    p = 0.5 * jax.random.normal(key, (n, 2))
    v = jnp.ones((n, 2))
    a = jnp.zeros((n, 2))
    dest = jnp.full((n, 2), 10.0)
    obs = jnp.array([[1e4, 1e4], [1e4 + 1, 1e4 + 1]])
    ref = relative_features(p, v, a, dest, obs, CFG)
    got = sharded_banded_features(p, v, a, dest, obs, CFG, mesh8)
    for r, g, name in zip(ref, got, ["ped", "obs", "dest"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-6, err_msg=name)
