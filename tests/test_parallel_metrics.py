"""Agent-sharded metrics (parallel/metrics_shard.py) vs the single-device
kernels, on the virtual 8-device CPU mesh.

Reference semantics: src/functions/metrics.py:45-91,107-273 — the sharded
path must reproduce the single-chip masked kernels (which are themselves
parity-tested against the torch reference in test_metrics.py) to f32
reduction-order rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from piml_tpu.metrics import (
    mmd_with_time_mask,
    ot_with_time_mask,
)
from piml_tpu.metrics.metrics import mmd_masked, sinkhorn_masked
from piml_tpu.parallel import (
    sharded_mmd,
    sharded_mmd_with_time_mask,
    sharded_ot_with_time_mask,
    sharded_sinkhorn,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(jax.devices()[:8]), ("ap",))


def _clouds(key, n=96, m=96, frac_invalid=0.2):
    ks = jax.random.split(key, 4)
    x = jax.random.uniform(ks[0], (n, 2)) * 20.0
    y = (x[:m] if m <= n else jnp.pad(x, ((0, m - n), (0, 0)), mode="wrap")) \
        + jax.random.normal(ks[1], (m, 2)) * 0.5
    mx = (jax.random.uniform(ks[2], (n,)) > frac_invalid).astype(jnp.float32)
    my = (jax.random.uniform(ks[3], (m,)) > frac_invalid).astype(jnp.float32)
    return x, y, mx, my


def test_sharded_sinkhorn_matches_dense(mesh):
    x, y, mx, my = _clouds(jax.random.PRNGKey(0))
    ref = float(sinkhorn_masked(x, y, mx, my))
    got = float(jax.jit(
        lambda a, b, c, d: sharded_sinkhorn(a, b, c, d, mesh)
    )(x, y, mx, my))
    assert abs(got - ref) <= 1e-4 * max(1.0, abs(ref)), (got, ref)


def test_sharded_sinkhorn_row_count_not_divisible(mesh):
    # N=91 does not divide 8: the pad rows carry zero mass and must not
    # perturb the transport cost
    x, y, mx, my = _clouds(jax.random.PRNGKey(3), n=91, m=85)
    ref = float(sinkhorn_masked(x, y, mx, my))
    got = float(jax.jit(
        lambda a, b, c, d: sharded_sinkhorn(a, b, c, d, mesh)
    )(x, y, mx, my))
    assert abs(got - ref) <= 1e-4 * max(1.0, abs(ref)), (got, ref)


def test_sharded_mmd_matches_dense(mesh):
    x, y, mx, my = _clouds(jax.random.PRNGKey(1))
    ref = float(mmd_masked(x, y, mx, my))
    got = float(jax.jit(
        lambda a, b, c, d: sharded_mmd(a, b, c, d, mesh)
    )(x, y, mx, my))
    assert abs(got - ref) <= 1e-6 + 1e-4 * abs(ref), (got, ref)


def test_sharded_time_masked_suite_matches(mesh):
    """Frame-looped sharded OT+MMD vs the single-device public entry points
    (incl. the ≤1-agent frame-skip semantics)."""
    key = jax.random.PRNGKey(2)
    T, N = 3, 64
    ks = jax.random.split(key, 3)
    p = jax.random.uniform(ks[0], (T, N, 2)) * 20.0
    q = p + jax.random.normal(ks[1], (T, N, 2)) * 0.3
    mask = (jax.random.uniform(ks[2], (T, N)) > 0.2).astype(jnp.float32)
    # one frame with a single present agent must be skipped by both paths
    mask = mask.at[1].set(0.0).at[1, 0].set(1.0)

    ref_ot = float(ot_with_time_mask(p, q, mask, "mean"))
    ref_mmd = float(mmd_with_time_mask(p, q, mask, "mean"))
    got_ot = float(jax.jit(
        lambda a, b, c: sharded_ot_with_time_mask(a, b, c, mesh)
    )(p, q, mask))
    got_mmd = float(jax.jit(
        lambda a, b, c: sharded_mmd_with_time_mask(a, b, c, mesh)
    )(p, q, mask))
    assert abs(got_ot - ref_ot) <= 1e-4 * max(1.0, abs(ref_ot))
    assert abs(got_mmd - ref_mmd) <= 1e-6 + 1e-4 * abs(ref_mmd)
