"""Banded Sinkhorn (metrics/ot_banded.py) vs the streaming dense kernel:
value equality under the exactness proof, fallback on unprovable inputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from piml_tpu.metrics.metrics import sinkhorn_masked_chunked
from piml_tpu.metrics.ot_banded import (
    ot_banded_params,
    sinkhorn_banded,
    sinkhorn_banded_or_dense,
)


@pytest.fixture
def crowds():
    # n chosen so the banded structure genuinely engages (grid ~35,
    # multi-block windows) while the dense oracle's 100-iteration
    # while_loop stays cheap on CPU; the spatial range keeps the GC
    # stress density (~0.075/m²).  The full 12,685-agent shape runs on
    # TPU in bench.py's dense_12685_metrics regime.
    rng = np.random.default_rng(7)
    n = 1200
    p = jnp.asarray(rng.uniform(0, 126, (n, 2)), jnp.float32)
    q = jnp.asarray(p + rng.normal(0, 0.5, (n, 2)), jnp.float32)
    return p, q


def test_matches_dense_full_mask(crowds):
    p, q = crowds
    m = jnp.ones(p.shape[0])
    cb, exact = sinkhorn_banded(p, q, m, m)
    cd = sinkhorn_masked_chunked(p, q, m, m)
    assert bool(exact)
    assert float(cb) == pytest.approx(float(cd), rel=1e-4)


def test_matches_dense_masked(crowds):
    p, q = crowds
    rng = np.random.default_rng(3)
    m = jnp.asarray((rng.random(p.shape[0]) > 0.2).astype(np.float32))
    cb, exact = sinkhorn_banded(p, q, m, m)
    cd = sinkhorn_masked_chunked(p, q, m, m)
    assert bool(exact)
    assert float(cb) == pytest.approx(float(cd), rel=1e-4)


def test_clustered_crowd_matches(crowds):
    """Half the crowd collapsed into a 4 m cluster: occupancy skew either
    stays provably exact or falls back — the composed value must equal the
    dense kernel's regardless."""
    p, q = crowds
    p = p.at[: p.shape[0] // 2].set(p[: p.shape[0] // 2] * 0.02)
    q = q.at[: q.shape[0] // 2].set(p[: p.shape[0] // 2]
                                    + q[: q.shape[0] // 2] * 1e-3)
    m = jnp.ones(p.shape[0])
    cv = sinkhorn_banded_or_dense(p, q, m, m)
    cd = sinkhorn_masked_chunked(p, q, m, m)
    assert float(cv) == pytest.approx(float(cd), rel=1e-4)


def test_fallback_on_far_clouds(crowds):
    """Two independent clouds 300 m apart: the transport potentials grow
    to the cost scale, the excluded-mass proof cannot hold, and the
    composed driver must return the dense kernel's value exactly."""
    p, _ = crowds
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.uniform(0, 200, p.shape) + 300.0, jnp.float32)
    m = jnp.ones(p.shape[0])
    _, exact = sinkhorn_banded(p, q, m, m)
    assert not bool(exact)
    cv = sinkhorn_banded_or_dense(p, q, m, m)
    cd = sinkhorn_masked_chunked(p, q, m, m)
    assert float(cv) == float(cd)


def test_padding_invariance(crowds):
    """Extra all-masked rows must not change the value."""
    p, q = crowds
    m = jnp.ones(p.shape[0])
    c0, e0 = sinkhorn_banded(p, q, m, m)
    pad = jnp.full((137, 2), jnp.nan)
    p2 = jnp.concatenate([p, pad])
    q2 = jnp.concatenate([q, pad])
    m2 = jnp.concatenate([m, jnp.zeros(137)])
    c1, e1 = sinkhorn_banded(p2, q2, m2, m2)
    assert bool(e0) and bool(e1)
    assert float(c1) == pytest.approx(float(c0), rel=1e-5)


def test_identical_clouds(crowds):
    p, _ = crowds
    m = jnp.ones(p.shape[0])
    cb, exact = sinkhorn_banded(p, p, m, m)
    cd = sinkhorn_masked_chunked(p, p, m, m)
    assert bool(exact)
    assert float(cb) == pytest.approx(float(cd), rel=1e-4, abs=1e-6)


def test_params_are_static_and_sane():
    g, w = ot_banded_params(12685, 12685)
    assert 16 <= g <= 256 and w % 128 == 0
    # window never exceeds the padded table
    g2, w2 = ot_banded_params(200, 200)
    assert w2 <= 256
