"""Pallas streaming top-k kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from piml_tpu.ops import topk_neighbors_pallas
from piml_tpu.physics.features import heading_direction, nearby_in_sight


@pytest.mark.parametrize("n,absent", [(64, 0.0), (300, 0.3), (513, 0.1)])
def test_pallas_topk_matches_xla(rng, n, absent):
    pos = rng.randn(n, 2).astype(np.float32) * 5
    pos[rng.rand(n) < absent] = np.nan
    vel = rng.randn(n, 2).astype(np.float32)
    heading = heading_direction(jnp.asarray(vel), time_axis=False)

    d_ref, i_ref = nearby_in_sight(
        jnp.asarray(pos), jnp.asarray(pos), heading, 6, 90.0, same_objects=True
    )
    d_pal, i_pal = topk_neighbors_pallas(jnp.asarray(pos), heading, 6, 90.0)
    d_ref, i_ref = np.asarray(d_ref), np.asarray(i_ref)
    d_pal, i_pal = np.asarray(d_pal), np.asarray(i_pal)

    finite = np.isfinite(d_ref)
    np.testing.assert_allclose(
        np.where(finite, d_ref, 0), np.where(np.isfinite(d_pal), d_pal, 0),
        atol=1e-3,
    )
    # index agreement except where distances are fp-tied
    mismatch = (i_ref != i_pal) & finite
    assert mismatch.mean() < 0.01


def test_pallas_topk_self_exclusion(rng):
    """FOV < 90.0005° must exclude the self-pair (cos 0 < threshold)."""
    pos = rng.randn(40, 2).astype(np.float32)
    heading = heading_direction(
        jnp.asarray(rng.randn(40, 2).astype(np.float32)), time_axis=False
    )
    d, idx = topk_neighbors_pallas(jnp.asarray(pos), heading, 4, 90.0)
    d, idx = np.asarray(d), np.asarray(idx)
    rows = np.arange(40)[:, None]
    self_selected = (idx == rows) & np.isfinite(d)
    assert not self_selected.any()
