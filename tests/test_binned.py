"""Cell-list neighbor selection vs the dense path: output-exact equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from piml_tpu.ops import BinnedConfig, binned_neighbors
from piml_tpu.physics.features import heading_direction, nearby_in_sight


@pytest.mark.parametrize("seed,absent", [(0, 0.2), (1, 0.0), (2, 0.5)])
def test_binned_matches_dense(seed, absent):
    rng = np.random.RandomState(seed)
    n = 300
    pos = rng.rand(n, 2).astype(np.float32) * 40
    pos[rng.rand(n) < absent] = np.nan
    vel = rng.randn(n, 2).astype(np.float32)
    h = heading_direction(jnp.asarray(vel), time_axis=False)
    cfg = BinnedConfig(x_min=0, y_min=0, x_max=40, y_max=40,
                       cell_size=4.0, cell_capacity=64)

    d_ref, i_ref = map(np.asarray, nearby_in_sight(
        jnp.asarray(pos), jnp.asarray(pos), h, 6, 90.0, same_objects=True
    ))
    d_ref = np.where(d_ref <= 4.0, d_ref, np.inf)  # dense keeps far slots
    d_bin, i_bin, ovf = binned_neighbors(jnp.asarray(pos), h, cfg, 6, 90.0, 4.0)
    d_bin, i_bin = np.asarray(d_bin), np.asarray(i_bin)

    assert int(ovf) == 0
    fr, fb = np.isfinite(d_ref), np.isfinite(d_bin)
    np.testing.assert_array_equal(fr.sum(1), fb.sum(1))
    # dense path distances come from the |a|²+|b|²−2ab matmul form (fp
    # cancellation ~1e-3 at |p|~40); binned uses direct differences
    np.testing.assert_allclose(
        np.sort(np.where(fr, d_ref, 0.0), axis=1),
        np.sort(np.where(fb, d_bin, 0.0), axis=1), atol=2e-2,
    )
    for i in range(n):
        assert set(i_ref[i][fr[i]].tolist()) == set(i_bin[i][fb[i]].tolist())


def test_binned_overflow_detection():
    # 100 agents in one spot with tiny capacity → overflow reported
    pos = jnp.zeros((100, 2)) + 1.0
    h = jnp.ones((100, 2)) / np.sqrt(2)
    cfg = BinnedConfig(x_min=0, y_min=0, x_max=8, y_max=8,
                       cell_size=4.0, cell_capacity=8)
    _, _, ovf = binned_neighbors(pos, h, cfg, 6, 90.0, 4.0)
    assert int(ovf) > 0
