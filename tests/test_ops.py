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


def test_grouped_top_k_exact_vs_lax_top_k(rng):
    """Two-stage grouped top-k must equal one wide lax.top_k bit-for-bit,
    including tie order (lowest index first) and +inf padding."""
    from jax import lax

    from piml_tpu.physics.features import grouped_top_k

    d = rng.randn(37, 1100).astype(np.float32) ** 2
    # inject ties within and across group boundaries, and inf runs
    d[:, 100] = d[:, 5]
    d[:, 512] = d[:, 5]
    d[:, 600:640] = np.inf
    d[3, :] = np.inf
    gd, gi = grouped_top_k(jnp.asarray(d), 6, 256)
    neg, ri = lax.top_k(-jnp.asarray(d), 6)
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(-neg))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))


def test_grouped_top_k_all_equal_rows(rng):
    from jax import lax

    from piml_tpu.physics.features import grouped_top_k

    d = np.zeros((8, 700), np.float32)
    gd, gi = grouped_top_k(jnp.asarray(d), 4, 128)
    neg, ri = lax.top_k(-jnp.asarray(d), 4)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(-neg))


def test_nearby_in_sight_grouped_matches_plain(rng):
    """relative-feature hot path: grouped selection == plain selection."""
    n = 900
    pos = rng.randn(n, 2).astype(np.float32) * 20
    pos[rng.rand(n) < 0.2] = np.nan
    vel = rng.randn(n, 2).astype(np.float32)
    heading = heading_direction(jnp.asarray(vel)[None])[0]
    d0, i0 = nearby_in_sight(jnp.asarray(pos), jnp.asarray(pos), heading, 6,
                             90.0, same_objects=True, topk_group=0)
    d1, i1 = nearby_in_sight(jnp.asarray(pos), jnp.asarray(pos), heading, 6,
                             90.0, same_objects=True, topk_group=256)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_pallas_topk_separate_objects_matches_xla(rng):
    """Obstacle-table variant (objects != agents) vs the XLA path."""
    n, m = 200, 300
    pos = rng.randn(n, 2).astype(np.float32) * 10
    obs = rng.randn(m, 2).astype(np.float32) * 10
    obs[rng.rand(m) < 0.2] = np.nan
    vel = rng.randn(n, 2).astype(np.float32)
    heading = heading_direction(jnp.asarray(vel)[None])[0]
    d_ref, i_ref = nearby_in_sight(jnp.asarray(pos), jnp.asarray(obs),
                                   heading, 8, 90.0)
    d_pal, i_pal = topk_neighbors_pallas(jnp.asarray(pos), heading, 8, 90.0,
                                         objects=jnp.asarray(obs),
                                         same_objects=False)
    d_ref, i_ref = np.asarray(d_ref), np.asarray(i_ref)
    d_pal, i_pal = np.asarray(d_pal), np.asarray(i_pal)
    finite = np.isfinite(d_ref)
    assert (np.isfinite(d_pal) == finite).all()
    # the kernel differences coordinates directly; the XLA path uses the
    # |a|²+|b|²−2ab matmul trick whose cancellation costs ~1e-4 absolute
    np.testing.assert_allclose(d_pal[finite], d_ref[finite], rtol=1e-4,
                               atol=2e-4)
    # index agreement wherever the reference distance has no near-tie
    gap = np.abs(np.diff(d_ref, axis=1))
    clear = finite[:, :-1] & finite[:, 1:] & (gap > 1e-4)
    same = i_pal[:, :-1][clear] == i_ref[:, :-1][clear]
    assert same.mean() > 0.999


def test_pallas_topk_streamed_column_tiles_match_xla(rng):
    """The tile_m < m_pad streaming path (what the VMEM-model picker
    selects beyond M ~ 128k columns): the fori_loop must merge the running
    top-k across several column tiles identically to the one-tile pass."""
    n = 300
    pos = rng.randn(n, 2).astype(np.float32) * 5
    pos[rng.rand(n) < 0.25] = np.nan
    vel = rng.randn(n, 2).astype(np.float32)
    heading = heading_direction(jnp.asarray(vel), time_axis=False)

    d_ref, i_ref = nearby_in_sight(
        jnp.asarray(pos), jnp.asarray(pos), heading, 6, 90.0, same_objects=True
    )
    # force 3 column tiles (m_pad = 384) and small row tiles
    d_pal, i_pal = topk_neighbors_pallas(
        jnp.asarray(pos), heading, 6, 90.0, tile_n=8, tile_m=128
    )
    d_ref, i_ref = np.asarray(d_ref), np.asarray(i_ref)
    d_pal, i_pal = np.asarray(d_pal), np.asarray(i_pal)

    finite = np.isfinite(d_ref)
    np.testing.assert_allclose(
        np.where(finite, d_ref, 0), np.where(np.isfinite(d_pal), d_pal, 0),
        atol=1e-3,
    )
    mismatch = (i_ref != i_pal) & finite
    assert mismatch.mean() < 0.01


def test_pick_tiles_vmem_model():
    """The picker's VMEM model: measured shapes reproduce, very large M
    streams narrower column tiles, and beyond the resident-input limit it
    raises with guidance instead of a Mosaic OOM at compile time."""
    from piml_tpu.ops.pairwise import _pick_tiles

    assert _pick_tiles(12685, None, None) == (128, 12800)
    # the re-fitted model (lean kernel: + 32·tile_m block-slice term)
    # streams narrower column tiles at very large M instead of admitting
    # the (8, 102400) shape that Mosaic measures at 17.74 MB scoped
    assert _pick_tiles(102400, None, None) == (8, 51200)
    tn, tm = _pick_tiles(204800, None, None)
    assert tn == 8 and tm < 204800  # streams, within the scoped limit
    assert 9 * tn * tm + 32 * tm + 64 * 204800 <= 16.5e6
    with pytest.raises(ValueError, match="shard the agent axis"):
        _pick_tiles(300000, None, None)
