"""Cell-list grid top-k (ops/grid_pairs.py) vs the dense XLA path.

The grid path claims on-device-provable exactness; these tests check the
claim on dense scenes (where the predicate holds and results must match the
dense pass), sparse/adversarial scenes (where the predicate must come back
False and the composed selector must return the dense result), exact ties,
and the feature-level wiring through ``relative_features``.

FP note: the XLA dense path computes distances via the |a|²+|b|²−2ab matmul
identity while the grid path differences coordinates directly, so on random
float scenes values agree only to cancellation noise and fp-near-ties may
select different (equidistant) objects — random-scene tests therefore
exclude near-ties, and the bit-exactness tests use integer/half-integer
lattices where both formulas are exact.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from piml_tpu.ops.grid_pairs import grid_topk_neighbors, topk_neighbors_grid
from piml_tpu.physics.features import (
    NeighborConfig,
    heading_direction,
    nearby_in_sight,
    relative_features,
)


def _dense_scene(rng, n, extent=100.0, inward=False):
    """Near-uniform scene dense enough for the exactness predicate.

    ``inward`` points every heading at the scene centre (plus noise):
    outward-looking edge agents legitimately have their k-th *in-FOV*
    neighbor far outside the 5×5 block (or none at all), which correctly
    fails the selection-level predicate — inward headings keep every row
    inside it so selection-level equality can be asserted.
    """
    pos = (rng.rand(n, 2).astype(np.float32) * extent).astype(np.float32)
    if inward:
        vel = (extent / 2 - pos) + rng.randn(n, 2).astype(np.float32)
    else:
        vel = rng.randn(n, 2).astype(np.float32)
    heading = heading_direction(jnp.asarray(vel), time_axis=False)
    return jnp.asarray(pos), heading


def _assert_selection_matches(d_ref, i_ref, d_grid, i_grid):
    d_ref, i_ref = np.asarray(d_ref), np.asarray(i_ref)
    d_grid, i_grid = np.asarray(d_grid), np.asarray(i_grid)
    finite = np.isfinite(d_ref)
    assert (np.isfinite(d_grid) == finite).all()
    # The XLA matmul identity carries an ADDITIVE cancellation error of
    # ~|p|²·eps ≈ 1e-2 on the SQUARED distance at 60 m coordinates (the
    # grid path's direct differencing is the sharper of the two), so (a)
    # values are compared as squared distances, and (b) fp-near-ties (in
    # d²) may swap slot occupants: compare only slots not adjacent to a
    # near-tie, and drop the k-th slot (its neighbor candidate beyond the
    # selection is invisible here).
    s_ref = d_ref.astype(np.float64) ** 2
    s_grid = d_grid.astype(np.float64) ** 2
    with np.errstate(invalid="ignore"):
        gap_small = np.abs(np.diff(s_ref, axis=1)) < 5e-2
    clear = finite.copy()
    clear[:, :-1] &= ~gap_small
    clear[:, 1:] &= ~gap_small
    clear = clear[:, :-1]
    assert clear.mean() > 0.5, "degenerate scene: near-ties everywhere"
    np.testing.assert_allclose(s_grid[:, :-1][clear], s_ref[:, :-1][clear],
                               rtol=1e-3, atol=2e-2)
    same = i_grid[:, :-1][clear] == i_ref[:, :-1][clear]
    assert same.mean() > 0.999


@pytest.mark.parametrize("n,absent", [(1500, 0.0), (2000, 0.2)])
def test_grid_matches_dense_selection(rng, n, absent):
    pos, heading = _dense_scene(rng, n, extent=60.0, inward=True)
    if absent:
        pos = jnp.where(jnp.asarray(rng.rand(n) < absent)[:, None],
                        jnp.nan, pos)
    d_ref, i_ref = nearby_in_sight(pos, pos, heading, 6, 90.0,
                                   same_objects=True)
    d_grid, i_grid, exact = grid_topk_neighbors(pos, heading, 6, 90.0)
    assert bool(exact), "dense inward scene must satisfy the predicate"
    _assert_selection_matches(d_ref, i_ref, d_grid, i_grid)


def test_grid_random_headings_threshold_exact(rng):
    """Random headings on a dense scene: outward-looking rows fail the
    selection predicate, but the threshold predicate (what the production
    feature pass uses) must hold for the whole scene."""
    pos, heading = _dense_scene(rng, 1500, extent=60.0)
    _, _, exact_sel = grid_topk_neighbors(pos, heading, 6, 90.0)
    _, _, exact_feat = grid_topk_neighbors(pos, heading, 6, 90.0,
                                           dist_threshold=4.0)
    assert not bool(exact_sel)
    assert bool(exact_feat)


def test_grid_separate_objects_matches_dense(rng):
    n, m = 900, 3000
    pos, heading = _dense_scene(rng, n, extent=50.0, inward=True)
    obs = jnp.asarray((rng.rand(m, 2) * 50.0).astype(np.float32))
    obs = jnp.where(jnp.asarray(rng.rand(m) < 0.1)[:, None], jnp.nan, obs)
    d_ref, i_ref = nearby_in_sight(pos, obs, heading, 10, 90.0)
    d_grid, i_grid, exact = grid_topk_neighbors(
        pos, heading, 10, 90.0, objects=obs, same_objects=False)
    assert bool(exact)
    _assert_selection_matches(d_ref, i_ref, d_grid, i_grid)


def test_grid_exact_ties_break_by_lowest_index():
    """Integer-lattice positions: both paths compute bit-exact distances, so
    values AND tie order (lowest original object index) must match
    ``lax.top_k`` exactly.  A 180° sight angle keeps every row (including
    grid-edge agents) inside the exactness predicate."""
    side = 40
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    pos = jnp.asarray(
        np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float32) * 2.0)
    heading = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32),
                       (pos.shape[0], 1))
    d_ref, i_ref = nearby_in_sight(pos, pos, heading, 6, 180.0,
                                   same_objects=True)
    d_grid, i_grid, exact = grid_topk_neighbors(pos, heading, 6, 180.0)
    assert bool(exact)
    np.testing.assert_array_equal(np.asarray(d_grid), np.asarray(d_ref))
    finite = np.isfinite(np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(i_grid)[finite],
                                  np.asarray(i_ref)[finite])


def test_grid_sparse_scene_falls_back(rng):
    """Far-apart agents: the k-th neighbor sits outside the 5×5 block, the
    predicate must refuse, and the composed selector must return the dense
    result bit-for-bit."""
    n = 1024
    pos = jnp.asarray((rng.rand(n, 2) * 5000.0).astype(np.float32))
    heading = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (n, 1))
    # huge grid ⇒ tiny cells relative to the ~150 m neighbor spacing
    _, _, exact = grid_topk_neighbors(pos, heading, 6, 90.0, grid_dim=128,
                                      band_width=64)
    assert not bool(exact)
    # sentinel dense branch: proves lax.cond routed to the fallback (value
    # bit-equality between an eager and a cond-embedded dense computation
    # is not an fp guarantee — fma codegen may differ)
    sentinel = (jnp.full((n, 6), -1.0), jnp.full((n, 6), -7, jnp.int32))
    d_sel, i_sel = topk_neighbors_grid(
        pos, heading, 6, 90.0, lambda: sentinel,
        grid_dim=128, band_width=64)
    np.testing.assert_array_equal(np.asarray(d_sel), -1.0)
    np.testing.assert_array_equal(np.asarray(i_sel), -7)


def test_grid_band_overflow_falls_back(rng):
    """A tight cluster inside a wide scene: the cluster cell's band window
    overflows and the predicate must refuse (a wrong answer here would
    silently drop candidates).  10% spread agents keep the quantile-based
    grid bounds wide."""
    n = 600
    pos = (rng.rand(n, 2) * 0.5 + 100.0).astype(np.float32)
    pos[:60] = (rng.rand(60, 2) * 100.0).astype(np.float32)
    pos = jnp.asarray(pos)
    heading = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (n, 1))
    _, _, exact = grid_topk_neighbors(pos, heading, 6, 90.0, grid_dim=16,
                                      band_width=32)
    assert not bool(exact)


def test_grid_runaway_outliers_stay_exact(rng):
    """A few runaway agents (divergent-rollout artifact) must NOT collapse
    the grid: quantile bounds keep the core crowd resolved, outliers clip
    into edge cells, and the result stays exact vs the dense pass."""
    n = 2000
    pos = (rng.rand(n, 2) * 60.0).astype(np.float32)
    pos[0] = (-4000.0, -4000.0)
    pos[1] = (7000.0, 30.0)
    pos[2] = (30.0, 9000.0)
    pos = jnp.asarray(pos)
    vel = (30.0 - pos) + jnp.asarray(rng.randn(n, 2).astype(np.float32))
    heading = heading_direction(vel, time_axis=False)
    d_g, i_g, exact = grid_topk_neighbors(pos, heading, 6, 90.0,
                                          dist_threshold=4.0)
    assert bool(exact)
    # compare against the Pallas dense kernel, whose distance arithmetic is
    # bit-identical to the grid path (direct differencing) — the guarantee
    # is threshold-masked equality
    from piml_tpu.ops.pairwise import topk_neighbors_pallas

    d_p, i_p = topk_neighbors_pallas(pos, heading, 6, 90.0)
    d_g, i_g = np.asarray(d_g), np.asarray(i_g)
    d_p, i_p = np.asarray(d_p), np.asarray(i_p)
    in_thr = d_p <= 4.0
    assert (np.where(in_thr, d_g, 0) == np.where(in_thr, d_p, 0)).all()
    assert ((d_g <= 4.0) == in_thr).all()
    np.testing.assert_array_equal(i_g[in_thr], i_p[in_thr])


def test_grid_threshold_predicate_feature_exact(rng):
    """Low-occupancy scene where the k-th neighbor escapes the block (the
    selection predicate fails for some row) but cells are far wider than
    dist_threshold: the threshold predicate must accept, and
    threshold-masked features must equal the dense pass even though
    beyond-threshold slot occupants may differ."""
    n = 800
    extent = 1000.0  # 8e-4 agents/m² ⇒ 6-NN radius ≫ threshold 4 m
    pos = jnp.asarray((rng.rand(n, 2) * extent).astype(np.float32))
    vel = rng.randn(n, 2).astype(np.float32)
    heading = heading_direction(jnp.asarray(vel), time_axis=False)
    kw = dict(grid_dim=16, band_width=64)  # cells ~62 m ≫ threshold 4 m
    _, _, exact_sel = grid_topk_neighbors(pos, heading, 6, 90.0, **kw)
    d_g, i_g, exact_feat = grid_topk_neighbors(pos, heading, 6, 90.0,
                                               dist_threshold=4.0, **kw)
    assert not bool(exact_sel)
    assert bool(exact_feat)
    d_ref, i_ref = nearby_in_sight(pos, pos, heading, 6, 90.0,
                                   same_objects=True)

    def feats(d, i):
        rel = jnp.take_along_axis(
            jnp.broadcast_to(pos[None, :, :], (n, n, 2)),
            jnp.asarray(i)[..., None], axis=1) - pos[:, None, :]
        keep = (jnp.asarray(d) <= 4.0)[..., None]
        return np.asarray(jnp.where(keep & jnp.isfinite(rel), rel, 0.0))

    np.testing.assert_allclose(feats(d_g, i_g), feats(d_ref, i_ref),
                               atol=2e-4)


def test_grid_empty_and_all_invalid():
    pos = jnp.full((512, 2), jnp.nan)
    heading = jnp.zeros((512, 2))
    d, i, exact = grid_topk_neighbors(pos, heading, 6, 90.0)
    assert bool(exact)  # all rows invalid ⇒ trivially exact
    assert not np.isfinite(np.asarray(d)).any()
    assert (np.asarray(i) == 0).all()


def test_grid_agents_outside_object_extent(rng):
    """Agents just outside the object bounding box: their cell coordinates
    clip to the grid edge, the nearest objects live in the clipped corner
    block, and the (real-coordinate) bound still proves exactness."""
    m = 2048
    obs = jnp.asarray((rng.rand(m, 2) * 20.0).astype(np.float32))
    pos = jnp.asarray((rng.rand(300, 2) * 2.0 + 21.0).astype(np.float32))
    heading = jnp.full((300, 2), -1.0) / np.sqrt(2.0).astype(np.float32)
    d_g, i_g, exact = grid_topk_neighbors(pos, heading, 10, 90.0,
                                          objects=obs, same_objects=False)
    assert bool(exact)
    d_ref, i_ref = nearby_in_sight(pos, obs, heading, 10, 90.0)
    _assert_selection_matches(d_ref, i_ref, d_g, i_g)


def test_relative_features_grid_path_matches_dense():
    """End-to-end: relative_features with the cell-list gate engaged (pair
    count ≥ 2²¹; the banded kernel in interpret mode off-TPU) is
    bit-identical to the dense path on a lattice scene (exact arithmetic
    in both distance formulas ⇒ identical selection and features)."""
    side = 46  # 2116 agents ⇒ 2116² pairs ≥ the 2²¹ gate
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    pos = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32) * 2.0
    n = pos.shape[0]
    vel = np.tile(np.asarray([[1.0, 0.0]], np.float32), (n, 1))
    acc = np.zeros((n, 2), np.float32)
    dest = pos[::-1].copy()
    # obstacle lattice offset by half a cell: half-integer coordinates stay
    # exact in f32 through both distance formulas
    ox, oy = np.meshgrid(np.arange(45), np.arange(45))
    obstacles = (np.stack([ox.ravel(), oy.ravel()], 1).astype(np.float32)
                 * 2.0 + 0.5)
    args = [jnp.asarray(a) for a in (pos, vel, acc, dest, obstacles)]
    kw = dict(sight_angle_ped=180.0, sight_angle_obs=180.0,
              use_pallas_topk=False)
    pf_g, of_g, df_g = relative_features(
        *args, NeighborConfig(use_grid_topk=True, **kw))
    pf_d, of_d, df_d = relative_features(
        *args, NeighborConfig(use_grid_topk=False, **kw))
    np.testing.assert_array_equal(np.asarray(pf_g), np.asarray(pf_d))
    np.testing.assert_array_equal(np.asarray(of_g), np.asarray(of_d))
    np.testing.assert_array_equal(np.asarray(df_g), np.asarray(df_d))
