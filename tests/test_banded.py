"""Banded cell-list Pallas kernel (ops/banded.py) vs the dense paths.

The banded kernel differences coordinates with the same expression tree as
the dense Pallas kernel, so wherever its exactness predicate holds the
result must be BIT-identical to the dense kernel (interpret mode on CPU
here; the same comparison runs compiled on TPU in the perf guard).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from piml_tpu.ops.banded import topk_neighbors_banded, \
    topk_neighbors_banded_or_dense
from piml_tpu.ops.pairwise import topk_neighbors_pallas
from piml_tpu.physics.features import heading_direction


def _scene(rng, n, extent, inward=True):
    pos = (rng.rand(n, 2).astype(np.float32) * extent).astype(np.float32)
    if inward:
        vel = (extent / 2 - pos) + rng.randn(n, 2).astype(np.float32)
    else:
        vel = rng.randn(n, 2).astype(np.float32)
    heading = heading_direction(jnp.asarray(vel), time_axis=False)
    return jnp.asarray(pos), heading


@pytest.mark.parametrize("n,absent", [(1500, 0.0), (2000, 0.25)])
def test_banded_bit_identical_to_dense_kernel(rng, n, absent):
    pos, heading = _scene(rng, n, extent=60.0, inward=True)
    if absent:
        pos = jnp.where(jnp.asarray(rng.rand(n) < absent)[:, None],
                        jnp.nan, pos)
    d_b, i_b, exact = topk_neighbors_banded(pos, heading, 6, 90.0)
    assert bool(exact)
    d_p, i_p = topk_neighbors_pallas(pos, heading, 6, 90.0)
    np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_p))
    finite = np.isfinite(np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(i_b)[finite],
                                  np.asarray(i_p)[finite])


def test_banded_separate_objects_bit_identical(rng):
    n, m = 700, 3000
    pos, heading = _scene(rng, n, extent=50.0, inward=True)
    obs = jnp.asarray((rng.rand(m, 2) * 50.0).astype(np.float32))
    obs = jnp.where(jnp.asarray(rng.rand(m) < 0.1)[:, None], jnp.nan, obs)
    d_b, i_b, exact = topk_neighbors_banded(pos, heading, 10, 90.0,
                                            objects=obs, same_objects=False)
    assert bool(exact)
    d_p, i_p = topk_neighbors_pallas(pos, heading, 10, 90.0, objects=obs,
                                     same_objects=False)
    np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_p))
    finite = np.isfinite(np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(i_b)[finite],
                                  np.asarray(i_p)[finite])


def test_banded_exact_ties_lattice():
    """Integer lattice + 180° sight: distances tie in groups; tie order
    (lowest original id) must match the dense kernel exactly."""
    side = 40
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    pos = jnp.asarray(
        np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float32) * 2.0)
    heading = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32),
                       (pos.shape[0], 1))
    d_b, i_b, exact = topk_neighbors_banded(pos, heading, 6, 180.0)
    assert bool(exact)
    d_p, i_p = topk_neighbors_pallas(pos, heading, 6, 180.0)
    np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_p))
    finite = np.isfinite(np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(i_b)[finite],
                                  np.asarray(i_p)[finite])


def test_banded_threshold_predicate(rng):
    """Sparse scene: selection predicate fails, the dist_threshold
    (feature-level) predicate holds when cells dwarf the threshold."""
    pos, heading = _scene(rng, 800, extent=1000.0, inward=False)
    _, _, exact_sel = topk_neighbors_banded(pos, heading, 6, 90.0,
                                            grid_dim=16)
    _, _, exact_feat = topk_neighbors_banded(pos, heading, 6, 90.0,
                                             grid_dim=16,
                                             dist_threshold=4.0)
    assert not bool(exact_sel)
    assert bool(exact_feat)


def test_banded_window_overflow_falls_back(rng):
    """A tight cluster inside a wide scene (10% spread agents keep the
    quantile grid bounds wide): the cluster tile's window overflows and
    the composed selector must route to dense."""
    n = 600
    pos = (rng.rand(n, 2) * 0.5 + 100.0).astype(np.float32)
    pos[:60] = (rng.rand(60, 2) * 100.0).astype(np.float32)
    pos = jnp.asarray(pos)
    heading = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (n, 1))
    _, _, exact = topk_neighbors_banded(pos, heading, 6, 90.0, grid_dim=16,
                                        window=128)
    assert not bool(exact)
    sentinel = (jnp.full((n, 6), -1.0), jnp.full((n, 6), -7, jnp.int32))
    d_sel, i_sel = topk_neighbors_banded_or_dense(
        pos, heading, 6, 90.0, lambda: sentinel, grid_dim=16, window=128)
    np.testing.assert_array_equal(np.asarray(d_sel), -1.0)
    np.testing.assert_array_equal(np.asarray(i_sel), -7)


def test_banded_runaway_outliers_bit_identical(rng):
    """Runaway agents must not collapse the grid (quantile bounds): the
    core crowd stays resolved and the result still bit-matches the dense
    kernel."""
    n = 2000
    pos = (rng.rand(n, 2) * 60.0).astype(np.float32)
    pos[0] = (-4000.0, -4000.0)
    pos[1] = (7000.0, 30.0)
    pos[2] = (30.0, 9000.0)
    pos = jnp.asarray(pos)
    vel = (30.0 - pos) + jnp.asarray(rng.randn(n, 2).astype(np.float32))
    heading = heading_direction(vel, time_axis=False)
    d_b, i_b, exact = topk_neighbors_banded(pos, heading, 6, 90.0,
                                            dist_threshold=4.0)
    assert bool(exact)
    d_p, i_p = topk_neighbors_pallas(pos, heading, 6, 90.0)
    # the dist_threshold predicate guarantees THRESHOLD-MASKED equality
    # (beyond-threshold slot occupants may differ; features zero them)
    d_b, i_b = np.asarray(d_b), np.asarray(i_b)
    d_p, i_p = np.asarray(d_p), np.asarray(i_p)
    in_thr = d_p <= 4.0
    assert (np.where(in_thr, d_b, 0) == np.where(in_thr, d_p, 0)).all()
    assert ((d_b <= 4.0) == in_thr).all()
    np.testing.assert_array_equal(i_b[in_thr], i_p[in_thr])


def test_banded_all_invalid():
    pos = jnp.full((512, 2), jnp.nan)
    heading = jnp.zeros((512, 2))
    d, i, exact = topk_neighbors_banded(pos, heading, 6, 90.0)
    assert bool(exact)
    assert not np.isfinite(np.asarray(d)).any()


def test_banded_composes_with_vmap_and_grad(rng):
    """Channeled BPTT at dense N: the selector must compose with vmap+grad
    (selection indices carry no gradient; sequential_vmap maps the kernel
    over the batch) and match the dense XLA path's gradient."""
    import jax

    from piml_tpu.physics.features import NeighborConfig, relative_features

    n, C = 2048, 2
    pos = jnp.asarray((rng.rand(C, n, 2) * 70).astype(np.float32))
    vel = jnp.asarray(rng.randn(C, n, 2).astype(np.float32))
    acc = jnp.zeros((C, n, 2))
    dest = pos[:, ::-1]
    obstacles = jnp.asarray((rng.rand(4096, 2) * 70).astype(np.float32))

    def grad_norm(cfg):
        def loss(p, v):
            pf, of, _ = relative_features(p, v, acc[0], dest[0],
                                          obstacles, cfg)
            return jnp.sum(pf ** 2) + jnp.sum(of ** 2)

        g = jax.jit(jax.grad(lambda p: jnp.sum(jax.vmap(loss)(p, vel))))
        return float(jnp.linalg.norm(g(pos)))

    gb = grad_norm(NeighborConfig(use_grid_topk=True, use_pallas_topk=False))
    gd = grad_norm(NeighborConfig(use_grid_topk=False,
                                  use_pallas_topk=False))
    assert gb == pytest.approx(gd, rel=1e-4)


@pytest.mark.parametrize("seed", range(6))
def test_banded_fuzz_feature_equivalence(seed):
    """Randomized densities/extents/clusters: the COMPOSED selector (grid
    result when provably exact, dense otherwise) must always produce the
    same threshold-masked features as the dense kernel."""
    rng = np.random.RandomState(100 + seed)
    n = int(rng.choice([700, 1500, 2500]))
    extent = float(rng.choice([5.0, 40.0, 200.0, 2000.0]))
    pos = (rng.rand(n, 2) * extent).astype(np.float32)
    if seed % 3 == 0:  # cluster half the agents
        pos[: n // 2] = (rng.rand(n // 2, 2) * extent * 0.02).astype(
            np.float32)
    if seed % 2 == 0:  # some absent agents
        pos[rng.rand(n) < 0.2] = np.nan
    pos = jnp.asarray(pos)
    heading = heading_direction(
        jnp.asarray(rng.randn(n, 2).astype(np.float32)), time_axis=False)

    d_p, i_p = topk_neighbors_pallas(pos, heading, 6, 90.0)
    d_s, i_s = topk_neighbors_banded_or_dense(
        pos, heading, 6, 90.0,
        lambda: topk_neighbors_pallas(pos, heading, 6, 90.0),
        dist_threshold=4.0)
    d_p, i_p = np.asarray(d_p), np.asarray(i_p)
    d_s, i_s = np.asarray(d_s), np.asarray(i_s)
    in_thr = d_p <= 4.0
    assert ((d_s <= 4.0) == in_thr).all()
    assert (np.where(in_thr, d_s, 0) == np.where(in_thr, d_p, 0)).all()
    np.testing.assert_array_equal(i_s[in_thr], i_p[in_thr])


def test_batched_hoisted_cond_matches_per_channel():
    """Rank-3 (channel-leading) relative_features routes the banded
    selector per channel with ONE exactness lax.cond hoisted above the
    channel axis (engine/rollout.py batched_rollout's feature pass) —
    on a well-spread scene (proof holds everywhere) it must be
    BIT-identical to the rank-2 composed path called per channel, since
    both sides then take the banded kernel.  (Comparison against the XLA
    matmul-expansion dense pass is NOT bit-exact by design: that
    expansion carries |p|²·eps_f32 cancellation noise at threshold
    boundaries — see the fuzz test above, which masks for it.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from piml_tpu.physics.features import NeighborConfig, relative_features

    key = jax.random.PRNGKey(5)
    c, n, m = 2, 1536, 1400  # n*n and n*m_pad both >= 2^21: both passes engage
    kp, kv, ko, km = jax.random.split(key, 4)
    p = jax.random.uniform(kp, (c, n, 2), minval=0.0, maxval=100.0)
    v = jax.random.normal(kv, (c, n, 2))
    a = 0.1 * jax.random.normal(kv, (c, n, 2))
    dest = jnp.full((c, n, 2), 50.0)
    obstacles = jax.random.uniform(ko, (m, 2), minval=0.0, maxval=100.0)
    absent = jax.random.uniform(km, (c, n)) < 0.1
    p = jnp.where(absent[..., None], jnp.nan, p)

    grid = NeighborConfig(use_pallas_topk=False, use_grid_topk=True)
    got = relative_features(p, v, a, dest, obstacles, grid, batched=True)
    ref = [relative_features(p[i], v[i], a[i], dest[i], obstacles, grid)
           for i in range(c)]
    ref = [jnp.stack([r[j] for r in ref]) for j in range(3)]
    for g, r, name in zip(got, ref, ["ped", "obs", "dest"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0, atol=0, err_msg=name)


def test_batched_banded_grad_matches_per_channel():
    """AD through the hoisted lax.cond + sequential_vmap'd banded kernel
    (the channeled-BPTT feature path) must produce finite gradients that
    BIT-match the rank-2 banded path's — the kernel's selections are
    stop_gradient'ed, so once the forward selections agree (test above),
    the gather-and-subtract cotangents must agree too.  Guards the AD
    regression VERDICT r3 / ADVICE flagged as invisible to CI (the only
    batched test was forward-only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from piml_tpu.physics.features import NeighborConfig, relative_features

    key = jax.random.PRNGKey(5)
    c, n, m = 2, 1536, 1400  # crosses the 2^21 engagement gate
    kp, kv, ko, km = jax.random.split(key, 4)
    p = jax.random.uniform(kp, (c, n, 2), minval=0.0, maxval=100.0)
    v = jax.random.normal(kv, (c, n, 2))
    a = 0.1 * jax.random.normal(kv, (c, n, 2))
    dest = jnp.full((c, n, 2), 50.0)
    obstacles = jax.random.uniform(ko, (m, 2), minval=0.0, maxval=100.0)
    absent = jax.random.uniform(km, (c, n)) < 0.1
    p = jnp.where(absent[..., None], jnp.nan, p)

    grid = NeighborConfig(use_pallas_topk=False, use_grid_topk=True)

    def loss_batched(v_, a_):
        pf, of, df = relative_features(p, v_, a_, dest, obstacles, grid,
                                       batched=True)
        return jnp.sum(pf ** 2) + jnp.sum(of ** 2) + jnp.sum(df ** 2)

    def loss_per_channel(v_, a_):
        tot = 0.0
        for i in range(c):
            pf, of, df = relative_features(p[i], v_[i], a_[i], dest[i],
                                           obstacles, grid)
            tot = tot + jnp.sum(pf ** 2) + jnp.sum(of ** 2) + jnp.sum(df ** 2)
        return tot

    lb, gb = jax.value_and_grad(loss_batched, argnums=(0, 1))(v, a)
    lr, gr = jax.value_and_grad(loss_per_channel, argnums=(0, 1))(v, a)
    np.testing.assert_allclose(float(lb), float(lr), rtol=1e-6)
    for b_, r_, name in zip(gb, gr, ["dv", "da"]):
        assert np.isfinite(np.asarray(b_)).all(), name
        np.testing.assert_allclose(np.asarray(b_), np.asarray(r_),
                                   rtol=0, atol=0, err_msg=name)


def test_banded_dma_variant_bit_identical(rng, monkeypatch):
    """The huge-M DMA kernel (column table in HBM, per-tile (8, window)
    band DMA'd into VMEM scratch — lifts the ~300k-object resident-table
    VMEM ceiling) must be bit-identical to the resident kernel.  Forced
    here by shrinking the resident ceiling to one byte."""
    import piml_tpu.ops.banded as B

    pos, heading = _scene(rng, 1500, extent=60.0, inward=True)
    d_r, i_r, ex_r = topk_neighbors_banded(pos, heading, 6, 90.0,
                                           dist_threshold=4.0)
    monkeypatch.setattr(B, "_COLS_RESIDENT_BYTES", 1)
    d_d, i_d, ex_d = B.topk_neighbors_banded.__wrapped__(
        pos, heading, 6, 90.0, dist_threshold=4.0)
    assert bool(ex_r) and bool(ex_d)
    np.testing.assert_array_equal(np.asarray(d_r), np.asarray(d_d))
    np.testing.assert_array_equal(np.asarray(i_r), np.asarray(i_d))


def test_huge_m_fallback_is_banded_not_dense(rng):
    """Past the dense twin's VMEM ceiling (pair_pass_fits False) the
    selector's cond fallback is the doubled-window banded pass — the
    dense kernel would raise at trace time.  The widened pass must match
    the dense kernel on a scene the auto window already covers."""
    from piml_tpu.ops.pairwise import pair_pass_fits
    from piml_tpu.physics.features import _banded_wide_fallback

    assert pair_pass_fits(12_685)
    assert not pair_pass_fits(409_600)

    pos, heading = _scene(rng, 1500, extent=60.0, inward=True)
    d_w, i_w = _banded_wide_fallback(pos, heading, 6, 90.0, 4.0)
    d_p, i_p = topk_neighbors_pallas(pos, heading, 6, 90.0)
    np.testing.assert_array_equal(np.asarray(d_w), np.asarray(d_p))
    finite = np.isfinite(np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(i_w)[finite],
                                  np.asarray(i_p)[finite])
