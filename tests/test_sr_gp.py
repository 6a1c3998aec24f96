"""Native GP symbolic regression (piml_tpu/sr/gp.py) — the in-repo
replacement for the reference's PySR call (symbolic_regression.py:38-52),
which needs Julia + network installs unavailable here."""

import numpy as np
import pytest

from piml_tpu.sr import GPSymbolicRegressor, symbolic_regression
from piml_tpu.sr.fit import HAVE_PYSR


def _small(seed=1, **kw):
    kw.setdefault("populations", 4)
    kw.setdefault("niterations", 6)
    kw.setdefault("evolutions_per_iteration", 300)
    kw.setdefault("batch_size", 512)
    return GPSymbolicRegressor(seed=seed, **kw)


def test_recovers_exponential_force_law():
    """The paper's pair force family A*exp(B*r) with the reference's exact
    operator set (+ * exp cos)."""
    rng = np.random.default_rng(0)
    r = rng.uniform(0.1, 2.0, size=3000)
    y = 7.55 * np.exp(-3.0 * r)
    m = _small().fit(r[:, None], y)
    best = m.best()
    assert best.loss < 1e-4
    # prediction matches the law everywhere, not just on training points
    rt = np.linspace(0.15, 1.9, 64)
    assert np.allclose(best.predict(rt[:, None]), 7.55 * np.exp(-3.0 * rt),
                       rtol=0.05, atol=0.02)


def test_recovers_linear_plus_cos_multivariate():
    rng = np.random.default_rng(1)
    X = rng.uniform(-2.0, 2.0, size=(2000, 2))
    y = 3.0 * X[:, 0] + np.cos(X[:, 1])
    m = _small(seed=3).fit(X, y)
    assert m.best().loss < 1e-3


def test_pareto_front_monotone_and_scored():
    rng = np.random.default_rng(2)
    x = rng.uniform(0.0, 3.0, size=1000)
    y = 2.0 * x + 1.0
    m = _small(seed=2, niterations=3).fit(x[:, None], y)
    eqs = m.equations_
    assert len(eqs) >= 2
    comp = [e.complexity for e in eqs]
    loss = [e.loss for e in eqs]
    assert comp == sorted(comp)
    assert all(l2 < l1 for l1, l2 in zip(loss, loss[1:]))  # strict front


def test_respects_operator_whitelist():
    rng = np.random.default_rng(3)
    x = rng.uniform(0.5, 2.0, size=500)
    m = _small(seed=4, niterations=2, unary_operators=()).fit(
        x[:, None], 2.0 * x)
    for e in m.equations_:
        assert "exp" not in e.expression and "cos" not in e.expression
    with pytest.raises(ValueError):
        GPSymbolicRegressor(binary_operators=("mod",))


def test_recovers_power_law_with_protected_ops():
    """Arity extensions (protected pow/log/sqrt): an inverse-square law
    A/r^2 is found exactly once pow is in the operator pool."""
    rng = np.random.default_rng(6)
    r = rng.uniform(0.3, 3.0, size=2000)
    y = 5.0 / r**2
    m = _small(seed=9, binary_operators=("+", "*", "pow"),
               unary_operators=("log", "sqrt")).fit(r[:, None], y)
    best = m.best()
    assert best.loss < 1e-3
    rt = np.linspace(0.35, 2.8, 64)
    assert np.allclose(best.predict(rt[:, None]), 5.0 / rt**2,
                       rtol=0.05, atol=0.05)


def test_deterministic_under_seed():
    rng = np.random.default_rng(4)
    x = rng.uniform(0.1, 2.0, size=800)
    y = np.exp(-x) * 2.0
    a = _small(seed=7, niterations=2).fit(x[:, None], y)
    b = _small(seed=7, niterations=2).fit(x[:, None], y)
    assert [e.expression for e in a.equations_] == \
        [e.expression for e in b.equations_]


@pytest.mark.skipif(HAVE_PYSR, reason="PySR present: wrapper uses PySR")
def test_symbolic_regression_wrapper_uses_gp():
    rng = np.random.default_rng(5)
    x = rng.uniform(0.1, 2.0, size=300)
    y = 4.0 * np.exp(-2.0 * x)
    model = symbolic_regression(x[:, None], y, niterations=6, populations=4,
                                seed=1)
    assert isinstance(model, GPSymbolicRegressor)
    assert model.best().loss < 1e-2


def test_vector_force_law_fit_recovers_constants():
    """The joint vector fit pins all five constants incl. C/D signs when
    cos varies (quirk-free supervision); the magnitude-only degenerate case
    collapses C/D into A·e^C and B+D (documented identifiability)."""
    import numpy as np

    from piml_tpu.sr.fit import VectorForceLawFit, fit_vector_force_law

    rng = np.random.RandomState(0)
    n = 4000
    dr = rng.randn(n, 2) * 1.2
    dv = rng.randn(n, 2)
    true = VectorForceLawFit(A=9.0, B=-2.75, C=0.06, D=-0.3,
                             theta_deg=10.0, r2=1.0)
    F = true.force(dr, dv)
    F = F + rng.randn(*F.shape) * np.abs(F) * 0.01  # 1% multiplicative noise

    got = fit_vector_force_law(dr, dv, F)
    assert got.r2 > 0.99
    assert got.A == pytest.approx(9.0, rel=0.05)
    assert got.B == pytest.approx(-2.75, rel=0.05)
    assert got.C == pytest.approx(0.06, abs=0.03)
    assert got.D == pytest.approx(-0.3, rel=0.15)
    assert got.theta_deg == pytest.approx(10.0, abs=1.0)
    # the signs the magnitude-only fit could never see
    assert got.C > 0 and got.D < 0


def test_quirk_supervision_degeneracy_is_measured():
    """With the reference's dv-from-dr quirk (cos ≡ 1) the v2 family
    degenerates: the analytic supervision equals (A·e^C)·exp((B+D)·r) and
    the joint fit recovers the collapsed constants, not C/D."""
    import jax.numpy as jnp
    import numpy as np

    from piml_tpu.physics import forces

    rng = np.random.RandomState(1)
    n = 2000
    dr = rng.randn(n, 2).astype(np.float32)
    dv = rng.randn(n, 2).astype(np.float32)
    rel = np.concatenate([dr, dv, np.zeros((n, 2), np.float32)], axis=-1)

    quirk = np.asarray(forces.pairwise_acceleration(
        jnp.asarray(rel), "v2", "gc2344"))
    r = np.linalg.norm(dr, axis=-1, keepdims=True) + 1e-6
    A, B, C, D, theta = forces.SF_CONSTANTS["v2"]["gc2344"]
    collapsed_mag = (A * np.exp(C)) * np.exp((B + D) * r)
    np.testing.assert_allclose(np.linalg.norm(quirk, axis=-1, keepdims=True),
                               collapsed_mag, rtol=1e-3)

    # quirk-free supervision actually varies cos -> C/D live in the data
    free = np.asarray(forces.pairwise_acceleration(
        jnp.asarray(rel), "v2", "gc2344", dv_from_velocity=True))
    assert not np.allclose(np.linalg.norm(free, axis=-1, keepdims=True),
                           collapsed_mag, rtol=1e-2)
