"""Metric suite tests: masked Sinkhorn/MMD vs dense numpy oracles implementing
the reference semantics (src/functions/metrics.py)."""

import numpy as np
import pytest

from piml_tpu.metrics import (
    collision_count,
    mae_with_time_mask,
    mmd_masked,
    mmd_with_time_mask,
    ot_with_time_mask,
    sinkhorn_masked,
)


def oracle_sinkhorn(x, y, eps=0.1, max_iter=100, thresh=1e-1):
    """Dense log-domain Sinkhorn (reference: metrics.py:107-203)."""
    C = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    nx, ny = x.shape[0], y.shape[0]
    mu = np.full(nx, 1.0 / nx)
    nu = np.full(ny, 1.0 / ny)
    u, v = np.zeros(nx), np.zeros(ny)

    def M(u, v):
        return (-C + u[:, None] + v[None, :]) / eps

    def lse(m, axis):
        mx = m.max(axis=axis, keepdims=True)
        return (mx + np.log(np.exp(m - mx).sum(axis=axis, keepdims=True))).squeeze(axis)

    for _ in range(max_iter):
        u1 = u.copy()
        u = eps * (np.log(mu + 1e-8) - lse(M(u, v), 1)) + u
        v = eps * (np.log(nu + 1e-8) - lse(M(u, v), 0)) + v
        if np.abs(u - u1).sum() < thresh:
            break
    pi = np.exp(M(u, v))
    return (pi * C).sum()


def oracle_mmd(s, t, kernel_mul=2.0, kernel_num=5):
    """Dense multi-kernel MMD (reference: metrics.py:207-273)."""
    total = np.concatenate([s, t], 0)
    l2 = ((total[:, None, :] - total[None, :, :]) ** 2).sum(-1)
    ns = total.shape[0]
    bandwidth = l2.sum() / (ns ** 2 - ns)
    bandwidth /= kernel_mul ** (kernel_num // 2)
    k = sum(np.exp(-l2 / (bandwidth * kernel_mul ** i)) for i in range(kernel_num))
    n, m = s.shape[0], t.shape[0]
    return (k[:n, :n] / (n * n)).sum() + (k[n:, n:] / (m * m)).sum() \
        - (k[:n, n:] / (n * m)).sum() - (k[n:, :n] / (m * n)).sum()


def test_sinkhorn_identical_clouds(rng):
    """Entropic OT of identical clouds: small but nonzero (ε-blur); must
    match the dense reference-semantics oracle."""
    x = rng.randn(8, 2).astype(np.float32)
    m = np.ones(8, np.float32)
    got = float(sinkhorn_masked(x, x, m, m))
    exp = oracle_sinkhorn(x.astype(np.float64), x.astype(np.float64))
    assert got == pytest.approx(exp, rel=1e-3, abs=1e-4)


def test_sinkhorn_matches_dense_oracle(rng):
    x = rng.randn(6, 2).astype(np.float32)
    y = rng.randn(6, 2).astype(np.float32) + 1.0
    m = np.ones(6, np.float32)
    got = float(sinkhorn_masked(x, y, m, m))
    exp = oracle_sinkhorn(x.astype(np.float64), y.astype(np.float64))
    assert got == pytest.approx(exp, rel=0.05)


def test_sinkhorn_padding_invariance(rng):
    """Masked padded points must not change the transport cost."""
    x = rng.randn(5, 2).astype(np.float32)
    y = rng.randn(5, 2).astype(np.float32)
    m5 = np.ones(5, np.float32)
    base = float(sinkhorn_masked(x, y, m5, m5))
    xp = np.concatenate([x, np.full((3, 2), 777.0, np.float32)], 0)
    yp = np.concatenate([y, np.full((3, 2), -777.0, np.float32)], 0)
    mp = np.concatenate([m5, np.zeros(3, np.float32)])
    padded = float(sinkhorn_masked(xp, yp, mp, mp))
    assert padded == pytest.approx(base, rel=1e-4, abs=1e-5)


def test_mmd_matches_dense_oracle(rng):
    s = rng.randn(7, 2).astype(np.float32)
    t = rng.randn(5, 2).astype(np.float32) + 0.5
    ms, mt = np.ones(7, np.float32), np.ones(5, np.float32)
    got = float(mmd_masked(s, t, ms, mt))
    exp = oracle_mmd(s.astype(np.float64), t.astype(np.float64))
    assert got == pytest.approx(exp, rel=1e-3, abs=1e-5)


def test_mmd_reference_smoke():
    """Reference __main__ smoke values (metrics.py:276-284): zeros vs ones."""
    s = np.zeros((3, 2), np.float32)
    t = np.ones((3, 2), np.float32)
    m = np.ones(3, np.float32)
    got = float(mmd_masked(s, t, m, m))
    assert got > 0  # distinct distributions → positive MMD
    same = float(mmd_masked(s, s, m, m))
    assert same == pytest.approx(0.0, abs=1e-5)


def test_mmd_padding_invariance(rng):
    s = rng.randn(6, 2).astype(np.float32)
    t = rng.randn(6, 2).astype(np.float32)
    m = np.ones(6, np.float32)
    base = float(mmd_masked(s, t, m, m))
    sp = np.concatenate([s, np.full((2, 2), 123.0, np.float32)])
    tp = np.concatenate([t, np.full((2, 2), 321.0, np.float32)])
    mp = np.concatenate([m, np.zeros(2, np.float32)])
    padded = float(mmd_masked(sp, tp, mp, mp))
    assert padded == pytest.approx(base, rel=1e-4, abs=1e-6)


def test_mae_with_time_mask():
    p = np.zeros((2, 3, 2), np.float32)
    q = np.ones((2, 3, 2), np.float32)
    mask = np.zeros((2, 3), np.float32)
    mask[0, :2] = 1
    got = float(mae_with_time_mask(p, q, mask, "mean"))
    assert got == pytest.approx(np.sqrt(2), rel=1e-5)
    got_sum = float(mae_with_time_mask(p, q, mask, "sum"))
    assert got_sum == pytest.approx(2 * np.sqrt(2), rel=1e-5)


def test_ot_with_time_mask_frames(rng):
    T, N = 4, 6
    p = rng.randn(T, N, 2).astype(np.float32)
    q = p.copy()
    mask = np.ones((T, N), np.float32)
    mask[2] = 0  # skipped frame (≤1 agents)
    got = float(ot_with_time_mask(p, q, mask, "mean"))
    assert 0 <= got < 0.1  # identical clouds: only the ε-blur remains


def test_mmd_with_time_mask_channels(rng):
    c, t, n = 2, 3, 5
    p = rng.randn(c, t, n, 2).astype(np.float32)
    mask = np.ones((c, t, n), np.float32)
    got = float(mmd_with_time_mask(p, p, mask, "mean"))
    assert got == pytest.approx(0.0, abs=1e-5)


def test_collision_count_reduction():
    T, N = 10, 3
    pos = np.full((T, N, 2), np.nan, np.float32)
    pos[:, 0] = [0, 0]
    pos[:, 1] = [10, 0]
    pos[:5, 1] = [0.2, 0]
    pos[:, 2] = [5, 5]
    total = float(collision_count(pos, 0.5, mode="sum"))
    assert total == 10.0  # 5 frames × 2 directed pairs


# ---------------------------------------------------------------------------
# streaming (chunked) kernels — must match the dense kernels exactly
# ---------------------------------------------------------------------------

def test_sinkhorn_chunked_matches_dense(rng):
    from piml_tpu.metrics import sinkhorn_masked_chunked

    n, m = 37, 53  # deliberately not multiples of the block
    x = rng.randn(n, 2).astype(np.float32)
    y = rng.randn(m, 2).astype(np.float32) + 0.5
    mx = (rng.rand(n) > 0.2).astype(np.float32)
    my = (rng.rand(m) > 0.2).astype(np.float32)
    dense = float(sinkhorn_masked(x, y, mx, my))
    chunked = float(sinkhorn_masked_chunked(x, y, mx, my, block=16))
    assert chunked == pytest.approx(dense, rel=1e-4, abs=1e-5)


def test_mmd_chunked_matches_dense(rng):
    from piml_tpu.metrics import mmd_masked_chunked

    n, m = 41, 29
    s = rng.randn(n, 2).astype(np.float32)
    t = rng.randn(m, 2).astype(np.float32) + 0.3
    ms = (rng.rand(n) > 0.2).astype(np.float32)
    mt = (rng.rand(m) > 0.2).astype(np.float32)
    dense = float(mmd_masked(s, t, ms, mt))
    chunked = float(mmd_masked_chunked(s, t, ms, mt, block=16))
    assert chunked == pytest.approx(dense, rel=1e-4, abs=1e-6)


def test_time_mask_dispatch_chunked_matches_dense(rng):
    """Above dense_limit the frame-level drivers switch to the streaming
    kernels; forcing a tiny limit on small data must not change results."""
    T, N = 3, 24
    p = rng.randn(T, N, 2).astype(np.float32)
    q = rng.randn(T, N, 2).astype(np.float32)
    mask = (rng.rand(T, N) > 0.2).astype(np.float32)
    ot_d = float(ot_with_time_mask(p, q, mask, "mean"))
    ot_c = float(ot_with_time_mask(p, q, mask, "mean", dense_limit=8))
    assert ot_c == pytest.approx(ot_d, rel=1e-4, abs=1e-5)
    mmd_d = float(mmd_with_time_mask(p, q, mask, "mean"))
    mmd_c = float(mmd_with_time_mask(p, q, mask, "mean", dense_limit=8))
    assert mmd_c == pytest.approx(mmd_d, rel=1e-4, abs=1e-6)
