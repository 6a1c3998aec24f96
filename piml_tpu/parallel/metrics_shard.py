"""Agent-sharded evaluation metrics: Sinkhorn OT + multi-kernel MMD.

The engine shards the agent axis past one chip (agent_shard.py); this module
gives the evaluation side the same scaling story (VERDICT r4 item 3: metrics
were the only major subsystem with no multi-device path).  Reference
semantics: src/functions/metrics.py:107-273 — the identical log-domain
Sinkhorn update sequence and multi-kernel Gaussian MMD, partitioned the way
the scaling-book recipe prescribes:

* the point clouds are tiny ((N, 2) f32 = 0.8 MB at N = 100k) — ``all_gather``
  them once over ICI;
* the O(N·M) row blocks of every potential update / kernel tile shard over
  the mesh (each device owns its query rows), so per-device memory and
  FLOPs are 1/D of the single-chip streaming kernels
  (metrics.sinkhorn_masked_chunked / mmd_masked_chunked);
* the scalar reductions (convergence error, transport cost, MMD quadrants)
  merge with ``psum``.

Numerics: each device sums its own row block in the same order as the
single-chip kernel sums that slice, so results match single-device to f32
reduction-order rounding (proven on the virtual CPU mesh in
``__graft_entry__.dryrun_multichip`` and tests/test_parallel_metrics.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "sharded_sinkhorn",
    "sharded_mmd",
    "sharded_ot_with_time_mask",
    "sharded_mmd_with_time_mask",
]

_NEG_BIG = -1e9


def _pad_rows(a, mult: int):
    pad = (-a.shape[0]) % mult
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a


def _sinkhorn_tiles(x_t, mx_t, u_t, y, my, v, eps):
    """One (rows_local, M) block of M(u, v) plus its cost block — identical
    arithmetic to metrics.sinkhorn_masked_chunked.m_tile, rows sharded."""
    dx = x_t[:, 0][:, None] - y[:, 0][None, :]
    dy = x_t[:, 1][:, None] - y[:, 1][None, :]
    c = dx * dx + dy * dy
    m = (-c + u_t[:, None] + v[None, :]) / eps
    return jnp.where((mx_t[:, None] * my[None, :]) == 1, m, _NEG_BIG), c


def sharded_sinkhorn(
    x: jax.Array, y: jax.Array, mask_x: jax.Array, mask_y: jax.Array,
    mesh: Mesh, axis: str = "ap",
    eps: float = 0.1, max_iter: int = 100, thresh: float = 1e-1,
) -> jax.Array:
    """Entropic OT with the pair-matrix row blocks sharded over ``mesh``.

    Same update sequence as the reference (metrics.py:107-203) and the
    single-chip kernels: u rows live where x's rows live, v rows where y's
    live; each half-update all_gathers only the opposite potential (N f32)
    and recomputes its local (N/D, M) cost block on the fly.  The
    convergence error and the final transport cost are psum-merged.
    """
    n_dev = mesh.shape[axis]
    n, m = x.shape[0], y.shape[0]
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    y = jnp.where(jnp.isfinite(y), y, 0.0)
    x = _pad_rows(x, n_dev)
    y = _pad_rows(y, n_dev)
    mask_x = _pad_rows(mask_x, n_dev)
    mask_y = _pad_rows(mask_y, n_dev)

    nx = jnp.maximum(jnp.sum(mask_x), 1.0)
    ny = jnp.maximum(jnp.sum(mask_y), 1.0)
    log_mu = jnp.log(mask_x / nx + 1e-8)
    log_nu = jnp.log(mask_y / ny + 1e-8)
    lse = jax.scipy.special.logsumexp

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def run(x_t, mx_t, lmu_t, y_t, my_t, lnu_t):
        # the clouds themselves are gathered once (tiny); the potentials
        # are gathered per half-update (they change every iteration)
        y_full = lax.all_gather(y_t, axis, axis=0, tiled=True)
        my_full = lax.all_gather(my_t, axis, axis=0, tiled=True)
        x_full = lax.all_gather(x_t, axis, axis=0, tiled=True)
        mx_full = lax.all_gather(mx_t, axis, axis=0, tiled=True)

        def body(carry):
            u_t, v_t, _, it = carry
            u1 = u_t
            v_full = lax.all_gather(v_t, axis, axis=0, tiled=True)
            mu_blk, _ = _sinkhorn_tiles(x_t, mx_t, u_t, y_full, my_full,
                                        v_full, eps)
            u_t = eps * (lmu_t - lse(mu_blk, axis=-1)) + u_t
            u_full = lax.all_gather(u_t, axis, axis=0, tiled=True)
            # v-update: rows of the TRANSPOSED block are the local y rows
            mv_blk, _ = _sinkhorn_tiles(y_t, my_t, v_t, x_full, mx_full,
                                        u_full, eps)
            v_t = eps * (lnu_t - lse(mv_blk, axis=-1)) + v_t
            err = lax.psum(jnp.sum(jnp.abs((u_t - u1) * mx_t)), axis)
            return u_t, v_t, err, it + 1

        def cond(carry):
            _, _, err, it = carry
            return (err >= thresh) & (it < max_iter)

        u_t, v_t, _, _ = lax.while_loop(
            cond, body,
            (jnp.zeros_like(mx_t), jnp.zeros_like(my_t), jnp.inf, 0))

        v_full = lax.all_gather(v_t, axis, axis=0, tiled=True)
        m_blk, c_blk = _sinkhorn_tiles(x_t, mx_t, u_t, y_full, my_full,
                                       v_full, eps)
        pi = jnp.exp(m_blk) * (mx_t[:, None] * my_full[None, :])
        return lax.psum(jnp.sum(pi * c_blk), axis)

    return run(x, mask_x, log_mu, y, mask_y, log_nu)


def sharded_mmd(
    source: jax.Array, target: jax.Array, mask_s: jax.Array,
    mask_t: jax.Array, mesh: Mesh, axis: str = "ap",
    kernel_mul: float = 2.0, kernel_num: int = 5,
) -> jax.Array:
    """Multi-kernel Gaussian MMD with the kernel-matrix row blocks sharded.

    Same math as metrics.mmd_masked_chunked (O(N) closed-form bandwidth,
    power-of-two kernel scales as squarings, quadrant sums as matvecs);
    the concatenated cloud's rows split over the mesh and the four quadrant
    sums psum-merge."""
    n_dev = mesh.shape[axis]
    source = jnp.where(jnp.isfinite(source), source, 0.0)
    target = jnp.where(jnp.isfinite(target), target, 0.0)
    total = jnp.concatenate([source, target], axis=0)
    mask = jnp.concatenate([mask_s, mask_t], axis=0)
    is_s = jnp.concatenate([mask_s, jnp.zeros_like(mask_t)], axis=0)
    is_t = jnp.concatenate([jnp.zeros_like(mask_s), mask_t], axis=0)

    # O(N) closed-form bandwidth (translation-invariant pair-distance sum
    # on mean-centered points) — replicated host math, no pair pass
    n_samples = jnp.maximum(jnp.sum(mask), 2.0)
    center = jnp.sum(total * mask[:, None], axis=0) / n_samples
    tc = (total - center) * mask[:, None]
    sq = jnp.sum(tc ** 2)
    l2_sum = 2.0 * (n_samples * sq - jnp.sum(jnp.sum(tc, axis=0) ** 2))
    bandwidth = l2_sum / (n_samples ** 2 - n_samples)
    bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))
    bandwidth = jnp.maximum(bandwidth, 1e-12)

    total = _pad_rows(total, n_dev)
    mask = _pad_rows(mask, n_dev)
    is_s = _pad_rows(is_s, n_dev)
    is_t = _pad_rows(is_t, n_dev)
    mul_is_pow2 = float(kernel_mul) == 2.0

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    def run(rows_t, mrow_t, ss_t, tt_t, bw, _pad):
        tot = lax.all_gather(rows_t, axis, axis=0, tiled=True)
        msk = lax.all_gather(mrow_t, axis, axis=0, tiled=True)
        s_full = lax.all_gather(ss_t, axis, axis=0, tiled=True)
        t_full = lax.all_gather(tt_t, axis, axis=0, tiled=True)
        dx = rows_t[:, 0][:, None] - tot[:, 0][None, :]
        dy = rows_t[:, 1][:, None] - tot[:, 1][None, :]
        d = (dx * dx + dy * dy) * (mrow_t[:, None] * msk[None, :])
        if mul_is_pow2:
            e = jnp.exp(-d / (bw * kernel_mul ** (kernel_num - 1)))
            k = e
            for _ in range(kernel_num - 1):
                e = e * e
                k = k + e
        else:
            k = jnp.zeros_like(d)
            for i in range(kernel_num):
                k = k + jnp.exp(-d / (bw * kernel_mul ** i))
        k = k * (mrow_t[:, None] * msk[None, :])
        ks = k @ s_full
        kt = k @ t_full
        quad = jnp.stack([jnp.sum(ss_t * ks), jnp.sum(tt_t * kt),
                          jnp.sum(ss_t * kt), jnp.sum(tt_t * ks)])
        return lax.psum(quad, axis)

    quad = run(total, mask, is_s, is_t, bandwidth, jnp.zeros(()))
    ns = jnp.maximum(jnp.sum(mask_s), 1.0)
    nt = jnp.maximum(jnp.sum(mask_t), 1.0)
    return (quad[0] / (ns * ns) + quad[1] / (nt * nt)
            - quad[2] / (ns * nt) - quad[3] / (nt * ns))


def sharded_ot_with_time_mask(p: jax.Array, q: jax.Array, mask: jax.Array,
                              mesh: Mesh, axis: str = "ap",
                              mode: str = "mean") -> jax.Array:
    """Per-frame sharded Sinkhorn (reference: metrics.py:45-67 semantics —
    frames with ≤1 present agent are skipped)."""
    m = (mask == 1).astype(p.dtype)
    per_frame = lax.map(
        lambda a: sharded_sinkhorn(a[0], a[1], a[2], a[2], mesh, axis),
        (p, q, m))
    active = jnp.sum(mask == 1, axis=-1) > 1
    per_frame = jnp.where(active, per_frame, 0.0)
    if mode == "sum":
        return jnp.sum(per_frame)
    return jnp.sum(per_frame) / jnp.maximum(jnp.sum(active), 1)


def sharded_mmd_with_time_mask(p: jax.Array, q: jax.Array, mask: jax.Array,
                               mesh: Mesh, axis: str = "ap",
                               mode: str = "mean") -> jax.Array:
    """Per-frame sharded MMD (reference: metrics.py:70-91 semantics)."""
    if mask.ndim > 2:
        mask = mask.reshape(-1, mask.shape[-1])
        p = p.reshape(mask.shape[0], p.shape[-2], p.shape[-1])
        q = q.reshape(mask.shape[0], q.shape[-2], q.shape[-1])
    m = (mask == 1).astype(p.dtype)
    per_frame = lax.map(
        lambda a: sharded_mmd(a[0], a[1], a[2], a[2], mesh, axis), (p, q, m))
    active = jnp.sum(mask == 1, axis=-1) > 1
    per_frame = jnp.where(active, per_frame, 0.0)
    if mode == "sum":
        return jnp.sum(per_frame)
    return jnp.sum(per_frame) / jnp.maximum(jnp.sum(active), 1)
