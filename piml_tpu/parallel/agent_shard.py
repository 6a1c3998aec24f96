"""Agent-axis sharding of the O(N²) pair pass (SURVEY §5: the N² interaction
over agents is this framework's "long context").

The single-chip path (physics/features.py) computes the full (N, N) distance
matrix; past one chip's HBM the agent axis itself must shard.  Here the
query agents are split over the mesh and the candidate-neighbor state tiles
travel around the ICI ring via ``lax.ppermute`` — a flash-attention-style
streaming pass: each device only ever holds its (N/D, N/D) score block and a
running top-k, so per-device memory is O(N²/D²) instead of O(N²).

The reference has no distributed pair pass at all (its rollout is a
single-process Python loop, src/models/simulators.py:595-652); this is the
TPU-native scaling story, not a port.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from piml_tpu.physics.features import INF, NeighborConfig, heading_direction

__all__ = [
    "ring_topk_neighbors",
    "sharded_relative_features",
    "sharded_banded_features",
]


def _tile_scores(q_pos, q_head, q_absent, q_gidx, key_tile, k_gidx,
                 angle_threshold: float):
    """FOV-masked distances from local query agents to one key tile.

    q_pos/q_head (M, 2), key_tile (Mt, 6) → (M, Mt) distances with the same
    semantics as features.nearby_in_sight (self-pair pinned to dist 0 /
    cos 0, absent rows at +inf, literal cos(3.14·angle/180) threshold)."""
    k_pos = key_tile[:, :2]
    k_absent = jnp.any(jnp.isnan(k_pos), axis=-1)
    k_pos = jnp.where(jnp.isnan(k_pos), 0.0, k_pos)

    hi = lax.Precision.HIGHEST
    d2 = (
        jnp.sum(q_pos * q_pos, axis=-1)[:, None]
        + jnp.sum(k_pos * k_pos, axis=-1)[None, :]
        - 2.0 * jnp.einsum("nd,md->nm", q_pos, k_pos, precision=hi)
    )
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    invalid = q_absent[:, None] | k_absent[None, :]
    dist = jnp.where(invalid, INF, dist)

    rel_dot_h = (
        jnp.einsum("md,nd->nm", k_pos, q_head, precision=hi)
        - jnp.sum(q_pos * q_head, axis=-1)[:, None]
    )
    h_norm = jnp.maximum(jnp.linalg.norm(q_head, axis=-1), 1e-8)
    cos = rel_dot_h / jnp.maximum(dist, 1e-8) / h_norm[:, None]
    cos = jnp.where(invalid | jnp.isnan(cos), -1.0, cos)

    self_pair = (q_gidx[:, None] == k_gidx[None, :]) & ~invalid
    dist = jnp.where(self_pair, 0.0, dist)
    cos = jnp.where(self_pair, 0.0, cos)

    dist = jnp.where(cos < math.cos(3.14 * angle_threshold / 180.0), INF, dist)
    return dist


def ring_topk_neighbors(state: jax.Array, heading: jax.Array, k: int,
                        angle_threshold: float, mesh: Mesh,
                        axis: str = "ap") -> Tuple[jax.Array, jax.Array]:
    """Top-k in-FOV neighbor selection with the agent axis sharded.

    ``state``: (N, 6) = [p, v, a] rows, NaN position = absent; ``heading``:
    (N, 2).  N must divide the mesh axis size.  Returns ``(dist (N, k),
    rows (N, k, 6))`` — the selected neighbors' state rows (not indices:
    indices would be useless without the remote rows they point to).

    Tie-breaking among exactly equal distances may differ from the
    single-device ``lax.top_k`` (which favors the lowest global index); for
    continuous positions ties occur only between absent (+inf) slots, whose
    features are zeroed downstream either way.
    """
    n_dev = mesh.shape[axis]
    n = state.shape[0]
    assert n % n_dev == 0, f"N={n} must divide the {axis}-axis ({n_dev})"
    m = n // n_dev
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    def run(state_tile, heading_tile):
        my = lax.axis_index(axis)
        q_pos = jnp.where(jnp.isnan(state_tile[:, :2]), 0.0, state_tile[:, :2])
        q_absent = jnp.any(jnp.isnan(state_tile[:, :2]), axis=-1)
        q_gidx = my * m + jnp.arange(m)

        def merge(run_dist, run_rows, key_tile, src):
            k_gidx = src * m + jnp.arange(m)
            dist = _tile_scores(q_pos, heading_tile, q_absent, q_gidx,
                                key_tile, k_gidx, angle_threshold)
            neg, idx = lax.top_k(-dist, min(k, m))      # (M, k')
            rows = jnp.take(key_tile, idx, axis=0)       # (M, k', 6)
            rows = jnp.where(jnp.isnan(rows), 0.0, rows)
            all_dist = jnp.concatenate([run_dist, -neg], axis=-1)
            all_rows = jnp.concatenate([run_rows, rows], axis=-2)
            neg2, sel = lax.top_k(-all_dist, k)
            return -neg2, jnp.take_along_axis(all_rows, sel[..., None], axis=-2)

        def body(carry, step):
            run_dist, run_rows, key_tile = carry
            src = (my - step) % n_dev  # whose tile we currently hold
            run_dist, run_rows = merge(run_dist, run_rows, key_tile, src)
            key_tile = lax.ppermute(key_tile, axis, perm)
            return (run_dist, run_rows, key_tile), None

        # the running top-k starts as a constant but becomes device-varying
        # inside the scan, so its carry type must be marked varying over the
        # mesh axis up front (lax.pcast(to='varying'); pre-0.9 JAX spelled
        # this lax.pvary)
        if hasattr(lax, "pcast"):
            _varying = lambda x: lax.pcast(x, axis, to="varying")
        else:  # pragma: no cover - older JAX
            _varying = lambda x: lax.pvary(x, axis)
        init = (
            _varying(jnp.full((m, k), INF, state_tile.dtype)),
            _varying(
                jnp.zeros((m, k, state_tile.shape[-1]), state_tile.dtype)
            ),
            state_tile,
        )
        (run_dist, run_rows, _), _ = lax.scan(
            body, init, jnp.arange(n_dev)
        )
        return run_dist, run_rows

    return run(state, heading)


def sharded_relative_features(
    position: jax.Array,
    velocity: jax.Array,
    acceleration: jax.Array,
    destination: jax.Array,
    obstacles: jax.Array,
    cfg: NeighborConfig,
    mesh: Mesh,
    axis: str = "ap",
    include_obstacles: bool = True,
):
    """Single-frame relative features with the agent axis sharded over the
    mesh — output-equivalent to ``physics.features.relative_features`` on one
    frame (tested on the virtual CPU mesh), memory O(N²/D²) per device.

    Inputs (N, 2) NaN-masked; obstacles (M, 2) replicated (obstacle tables
    are small; only the agent-agent pass is the N² problem).
    Returns (ped_features (N, k1, 6), obs_features (N, k2, 6), dest (N, 2)).

    ``include_obstacles=False`` skips the obstacle pass (obs_features is
    None) — used by :func:`sharded_banded_features`'s exactness fallback,
    whose own shard-local obstacle pass is identical and already computed.
    """
    velocity = jnp.where(jnp.isnan(velocity), 0.0, velocity)
    acceleration = jnp.where(jnp.isnan(acceleration), 0.0, acceleration)
    heading = heading_direction(velocity, time_axis=False)
    state = jnp.concatenate([position, velocity, acceleration], axis=-1)

    k1 = min(cfg.topk_ped, state.shape[0])
    dist, rows = ring_topk_neighbors(state, heading, k1,
                                     cfg.sight_angle_ped, mesh, axis)
    state_z = jnp.where(jnp.isnan(state), 0.0, state)
    rel = rows - state_z[:, None, :]
    keep = (dist <= cfg.dist_threshold_ped)[..., None]
    ped_features = jnp.where(keep & jnp.isfinite(rel), rel, 0.0)

    dest = jnp.where(jnp.isnan(destination - position), 0.0,
                     destination - position)

    # obstacle pass: local per shard (replicated obstacle table)
    from piml_tpu.physics.features import _pad_object_axis, nearby_in_sight

    obstacles_pad, m_real = _pad_object_axis(obstacles)
    k2 = min(cfg.topk_obs, m_real)

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
             out_specs=P(axis))
    def obs_pass(pos_tile, head_tile, state_tile):
        od, oi = nearby_in_sight(pos_tile, obstacles_pad, head_tile, k2,
                                 cfg.sight_angle_obs)
        zeros = jnp.zeros_like(obstacles_pad)
        obs_state = jnp.concatenate([obstacles_pad, zeros, zeros], axis=-1)
        gathered = jnp.take(obs_state, oi, axis=0)
        st = jnp.where(jnp.isnan(state_tile), 0.0, state_tile)
        rel_o = gathered - st[:, None, :]
        keep_o = (od <= cfg.dist_threshold_obs)[..., None]
        return jnp.where(keep_o & jnp.isfinite(rel_o), rel_o, 0.0)

    obs_features = (obs_pass(position, heading, state)
                    if include_obstacles else None)
    return ped_features, obs_features, dest


def sharded_banded_features(
    position: jax.Array,
    velocity: jax.Array,
    acceleration: jax.Array,
    destination: jax.Array,
    obstacles: jax.Array,
    cfg: NeighborConfig,
    mesh: Mesh,
    axis: str = "ap",
):
    """O(N) multi-chip feature pass: the banded cell-list kernel under
    agent-axis sharding.

    The ring pass above is O(N²/D) per device — it still scores every
    query against every candidate tile.  Here the full agent state table
    is ``all_gather``-ed instead (it is tiny: (N, 6) f32 = 2.4 MB at
    N = 100k, one hop over ICI), each device cell-sorts the global table
    and runs the banded kernel (ops/banded.py) on its LOCAL query shard
    against it, so per-device work is O(N/D · window) — the same O(N)
    scaling as the single-chip banded path, divided by D.  This sidesteps
    the open problem of exactness bookkeeping across ring steps: each
    device proves exactness for its own queries against the full table and
    the proofs are AND-reduced with a ``psum``; if any device fails, the
    whole pass falls back to the always-correct ring pass via ``lax.cond``.

    When the reduced proof holds, the result is BIT-IDENTICAL to the
    single-device dense pass (the banded kernel breaks ties by lowest
    global object id, exactly like ``lax.top_k``) — a stronger guarantee
    than the ring pass, whose tie order may differ.

    Same contract as :func:`sharded_relative_features` (the reference has
    no distributed pair pass at all — src/models/simulators.py:595-652 is
    a single-process Python loop; this is the TPU scaling story, not a
    port).
    """
    from piml_tpu.ops.banded import (banded_params, build_object_index,
                                     topk_neighbors_banded)
    from piml_tpu.physics.features import _pad_object_axis, nearby_in_sight

    n_dev = mesh.shape[axis]
    n = position.shape[0]
    assert n % n_dev == 0, f"N={n} must divide the {axis}-axis ({n_dev})"
    m_loc = n // n_dev

    velocity = jnp.where(jnp.isnan(velocity), 0.0, velocity)
    acceleration = jnp.where(jnp.isnan(acceleration), 0.0, acceleration)
    heading = heading_direction(velocity, time_axis=False)
    state = jnp.concatenate([position, velocity, acceleration], axis=-1)

    k1 = min(cfg.topk_ped, n)
    # static banded params: m_loc queries per device vs the global table.
    # A tile of sorted LOCAL queries spans ~D× more cells than on one chip
    # (local occupancy is N/D over the same grid), which auto_window's
    # n-argument accounts for — windows widen, the 5-cell-row base term
    # still dominates, so per-device work stays ~1/D of single-chip.
    g_p, w_p = banded_params(m_loc, n, k1, fine=True)

    obstacles_pad, m_real = _pad_object_axis(obstacles)
    k2 = min(cfg.topk_obs, m_real)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        # pallas_call's out_shape carries no varying-mesh-axes info, so the
        # vma checker cannot see through it; replication of the psum'd
        # exact flag is guaranteed by construction
        check_vma=False,
    )
    def run(state_tile, heading_tile):
        my = lax.axis_index(axis)
        gstate = lax.all_gather(state_tile, axis, axis=0, tiled=True)  # N, 6
        gpos = gstate[:, :2]                     # NaN rows = absent agents
        index = build_object_index(gpos, g_p, w_p)
        self_ids = my * m_loc + jnp.arange(m_loc)
        dist, idx, exact = topk_neighbors_banded(
            state_tile[:, :2], heading_tile, k1, cfg.sight_angle_ped,
            objects=gpos, same_objects=False, grid_dim=g_p, window=w_p,
            dist_threshold=cfg.dist_threshold_ped, index=index,
            self_ids=self_ids,
        )
        # assemble exactly like the single-device path
        # (physics/features.py relative_features): gather rows, subtract
        # the raw local state (NaN query rows zero out via isfinite)
        gathered = jnp.take(gstate, idx, axis=0)            # m_loc, k1, 6
        rel = gathered - state_tile[:, None, :]
        keep = (dist <= cfg.dist_threshold_ped)[..., None]
        ped_f = jnp.where(keep & jnp.isfinite(rel), rel, 0.0)

        # obstacle pass: local per shard against the replicated table
        # (obstacle tables are small; identical to the ring pass's)
        od, oi = nearby_in_sight(state_tile[:, :2], obstacles_pad,
                                 heading_tile, k2, cfg.sight_angle_obs)
        zeros = jnp.zeros_like(obstacles_pad)
        obs_state = jnp.concatenate([obstacles_pad, zeros, zeros], axis=-1)
        gathered_o = jnp.take(obs_state, oi, axis=0)
        rel_o = gathered_o - state_tile[:, None, :]
        keep_o = (od <= cfg.dist_threshold_obs)[..., None]
        obs_f = jnp.where(keep_o & jnp.isfinite(rel_o), rel_o, 0.0)

        all_exact = lax.psum(exact.astype(jnp.int32), axis) == n_dev
        return ped_f, obs_f, all_exact

    ped_b, obs_b, exact = run(state, heading)
    dest = jnp.where(jnp.isnan(destination - position), 0.0,
                     destination - position)

    # the obstacle pass is shard-local dense and identical in both branches
    # (run() above already computed it) — only the ped pass is under the
    # exactness cond, so a fallback frame never pays the obstacle work twice
    def fallback():
        p, _, _ = sharded_relative_features(
            position, velocity, acceleration, destination, obstacles,
            cfg, mesh, axis, include_obstacles=False)
        return p

    ped_f = lax.cond(exact, lambda: ped_b, fallback)
    return ped_f, obs_b, dest
