"""Pure-function feature kernels (the reference's ``Pedestrians`` mixin).

Everything here is branch-free masked math over fixed shapes so it jits onto
the TPU VPU/MXU, replacing the reference's Python loops and dense
``(t, N, N, 6)`` sort pipeline (reference: src/data/data.py:343-601):

- :func:`heading_direction` — the per-agent forward/backward fill of the last
  nonzero velocity direction becomes two ``lax.scan`` passes over time
  (reference O(T·N) Python loop at src/data/data.py:351-395).
- :func:`nearby_in_sight` — field-of-view masking + nearest-``k`` selection via
  ``lax.top_k`` on masked distances (replaces the full sort at
  src/data/data.py:416-447).
- :func:`relative_features` — assembles the ``(..., N, k, 6)`` neighbor /
  obstacle features and the destination vector (src/data/data.py:466-512).
- :func:`collision_label` / :func:`collision_detection` — constant-velocity
  1-second collision forecast and pairwise contact counts with the
  "friends" filter (src/data/data.py:514-601).

NaN conventions match the reference exactly: absent agents carry NaN
positions, which turn into +inf distances and therefore zero-padded features.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

INF = jnp.inf


class NeighborConfig(NamedTuple):
    """Neighborhood hyper-parameters (reference CLI flags, src/main.py:52-57).

    ``use_pallas_topk``: route the agent-agent selection through the Pallas
    streaming kernel (piml_tpu.ops.pairwise) when the call is single-frame
    (rank-2) and the agent count is large — XLA's fused top_k re-sorts the
    whole (N, N) row per agent, which dominates the rollout step at GC scale.

    ``topk_group``: when > 0 and the object axis exceeds it, run the exact
    two-stage grouped top-k (:func:`grouped_top_k`) instead of one wide
    ``lax.top_k``.  MEASURED SLOWER on TPU (default 0): XLA's 2-D TopK gets
    an optimized custom lowering (~10 ms at 12685²) while the 3-D grouped
    form falls back to generic sort (~92 ms) — see tools/profile_stress.py.
    Kept as a documented, output-exact alternative.
    """

    topk_ped: int = 6
    topk_obs: int = 10
    sight_angle_ped: float = 90.0
    sight_angle_obs: float = 90.0
    dist_threshold_ped: float = 4.0
    dist_threshold_obs: float = 4.0
    use_pallas_topk: bool = True   # size/backend-gated in relative_features
    topk_group: int = 0
    # Cell-list pruning: O(N) candidate selection with an on-device
    # exactness proof and lax.cond dense fallback — on TPU the banded
    # Pallas kernel (ops/banded.py, measured 4.5×/2.8× faster than the
    # dense kernel on the agent/obstacle pass at N = 12,685); the pure-XLA
    # twin (ops/grid_pairs.py) is the verification path.  Always exact.
    use_grid_topk: bool = True


# ----------------------------------------------------------------------------
# heading direction
# ----------------------------------------------------------------------------

def _fill_zero_velocity(velocity: jax.Array) -> jax.Array:
    """Backward-then-forward fill of zero velocities along the time axis.

    Semantics (src/data/data.py:362-389): a zero velocity at time ``t`` is
    replaced by the next nonzero velocity after ``t``; if none exists, by the
    last nonzero velocity before ``t``; zeros remain only if the agent never
    moves.  Input/output shape ``(t, N, 2)``.
    """
    nonzero = jnp.linalg.norm(velocity, axis=-1, keepdims=True) > 0

    def bwd(carry, xs):
        v, nz = xs
        filled = jnp.where(nz, v, carry)
        carry = jnp.where(nz, v, carry)
        return carry, filled

    zero0 = jnp.zeros_like(velocity[0])
    _, filled = lax.scan(bwd, zero0, (velocity, nonzero), reverse=True)

    def fwd(carry, xs):
        v, nz = xs
        out = jnp.where(nz, v, carry)
        carry = out  # forward fill carries the *filled* value (incl. bwd result)
        return carry, out

    # After the reference's backward pass, the forward pass only rewrites
    # entries whose backward-filled value is still zero.
    nonzero2 = jnp.linalg.norm(filled, axis=-1, keepdims=True) > 0
    _, filled2 = lax.scan(fwd, zero0, (filled, nonzero2))
    return filled2


def heading_direction(velocity: jax.Array, time_axis: bool = True) -> jax.Array:
    """Normalized heading direction with zero-velocity fill.

    - ``velocity`` of rank 2 ``(N, 2)``: no temporal fill (matches the
      reference when called on flattened pointwise rows where the Python loop
      never runs) — just the guarded normalization.
    - rank 3 ``(t, N, 2)``: temporal fill along axis 0.
    - rank 4 ``(c, t, N, 2)``: vmapped over channels.

    Normalization divides by ``max(|v|, 0.1-when-zero)``
    (src/data/data.py:391-394): zero vectors stay zero.
    """
    if time_axis:
        if velocity.ndim == 3:
            velocity = _fill_zero_velocity(velocity)
        elif velocity.ndim == 4:
            velocity = jax.vmap(_fill_zero_velocity)(velocity)
    norm = jnp.linalg.norm(velocity, axis=-1, keepdims=True)
    denom = jnp.where(norm == 0, 0.1, norm)
    return velocity / denom


# ----------------------------------------------------------------------------
# neighbor selection
# ----------------------------------------------------------------------------

def _cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """torch.cosine_similarity semantics: denominators clamped at eps."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def grouped_top_k(dist: jax.Array, k: int, group: int
                  ) -> Tuple[jax.Array, jax.Array]:
    """Exact two-stage smallest-k over the last axis of ``dist``.

    Stage 1 splits the M-wide row into groups of ``group`` lanes and takes
    each group's top-k (sort depth O(log² group)); stage 2 merges the
    G·k candidates (tiny).  Equivalent to ``lax.top_k(-dist, k)`` INCLUDING
    tie order: within a group ``lax.top_k`` prefers the lowest index, and
    the candidate array is group-major, so equal values keep global index
    order through the merge.  At GC scale (M ≈ 12.8k) this replaces one
    12.8k-wide per-row sort with 512-wide sorts — the rollout's top cost.

    Returns ``(dist (..., k), idx (..., k))`` with ascending distance.
    """
    m = dist.shape[-1]
    pad = (-m) % group
    if pad:
        dist = jnp.pad(dist, [(0, 0)] * (dist.ndim - 1) + [(0, pad)],
                       constant_values=INF)
    g = dist.shape[-1] // group
    d = dist.reshape(dist.shape[:-1] + (g, group))
    neg, idx = lax.top_k(-d, k)                      # ..., G, k
    base = (jnp.arange(g, dtype=idx.dtype) * group)[:, None]
    cand_v = neg.reshape(neg.shape[:-2] + (g * k,))
    cand_i = (idx + base).reshape(idx.shape[:-2] + (g * k,))
    neg2, j = lax.top_k(cand_v, k)
    return -neg2, jnp.take_along_axis(cand_i, j, axis=-1)


def nearby_in_sight(
    position: jax.Array,
    objects: jax.Array,
    heading: jax.Array,
    k: int,
    angle_threshold: float,
    same_objects: bool = False,
    topk_group: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Indices/distances of the k closest objects inside the field of view.

    ``position``: (..., N, 2); ``objects``: (..., M, 2); ``heading``: (..., N, 2).
    Returns ``(dist, idx)`` of shape (..., N, k); out-of-view / absent entries
    carry +inf distance.  Mirrors src/data/data.py:416-447 including the
    literal ``cos(3.14 * angle / 180)`` threshold (not ``pi``), which is what
    excludes the self-pair: the zero relative vector has cosine 0 < cos(3.14/2).

    TPU-native formulation: instead of materializing the (..., N, M, 2)
    relative-vector tensor, squared distances and the FOV cosine come from two
    (N, M) matmuls (MXU) —
    ``|p_j − p_i|² = |p_i|² + |p_j|² − 2·p_i·p_j`` and
    ``(p_j − p_i)·h_i = p_j·h_i − p_i·h_i`` — so peak memory is O(N·M), not
    O(N·M·d), which is what makes the 12k-agent GC scene fit on one chip.
    """
    pos = jnp.where(jnp.isnan(position), 0.0, position)
    obj = jnp.where(jnp.isnan(objects), 0.0, objects)
    absent_p = jnp.any(jnp.isnan(position), axis=-1)  # ..., N
    absent_o = jnp.any(jnp.isnan(objects), axis=-1)   # ..., M

    # f32 MXU passes: the default TPU bf16 matmul precision destroys the
    # |p_i|² + |p_j|² − 2·p_i·p_j cancellation (errors ~0.1 m at |p|~50 m).
    hi = lax.Precision.HIGHEST
    p_sq = jnp.sum(pos * pos, axis=-1)  # ..., N
    o_sq = jnp.sum(obj * obj, axis=-1)  # ..., M
    dot = jnp.einsum("...nd,...md->...nm", pos, obj, precision=hi)
    dist2 = p_sq[..., :, None] + o_sq[..., None, :] - 2.0 * dot
    dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
    invalid = absent_p[..., :, None] | absent_o[..., None, :]
    dist = jnp.where(invalid, INF, dist)

    # FOV cosine with torch.cosine_similarity eps semantics: the relative
    # vector's norm IS the distance; |heading| is 1 or 0 (guarded at 1e-8).
    rel_dot_h = (
        jnp.einsum("...md,...nd->...nm", obj, heading, precision=hi)
        - jnp.sum(pos * heading, axis=-1)[..., :, None]
    )
    h_norm = jnp.maximum(jnp.linalg.norm(heading, axis=-1), 1e-8)
    cos = rel_dot_h / jnp.maximum(dist, 1e-8) / h_norm[..., :, None]
    cos = jnp.where(invalid | jnp.isnan(cos), -1.0, cos)

    if same_objects:
        # pin the self-pair exactly: zero relative vector → dist 0, cosine 0
        # (the reference's zero-vector cosine, data.py:439-443) so the FOV
        # threshold alone decides self-inclusion, free of cancellation noise.
        n, m = position.shape[-2], objects.shape[-2]
        diag = (jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (n, m), 1))
        dist = jnp.where(diag & ~invalid, 0.0, dist)
        cos = jnp.where(diag & ~invalid, 0.0, cos)

    dist = jnp.where(cos < math.cos(3.14 * angle_threshold / 180.0), INF, dist)

    # The reference's sort + [:k] naturally yields min(k, M) columns
    # (src/data/data.py:445-447) and that column count is semantically
    # significant: zero-padded rows still pass the encoders and contribute
    # bias-derived messages to the sum-pool.
    k = min(k, objects.shape[-2])
    if topk_group and objects.shape[-2] > 2 * topk_group and k <= topk_group:
        return grouped_top_k(dist, k, topk_group)
    neg, idx = lax.top_k(-dist, k)  # ties resolved by lowest index, like stable sort
    return -neg, idx


def gather_filtered(
    features: jax.Array, idx: jax.Array, dist: jax.Array, dist_threshold: float
) -> jax.Array:
    """Gather per-neighbor feature rows, zeroing beyond the distance threshold.

    ``features``: (..., N, M, d); ``idx``/``dist``: (..., N, k) → (..., N, k, d).
    (reference: src/data/data.py:449-464 — zero padding, never inf/NaN.)
    """
    gathered = jnp.take_along_axis(features, idx[..., None], axis=-2)
    keep = (dist <= dist_threshold)[..., None]
    gathered = jnp.where(keep, gathered, 0.0)
    return jnp.where(jnp.isfinite(gathered), gathered, 0.0)


# ----------------------------------------------------------------------------
# relative features
# ----------------------------------------------------------------------------

def _gather_neighbor_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``(..., M, d)[(..., N, k)] → (..., N, k, d)`` neighbor-row gather.

    ``jnp.take_along_axis`` with a broadcast trailing index lowers to a
    per-ELEMENT gather on TPU — measured 192 ms for (524k, 6) neighbor
    rows of 6 floats — while plain row indexing lowers to a row gather:
    8.7 ms for the same bytes (22×).  At ≥262k agents the feature pass
    was gather-bound on exactly this (DESIGN §12)."""
    if table.ndim == 2:
        return table[idx]
    return jax.vmap(_gather_neighbor_rows)(table, idx)


def _banded_wide_fallback(position, heading, k, sight_angle, dist_threshold):
    """Fallback branch of the banded selector's exactness cond past ~300k
    objects, where the dense O(N·M) twin cannot fit VMEM on one core
    (ops/pairwise.py pair_pass_fits): a HALF-GRID banded pass.

    Halving grid_dim doubles the cell size, which doubles every row's
    distance-to-box-edge bound — the predicate's feature-exactness clause
    ``bound > dist_threshold`` then holds by construction wherever
    2 × (2·cs) exceeds the threshold (measured: the uniform 524k/1M
    scaling scenes fail the fine grid's bound on a tail of rows but are
    fully exact on the half grid).  Cost ~2× the primary pass (row width
    doubles), still O(N·window).  At this scale NO framework can run the
    exact dense pass (the pair tensor alone is ≥0.7 TB), so residual
    inexactness (threshold beyond even the doubled bound) relaxes to
    9×9-fine-cell coverage rather than raising."""
    from piml_tpu.ops.banded import banded_params, topk_neighbors_banded

    n_r = position.shape[0]
    g1, _ = banded_params(n_r, n_r, k, fine=True)
    g2 = max(g1 // 2, 3)
    _, w2 = banded_params(n_r, n_r, k, grid_dim=g2, fine=True)
    bd, bi, _ = topk_neighbors_banded(position, heading, k, sight_angle,
                                      dist_threshold=dist_threshold,
                                      grid_dim=g2, window=w2)
    return bd, bi


def _pad_object_axis(x: jax.Array, minimum: int = 128):
    """Pad the object (second-to-last) axis up to a lane-aligned multiple.

    TPU layouts degrade pathologically when the lane dimension of the (N, M)
    pair matrices is tiny (the reference's 2-point dummy obstacle table makes
    every downstream op ~500× slower); NaN-padded rows are invalid (+inf
    distance) and never selected ahead of real candidates.
    Returns (padded, real_count).
    """
    m = x.shape[-2]
    target = max(minimum, -(-m // minimum) * minimum)
    if target == m:
        return x, m
    pad = jnp.full(x.shape[:-2] + (target - m, x.shape[-1]), jnp.nan, x.dtype)
    return jnp.concatenate([x, pad], axis=-2), m


def prepare_obstacle_index(n_agents: int, obstacles: jax.Array,
                           cfg: NeighborConfig):
    """Prebuild the banded selector's obstacle cell index (ops/banded.py).

    The obstacle table is static per scene, so building its sorted column
    table once OUTSIDE the rollout scan (and closing over it in the scan
    body) saves the per-frame sort/histogram/table fusions.  Returns None
    when the banded path would not engage for these shapes — safe to pass
    either way to :func:`relative_features`.
    """
    obstacles_pad, m_real = _pad_object_axis(obstacles)
    n_pad = max(128, -(-n_agents // 128) * 128)
    engaged = (
        cfg.use_grid_topk
        and n_agents * n_pad >= 2 ** 21
        and n_agents * obstacles_pad.shape[0] >= 2 ** 21
        and (jax.default_backend() == "tpu" or not cfg.use_pallas_topk)
    )
    if not engaged:
        return None
    from piml_tpu.ops.banded import banded_params, build_object_index

    k_obs = min(cfg.topk_obs, m_real)
    g_o, w_o = banded_params(n_agents, obstacles_pad.shape[0], k_obs,
                             fine=True)
    return build_object_index(obstacles_pad, g_o, w_o)


def _check_obstacle_index(obstacle_index, obstacles_pad, g_o: int, w_o: int):
    """A prebuilt index encodes its (grid_dim, window) in its shapes; a
    mismatch would silently corrupt the in-kernel cell masks, so fail fast
    with an actionable message before the (possibly vmapped) kernel call."""
    if obstacle_index is None:
        return
    m_band = -(-max(obstacles_pad.shape[0], 128) // 128) * 128 + w_o
    if (obstacle_index.offsets.shape[0] != g_o * g_o + 2
            or obstacle_index.cols.shape[1] != m_band):
        raise ValueError(
            "obstacle_index was built with different banded params; "
            "build it via prepare_obstacle_index with the same "
            "NeighborConfig and agent count")


def relative_features(
    position: jax.Array,
    velocity: jax.Array,
    acceleration: jax.Array,
    destination: jax.Array,
    obstacles: jax.Array,
    cfg: NeighborConfig,
    heading: Optional[jax.Array] = None,
    obstacle_index=None,
    batched: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pairwise neighbor / obstacle / destination features for model input.

    Args:
      position/velocity/acceleration/destination: (..., t, N, 2) (NaN = absent)
      obstacles: (M, 2)
      heading: optional precomputed (..., t, N, 2) heading (skips the fill)
      obstacle_index: optional prebuilt :func:`prepare_obstacle_index`
        result (static obstacle tables: hoists the per-frame cell sort)
      batched: explicit opt-in for the rank-3 channel-batched banded path
        (one hoisted exactness cond for the whole batch).  Only the
        channeled-BPTT caller (engine/rollout.py batched_rollout) sets
        this; time-major (t, N, 2) preprocessing callers keep the dense
        kernels so cached dataset features never depend on the banded
        kernel's threshold-boundary f32 rounding.

    Returns:
      ped_features: (..., t, N, k1, 6) — relative p, v, a of k1 nearest in-FOV
      obs_features: (..., t, N, k2, 6) — relative p, zero v/a rows
      dest_features: (..., t, N, 2) — destination − position (NaN→0)
    (reference: src/data/data.py:466-512)
    """
    velocity = jnp.where(jnp.isnan(velocity), 0.0, velocity)
    acceleration = jnp.where(jnp.isnan(acceleration), 0.0, acceleration)
    if heading is None:
        heading = heading_direction(velocity)

    # Never materialize the (..., N, M, 6) relative tensor: select neighbor
    # indices first (O(N·M) matmul distances), then gather-and-subtract the
    # (..., N, k, 6) selected rows only.  Object tables are lane-padded.
    state = jnp.concatenate([position, velocity, acceleration], axis=-1)  # ..., N, 6
    state_pad, n_real = _pad_object_axis(state)
    k_ped = min(cfg.topk_ped, n_real)

    # Route the O(N·M) selections through the Pallas streaming kernel on the
    # single-frame TPU hot path once the pair grid is large enough for the
    # launch overhead to pay off (crossover well below GC scale, where the
    # kernel is 3.7× faster than XLA's TopK; see ops/pairwise.py).
    big_single_frame = (
        position.ndim == 2
        and position.shape[0] * state_pad.shape[0] >= 2 ** 21
    )
    use_pallas = (
        cfg.use_pallas_topk and big_single_frame
        and jax.default_backend() == "tpu"
    )
    # Cell-list acceleration (use_grid_topk): on TPU the banded Pallas
    # kernel (ops/banded.py — cell-sorted table, contiguous windows, no
    # gathers) replaces the O(N·M) dense pass; the pure-XLA cell list
    # (ops/grid_pairs.py) is gather-bound on TPU (measured 62× slower at
    # N = 12,685) and stays a CPU/reference path only.  Both prove
    # exactness on device and lax.cond back to the dense pass otherwise.
    # (off-TPU the banded kernel runs in interpret mode; that is only
    # useful for verification, so it requires explicitly disabling the
    # dense Pallas path)
    use_banded = (cfg.use_grid_topk and big_single_frame
                  and (jax.default_backend() == "tpu"
                       or not cfg.use_pallas_topk))
    # Batched (rank-3, channel-leading) banded path with the exactness
    # decision HOISTED above the channel axis: an explicitly-batched call
    # (engine/rollout.py batched_rollout — the channeled BPTT feature
    # pass) vmaps the banded selector over channels, AND-reduces the
    # per-channel exactness flags, and takes ONE lax.cond for the whole
    # batch.  Under an outer jax.vmap this function sees rank-2 tracers
    # and a per-channel cond would degrade to select (both branches
    # execute); callers must pass the channel axis explicitly to get
    # real branching.
    use_banded_batched = (
        batched
        and cfg.use_grid_topk
        and position.ndim == 3
        and position.shape[-2] * state_pad.shape[-2] >= 2 ** 21
        and (jax.default_backend() == "tpu" or not cfg.use_pallas_topk)
    )

    def _ped_dense():
        if use_pallas:
            from piml_tpu.ops.pairwise import (pair_pass_fits,
                                               topk_neighbors_pallas)

            if pair_pass_fits(state_pad.shape[0]):
                # pallas/banded indices address the un-padded table; all
                # tables agree on the first n_real rows, so the shared
                # gather below stays valid
                return topk_neighbors_pallas(
                    position, heading, k_ped, cfg.sight_angle_ped
                )
            return _banded_wide_fallback(position, heading, k_ped,
                                         cfg.sight_angle_ped,
                                         cfg.dist_threshold_ped)
        return nearby_in_sight(
            position, state_pad[..., :2], heading, k_ped, cfg.sight_angle_ped,
            same_objects=True, topk_group=cfg.topk_group,
        )

    agent_order = None
    if use_banded:
        from piml_tpu.ops.banded import (banded_params, build_object_index,
                                         topk_neighbors_banded_or_dense)

        n_rows = position.shape[0]
        g_p, w_p = banded_params(n_rows, n_rows, k_ped, fine=True)
        ped_index = build_object_index(position, g_p, w_p)
        inv = jnp.zeros(n_rows, jnp.int32).at[ped_index.order].set(
            jnp.arange(n_rows, dtype=jnp.int32))
        # one spatially-coherent agent sort, shared with the obstacle pass
        agent_order = (ped_index.order, inv)
        ped_dist, ped_idx = topk_neighbors_banded_or_dense(
            position, heading, k_ped, cfg.sight_angle_ped, _ped_dense,
            dist_threshold=cfg.dist_threshold_ped, grid_dim=g_p, window=w_p,
            index=ped_index, agent_order=agent_order,
        )
    elif use_banded_batched:
        from piml_tpu.ops.banded import banded_params, topk_neighbors_banded

        n_rows = position.shape[-2]
        g_p, w_p = banded_params(n_rows, n_rows, k_ped, fine=True)

        def _one(p, h):
            return topk_neighbors_banded(
                p, h, k_ped, cfg.sight_angle_ped,
                dist_threshold=cfg.dist_threshold_ped,
                grid_dim=g_p, window=w_p,
            )

        bd, bi, bex = jax.vmap(_one)(position, heading)
        ped_dist, ped_idx = lax.cond(jnp.all(bex), lambda: (bd, bi),
                                     _ped_dense)
    else:
        ped_dist, ped_idx = _ped_dense()
    gathered = _gather_neighbor_rows(state_pad, ped_idx)
    rel = gathered - state[..., :, None, :]
    keep = (ped_dist <= cfg.dist_threshold_ped)[..., None]
    ped_features = jnp.where(keep & jnp.isfinite(rel), rel, 0.0)

    dest_features = destination - position
    dest_features = jnp.where(jnp.isnan(dest_features), 0.0, dest_features)

    obstacles_pad, m_real = _pad_object_axis(obstacles)
    k_obs = min(cfg.topk_obs, m_real)
    obs = jnp.broadcast_to(
        obstacles_pad, position.shape[:-2] + obstacles_pad.shape
    )  # ..., M_pad, 2
    big_obs = position.shape[0] * obstacles_pad.shape[0] >= 2 ** 21

    def _obs_dense():
        if use_pallas and big_obs:
            from piml_tpu.ops.pairwise import topk_neighbors_pallas

            return topk_neighbors_pallas(
                position, heading, k_obs, cfg.sight_angle_obs,
                objects=obstacles_pad, same_objects=False,
            )
        return nearby_in_sight(
            position, obs, heading, k_obs, cfg.sight_angle_obs,
            topk_group=cfg.topk_group,
        )

    if use_banded and big_obs:
        from piml_tpu.ops.banded import (banded_params, build_object_index,
                                         topk_neighbors_banded_or_dense)

        g_o, w_o = banded_params(position.shape[0], obstacles_pad.shape[0],
                                 k_obs, fine=True)
        _check_obstacle_index(obstacle_index, obstacles_pad, g_o, w_o)
        o_index = (obstacle_index if obstacle_index is not None
                   else build_object_index(obstacles_pad, g_o, w_o))
        obs_dist, obs_idx = topk_neighbors_banded_or_dense(
            position, heading, k_obs, cfg.sight_angle_obs, _obs_dense,
            objects=obstacles_pad, same_objects=False,
            dist_threshold=cfg.dist_threshold_obs, grid_dim=g_o, window=w_o,
            index=o_index, agent_order=agent_order,
        )
    elif (use_banded_batched
          and position.shape[-2] * obstacles_pad.shape[0] >= 2 ** 21):
        from piml_tpu.ops.banded import (banded_params, build_object_index,
                                         topk_neighbors_banded)

        g_o, w_o = banded_params(position.shape[-2], obstacles_pad.shape[0],
                                 k_obs, fine=True)
        _check_obstacle_index(obstacle_index, obstacles_pad, g_o, w_o)
        # the obstacle table is shared across channels: one index, vmapped
        # with in_axes None
        o_index = (obstacle_index if obstacle_index is not None
                   else build_object_index(obstacles_pad, g_o, w_o))

        def _one_o(p, h):
            return topk_neighbors_banded(
                p, h, k_obs, cfg.sight_angle_obs, objects=obstacles_pad,
                same_objects=False, grid_dim=g_o, window=w_o,
                dist_threshold=cfg.dist_threshold_obs, index=o_index,
            )

        od, oi, oex = jax.vmap(_one_o)(position, heading)
        obs_dist, obs_idx = lax.cond(jnp.all(oex), lambda: (od, oi),
                                     _obs_dense)
    else:
        obs_dist, obs_idx = _obs_dense()
    zeros = jnp.zeros_like(obs)
    obs_state = jnp.concatenate([obs, zeros, zeros], axis=-1)  # ..., M_pad, 6
    gathered_o = _gather_neighbor_rows(obs_state, obs_idx)
    rel_o = gathered_o - state[..., :, None, :]
    keep_o = (obs_dist <= cfg.dist_threshold_obs)[..., None]
    obs_features = jnp.where(keep_o & jnp.isfinite(rel_o), rel_o, 0.0)

    return ped_features, obs_features, dest_features


# ----------------------------------------------------------------------------
# collisions
# ----------------------------------------------------------------------------

def collision_label(ped_features: jax.Array) -> jax.Array:
    """Would-collide-within-1s label per neighbor edge.

    Ten 0.1 s constant-relative-velocity sub-steps; any sub-step with relative
    distance in (0, 0.5) marks the edge (src/data/data.py:514-535).
    Input (..., k, 6) → output (..., k).
    """
    t = jnp.arange(10, dtype=ped_features.dtype) * 0.1  # (10,)
    rel_p = ped_features[..., None, :2]  # ..., k, 1, 2
    rel_v = ped_features[..., None, 2:4]
    future = rel_p + rel_v * t[:, None]  # ..., k, 10, 2
    d = jnp.linalg.norm(future, axis=-1)  # ..., k, 10
    hit = (d < 0.5) & (d != 0)
    return jnp.any(hit, axis=-1).astype(ped_features.dtype)


def collision_detection(
    position: jax.Array,
    threshold: float,
    real_position: Optional[jax.Array] = None,
    friends_window: int = 4,
    friends_frames: int = 25,
) -> jax.Array:
    """Pairwise contact matrix minus self-loops and "friends".

    ``position``: (t, N, 2) or (c, t, N, 2) with NaN marking absence.
    Friends are removed per the reference (src/data/data.py:571-599):

    - 3-D input (evaluation): pairs in contact > ``friends_frames`` frames —
      or, when ``real_position`` is given, contact counted on the real data;
    - 4-D input (training): pairs already in contact during the first
      ``friends_window`` frames of the window.

    Returns the (t, N, N) / (c, t, N, N) 0/1 contact tensor.
    """
    rel = position[..., None, :, :] - position[..., :, None, :]
    dist = jnp.linalg.norm(rel, axis=-1)  # ..., t, N, N (NaN where absent)
    eye = jnp.eye(position.shape[-2], dtype=position.dtype)
    coll = jnp.where(
        jnp.isnan(dist), 0.0, jnp.where(dist < threshold, 1.0, 0.0) - eye
    )

    if real_position is not None:
        rrel = real_position[..., None, :, :] - real_position[..., :, None, :]
        rdist = jnp.linalg.norm(rrel, axis=-1)
        rcoll = jnp.where(jnp.isnan(rdist), 0.0, (rdist < threshold).astype(position.dtype))
        friends = (jnp.sum(rcoll, axis=0) <= friends_frames).astype(position.dtype)
        friends = friends[None]
    elif position.ndim == 3:
        friends = (jnp.sum(coll, axis=0) <= friends_frames).astype(position.dtype)
        friends = friends[None]
    else:  # (c, t, N, 2) training windows
        early = jnp.sum(coll[:, :friends_window], axis=1)
        friends = 1.0 - (early > 0).astype(position.dtype)
        friends = friends[:, None]

    return coll * friends


def collision_detection_single_frame(position: jax.Array, threshold: float) -> jax.Array:
    """Per-frame contact counts without the friends filter, used inside the
    differentiable rollout (reference calls collision_detection on a single
    frame where the friends logic degenerates; src/models/simulators.py:708).

    ``position``: (..., N, 2) → (..., N) contact counts.
    """
    rel = position[..., None, :, :] - position[..., :, None, :]
    dist = jnp.linalg.norm(rel, axis=-1)
    n = position.shape[-2]
    eye = jnp.eye(n, dtype=position.dtype)
    coll = jnp.where(jnp.isnan(dist), 0.0, jnp.where(dist < threshold, 1.0, 0.0) - eye)
    return jnp.sum(coll, axis=-1)


# ----------------------------------------------------------------------------
# masks / windowing helpers
# ----------------------------------------------------------------------------

def move_index_matrix(mask: jax.Array, direction: str, n_steps: int, axis: int = 0) -> jax.Array:
    """Shift-and-intersect of a 0/1 index matrix (src/data/data.py:674-697)."""
    zeros_shape = list(mask.shape)
    zeros_shape[axis] = n_steps
    zeros = jnp.zeros(zeros_shape, mask.dtype)
    length = mask.shape[axis]
    if direction == "backward":
        body = lax.slice_in_dim(mask, 0, length - n_steps, axis=axis)
        shifted = jnp.concatenate([zeros, body], axis=axis)
    elif direction == "forward":
        body = lax.slice_in_dim(mask, n_steps, length, axis=axis)
        shifted = jnp.concatenate([body, zeros], axis=axis)
    else:
        raise ValueError(direction)
    return shifted * mask


def turn_detection(position: jax.Array, velocity: jax.Array, mask_v: jax.Array) -> jax.Array:
    """Flag non-abnormal agents: 1 unless turning (>20° between entry velocity
    and start→end chord) or loitering (mean speed < 1.3·0.3)
    (reference: src/data/data.py:700-744).

    position: (T, N, 2) with NaN absence; returns (N,) float 0/1.
    """
    present = jnp.isfinite(position[..., 0])  # T, N
    T = position.shape[0]
    any_present = jnp.any(present, axis=0)
    first = jnp.argmax(present, axis=0)  # N
    last = T - 1 - jnp.argmax(present[::-1], axis=0)

    idx = jnp.arange(position.shape[1])
    starts = position[first, idx]  # N, 2
    ends = position[last, idx]
    v_starts = velocity[first, idx]
    starts = jnp.where(any_present[:, None], starts, 1e4)
    ends = jnp.where(any_present[:, None], ends, 1e4)
    v_starts = jnp.where(any_present[:, None], v_starts, 1e4)

    chord = ends - starts
    dist = jnp.linalg.norm(chord, axis=-1) + 1e-6
    norm_v = jnp.linalg.norm(v_starts, axis=-1) + 1e-6
    cos_theta = jnp.sum(chord * v_starts, axis=-1) / dist / norm_v
    non_abnormal = (cos_theta >= math.cos(3.1415 * 20 / 180)) & (cos_theta > 0)
    non_abnormal = non_abnormal.astype(position.dtype)

    speed = jnp.linalg.norm(jnp.where(jnp.isnan(velocity), 0.0, velocity), axis=-1)
    mean_speed = jnp.sum(speed, axis=0) / jnp.maximum(jnp.sum(mask_v, axis=0), 1e-6)
    return jnp.where(mean_speed < 1.3 * 0.3, 0.0, non_abnormal)


def desired_speed(velocity: jax.Array, skip_frames: int) -> jax.Array:
    """Mean speed over the first ``skip_frames`` frames after each agent's
    first movement (reference: src/data/data.py:797-808).

    velocity: (T, N, 2) → (N,).  The reference's torch.mean over the sliced
    window includes zero-velocity frames inside the window; the window is
    clipped at T like a Python slice.
    """
    T, N = velocity.shape[0], velocity.shape[1]
    speed = jnp.linalg.norm(velocity, axis=-1)  # T, N
    moving = speed > 0
    # first index with movement, 0 if never (matches reference start_idx = 0)
    start = jnp.where(jnp.any(moving, axis=0), jnp.argmax(moving, axis=0), 0)  # N
    offsets = jnp.arange(skip_frames)  # (k,)
    idx = start[None, :] + offsets[:, None]  # k, N
    valid = idx < T
    idx = jnp.minimum(idx, T - 1)
    window = jnp.take_along_axis(speed, idx, axis=0)  # k, N
    window = jnp.where(valid, window, 0.0)
    count = jnp.maximum(jnp.sum(valid, axis=0), 1)
    return jnp.sum(window, axis=0) / count


def history_velocity(velocity: jax.Array, num_history: int) -> jax.Array:
    """Stacked trailing velocities ``(T, N, 2*num_history)`` ordered oldest →
    newest, zero-padded at the sequence start (src/data/data.py:787-795)."""
    T = velocity.shape[0]
    frames = []
    for i in range(num_history):
        shift = num_history - i - 1
        if shift == 0:
            frames.append(velocity)
        else:
            pad = jnp.zeros((shift,) + velocity.shape[1:], velocity.dtype)
            frames.append(jnp.concatenate([pad, velocity[: T - shift]], axis=0))
    return jnp.concatenate(frames, axis=-1)
