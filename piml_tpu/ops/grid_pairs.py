"""Cell-list (spatial-grid) top-k neighbor selection — exact, O(N) per frame.

The dense pair pass (ops/pairwise.py Pallas kernel, physics.features XLA
path) scans all N·M pairs every frame: at GC-dataset scale that is 161 M
distance/FOV evaluations per rollout step, and it grows quadratically with
the agent count.  This module implements the standard molecular-dynamics
cell-list scheme (the same design jax-md uses on TPU), adapted to the
reference's field-of-view top-k semantics (src/data/data.py:416-447):

1. bin the M objects into a static G×G grid spanning the bounding box of
   the valid objects (dynamic origin/extent, static G — shapes stay fixed
   under jit);
2. sort object ids by cell id (one XLA sort) and build per-cell offsets;
3. for each agent, gather the candidates from the 5×5 block of cells
   around its own cell — three contiguous slices of the sorted order (one
   per cell row), each a static ``W``-wide window masked to the actual
   band occupancy;
4. run the reference's exact FOV/top-k selection on the (N, 5·W) candidate
   set with ties broken by the lowest ORIGINAL object index (the sorted
   order is not index order, so the tie-break is explicit).

**Exactness is checked, not assumed.**  A row is provably exact when none
of its cell bands overflowed the static window ``W`` and either

- *selection-exact*: its k-th selected (in-FOV) distance is strictly
  inside the distance from the agent to the nearest *unexamined* cell
  region (or the 5×5 block covers the whole grid) — any object outside the
  examined block is at least that boundary distance away and cannot
  displace the selected top-k; or
- *feature-exact* (``dist_threshold`` given): the unexamined region starts
  beyond ``dist_threshold``.  Downstream feature assembly zeroes every
  slot beyond the threshold (src/data/data.py:449-464), and in-threshold
  candidates — all provably captured — occupy the same leading slots in
  both paths (ascending distance), so the *observable* features match the
  dense pass even when beyond-threshold slot occupants differ.

The composed selector (:func:`topk_neighbors_grid`) evaluates the
predicate on-device and falls back to the caller-supplied dense path via
``lax.cond`` when it fails, so the grid path is *always* exact — sparse or
adversarial scenes simply pay the dense cost (plus the small grid probe).

Everything here is plain XLA (sort, cumsum, gathers, min-extractions) —
no Pallas — so it runs identically on CPU tests and TPU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

INF = jnp.inf
_BIG_ID = jnp.int32(2 ** 30)
_BOUND_TOL = 1e-3  # metres; conservative slack on the exactness bound


def auto_grid_dim(m: int, k: int, fine: bool = False) -> int:
    """Static grid dimension targeting ~k objects per cell.

    With occupancy ≈ k the 5×5 examined block holds ~25·k candidates, so
    the k-th in-FOV distance sits far inside the 2-cell exactness bound for
    near-uniform scenes (measured fallback rate 0 on the dense-stress
    regime), while the candidate width stays ~25·k ≪ M.

    ``fine=True`` (used when a ``dist_threshold`` backs the predicate, so
    only ``2·cell > threshold`` must hold, not ``2·cell > k-NN radius``):
    1.5× finer cells — measured 0.89 → 0.72 ms on the banded agent pass at
    N = 12,685.  A mis-sized grid never costs correctness, only fallback
    frames at dense-kernel speed.
    """
    g = math.sqrt(max(m, 1) / max(k, 1))
    if fine:
        g *= 1.5
    return max(4, min(512, int(g)))


def auto_band_width(m: int, grid_dim: int) -> int:
    """Static per-band candidate window: 4× the mean 5-cell band occupancy
    (Poisson fluctuations at the bench densities never reach 4×; clustered
    real scenes that do overflow simply take the exact dense fallback)."""
    occ = m / (grid_dim * grid_dim)
    return max(8, int(math.ceil(20.0 * occ)))


@partial(jax.jit, static_argnames=("grid_dim",))
def build_cell_index(objects: jax.Array, grid_dim: int):
    """Bin ``objects`` (M, 2; NaN = absent) into a G×G grid.

    Returns ``(order, offsets, lo, cell_size)``: ``order`` (M,) object ids
    sorted by cell id (invalid objects sort last, into cell G·G);
    ``offsets`` (G·G+2,) exclusive prefix starts per cell; ``lo``/
    ``cell_size`` (2,) dynamic grid origin and per-axis cell size.

    The grid spans the [0.5%, 99.5%] coordinate quantiles, not min/max: a
    handful of runaway agents (divergent synthetic rollouts produce them)
    would otherwise stretch the box until the real crowd collapses into
    one cell.  Outliers clip into edge cells, which keeps every exactness
    argument intact: a clipped object's real coordinate lies beyond the
    grid edge, so it is farther from any interior agent than the examined
    box side in that direction, and boxes touching the edge include the
    edge cells (hence every clipped object) as candidates.
    """
    g = grid_dim
    valid = jnp.all(jnp.isfinite(objects), axis=-1)
    masked = jnp.where(valid[:, None], objects, jnp.nan)
    qs = jnp.nanquantile(masked, jnp.asarray([0.005, 0.995]), axis=0)
    lo, hi = qs[0], qs[1]
    empty = ~jnp.any(valid)
    lo = jnp.where(empty | jnp.isnan(lo), 0.0, lo)
    hi = jnp.where(empty | jnp.isnan(hi), 1.0, hi)
    cell_size = jnp.maximum((hi - lo) / g, 1e-6)

    cc = jnp.clip(jnp.floor((objects - lo) / cell_size), 0, g - 1)
    cc = jnp.where(valid[:, None], cc, 0.0).astype(jnp.int32)
    cid = jnp.where(valid, cc[:, 0] * g + cc[:, 1], g * g)
    order = jnp.argsort(cid, stable=True).astype(jnp.int32)
    counts = jnp.zeros(g * g + 1, jnp.int32).at[cid].add(1)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    return order, offsets, lo, cell_size


def _extract_topk_by_id(d: jax.Array, ids: jax.Array, k: int):
    """Exact smallest-k of ``d`` (N, C) with ties broken by lowest ``ids``.

    Matches ``lax.top_k(-dist)`` over an index-ordered table (stable-sort
    tie order) even though the candidate buffer is cell-ordered.  INF
    entries yield (INF, 0) slots, mirroring the dense paths' don't-care
    indices (downstream feature gathers mask on the distance).
    """
    out_d = []
    out_i = []
    for _ in range(k):
        mn = jnp.min(d, axis=1, keepdims=True)                    # N, 1
        at_min = d <= mn                                          # ties incl.
        sel = jnp.min(jnp.where(at_min, ids, _BIG_ID), axis=1, keepdims=True)
        out_d.append(mn)
        out_i.append(jnp.where(jnp.isfinite(mn), sel, 0))
        d = jnp.where(at_min & (ids == sel), INF, d)
    return (jnp.concatenate(out_d, axis=1),
            jnp.concatenate(out_i, axis=1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("k", "angle_threshold", "same_objects",
                                   "grid_dim", "band_width", "dist_threshold"))
def grid_topk_neighbors(
    position: jax.Array,
    heading: jax.Array,
    k: int,
    angle_threshold: float,
    objects: Optional[jax.Array] = None,
    same_objects: bool = True,
    grid_dim: Optional[int] = None,
    band_width: Optional[int] = None,
    dist_threshold: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Grid-pruned FOV top-k: ``(dist (N,k'), idx (N,k'), exact ())``.

    Same contract as ``ops.pairwise.topk_neighbors_pallas`` (ascending
    distance, +inf beyond view/validity, k' = min(k, M)) plus a scalar
    ``exact`` flag: True ⇒ the result is provably equivalent to the dense
    pass (see module docstring; with ``dist_threshold`` the guarantee is
    at the threshold-masked feature level); False ⇒ the caller must
    recompute densely.
    """
    if objects is None:
        objects = position
        same_objects = True
    n = position.shape[0]
    m = objects.shape[0]
    k_eff = min(k, m)
    if grid_dim is None:
        grid_dim = auto_grid_dim(m, k)
    if band_width is None:
        band_width = auto_band_width(m, grid_dim)
    g, w = grid_dim, band_width

    pos_valid = jnp.all(jnp.isfinite(position), axis=-1)          # N
    pos = jnp.where(pos_valid[:, None], position, 0.0)
    hd = jnp.where(jnp.isfinite(heading), heading, 0.0)
    obj_valid = jnp.all(jnp.isfinite(objects), axis=-1)           # M
    obj = jnp.where(obj_valid[:, None], objects, 0.0)

    order, offsets, lo, cs = build_cell_index(objects, g)

    # agent cell coordinates in the OBJECT grid (clipped: agents may sit
    # outside the object bounding box; the bound check below stays valid
    # because clipped-side cells beyond the grid edge hold no objects)
    acell = jnp.clip(jnp.floor((pos - lo) / cs), 0, g - 1).astype(jnp.int32)
    ax, ay = acell[:, 0], acell[:, 1]

    # 5 contiguous bands (cell rows ax-2..ax+2, columns ay-2..ay+2)
    cy_lo = jnp.clip(ay - 2, 0, g - 1)
    cy_hi = jnp.clip(ay + 2, 0, g - 1)
    jj = jnp.arange(w, dtype=jnp.int32)
    cand_idx = []
    cand_valid = []
    bands_ok = jnp.ones((n,), bool)
    for b in range(-2, 3):
        rx = ax + b
        in_grid = (rx >= 0) & (rx < g)
        c0 = jnp.clip(rx, 0, g - 1) * g + cy_lo
        c1 = jnp.clip(rx, 0, g - 1) * g + cy_hi
        start = offsets[c0]
        end = offsets[c1 + 1]
        blen = jnp.where(in_grid, end - start, 0)                 # N
        bands_ok &= blen <= w
        pos_in_sorted = start[:, None] + jj[None, :]              # N, W
        valid_j = jj[None, :] < blen[:, None]
        cand_idx.append(order[jnp.clip(pos_in_sorted, 0, m - 1)])
        cand_valid.append(valid_j)
    cand = jnp.concatenate(cand_idx, axis=1)                      # N, C
    cvalid = jnp.concatenate(cand_valid, axis=1)
    cvalid &= obj_valid[cand]

    # distances + FOV gate on the candidate set, torch-cosine semantics
    # (direct coordinate differencing, like the Pallas kernel)
    cpos = obj[cand]                                              # N, C, 2
    dx = cpos[..., 0] - pos[:, None, 0]
    dy = cpos[..., 1] - pos[:, None, 1]
    d2 = dx * dx + dy * dy
    dist = jnp.sqrt(d2)
    rel_h = dx * hd[:, None, 0] + dy * hd[:, None, 1]
    if same_objects:
        self_pair = cand == jnp.arange(n, dtype=jnp.int32)[:, None]
        dist = jnp.where(self_pair, 0.0, dist)
        rel_h = jnp.where(self_pair, 0.0, rel_h)
    cos_thr = math.cos(3.14 * angle_threshold / 180.0)
    in_view = rel_h >= cos_thr * jnp.maximum(dist, 1e-8)
    keep = cvalid & in_view & pos_valid[:, None]
    dist = jnp.where(keep, dist, INF)
    ids = jnp.where(keep, cand, _BIG_ID)

    top_d, top_i = _extract_topk_by_id(dist, ids, k_eff)

    # ---- exactness predicate --------------------------------------------
    # distance from the agent to the nearest unexamined cell region; sides
    # of the 5×5 block flush with the grid edge have no cells beyond them
    bx_lo = lo[0] + (ax - 2).astype(jnp.float32) * cs[0]
    bx_hi = lo[0] + (ax + 3).astype(jnp.float32) * cs[0]
    by_lo = lo[1] + (ay - 2).astype(jnp.float32) * cs[1]
    by_hi = lo[1] + (ay + 3).astype(jnp.float32) * cs[1]
    d_left = jnp.where(ax - 2 > 0, pos[:, 0] - bx_lo, INF)
    d_right = jnp.where(ax + 2 < g - 1, bx_hi - pos[:, 0], INF)
    d_down = jnp.where(ay - 2 > 0, pos[:, 1] - by_lo, INF)
    d_up = jnp.where(ay + 2 < g - 1, by_hi - pos[:, 1], INF)
    bound = jnp.maximum(
        jnp.minimum(jnp.minimum(d_left, d_right),
                    jnp.minimum(d_down, d_up)), 0.0)
    covered = ((ax - 2 <= 0) & (ax + 2 >= g - 1)
               & (ay - 2 <= 0) & (ay + 2 >= g - 1))
    kth = top_d[:, k_eff - 1]
    ok = covered | (kth < bound - _BOUND_TOL)
    if dist_threshold is not None:
        # feature-exactness: every in-threshold candidate is inside the
        # examined block (module docstring)
        ok |= bound > dist_threshold + _BOUND_TOL
    row_ok = ~pos_valid | (ok & bands_ok)
    exact = jnp.all(row_ok)
    return top_d, top_i, exact


def topk_neighbors_grid(
    position: jax.Array,
    heading: jax.Array,
    k: int,
    angle_threshold: float,
    dense_fn: Callable[[], Tuple[jax.Array, jax.Array]],
    objects: Optional[jax.Array] = None,
    same_objects: bool = True,
    grid_dim: Optional[int] = None,
    band_width: Optional[int] = None,
    dist_threshold: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Always-exact selector: grid result when provably exact, else the
    caller's dense path (``dense_fn``) via ``lax.cond`` — only one branch
    executes at runtime."""
    gd, gi, exact = grid_topk_neighbors(
        position, heading, k, angle_threshold, objects=objects,
        same_objects=same_objects, grid_dim=grid_dim, band_width=band_width,
        dist_threshold=dist_threshold)
    return lax.cond(exact, lambda: (gd, gi), dense_fn)
