"""Cell-list (spatial-binning) neighbor selection — O(N) instead of O(N²).

The reference's neighborhood is "k nearest within a 90° FOV, features zeroed
beyond ``dist_threshold``" (src/data/data.py:416-463).  Because rows beyond
the threshold are zeroed regardless of which far agent occupied the slot, the
*observable* features depend only on in-threshold candidates — and with a
grid-cell size equal to the threshold, every in-threshold candidate lies in
the 3×3 cell neighborhood.  So binning is output-exact, not approximate.

TPU-native construction (all static shapes):

1. cell id per agent from static arena bounds;
2. one ``argsort`` by cell id (the only O(N log N) step);
3. cell→member table (n_cells, cell_capacity) by scatter of sorted ranks;
4. per agent: gather the 3×3 neighborhood's members → (N, 9·capacity)
   candidates; masked distances + FOV; ``lax.top_k`` over the small
   candidate axis.

``cell_capacity`` overflow drops candidates; callers size it from expected
density (returned overflow count makes it checkable).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

INF = jnp.inf


@dataclasses.dataclass(frozen=True)
class BinnedConfig:
    """Static binning geometry.  ``cell_size`` must be ≥ the neighbor
    distance threshold for output-exactness."""

    x_min: float
    y_min: float
    x_max: float
    y_max: float
    cell_size: float = 4.0
    cell_capacity: int = 64

    @property
    def nx(self) -> int:
        return max(1, int(math.ceil((self.x_max - self.x_min) / self.cell_size)))

    @property
    def ny(self) -> int:
        return max(1, int(math.ceil((self.y_max - self.y_min) / self.cell_size)))

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny


@partial(jax.jit, static_argnames=("cfg", "k", "angle_threshold", "dist_threshold"))
def binned_neighbors(
    position: jax.Array,
    heading: jax.Array,
    cfg: BinnedConfig,
    k: int,
    angle_threshold: float,
    dist_threshold: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(dist (N, k), idx (N, k), overflow count).

    Out-of-FOV / absent / beyond-threshold slots carry +inf distance (the
    caller's zero-padding then matches the dense path exactly).  Ties are
    NOT guaranteed to break by global index (cell order intervenes); tied
    distances are fp-measure-zero in simulation states.
    """
    n = position.shape[0]
    valid = jnp.all(jnp.isfinite(position), axis=-1)
    pos = jnp.where(valid[:, None], position, 0.0)

    cx = jnp.clip(((pos[:, 0] - cfg.x_min) / cfg.cell_size).astype(jnp.int32),
                  0, cfg.nx - 1)
    cy = jnp.clip(((pos[:, 1] - cfg.y_min) / cfg.cell_size).astype(jnp.int32),
                  0, cfg.ny - 1)
    cid = jnp.where(valid, cx * cfg.ny + cy, cfg.n_cells)  # invalid → overflow bin

    order = jnp.argsort(cid)                       # N
    cid_sorted = cid[order]

    # rank of each sorted agent within its cell
    starts = jnp.searchsorted(cid_sorted, jnp.arange(cfg.n_cells + 1))
    rank = jnp.arange(n) - starts[jnp.clip(cid_sorted, 0, cfg.n_cells)]
    # absent agents collect in the sentinel bin; only real cells can overflow
    overflow = jnp.sum((rank >= cfg.cell_capacity)
                       & (cid_sorted < cfg.n_cells))

    # cell → member table (original agent ids); empty slots = n (sentinel)
    table = jnp.full((cfg.n_cells + 1, cfg.cell_capacity), n, jnp.int32)
    in_cap = rank < cfg.cell_capacity
    table = table.at[
        jnp.where(in_cap, cid_sorted, cfg.n_cells),
        jnp.clip(rank, 0, cfg.cell_capacity - 1),
    ].set(jnp.where(in_cap, order.astype(jnp.int32), n))

    # 3×3 neighborhood cell ids per agent (clamped at borders; duplicates at
    # the border collapse to the same cell — dedup via a seen-before mask)
    offs = jnp.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                     jnp.int32)  # 9, 2
    ncx = jnp.clip(cx[:, None] + offs[None, :, 0], 0, cfg.nx - 1)
    ncy = jnp.clip(cy[:, None] + offs[None, :, 1], 0, cfg.ny - 1)
    ncell = ncx * cfg.ny + ncy                                   # N, 9
    # mask duplicate neighbor cells (border clamping) to avoid double-counting
    first_occurrence = jnp.ones((n, 9), bool)
    for a in range(1, 9):
        dup = jnp.zeros((n,), bool)
        for b in range(a):
            dup = dup | (ncell[:, a] == ncell[:, b])
        first_occurrence = first_occurrence.at[:, a].set(~dup)

    cand = table[ncell]                                          # N, 9, cap
    cand = jnp.where(first_occurrence[..., None], cand, n)
    cand = cand.reshape(n, 9 * cfg.cell_capacity)                # N, C

    # padded position table (sentinel row n = far away)
    pos_pad = jnp.concatenate([pos, jnp.full((1, 2), 1e9)], axis=0)
    valid_pad = jnp.concatenate([valid, jnp.zeros((1,), bool)])
    cpos = pos_pad[cand]                                         # N, C, 2
    cvalid = valid_pad[cand] & valid[:, None]

    rel = cpos - pos[:, None, :]
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    h_norm = jnp.maximum(jnp.linalg.norm(heading, axis=-1, keepdims=True), 1e-8)
    cos = jnp.sum(rel * heading[:, None, :], axis=-1) / jnp.maximum(dist, 1e-8) / h_norm
    self_pair = cand == jnp.arange(n)[:, None]
    cos = jnp.where(self_pair, 0.0, cos)
    dist = jnp.where(self_pair, 0.0, dist)
    keep = (cvalid & (cos >= math.cos(3.14 * angle_threshold / 180.0))
            & (dist <= dist_threshold))
    dist = jnp.where(keep, dist, INF)

    k = min(k, n)
    neg, slot = lax.top_k(-dist, k)
    idx = jnp.take_along_axis(cand, slot, axis=1)
    top_dist = -neg
    idx = jnp.where(jnp.isfinite(top_dist), idx, 0)
    return top_dist, idx, overflow
