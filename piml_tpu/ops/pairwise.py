"""Pallas TPU kernel: streaming field-of-view top-k neighbor selection.

The XLA path (physics.features.nearby_in_sight) materializes the (N, M)
distance matrix and runs ``lax.top_k`` over it — at GC-dataset scale
(N = 12,685 concurrent agents → 161 M pair distances) that matrix plus the
sort dominates the rollout step.  This kernel streams column tiles of the
objects through VMEM, maintaining a per-row running top-k, so HBM traffic is
O(N) and nothing of size N·M is ever written.

Semantics match the reference FOV selection exactly
(src/data/data.py:416-447; see physics.features.nearby_in_sight):

- distance +inf for absent (invalid) endpoints;
- FOV gate ``cos < cos(3.14·angle/180)`` with torch-style eps cosine;
- self-pair pinned to (dist 0, cos 0) so the threshold alone decides;
- ties broken by lowest object index (stable-sort order).

Layout: positions/headings/validity are packed lane-major as ``cols``
(8, M): row 0 = x, 1 = y, 2 = hx, 3 = hy, 4 = valid; and sublane-major as
``rows`` (N, 8) for the row block.  k is padded to the 128-lane tile in the
outputs; callers slice ``[:, :k]``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = jnp.inf
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_operands(position: jax.Array, heading: jax.Array):
    """(N, 2) position/heading (+NaN absence) → (rows (N_pad, 8),
    cols (8, M_pad), n_valid) padded to tile boundaries with invalid slots."""
    n = position.shape[0]
    valid = jnp.all(jnp.isfinite(position), axis=-1)
    pos = jnp.where(valid[:, None], position, 0.0)
    hd = jnp.where(jnp.isfinite(heading), heading, 0.0)

    n_pad = _round_up(max(n, 8), LANE)
    rows = jnp.zeros((n_pad, 8), jnp.float32)
    rows = rows.at[:n, 0].set(pos[:, 0])
    rows = rows.at[:n, 1].set(pos[:, 1])
    rows = rows.at[:n, 2].set(hd[:, 0])
    rows = rows.at[:n, 3].set(hd[:, 1])
    rows = rows.at[:n, 4].set(valid.astype(jnp.float32))
    cols = rows.T.reshape(8, n_pad)
    return rows, cols, n


def _kernel(rows_ref, cols_ref, out_d_ref, out_i_ref, *, tile_m: int,
            cos_thr: float, self_pairs: bool, k: int):
    """One row-tile: stream all column tiles, keep running top-k."""
    i = pl.program_id(0)
    tile_n = rows_ref.shape[0]
    m_total = cols_ref.shape[1]
    num_tiles = m_total // tile_m

    xa = rows_ref[:, 0:1]
    ya = rows_ref[:, 1:2]
    hxa = rows_ref[:, 2:3]
    hya = rows_ref[:, 3:4]
    va = rows_ref[:, 4:5]
    row_ids = (i * tile_n
               + jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0))

    def extract_topk(d, ids, carry_d, carry_i):
        """k-pass min extraction merging candidates (d, ids) into the running
        (carry_d, carry_i) — ties prefer earlier buffer position, and the
        running buffer (lower indices) is placed first."""
        cat_d = jnp.concatenate([carry_d, d], axis=1)
        cat_i = jnp.concatenate([carry_i, ids], axis=1)
        new_d = jnp.full((tile_n, k), INF, jnp.float32)
        new_i = jnp.zeros((tile_n, k), jnp.int32)
        out_col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k), 1)
        for j in range(k):
            mn = jnp.min(cat_d, axis=1, keepdims=True)          # tile_n, 1
            pos_ids = jax.lax.broadcasted_iota(
                jnp.int32, cat_d.shape, 1)
            first = jnp.min(
                jnp.where(cat_d <= mn, pos_ids, jnp.int32(2 ** 30)),
                axis=1, keepdims=True,
            )
            hit = pos_ids == first
            sel_i = jnp.max(jnp.where(hit, cat_i, 0), axis=1, keepdims=True)
            write = out_col == j
            new_d = jnp.where(write, mn, new_d)
            new_i = jnp.where(write, sel_i, new_i)
            cat_d = jnp.where(hit, INF, cat_d)
        return new_d, new_i

    def body(t, carry):
        carry_d, carry_i = carry
        start = t * tile_m
        blk = cols_ref[:, pl.ds(start, tile_m)]                  # 8, tile_m
        xb = blk[0:1, :]
        yb = blk[1:2, :]
        vb = blk[4:5, :]
        dx = xb - xa                                             # tile_n, tile_m
        dy = yb - ya
        dist = jnp.sqrt(dx * dx + dy * dy)
        rel_h = dx * hxa + dy * hya
        cos = rel_h / jnp.maximum(dist, 1e-8)
        invalid = (va < 0.5) | (vb < 0.5)
        col_ids = start + jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, tile_m), 1)
        if self_pairs:
            diag = col_ids == row_ids
            dist = jnp.where(diag, 0.0, dist)
            cos = jnp.where(diag, 0.0, cos)
        dist = jnp.where(invalid | (cos < cos_thr), INF, dist)
        return extract_topk(dist, col_ids, carry_d, carry_i)

    init = (jnp.full((tile_n, k), INF, jnp.float32),
            jnp.zeros((tile_n, k), jnp.int32))
    top_d, top_i = lax.fori_loop(0, num_tiles, body, init)

    out_d_ref[:, :] = jnp.pad(top_d, ((0, 0), (0, LANE - k)),
                              constant_values=INF)
    out_i_ref[:, :] = jnp.pad(top_i, ((0, 0), (0, LANE - k)))


@functools.partial(
    jax.jit,
    static_argnames=("k", "angle_threshold", "same_objects", "tile_n",
                     "tile_m", "interpret"),
)
def topk_neighbors_pallas(
    position: jax.Array,
    heading: jax.Array,
    k: int,
    angle_threshold: float,
    same_objects: bool = True,
    tile_n: int = 256,
    tile_m: int = 2048,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k in-FOV neighbor (dist, idx) over one agent set.

    position/heading: (N, 2); returns (dist (N, k), idx (N, k)).  Currently
    supports the self-neighbor case (objects == agents), which is the rollout
    hot path; obstacles use the XLA path (M is small after wall sampling).
    """
    rows, cols, n = pack_operands(position, heading)
    n_pad = rows.shape[0]
    # n_pad is a multiple of 128; shrink tiles until they divide it exactly
    tile_n = min(tile_n, n_pad)
    while n_pad % tile_n:
        tile_n //= 2
    tile_m = min(tile_m, n_pad)
    while n_pad % tile_m:
        tile_m //= 2
    cos_thr = math.cos(3.14 * angle_threshold / 180.0)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (n_pad // tile_n,)
    out_d, out_i = pl.pallas_call(
        functools.partial(_kernel, tile_m=tile_m, cos_thr=cos_thr,
                          self_pairs=same_objects, k=k),
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, LANE), jnp.int32),
        ),
    )(rows, cols)
    k_eff = min(k, n)
    return out_d[:n, :k_eff], out_i[:n, :k_eff]
