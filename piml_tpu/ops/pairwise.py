"""Pallas TPU kernel: streaming field-of-view top-k neighbor selection.

The XLA path (physics.features.nearby_in_sight) materializes the (N, M)
distance matrix and runs ``lax.top_k`` over it — at GC-dataset scale
(N = 12,685 concurrent agents → 161 M pair distances) XLA's TopK custom
lowering costs ~10 ms/frame for the agent pass and ~10 ms for the obstacle
pass (tools/profile_stress.py trace).  This kernel streams column tiles of
the objects through VMEM, maintaining a per-row running top-k, so HBM
traffic is O(N) and nothing of size N·M is ever written.  Measured at
N = 12,685 (one v5e chip): 3.8 ms vs 13.9 ms for the XLA agent pass —
the tile size is decisive: the k-pass merge is amortized only when the
column tile is wide (the round-1 default shrank tiles to divide N and made
the merge dominate; columns are now padded up to the tile instead).

Semantics match the reference FOV selection exactly
(src/data/data.py:416-447; see physics.features.nearby_in_sight):

- distance +inf for absent (invalid) endpoints;
- FOV gate ``cos < cos(3.14·angle/180)`` with torch-style eps cosine —
  evaluated multiplicatively (``rel·h < thr·dist``) so no divide runs on
  the N·M grid;
- self-pair pinned to (dist 0, cos 0) so the threshold alone decides;
- ties broken by lowest object index (stable-sort order);
- candidates ordered by squared distance (monotone ⇒ identical selection),
  one sqrt on the (N, k) output only.

Layout: object columns are packed lane-major as ``cols`` (8, M_pad): row
0 = x, 1 = y, 2 = valid; agent rows sublane-major as ``rows`` (N_pad, 8) =
[x, y, hx, hy, valid].  k is padded to the 128-lane tile in the outputs;
callers slice ``[:, :k]``.
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
# Scoped-VMEM model for the tile picker, re-fitted to the lean-extraction
# kernel's measured compile boundaries on v5e (Mosaic's scoped limit is
# 16 MB): ~2.25 live f32 work tiles (9·tile_n·tile_m bytes), the
# per-iteration (8, tile_m) block slice (32·tile_m bytes), plus the
# resident (8, m_pad) column input (64·m_r bytes).  Anchors: (128, 12800)
# compiles (model 16.0 MB), (8, 102400) OOMs at a measured 17.74 MB
# (model 17.2 MB) — the pre-lean fit lacked the 32·tile_m term and
# wrongly admitted it.
VMEM_SCOPED_LIMIT = 16.5e6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_rows(position: jax.Array, heading: jax.Array, tile_n: int):
    """(N, 2) agents → (N_pad, 8) sublane-major [x, y, hx, hy, valid]."""
    n = position.shape[0]
    valid = jnp.all(jnp.isfinite(position), axis=-1)
    pos = jnp.where(valid[:, None], position, 0.0)
    hd = jnp.where(jnp.isfinite(heading), heading, 0.0)
    n_pad = _round_up(max(n, 8), tile_n)
    rows = jnp.zeros((n_pad, 8), jnp.float32)
    rows = rows.at[:n, 0].set(pos[:, 0])
    rows = rows.at[:n, 1].set(pos[:, 1])
    rows = rows.at[:n, 2].set(hd[:, 0])
    rows = rows.at[:n, 3].set(hd[:, 1])
    rows = rows.at[:n, 4].set(valid.astype(jnp.float32))
    return rows, n


def pack_cols(objects: jax.Array, tile_m: int):
    """(M, 2) objects → (8, M_pad) lane-major [x, y, valid] columns."""
    m = objects.shape[0]
    valid = jnp.all(jnp.isfinite(objects), axis=-1)
    obj = jnp.where(valid[:, None], objects, 0.0)
    m_pad = _round_up(max(m, LANE), tile_m)
    cols = jnp.zeros((8, m_pad), jnp.float32)
    cols = cols.at[0, :m].set(obj[:, 0])
    cols = cols.at[1, :m].set(obj[:, 1])
    cols = cols.at[2, :m].set(valid.astype(jnp.float32))
    return cols, m


def _kernel(rows_ref, cols_ref, out_d_ref, out_i_ref, *, tile_m: int,
            cos_thr: float, self_pairs: bool, k: int):
    """One row-tile: stream all column tiles, keep running top-k (by d²)."""
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

    out_col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k), 1)

    def extract_topk(d, start, carry_d, carry_i):
        """k-pass min extraction of the tile's candidates, then a cheap
        (width 2k) merge into the running (carry_d, carry_i).

        The candidate's object id is its buffer position + ``start``, so no
        full-width index array is materialized and the per-pass work is the
        min, the first-position select, and the remask — 5 full-width ops
        instead of 8 plus two full-width concats in the fused-buffer form
        (~25% kernel time, and the freed VMEM admits wider row tiles).
        Ties prefer the lowest position ⇒ lowest object index."""
        pos = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        loc_d = jnp.full((tile_n, k), INF, jnp.float32)
        loc_i = jnp.zeros((tile_n, k), jnp.int32)
        for j in range(k):
            mn = jnp.min(d, axis=1, keepdims=True)               # tile_n, 1
            first = jnp.min(
                jnp.where(d <= mn, pos, jnp.int32(2 ** 30)),
                axis=1, keepdims=True,
            )
            d = jnp.where(pos == first, INF, d)
            write = out_col == j
            loc_d = jnp.where(write, mn, loc_d)
            loc_i = jnp.where(write, first + start, loc_i)
        # merge running + local top-k (running first: earlier tiles hold
        # lower object indices, so equal distances prefer the carry)
        cat_d = jnp.concatenate([carry_d, loc_d], axis=1)        # tile_n, 2k
        cat_i = jnp.concatenate([carry_i, loc_i], axis=1)
        cpos = jax.lax.broadcasted_iota(jnp.int32, cat_d.shape, 1)
        new_d = jnp.full((tile_n, k), INF, jnp.float32)
        new_i = jnp.zeros((tile_n, k), jnp.int32)
        for j in range(k):
            mn = jnp.min(cat_d, axis=1, keepdims=True)
            first = jnp.min(
                jnp.where(cat_d <= mn, cpos, jnp.int32(2 ** 30)),
                axis=1, keepdims=True,
            )
            hit = cpos == first
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
        vb = blk[2:3, :]
        dx = xb - xa                                             # tile_n, tile_m
        dy = yb - ya
        d2 = dx * dx + dy * dy
        rel_h = dx * hxa + dy * hya
        invalid = (va < 0.5) | (vb < 0.5)
        col_ids = start + jax.lax.broadcasted_iota(
            jnp.int32, (tile_n, tile_m), 1)
        if self_pairs:
            diag = col_ids == row_ids
            d2 = jnp.where(diag, 0.0, d2)
            rel_h = jnp.where(diag, 0.0, rel_h)
        # FOV gate cos < thr, multiplicatively: cos = rel_h / max(dist, eps)
        # (torch cosine eps semantics) ⇔ rel_h < thr · max(dist, eps) since
        # the clamped norm is positive — exact, with no divide on the grid.
        # The self-pair (rel_h = 0, dist clamped to eps) is excluded for
        # thr > 0 (90° FOV: cos(3.14/2) ≈ +8e-4), matching the reference.
        out_of_view = rel_h < cos_thr * jnp.maximum(jnp.sqrt(d2), 1e-8)
        d2 = jnp.where(invalid | out_of_view, INF, d2)
        return extract_topk(d2, start, carry_d, carry_i)

    init = (jnp.full((tile_n, k), INF, jnp.float32),
            jnp.zeros((tile_n, k), jnp.int32))
    top_d2, top_i = lax.fori_loop(0, num_tiles, body, init)

    out_d_ref[:, :] = jnp.pad(jnp.sqrt(top_d2), ((0, 0), (0, LANE - k)),
                              constant_values=INF)
    out_i_ref[:, :] = jnp.pad(top_i, ((0, 0), (0, LANE - k)))


def pair_pass_fits(m: int) -> bool:
    """True when the dense streaming kernel's auto tile picker can fit M
    columns under the scoped-VMEM model — callers composing the banded
    selector's lax.cond fallback must not TRACE the dense kernel past
    this (it raises), and switch to a widened-window banded fallback
    instead (physics/features.py)."""
    try:
        _pick_tiles(m, None, None)
        return True
    except ValueError:
        return False


def _pick_tiles(m: int, tile_n: Optional[int],
                tile_m: Optional[int]) -> Tuple[int, int]:
    """Wide column tiles amortize the k-pass merge (measured: (64, 12800)
    3.8 ms vs (256, 512) 28 ms at N = 12,685; after the lean-extraction
    rewrite (128, 12800) is the sweet spot at 3.4 ms vs 4.2 for 256);
    shrink rows until the scoped-VMEM model fits (wider rows always
    measured faster whenever they compile: 64 > 32 at M=25,600,
    32 > 16 at M=51,200)."""
    m_r = _round_up(max(m, LANE), LANE)
    if tile_m is None:
        tile_m = m_r
    if tile_n is None:
        # VMEM model: the (8, m_pad) column input is ONE resident block
        # (constant index map) costing 64·m_pad regardless of tile_m —
        # shrinking tile_m only shrinks the per-iteration work arrays
        # (8·tile_n·tile_m).  The 64 B/col input coefficient is the fitted
        # boundary from the tile_m == m_pad measurements.
        input_bytes = 64 * m_r

        def fits(tn, tm):
            return (9 * tn * tm + 32 * tm + input_bytes
                    <= VMEM_SCOPED_LIMIT)

        tile_n = 128
        while tile_n > 8 and not fits(tile_n, tile_m):
            tile_n //= 2
        # beyond M ≈ 128k even 8-row full-width tiles overflow: stream
        # narrower column tiles (input stays resident; work shrinks)
        while tile_m > LANE and not fits(tile_n, tile_m):
            tile_m = _round_up(tile_m // 2, LANE)
        if not fits(tile_n, tile_m):
            raise ValueError(
                f"pair pass with M={m} columns cannot fit VMEM on one core "
                f"(input block {input_bytes / 1e6:.1f} MB); shard the agent "
                "axis (parallel/agent_shard.py) or use the XLA path")
    return tile_n, tile_m


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
    objects: Optional[jax.Array] = None,
    same_objects: bool = True,
    tile_n: Optional[int] = None,
    tile_m: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k in-FOV neighbor (dist, idx) of ``position`` agents among
    ``objects`` (defaults to the agents themselves).

    position/heading: (N, 2); objects: (M, 2); returns (dist (N, k),
    idx (N, k)) with ascending distance, +inf beyond view/validity.
    """
    if objects is None:
        objects = position
        same_objects = True
    m_real = objects.shape[0]
    tile_n, tile_m = _pick_tiles(m_real, tile_n, tile_m)
    rows, n = pack_rows(position, heading, tile_n)
    cols, _ = pack_cols(objects, tile_m)
    n_pad = rows.shape[0]
    m_pad = cols.shape[1]
    cos_thr = math.cos(3.14 * angle_threshold / 180.0)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (n_pad // tile_n,)

    # sequential_vmap: batched calls lower to lax.map (no native batching
    # rule for the kernel; sequential is the right schedule at these sizes)
    @jax.custom_batching.sequential_vmap
    def _run(rows_, cols_):
        return pl.pallas_call(
            functools.partial(_kernel, tile_m=tile_m, cos_thr=cos_thr,
                              self_pairs=same_objects, k=k),
            interpret=interpret,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, m_pad), lambda i: (0, 0),
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
        )(rows_, cols_)

    out_d, out_i = _run(lax.stop_gradient(rows), lax.stop_gradient(cols))
    # ^ selection is non-differentiable and pallas_call has no JVP rule:
    # cutting the tape at the kernel inputs lets the selector compose with
    # grad (gradients flow through the gathered neighbor states, as with
    # lax.top_k selection + gather)
    k_eff = min(k, m_real)
    return out_d[:n, :k_eff], out_i[:n, :k_eff]
