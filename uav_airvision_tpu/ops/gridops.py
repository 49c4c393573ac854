"""Grid bucketing and per-cell top-k selection with static shapes.

The reference buckets features into a 4x5 grid of Python lists and sorts each
cell (reference feature_initializer.py:65-85, feature_adder.py:66-108,
feature_pruner.py:8-19).  Here cells are just an int field on flat padded
arrays; per-cell ranking is one lexsort + segment-rank, and per-cell top-k of
a dense score map is a single reshape + top_k.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp


def smallest_k_indices(key, k: int):
    """Indices of the k smallest (key, index) pairs, ascending — bit-equal to
    ``jnp.argsort(key)[:k]`` (stable sort) for any int/float key.

    Same O(n^2) pairwise construction as rank_in_cell: at the n ~ a-few-
    hundred sizes used here, one fused (n, n) strict-order mask + row
    reduction beats a bitonic sort network's ~log^2(n) sequential passes by
    ~6x on v5e (scripts/exp_fe_cumulative.py)."""
    n = key.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    before = (key[:, None] < key[None, :]) | (
        (key[:, None] == key[None, :]) & (idx[:, None] < idx[None, :])
    )
    rank = jnp.sum(before.astype(jnp.int32), axis=0, dtype=jnp.int32)
    return jnp.zeros((k,), jnp.int32).at[
        jnp.where(rank < k, rank, k)
    ].set(idx, mode="drop")


def stable_compact_indices(mask, fill):
    """Indices where ``mask`` is True, ascending, padded with ``fill`` — equal
    to ``jnp.sort(jnp.where(mask, arange, fill))`` for fill >= n, without the
    sort (one cumsum + scatter)."""
    n = mask.shape[0]
    m32 = mask.astype(jnp.int32)
    rank = jnp.cumsum(m32, dtype=jnp.int32) - m32  # exclusive prefix: my compacted position
    return jnp.full((n,), fill, jnp.int32).at[
        jnp.where(mask, rank, n)
    ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")


def cell_of_points(pts, grid_row, grid_col, img_h, img_w):
    """Grid cell index of pixel points (reference get_grid_size +
    row*grid_col+col bucketing; int() truncation)."""
    grid_h = int(np.ceil(img_h / grid_row))
    grid_w = int(np.ceil(img_w / grid_col))
    row = jnp.floor(pts[..., 1] / grid_h).astype(jnp.int32)
    col = jnp.floor(pts[..., 0] / grid_w).astype(jnp.int32)
    return row * grid_col + col


def rank_in_cell(cell, primary_desc, arrival, valid, n_cells):
    """Stable per-cell rank: order within each cell by primary value
    descending, ties by ascending arrival (replicates Python's stable
    ``sorted(..., reverse=True)``).  Invalid entries rank last.

    Returns (rank, order) where order is the global sorted permutation
    (cell-major) and rank is each element's position within its cell.

    Implemented as an O(n^2) pairwise comparison (n ~ 200 here) instead of a
    lexsort: a bitonic sort network is ~log^2(n) sequential tiny passes on
    TPU while the (n, n) strict-order mask is one fused VPU kernel + a row
    reduction — measured ~6x cheaper for the frontend's grid stage
    (scripts/exp_fe_cumulative.py).  The final index tie-break makes the
    order strict and total, matching a stable lexsort bit-for-bit.
    """
    n = cell.shape[0]
    bc = jnp.where(valid, cell, n_cells)
    idx = jnp.arange(n, dtype=jnp.int32)
    # before[j, i]: element j sorts strictly before element i under
    # (bc asc, primary desc, arrival asc, index asc).
    cj, ci = bc[:, None], bc[None, :]
    pj, pi = primary_desc[:, None], primary_desc[None, :]
    aj, ai = arrival[:, None], arrival[None, :]
    tie_pa = (pj == pi) & ((aj < ai) | ((aj == ai) & (idx[:, None] < idx[None, :])))
    in_cell_before = (pj > pi) | tie_pa
    same = cj == ci
    before = (cj < ci) | (same & in_cell_before)
    grank = jnp.sum(before.astype(jnp.int32), axis=0, dtype=jnp.int32)
    rank = jnp.sum((same & in_cell_before).astype(jnp.int32), axis=0, dtype=jnp.int32)
    perm = jnp.zeros((n,), jnp.int32).at[grank].set(idx)
    return rank, perm


def kept_order_stats(perm, keep, cell, valid, n_cells):
    """Derive every downstream ordering of a kept subset from ONE sort.

    ``perm`` is the stable cell-major permutation returned by
    ``rank_in_cell(cell, ..., valid, n_cells)`` and ``keep`` a boolean subset
    of the entries it ranked (keep implies valid).  A stable sort preserves
    the relative order of any subset whose keys are unchanged, so re-sorting
    with keep-validity (what the reference's per-cell Python loops do) yields
    the kept entries in exactly the order they already appear in ``perm`` —
    no second sort needed.  Returns

      global_rank : (N,) int32 — rank among ALL kept entries, cell-major
                    (== the id-assignment order), valid where ``keep``
      cell_rank   : (N,) int32 — rank among kept entries of the same cell,
                    valid where ``keep``
      n_kept      : () int32

    Replaces the reference's per-cell ``sorted(...)`` + enumerate loops
    (feature_adder.py:66-108, feature_pruner.py:8-19) at one sort per stage
    instead of the three a direct transcription costs.
    """
    n = perm.shape[0]
    # pos = inverse permutation: element e's position in the sorted order.
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    # Pairwise instead of gather+cumsum over the sorted order (see
    # rank_in_cell): kept-rank of i = #{kept j sorting before i}.
    before = pos[:, None] < pos[None, :]
    kept_before = keep[:, None] & before
    global_rank = jnp.sum(kept_before.astype(jnp.int32), axis=0, dtype=jnp.int32)
    big_cell = jnp.where(valid, cell, n_cells)
    same = big_cell[:, None] == big_cell[None, :]
    cell_rank = jnp.sum((kept_before & same).astype(jnp.int32), axis=0, dtype=jnp.int32)
    zero = jnp.zeros((n,), jnp.int32)
    global_rank = jnp.where(keep, global_rank, zero)
    cell_rank = jnp.where(keep, cell_rank, zero)
    return global_rank, cell_rank, jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)


def compact_kept(perm, keep, n_slots):
    """Scatter the kept entries (in their ``perm`` order) into the first
    slots of an ``n_slots`` table: returns (sel (n_slots,) int32 source
    indices, selm (n_slots,) bool).  Equivalent to ``perm_keep[:n_slots]``
    of a second keep-validity sort (see kept_order_stats), without the sort;
    requires n_kept <= n_slots (per-cell caps guarantee it at call sites).
    """
    n = perm.shape[0]
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    kept_rank = jnp.sum((keep[:, None] & (pos[:, None] < pos[None, :]))
                        .astype(jnp.int32), axis=0, dtype=jnp.int32)
    target = jnp.where(keep, kept_rank, n_slots)  # n_slots -> dropped
    sel = jnp.zeros((n_slots,), jnp.int32).at[target].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    selm = jnp.arange(n_slots) < jnp.sum(keep.astype(jnp.int32), dtype=jnp.int32)
    return sel, selm


def dense_grid_topk(score, grid_row, grid_col, k):
    """Top-k scoring pixels per grid cell from a dense (H, W) score map.

    Returns (ys, xs, vals) each (grid_row*grid_col, k); vals <= 0 entries are
    empty slots.
    """
    H, W = score.shape
    cell_h = int(np.ceil(H / grid_row))
    cell_w = int(np.ceil(W / grid_col))
    ph, pw = cell_h * grid_row, cell_w * grid_col
    padded = jnp.full((ph, pw), jnp.asarray(-1, score.dtype)).at[:H, :W].set(score)
    cells = (
        padded.reshape(grid_row, cell_h, grid_col, cell_w)
        .transpose(0, 2, 1, 3)
        .reshape(grid_row * grid_col, cell_h * cell_w)
    )
    # Exact top-k as k sequential argmax passes: argmax returns the FIRST
    # maximum, so ordering is (value desc, flat index asc) — identical to a
    # full sort's tie-break, and row-major flat order equals pixel order.
    # Each pass is one VPU max-reduction + a one-element suppression; for the
    # k<=8 used here this measures ~1.6x cheaper than chunked lax.top_k
    # (which sorts) on v5e, bit-identical outputs (scripts/exp_topk.py).
    n_cells, cell_sz = cells.shape
    neg = (jnp.iinfo(jnp.int32).min if cells.dtype == jnp.int32 else -jnp.inf)
    idxs, vals = [], []
    work = cells
    for _ in range(k):
        i = jnp.argmax(work, axis=1).astype(jnp.int32)
        v = jnp.take_along_axis(work, i[:, None], axis=1)[:, 0]
        work = work.at[jnp.arange(n_cells), i].set(neg)
        idxs.append(i)
        vals.append(v)
    idx = jnp.stack(idxs, axis=1)
    vals = jnp.stack(vals, axis=1)
    cy = idx // cell_w
    cx = idx % cell_w
    gr = jnp.arange(grid_row * grid_col, dtype=jnp.int32) // grid_col
    gc = jnp.arange(grid_row * grid_col, dtype=jnp.int32) % grid_col
    ys = gr[:, None] * cell_h + cy
    xs = gc[:, None] * cell_w + cx
    return ys, xs, vals

