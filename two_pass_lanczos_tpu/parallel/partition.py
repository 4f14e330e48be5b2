"""Row partitioning of sparse operators across a device mesh.

The KKT matrix is pathologically unbalanced for naive contiguous row splits:
arc rows carry exactly 3 nonzeros while node rows carry the node degree
(~2·arcs/nodes, i.e. hundreds); a contiguous split hands one device nearly
half the nnz. Since the Lanczos iteration is invariant under a symmetric
permutation ``P·A·Pᵀ`` (solve with ``P·b``, unpermute the result), we balance
by *permuting rows* so each equal-size vector shard carries near-equal nnz:

* sort rows by nnz descending,
* deal them to devices in serpentine (snake) order — the classic LPT-style
  balance guarantee with exactly equal row counts per device,
* sort each device's rows ascending (gather locality), and concatenate into
  the global permutation.

This keeps the *vector* sharding uniform (what ``shard_map`` needs) while the
*work* sharding is balanced (what the SpMV needs).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["RowPartition", "snake_partition", "build_local_blocks_split"]


class RowPartition(NamedTuple):
    """A symmetric-permutation row partition.

    ``perm[i]`` is the original row index placed at permuted position ``i``;
    positions ``[d·rows_per : (d+1)·rows_per)`` live on device ``d``.
    ``n_orig ≤ n_pad = ndev · rows_per`` (phantom zero rows pad the tail).
    """

    perm: np.ndarray  # (n_pad,) int64
    inv_perm: np.ndarray  # (n_pad,) int64
    rows_per: int
    ndev: int
    n_orig: int
    nnz_per_dev: np.ndarray  # (ndev,) int64 — diagnostics

    @property
    def n_pad(self) -> int:
        return self.rows_per * self.ndev


def snake_partition(nnz_per_row: np.ndarray, ndev: int) -> RowPartition:
    """Balance rows over ``ndev`` devices by serpentine dealing."""
    n_orig = int(nnz_per_row.shape[0])
    rows_per = -(-n_orig // ndev)
    n_pad = rows_per * ndev
    counts = np.zeros(n_pad, dtype=np.int64)
    counts[:n_orig] = nnz_per_row
    order = np.argsort(-counts, kind="stable")

    bins = np.empty((ndev, rows_per), dtype=np.int64)
    for idx in range(n_pad):
        rnd, pos = divmod(idx, ndev)
        dev = pos if rnd % 2 == 0 else ndev - 1 - pos
        bins[dev, rnd] = order[idx]
    bins.sort(axis=1)  # ascending original ids within each device

    perm = bins.reshape(-1)
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(n_pad)
    nnz_per_dev = counts[bins].sum(axis=1)
    return RowPartition(
        perm=perm,
        inv_perm=inv_perm,
        rows_per=rows_per,
        ndev=ndev,
        n_orig=n_orig,
        nnz_per_dev=nnz_per_dev,
    )


def build_local_blocks_split(rows, cols, vals, part: RowPartition,
                             pad_multiple: int = 128):
    """Per-device local blocks split into OWNED-column and REMOTE-column
    parts (SURVEY §7 stage 5: halo exchange *overlapped with* the
    diagonal-block SpMV).

    The owned part touches only columns this device's vector shard already
    holds, so it is data-independent of the ``all_gather`` — XLA's
    latency-hiding scheduler can run the collective concurrently with it,
    and the remote part applies once the gathered vector lands.

    Returns two triples of ``(ndev, ·)`` stacked arrays:

    * owned: ``(lr, lc_local, lv)`` with ``lc_local`` indexing the *local*
      shard (0..rows_per-1);
    * remote: ``(lr, lc_global, lv)`` with ``lc_global`` indexing the
      all-gathered vector.

    Both keep local rows ascending (the scatter-add in the sharded matvec
    promises ``indices_are_sorted=True``) and pad with the last local row /
    col 0 / val 0.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    pos_r = part.inv_perm[rows]
    pos_c = part.inv_perm[cols]
    dev = pos_r // part.rows_per
    lrow = pos_r - dev * part.rows_per
    owned = (pos_c // part.rows_per) == dev

    order = np.lexsort((lrow, dev))
    dev, lrow, pos_c, vals, owned = (
        dev[order], lrow[order], pos_c[order], vals[order], owned[order])

    def pack(mask, local_cols: bool):
        d_m, lrow_m, pos_m, val_m = dev[mask], lrow[mask], pos_c[mask], vals[mask]
        counts = np.bincount(d_m, minlength=part.ndev)
        mx = int(counts.max()) if counts.size else 0
        mx = max(((mx + pad_multiple - 1) // pad_multiple) * pad_multiple,
                 pad_multiple)
        lr = np.full((part.ndev, mx), part.rows_per - 1, dtype=np.int32)
        lc = np.zeros((part.ndev, mx), dtype=np.int32)
        lv = np.zeros((part.ndev, mx), dtype=vals.dtype)
        starts = np.concatenate([[0], np.cumsum(counts)])
        cvals = (pos_m - d_m * part.rows_per) if local_cols else pos_m
        for d in range(part.ndev):
            s, e = starts[d], starts[d + 1]
            c = e - s
            lr[d, :c] = lrow_m[s:e]
            lc[d, :c] = cvals[s:e]
            lv[d, :c] = val_m[s:e]
        return lr, lc, lv

    return pack(owned, True), pack(~owned, False)
