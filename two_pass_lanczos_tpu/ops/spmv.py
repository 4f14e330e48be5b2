"""Sparse matrix–vector products, designed for TPU/XLA.

The reference library delegates its SpMV to faer's native sparse kernels
(reference ``src/algorithms/mod.rs:177`` — ``operator.apply``). On TPU the
equivalent high-performance primitive is an XLA gather + sorted segment-sum
(this module) with an optional Pallas kernel (``spmv_pallas.py``) for the hot
path.

Layout decisions (TPU-first):

* **SortedCOO**: nonzeros sorted by row, stored as three flat arrays
  ``(rows, cols, vals)`` padded to a lane-aligned length. Sorted rows make the
  segment-sum monotonic (``indices_are_sorted=True``), which XLA lowers to a
  fast scan-free reduction on TPU; padding keeps shapes static under ``jit``.
* **Structure-aware KKT matvec**: the KKT matrix ``A = [[D, Eᵀ], [E, 0]]``
  (reference ``src/utils/data_loader.rs:211-258``) is never materialized:
  ``E`` is a node–arc incidence matrix with exactly one ``+1`` (row ``u_j``)
  and one ``-1`` (row ``v_j``) per column, so ``A·x`` reduces to two gathers
  and two scatter-adds — ~5 memory ops per arc versus 15+ for generic CSR.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SortedCOO", "csr_from_triplets", "coo_spmv", "kkt_matvec"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SortedCOO:
    """Row-sorted COO sparse matrix with static (padded) nnz.

    Padding entries carry ``row = col = 0`` and ``val = 0`` so they contribute
    nothing to the product while keeping every shape static for XLA.
    """

    rows: jax.Array  # int32 (nnz_padded,)
    cols: jax.Array  # int32 (nnz_padded,)
    vals: jax.Array  # dtype (nnz_padded,)
    shape: Tuple[int, int]
    nnz: int  # true number of nonzeros (excludes padding)

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        rows, cols, vals = children
        shape, nnz = aux
        return cls(rows=rows, cols=cols, vals=vals, shape=shape, nnz=nnz)

    @property
    def dtype(self):
        return self.vals.dtype

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, dtype=self.vals.dtype)
        return out.at[self.rows, self.cols].add(self.vals)


def csr_from_triplets(
    n_rows: int,
    n_cols: int,
    rows,
    cols,
    vals,
    dtype=None,
    pad_to: int = 512,
    sum_duplicates: bool = True,
) -> SortedCOO:
    """Build a :class:`SortedCOO` from triplets (host-side, NumPy).

    Duplicate ``(row, col)`` entries are summed, matching the semantics of
    faer's ``try_new_from_triplets`` used by the reference loader
    (``src/utils/data_loader.rs:150-152``).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    if dtype is not None:
        vals = vals.astype(dtype)
    if rows.shape != cols.shape or rows.shape != vals.shape:
        raise ValueError("rows/cols/vals must have identical shapes")
    if rows.size and (rows.min() < 0 or rows.max() >= n_rows):
        raise ValueError("row index out of bounds")
    if cols.size and (cols.min() < 0 or cols.max() >= n_cols):
        raise ValueError("col index out of bounds")

    if sum_duplicates and rows.size:
        # Collapse duplicates by linear index, preserving exact summation on host.
        lin = rows * np.int64(n_cols) + cols
        order = np.argsort(lin, kind="stable")
        lin_s = lin[order]
        vals_s = vals[order]
        uniq, start = np.unique(lin_s, return_index=True)
        summed = np.add.reduceat(vals_s, start) if vals_s.size else vals_s
        rows = (uniq // n_cols).astype(np.int64)
        cols = (uniq % n_cols).astype(np.int64)
        vals = summed
    else:
        order = np.argsort(rows, kind="stable")
        rows, cols, vals = rows[order], cols[order], vals[order]

    nnz = int(rows.size)
    padded = max(_round_up(max(nnz, 1), pad_to), pad_to)
    # pad entries target the LAST row (value 0): the tail must keep `rows`
    # ascending because coo_spmv promises indices_are_sorted=True
    pr = np.full(padded, n_rows - 1, dtype=np.int32)
    pc = np.zeros(padded, dtype=np.int32)
    pv = np.zeros(padded, dtype=vals.dtype if vals.size else np.float64)
    pr[:nnz] = rows
    pc[:nnz] = cols
    pv[:nnz] = vals
    return SortedCOO(
        rows=jnp.asarray(pr),
        cols=jnp.asarray(pc),
        vals=jnp.asarray(pv),
        shape=(int(n_rows), int(n_cols)),
        nnz=nnz,
    )


def coo_spmv(a: SortedCOO, x: jax.Array) -> jax.Array:
    """``y = A @ x`` for a row-sorted COO matrix.

    Gather–multiply–scatter-add formulation. Indices are validated at
    construction, so both memory ops use ``mode='promise_in_bounds'`` — on
    TPU the default out-of-bounds-safe lowering falls off a performance
    cliff (~600x) whenever the gather/scatter sits inside a loop body or
    consumes non-parameter operands, which is exactly where SpMV lives
    (the ``lax.scan`` recurrence).
    """
    gathered = a.vals * x.at[a.cols].get(mode="promise_in_bounds")
    y = jnp.zeros((a.shape[0],), dtype=x.dtype)
    y = y.at[a.rows].add(
        gathered.astype(x.dtype), mode="promise_in_bounds", indices_are_sorted=True
    )
    return y


def kkt_matvec(
    d: jax.Array,
    arc_u: jax.Array,
    arc_v: jax.Array,
    num_nodes: int,
    x: jax.Array,
) -> jax.Array:
    """Structure-aware matvec for the KKT matrix ``A = [[D, Eᵀ], [E, 0]]``.

    ``x = [x_a (num_arcs), x_n (num_nodes)]`` with the arc block first,
    matching the reference assembly (``src/utils/data_loader.rs:222-249``:
    D occupies rows/cols ``0..m``, E rows are shifted by ``num_arcs``).

    * top block:    ``y_a = d ⊙ x_a + x_n[u] − x_n[v]``    (D·x_a + Eᵀ·x_n)
    * bottom block: ``y_n = scatter_add(+x_a → u, −x_a → v)``  (E·x_a)

    ``arc_u``/``arc_v`` are the 0-based tail/head node indices per arc;
    the incidence convention is ``E[u_j, j] = +1``, ``E[v_j, j] = -1``
    (reference ``src/utils/data_loader.rs:120-133``).
    """
    m = d.shape[0]
    x_a = x[:m]
    x_n = x[m:]
    # promise_in_bounds everywhere: endpoints are validated at load time, and
    # the default bounds-checked lowering is ~600x slower on TPU inside the
    # scan loop this matvec runs in.
    y_a = (
        d * x_a
        + x_n.at[arc_u].get(mode="promise_in_bounds")
        - x_n.at[arc_v].get(mode="promise_in_bounds")
    )
    y_n = jnp.zeros((num_nodes,), dtype=x.dtype)
    y_n = y_n.at[arc_u].add(x_a, mode="promise_in_bounds")
    y_n = y_n.at[arc_v].add(-x_a, mode="promise_in_bounds")
    return jnp.concatenate([y_a, y_n])
