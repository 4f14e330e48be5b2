"""Matrix-free linear operators.

The reference's central abstraction is faer's ``matrix_free::LinOp`` — every
algorithm takes an operator defined only by its action (reference
``src/lib.rs:8-9``, ``src/algorithms/mod.rs:30``). The TPU-native equivalent
is a *pytree-registered callable*: a small dataclass carrying device arrays,
whose ``matvec`` is pure jnp and therefore traceable under ``jax.jit`` /
``lax.scan`` / ``shard_map``. Operators can be passed as jit arguments (they
flatten into their arrays) or closed over — both compile to the same HLO.

Implementations:

* :class:`DenseOperator`    — dense symmetric A, MXU matvec.
* :class:`DiagonalOperator` — diagonal A (stability/orthogonality scenarios).
* :class:`SparseOperator`   — generic sparse A in sorted-COO layout.
* :class:`KKTOperator`      — structure-aware ``[[D, Eᵀ], [E, 0]]`` operator.
* :class:`CallableOperator` — wraps any jit-compatible ``matvec`` closure.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from two_pass_lanczos_tpu.ops.spmv import SortedCOO, coo_spmv, kkt_matvec

__all__ = [
    "LinearOperator",
    "DenseOperator",
    "DiagonalOperator",
    "SparseOperator",
    "KKTOperator",
    "CallableOperator",
    "as_operator",
]


class LinearOperator:
    """Protocol: anything with ``.shape``, ``.dtype`` and ``.matvec(x)``."""

    shape: Tuple[int, int]

    def matvec(self, x: jax.Array) -> jax.Array:  # pragma: no cover
        raise NotImplementedError

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.matvec(x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DenseOperator(LinearOperator):
    """Dense (symmetric/Hermitian) operator; matvec runs on the MXU."""

    a: jax.Array

    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(a=children[0])

    @property
    def shape(self):
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def matvec(self, x):
        return self.a @ x


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiagonalOperator(LinearOperator):
    """Diagonal operator; used by the synthetic spectrum scenarios
    (reference ``src/bin/stability.rs:98-157``)."""

    diag: jax.Array

    def tree_flatten(self):
        return (self.diag,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(diag=children[0])

    @property
    def shape(self):
        n = self.diag.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self.diag.dtype

    def matvec(self, x):
        return self.diag * x


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SparseOperator(LinearOperator):
    """Generic sparse operator over a row-sorted COO matrix."""

    mat: SortedCOO

    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(mat=children[0])

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype

    def matvec(self, x):
        return coo_spmv(self.mat, x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class KKTOperator(LinearOperator):
    """Structure-aware KKT operator ``A = [[D, Eᵀ], [E, 0]]``.

    Never materializes A: holds the diagonal ``d`` of D (quadratic arc costs)
    and the arc endpoint index arrays of the incidence matrix E. Matches the
    block layout assembled by the reference loader
    (``src/utils/data_loader.rs:211-258``): arc block first, node block after.
    """

    d: jax.Array  # (num_arcs,) quadratic costs
    arc_u: jax.Array  # (num_arcs,) int32 tail nodes (E[u,j] = +1)
    arc_v: jax.Array  # (num_arcs,) int32 head nodes (E[v,j] = -1)
    num_nodes: int

    def tree_flatten(self):
        return (self.d, self.arc_u, self.arc_v), (self.num_nodes,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        d, arc_u, arc_v = children
        return cls(d=d, arc_u=arc_u, arc_v=arc_v, num_nodes=aux[0])

    @property
    def num_arcs(self):
        return self.d.shape[0]

    @property
    def shape(self):
        n = self.d.shape[0] + self.num_nodes
        return (n, n)

    @property
    def dtype(self):
        return self.d.dtype

    @property
    def nnz(self):
        # D has m entries, E and Eᵀ have 2m each.
        return 5 * self.d.shape[0]

    def matvec(self, x):
        return kkt_matvec(self.d, self.arc_u, self.arc_v, self.num_nodes, x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CallableOperator(LinearOperator):
    """Wraps an arbitrary jit-compatible ``matvec`` closure.

    The closure is static (part of the pytree structure); any arrays it needs
    must be captured at trace time.
    """

    fn: Callable[[jax.Array], jax.Array]
    n: int
    _dtype: object = jnp.float64

    def tree_flatten(self):
        return (), (self.fn, self.n, self._dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        fn, n, dtype = aux
        return cls(fn=fn, n=n, _dtype=dtype)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self._dtype

    def matvec(self, x):
        return self.fn(x)


def as_operator(a) -> LinearOperator:
    """Coerce an array / SortedCOO / callable-with-shape to a LinearOperator."""
    if isinstance(a, LinearOperator):
        return a
    if isinstance(a, SortedCOO):
        return SparseOperator(a)
    arr = jnp.asarray(a)
    if arr.ndim == 2:
        return DenseOperator(arr)
    if arr.ndim == 1:
        return DiagonalOperator(arr)
    raise TypeError(f"cannot interpret {type(a)!r} as a linear operator")
