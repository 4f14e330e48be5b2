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
    "PallasKKTOperator",
    "make_kkt_operator",
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
class PallasKKTOperator(LinearOperator):
    """KKT operator whose matvec is the fused Pallas TPU kernel.

    Same mathematical object as :class:`KKTOperator` but with arrays
    pre-padded for the kernel's static block geometry (see
    ``ops/spmv_pallas.py``). Use :func:`make_kkt_operator` with
    ``backend='auto'`` to pick this on TPU and the XLA path elsewhere.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    correctness testing).
    """

    d_pad: jax.Array
    u_pad: jax.Array
    v_pad: jax.Array
    num_arcs: int
    num_nodes: int
    interpret: bool = False

    def tree_flatten(self):
        return (self.d_pad, self.u_pad, self.v_pad), (
            self.num_arcs,
            self.num_nodes,
            self.interpret,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        d_pad, u_pad, v_pad = children
        return cls(d_pad=d_pad, u_pad=u_pad, v_pad=v_pad, num_arcs=aux[0],
                   num_nodes=aux[1], interpret=aux[2])

    @classmethod
    def build(cls, quad_costs, arc_u, arc_v, num_nodes, dtype=jnp.float32,
              interpret: bool = False):
        from two_pass_lanczos_tpu.ops.spmv_pallas import pad_kkt_for_pallas

        import numpy as np

        d, u, v, _, _ = pad_kkt_for_pallas(
            np.asarray(quad_costs), np.asarray(arc_u), np.asarray(arc_v),
            int(num_nodes), dtype=np.dtype(dtype),
        )
        return cls(
            d_pad=jnp.asarray(d), u_pad=jnp.asarray(u), v_pad=jnp.asarray(v),
            num_arcs=len(np.asarray(quad_costs)), num_nodes=int(num_nodes),
            interpret=interpret,
        )

    @property
    def shape(self):
        n = self.num_arcs + self.num_nodes
        return (n, n)

    @property
    def dtype(self):
        return self.d_pad.dtype

    @property
    def nnz(self):
        return 5 * self.num_arcs

    def matvec(self, x):
        from two_pass_lanczos_tpu.ops.spmv_pallas import kkt_matvec_pallas

        return kkt_matvec_pallas(
            self.d_pad, self.u_pad, self.v_pad, self.num_arcs, self.num_nodes,
            x, interpret=self.interpret,
        )


def make_kkt_operator(quad_costs, arc_u, arc_v, num_nodes, dtype=None,
                      backend: str = "auto") -> LinearOperator:
    """KKT operator factory: ``backend`` ∈ {'auto', 'xla', 'pallas'}.

    'auto' selects the Pallas kernel on TPU (f32) and the XLA gather/scatter
    path elsewhere (where XLA's lowering is fine and f64 is available).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        return PallasKKTOperator.build(
            quad_costs, arc_u, arc_v, num_nodes, dtype=dtype or jnp.float32
        )
    if backend == "xla":
        return KKTOperator(
            d=jnp.asarray(quad_costs, dtype=dtype),
            arc_u=jnp.asarray(arc_u, dtype=jnp.int32),
            arc_v=jnp.asarray(arc_v, dtype=jnp.int32),
            num_nodes=int(num_nodes),
        )
    raise ValueError(f"unknown backend {backend!r}")


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
