"""Observability: iteration callbacks, profiling, speed-of-light accounting.

Reference parity and TPU adaptation:

* **Per-iteration callback** — the reference invokes a ``LanczosCallback``
  with ``(k, V_k view, T_k view)`` inside the hot loop with early-stop
  (``src/algorithms/mod.rs:69-86``, ``lanczos.rs:93-106``). A Python callback
  inside a compiled ``lax.scan`` would force a host sync per step, so the
  equivalent here is **post-hoc replay**: :func:`replay_iterations` feeds the
  callback the same ``(k, V_k, T_k)`` views reconstructed from the scan
  outputs at zero extra device compute, and :func:`find_stopping_point`
  returns the step where the callback would have stopped (usable to truncate
  the decomposition before the projected solve and pass two — which is
  exactly the effect early stopping has in the reference).
* **Profiling** — ``jax.profiler`` trace contexts replacing the reference's
  ``Instant``-based timing (``tradeoff.rs:267-287``).
* **Speed-of-light model** — the per-matvec byte/flop accounting demanded by
  BASELINE.json's metric: achieved nnz/s against the HBM-bandwidth bound.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Callable, Optional

import numpy as np

from two_pass_lanczos_tpu.algorithms.core import LanczosDecomposition

__all__ = [
    "replay_iterations",
    "find_stopping_point",
    "truncate_decomposition",
    "trace",
    "SoLReport",
    "kkt_spmv_sol",
    "kkt_streaming_sol",
]


def replay_iterations(
    decomposition: LanczosDecomposition,
    callback: Callable,
    basis: Optional[np.ndarray] = None,
) -> int:
    """Invoke ``callback(k, v_k, (alphas, betas))`` for k = 1..steps_taken.

    ``v_k`` is the (k, n) basis prefix if ``basis`` was captured (one-pass),
    else None. Returns the number of iterations visited: the callback returns
    False to stop early, mirroring the reference's contract.
    """
    steps = decomposition.steps()
    alphas = decomposition.alphas_valid()
    betas = decomposition.betas_valid()
    b_np = np.asarray(basis) if basis is not None else None
    visited = 0
    for k in range(1, steps + 1):
        visited = k
        v_view = b_np[:k] if b_np is not None else None
        if not callback(k, v_view, (alphas[:k], betas[: max(k - 1, 0)])):
            break
    return visited


def find_stopping_point(decomposition: LanczosDecomposition, callback: Callable) -> int:
    """Steps after which the callback would have stopped the iteration."""
    return replay_iterations(decomposition, callback)


def truncate_decomposition(
    decomposition: LanczosDecomposition, steps: int
) -> LanczosDecomposition:
    """Truncate to ``steps`` iterations (early-stop semantics): padding
    zeroed, ``steps_taken`` clamped. Shapes stay static."""
    import jax.numpy as jnp

    k = decomposition.k_max
    steps = int(min(steps, decomposition.steps()))
    i = jnp.arange(k)
    return LanczosDecomposition(
        alphas=jnp.where(i < steps, decomposition.alphas, 0),
        betas=jnp.where(i < steps - 1, decomposition.betas, 0),
        steps_taken=jnp.asarray(steps, jnp.int32),
        b_norm=decomposition.b_norm,
    )


@contextlib.contextmanager
def trace(name: str, enabled: bool = True):
    """``jax.profiler.TraceAnnotation`` context (no-op when disabled)."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


# ---------------------------------------------------------------------------
# Speed-of-light accounting
# ---------------------------------------------------------------------------

#: HBM bandwidth per chip, bytes/s (TPU v5e spec: 819 GB/s).
HBM_BW = {"tpu": 819e9, "cpu": 100e9}


@dataclasses.dataclass
class SoLReport:
    nnz: int
    bytes_per_matvec: int
    sol_seconds: float
    achieved_seconds: float

    @property
    def sol_fraction(self) -> float:
        return self.sol_seconds / self.achieved_seconds

    @property
    def achieved_nnz_per_s(self) -> float:
        return self.nnz / self.achieved_seconds

    def __str__(self):
        return (
            f"SpMV: {self.nnz} nnz, {self.bytes_per_matvec / 1e6:.1f} MB/matvec, "
            f"SoL {self.sol_seconds * 1e6:.1f} us, achieved "
            f"{self.achieved_seconds * 1e6:.1f} us "
            f"({self.sol_fraction:.1%} of speed of light, "
            f"{self.achieved_nnz_per_s / 1e9:.2f} Gnnz/s)"
        )


def kkt_spmv_sol(
    num_arcs: int,
    num_nodes: int,
    achieved_seconds: float,
    dtype_bytes: int = 4,
    backend: str = "tpu",
) -> SoLReport:
    """*Ideal-layout* speed-of-light bound for the structure-aware KKT matvec.

    Minimum HBM traffic any single-ordering layout could achieve: the five
    per-arc streams (u, v int32 reads = 4B·2; d, x_a reads + y_a write =
    value bytes·3) plus the node vector in/out (negligible). This is the
    information-theoretic floor — the production dual-sorted layout must
    move ~2.1× more (see :func:`kkt_streaming_sol`), the price of turning
    scatters into contiguous segmented sums.
    """
    per_arc = 2 * 4 + 3 * dtype_bytes  # u, v int32 + d, x_a, y_a values
    bytes_total = num_arcs * per_arc + 2 * num_nodes * dtype_bytes
    bw = HBM_BW.get(backend, 819e9)
    nnz = 5 * num_arcs
    return SoLReport(
        nnz=nnz,
        bytes_per_matvec=bytes_total,
        sol_seconds=bytes_total / bw,
        achieved_seconds=achieved_seconds,
    )


def kkt_streaming_sol(layout, achieved_seconds: float,
                      backend: str = "tpu") -> SoLReport:
    """Speed-of-light bound for the **dual-sorted streaming matvec**
    (``ops/kkt_fused.kkt_streaming_matvec``) — the BASELINE.md per-chip
    metric applies to this path (used beyond ~1.9M arcs and inside
    ``ShardedFusedKKTSolver``).

    Exact HBM traffic per matvec, from the kernel's BlockSpecs: per ordering
    the grid streams the d (f32), es and eo (int16 when every endpoint
    fits — the round-3 compressed layout), x read and y write planes, plus
    the (C, 128, 4) i32 group table; the node table (P2, 128) is read once
    and the node output written once (constant index maps — Pallas keeps
    the block resident across the sequential grid). R counts *padded*
    slots: the per-node 128-lane run padding is part of the layout's real
    traffic, not overhead we get to ignore.

    ``layout`` is a ``SortedKKTLayout``.
    """
    lane = 128
    bytes_total = 0
    for o in (layout.u, layout.v):
        bytes_total += 3 * o.R * lane * 4  # d2, x, y
        bytes_total += o.R * lane * o.es2.dtype.itemsize  # es2 (i16/i32)
        bytes_total += o.R * lane * o.eo2.dtype.itemsize  # eo2 (i16/i32)
        bytes_total += o.C * lane * 4 * 4  # gn3 (4 channels)
        bytes_total += o.C * 4  # win (SMEM)
    bytes_total += 2 * layout.P2 * lane * 4  # xn read + yn write
    bw = HBM_BW.get(backend, 819e9)
    return SoLReport(
        nnz=5 * layout.m,
        bytes_per_matvec=bytes_total,
        sol_seconds=bytes_total / bw,
        achieved_seconds=achieved_seconds,
    )
