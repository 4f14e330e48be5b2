"""Block Lanczos: f(A)·B for a block of right-hand sides, one shared space.

The reference iterates a single vector (``src/algorithms/mod.rs:167-212``);
:func:`slq.lanczos_pass_one_batched` already batches INDEPENDENT
recurrences. This module adds the genuinely coupled variant: one block
Krylov space K_k(A, B) = span{B, AB, …, A^{k−1}B} with B ∈ R^{n×p},

    A·V_j = V_{j−1}·B_{j−1}ᵀ + V_j·A_j + V_{j+1}·B_j

(V_j orthonormal n×p blocks; A_j symmetric p×p; B_j upper-triangular from
the QR of the residual block). What it buys over p independent runs:

* **clustered/degenerate spectra**: a block of width p resolves
  eigenvalue multiplicities ≤ p that a single-vector Krylov space is
  blind to — fewer block steps than the worst single-vector k;
* **MXU shape**: every update is an (n, p)×(p, p) or (p, n)×(n, p)
  matmul and the matvec runs on a whole block — tall-skinny matmuls are
  the TPU's native diet, vs p separate GEMV streams;
* **shared matvec stream**: sparse A is read once per block step for all
  p vectors.

TPU-first structure: the whole pass is one ``lax.scan``; the basis blocks
(k, n, p) live in the scan outputs; the p×p QR per step is
``jnp.linalg.qr`` (tiny, device-side). Breakdown = the residual block
dropping rank: detected via min |diag R| ≤ 1000·ε·‖·‖ (the library's
breakdown convention scaled to blocks) and handled the library way —
graceful truncation via a done flag (no in-jit exception), full-rank
steps only. Partial-rank deflation is out of scope (documented).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from two_pass_lanczos_tpu.algorithms.core import breakdown_tolerance
from two_pass_lanczos_tpu.operators import LinearOperator

__all__ = ["BlockDecomposition", "block_pass_one", "solve_fAb_block"]

FSpec = Union[str, Callable[[np.ndarray], np.ndarray]]


class BlockDecomposition(NamedTuple):
    """Block tridiagonal T_k and bookkeeping (fixed shapes, jit-safe).

    * ``a_blocks`` — (k, p, p) diagonal blocks A_j (symmetric), zeros
      beyond ``steps_taken``.
    * ``b_blocks`` — (k, p, p) sub-diagonal blocks B_j (upper-triangular;
      ``b_blocks[j]`` couples block j and j+1). ``b_blocks[steps-1]`` is
      the final residual R like the single-vector convention keeps β_k.
    * ``r0`` — (p, p) upper-triangular factor of the initial QR, B = V₁·r0
      (the block analogue of ‖b‖).
    * ``steps_taken`` — int32 scalar, number of full-rank block steps.
    """

    a_blocks: jax.Array
    b_blocks: jax.Array
    r0: jax.Array
    steps_taken: jax.Array


def _qr_pos(w):
    """Reduced QR with a POSITIVE diagonal of R — makes the factorization
    unique and the p = 1 case equal to the β > 0 normalization of the
    single-vector recurrence."""
    q, r = jnp.linalg.qr(w)
    sgn = jnp.sign(jnp.diagonal(r))
    sgn = jnp.where(sgn == 0, jnp.ones_like(sgn), sgn)
    return q * sgn[None, :], r * sgn[:, None]


def block_pass_one(matvec, b_block: jax.Array, k: int):
    """``k`` block recurrence steps as one ``lax.scan``.

    ``matvec`` maps (n,) → (n,) (vmapped internally over the block).
    Returns ``(BlockDecomposition, basis)`` with ``basis`` of shape
    (k, n, p), block row j = V_{j+1}, zeros beyond ``steps_taken``.
    A rank-deficient initial B (or zero B) yields ``steps_taken == 0``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if b_block.ndim != 2:
        raise ValueError(f"b_block must be (n, p), got shape {b_block.shape}")
    n, p = b_block.shape
    if p < 1 or p > n:
        raise ValueError(f"block width p={p} must be in [1, n={n}]")
    rdt = b_block.dtype
    if jnp.issubdtype(rdt, jnp.complexfloating):
        raise TypeError(
            "block_pass_one supports real symmetric operators only (the "
            "block projections use plain transposes); the single-vector "
            "paths are complex-Hermitian-generic")
    tol = breakdown_tolerance(rdt)

    def block_mv(v):  # (n, p) -> (n, p)
        return jax.vmap(matvec, in_axes=1, out_axes=1)(v)

    def rank_ok(r, ref_scale):
        # RELATIVE rank test: smallest QR diagonal vs the larger of the
        # factor's own scale and the reference scale. No absolute floor —
        # an ε-absolute cut would reject perfectly valid small-norm blocks
        # in f32/bf16 (the zero_tolerance rationale, core.py). A zero
        # block gives scale 0 and is rejected (min 0 > 0 is false).
        diag = jnp.abs(jnp.diagonal(r))
        scale = jnp.maximum(jnp.max(diag), ref_scale)
        return jnp.min(diag) > tol * scale

    v0, r0 = _qr_pos(b_block)
    ok0 = rank_ok(r0, jnp.zeros((), rdt))
    v0 = jnp.where(ok0, v0, jnp.zeros_like(v0))

    def step(carry, _):
        v_prev, v_curr, b_prev, done, steps = carry
        executed = jnp.logical_not(done)
        w = block_mv(v_curr)
        w = w - v_prev @ b_prev.T
        a_j = v_curr.T @ w
        a_j = 0.5 * (a_j + a_j.T)  # exact-symmetry of the Ritz block
        w = w - v_curr @ a_j
        # one CGS re-sweep against the two live blocks keeps local block
        # orthogonality at working precision (the block analogue of the
        # classical-correction; cheap: two p×p GEMMs)
        c_prev = v_prev.T @ w
        c_curr = v_curr.T @ w
        w = w - v_prev @ c_prev - v_curr @ c_curr
        a_j = a_j + 0.5 * (c_curr + c_curr.T)
        v_next, b_j = _qr_pos(w)
        full_rank = rank_ok(b_j, jnp.max(jnp.abs(jnp.diagonal(a_j))))
        advance = jnp.logical_and(executed, full_rank)

        a_out = jnp.where(executed, a_j, jnp.zeros_like(a_j))
        b_out = jnp.where(advance, b_j, jnp.zeros_like(b_j))
        v_out = jnp.where(executed, v_curr, jnp.zeros_like(v_curr))

        sel = advance
        carry = (
            jnp.where(sel, v_curr, v_prev),
            jnp.where(sel, v_next, v_curr),
            jnp.where(sel, b_j, b_prev),
            jnp.logical_or(done, jnp.logical_not(full_rank)),
            steps + executed.astype(jnp.int32),
        )
        return carry, (a_out, b_out, v_out)

    carry0 = (jnp.zeros_like(v0), v0, jnp.zeros((p, p), rdt),
              jnp.logical_not(ok0), jnp.zeros((), jnp.int32))
    carry, (a_blocks, b_blocks, basis) = jax.lax.scan(
        step, carry0, None, length=k)
    decomp = BlockDecomposition(
        a_blocks=a_blocks, b_blocks=b_blocks,
        r0=jnp.where(ok0, r0, jnp.zeros_like(r0)), steps_taken=carry[4])
    return decomp, basis


def _assemble_t(decomp: BlockDecomposition) -> np.ndarray:
    """Dense (s·p, s·p) block tridiagonal on the host (s = steps)."""
    s = int(decomp.steps_taken)
    p = decomp.r0.shape[0]
    a = np.asarray(decomp.a_blocks, np.float64)
    b = np.asarray(decomp.b_blocks, np.float64)
    t = np.zeros((s * p, s * p))
    for j in range(s):
        t[j * p:(j + 1) * p, j * p:(j + 1) * p] = a[j]
        if j + 1 < s:
            # A V_j = ... + V_{j+1} B_j  =>  T[j+1, j] block = B_j
            t[(j + 1) * p:(j + 2) * p, j * p:(j + 1) * p] = b[j]
            t[j * p:(j + 1) * p, (j + 1) * p:(j + 2) * p] = b[j].T
    return t


def solve_fAb_block(
    operator: LinearOperator, b_block, k: int, f: FSpec = "exp"
) -> jax.Array:
    """``f(A)·B`` for B of shape (n, p) from ONE block Krylov space:
    x = V_k · f(T_k) · E₁ · R₀ with E₁ the first block column.

    k block steps = k shared (block) matvecs for all p RHS — and, unlike
    the vmapped independent runs, multiplicity-p eigenvalue clusters are
    resolved. The projected f(T_k) is evaluated host-side in f64 via the
    dense eigendecomposition of the (s·p, s·p) block tridiagonal (s·p is
    small), the same division of labor as the host solvers. Zero or
    rank-deficient B returns zeros (the library's graceful convention).
    """
    from two_pass_lanczos_tpu.spectrum import _f_of_theta  # shared dispatch

    if not callable(f):
        _f_of_theta(np.ones(1), f)  # reject unknown strings before any work
    b_block = jnp.asarray(b_block)
    decomp, basis = block_pass_one(operator.matvec, b_block, k)
    s = int(decomp.steps_taken)
    if s == 0:
        return jnp.zeros_like(b_block)
    p = b_block.shape[1]
    t = _assemble_t(decomp)
    lam, q = np.linalg.eigh(t)
    flam = _f_of_theta(lam, f)
    e1 = np.zeros((s * p, p))
    e1[:p, :p] = np.eye(p)
    y = (q * flam) @ (q.T @ (e1 @ np.asarray(decomp.r0, np.float64)))
    y_dev = jnp.asarray(y.reshape(s, p, p), b_block.dtype)
    basis_valid = basis[:s]
    return jnp.einsum("knp,kpq->nq", basis_valid, y_dev)
