"""Property-test runners: the reference's four-property correctness harness.

The reference code-generates one test per (data instance × property) at build
time (``build.rs:53-110``, runners at ``src/algorithms/mod.rs:434-587``). Here
the runners are a public library module — usable from pytest (see
``tests/test_properties.py``), from the CLI, or against any user operator —
with the same four properties at the same tolerances (k=30, tol 5e-9, seeded
b — ``mod.rs:360``):

1. **decomposition consistency** — one-pass and two-pass pass-one produce
   elementwise-identical (α, β) sequences (``mod.rs:434-482``);
2. **Lanczos relation** — ``‖(A·V_k − V_k·T_k) − β_k·v_{k+1}·e_kᵀ‖_F < tol``
   (``mod.rs:486-529``);
3. **orthonormality** — ``‖I − V_kᴴ·V_k‖_F < tol`` (``mod.rs:532-554``);
4. **reconstruction stability** — ``‖V_k − V′_k‖_F² < tol`` with V′ the
   pass-two regenerated basis (``mod.rs:558-587``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

import two_pass_lanczos_tpu as tpl
from two_pass_lanczos_tpu.ops.tridiag import assemble_tridiagonal

__all__ = [
    "PropertyReport",
    "seeded_b",
    "check_decomposition_consistency",
    "check_lanczos_relation",
    "check_orthonormality",
    "check_reconstruction_stability",
    "run_all_properties",
    "DEFAULT_K",
    "DEFAULT_TOL",
]

DEFAULT_K = 30
DEFAULT_TOL = 5e-9


class PropertyReport(NamedTuple):
    name: str
    value: float
    tolerance: float

    @property
    def passed(self) -> bool:
        return self.value < self.tolerance


def seeded_b(n: int, seed: int = 42, dtype=np.float64) -> jnp.ndarray:
    """Deterministic random starting vector (the harness convention)."""
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(n).astype(dtype))


def check_decomposition_consistency(operator, b, k=DEFAULT_K, tol=DEFAULT_TOL):
    """One-pass and pass-one (α, β) must match elementwise."""
    d1, _ = tpl.lanczos_standard(operator, b, k)
    d2 = tpl.lanczos_pass_one(operator, b, k)
    assert d1.steps() == d2.steps(), "steps_taken differs between variants"
    da = float(np.max(np.abs(d1.alphas_valid() - d2.alphas_valid()), initial=0.0))
    db = float(np.max(np.abs(d1.betas_valid() - d2.betas_valid()), initial=0.0))
    return PropertyReport("decomposition_consistency", max(da, db), tol)


def check_lanczos_relation(operator, b, k=DEFAULT_K, tol=DEFAULT_TOL):
    """``A·V_k − V_k·T_k = β_k·v_{k+1}·e_kᵀ`` to tolerance.

    Runs k+1 steps so v_{k+1} is available (the reference checks both k and
    k+1; parameterize ``k`` to cover both).
    """
    decomp, v_all = tpl.lanczos_standard(operator, b, k + 1)
    steps = decomp.steps()
    kk = k  # steps < k (early breakdown) leaves zero-padded columns, checked below
    if steps <= 1:
        return PropertyReport("lanczos_relation", 0.0, tol)
    v = np.asarray(v_all)  # (k+1, n), rows are v_1..v_{k+1}
    alphas = np.asarray(decomp.alphas)
    betas = np.asarray(decomp.betas)
    vk = v[:kk].T  # (n, kk)
    t_k = np.asarray(assemble_tridiagonal(jnp.asarray(alphas[:kk]), jnp.asarray(betas[: kk - 1])))
    av = np.column_stack([np.asarray(operator.matvec(jnp.asarray(v[i]))) for i in range(kk)])
    residual = av - vk @ t_k
    residual[:, -1] -= betas[kk - 1] * v[kk]
    return PropertyReport("lanczos_relation", float(np.linalg.norm(residual)), tol)


def check_orthonormality(operator, b, k=DEFAULT_K, tol=DEFAULT_TOL):
    """``‖I − V_kᴴ·V_k‖_F`` of the one-pass basis."""
    decomp, v = tpl.lanczos_standard(operator, b, k)
    s = decomp.steps()
    v = np.asarray(v)[:s]
    gram = v.conj() @ v.T
    loss = float(np.linalg.norm(np.eye(s) - gram))
    return PropertyReport("orthonormality", loss, tol)


def check_reconstruction_stability(operator, b, k=DEFAULT_K, tol=DEFAULT_TOL):
    """``‖V_k − V′_k‖_F²`` between stored and regenerated bases.

    The exact-replay design makes this 0.0 bit-for-bit in the common case
    (reference observes exactly 0.0 at every k — ``tex/report.tex:492``).
    """
    decomp, v = tpl.lanczos_standard(operator, b, k)
    s = decomp.steps()
    # dummy y (the reference uses ones — orthogonality.rs:190-197)
    y = jnp.ones((decomp.k_max,), dtype=b.dtype)
    from two_pass_lanczos_tpu.algorithms.two_pass import lanczos_pass_two_with_basis

    _, v_regen = lanczos_pass_two_with_basis(operator, b, decomp, y)
    drift = float(np.linalg.norm(np.asarray(v)[:s] - np.asarray(v_regen)[:s]) ** 2)
    return PropertyReport("reconstruction_stability", drift, tol)


def run_all_properties(operator, b=None, k=DEFAULT_K, tol=DEFAULT_TOL):
    """Run the full four-property harness; returns a list of reports."""
    if b is None:
        b = seeded_b(operator.shape[0])
    return [
        check_decomposition_consistency(operator, b, k, tol),
        check_lanczos_relation(operator, b, k, tol),
        check_orthonormality(operator, b, k, tol),
        check_reconstruction_stability(operator, b, k, tol),
    ]
