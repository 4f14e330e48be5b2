"""In-run early stopping (chunked pass one) and strict-breakdown mode.

The reference's ``LanczosCallback`` terminates the hot loop, saving the
remaining matvecs (``src/algorithms/lanczos.rs:93-113``). These tests pin:
(1) a stop at iteration s executes strictly fewer than k matvecs (counted via
a wrapped operator); (2) the chunked run's coefficients are bit-identical to
the monolithic scan's; (3) the callback receives the reference's exact view
contract; (4) ``strict_breakdown=True`` raises ``BreakdownError`` through the
real code path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import two_pass_lanczos_tpu as tpl
from two_pass_lanczos_tpu.algorithms.chunked import (
    lanczos_pass_one_chunked,
    lanczos_standard_chunked,
)
from two_pass_lanczos_tpu.algorithms.core import pass_one_scan


class _Holder:
    """Mutable counter, hashable by identity (usable as pytree aux data)."""

    def __init__(self):
        self.n = 0


@jax.tree_util.register_pytree_node_class
class CountingOperator(tpl.LinearOperator):
    """Wraps an operator and counts matvec *executions* on the device.

    The count is incremented by a ``jax.debug.callback`` compiled into the
    matvec, so it reflects what actually ran — jit caching cannot hide it
    (a scan of length c bumps it c times per execution)."""

    def __init__(self, inner, holder=None):
        self.inner = inner
        self.holder = holder if holder is not None else _Holder()

    @property
    def count(self):
        return self.holder.n

    def tree_flatten(self):
        return (self.inner,), (self.holder,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def shape(self):
        return self.inner.shape

    @property
    def dtype(self):
        return self.inner.dtype

    def _inc(self):
        self.holder.n += 1

    def matvec(self, x):
        jax.debug.callback(self._inc)
        return self.inner.matvec(x)


def _problem(n=80, seed=3, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, n))
    a = jnp.asarray((m + m.T) / 2, dtype=dtype)
    b = jnp.asarray(rng.standard_normal(n), dtype=dtype)
    return tpl.as_operator(a), b


def test_early_stop_skips_matvecs():
    op, b = _problem()
    k, chunk, stop_step = 64, 8, 10
    counting = CountingOperator(op)

    def cb(s, v, t):
        return s < stop_step

    decomp = lanczos_pass_one_chunked(counting, b, k, cb, chunk=chunk)
    jax.effects_barrier()
    assert decomp.steps() == stop_step
    # ceil(10/8)*8 = 16 matvecs, not 64: the loop actually stopped in-run
    assert counting.count == 16
    assert counting.count < k


def test_early_stop_chunk_one_is_exact():
    op, b = _problem()
    counting = CountingOperator(op)
    decomp = lanczos_pass_one_chunked(
        counting, b, 50, lambda s, v, t: s < 7, chunk=1
    )
    jax.effects_barrier()
    assert decomp.steps() == 7
    assert counting.count == 7  # per-iteration cadence: zero overshoot


def test_chunked_coefficients_bit_identical():
    op, b = _problem()
    k = 33  # not a multiple of chunk: exercises the tail-chunk compile
    ref, _ = pass_one_scan(op.matvec, b, k, emit_basis=False)
    for chunk in (1, 8, 16, 33, 64):
        d = lanczos_pass_one_chunked(op, b, k, None, chunk=chunk)
        assert d.steps() == ref.steps()
        np.testing.assert_array_equal(np.asarray(d.alphas), np.asarray(ref.alphas))
        np.testing.assert_array_equal(np.asarray(d.betas), np.asarray(ref.betas))


def test_chunked_basis_matches_monolithic():
    op, b = _problem(n=40)
    k = 12
    ref_d, ref_v = pass_one_scan(op.matvec, b, k, emit_basis=True)
    d, v = lanczos_standard_chunked(op, b, k, None, chunk=5)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(d.alphas), np.asarray(ref_d.alphas))


def test_callback_view_contract():
    """callback(s, V[:s], (alphas[:s], betas[:s-1])) — the reference's views
    (lanczos.rs:93-106: basis excludes v_{s+1}, betas exclude the current β)."""
    op, b = _problem(n=30)
    k = 9
    seen = []

    def cb(s, v, t):
        alphas, betas = t
        assert v.shape == (s, 30)
        assert alphas.shape == (s,)
        assert betas.shape == (s - 1,)
        seen.append(s)
        return True

    decomp, v = lanczos_standard_chunked(op, b, k, cb, chunk=4)
    assert seen == list(range(1, k + 1))
    # the views were orthonormal prefixes of the true basis
    ref_d, ref_v = pass_one_scan(op.matvec, b, k, emit_basis=True)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref_v))


def test_early_stop_basis_rows_zeroed():
    op, b = _problem(n=24)
    d, v = lanczos_standard_chunked(op, b, 16, lambda s, v_, t: s < 5, chunk=8)
    assert d.steps() == 5
    v = np.asarray(v)
    assert v.shape == (16, 24)
    assert np.all(v[5:] == 0.0)
    assert np.all(np.abs(np.diag(v[:5] @ v[:5].T) - 1.0) < 1e-12)


def test_chunked_breakdown_semantics():
    # invariant subspace: breakdown at step 1 regardless of chunking
    op = tpl.DiagonalOperator(jnp.array([2.0, 3.0], dtype=jnp.float64))
    b = jnp.array([1.0, 0.0], dtype=jnp.float64)
    calls = []
    d = lanczos_pass_one_chunked(op, b, 6, lambda s, v, t: calls.append(s) or True,
                                 chunk=4)
    assert d.steps() == 1
    assert calls == [1]  # callback fires on the breakdown step, then stops
    np.testing.assert_allclose(d.alphas_valid(), [2.0], atol=1e-15)


def test_solver_with_callback_early_stop():
    """End-to-end: lanczos() with a stopping callback produces the same x as
    a plain run truncated at the stop point, with fewer matvecs."""
    op, b = _problem(n=60, seed=5)
    k, stop = 40, 12
    counting = CountingOperator(op)
    x_stopped = tpl.lanczos(counting, b, k, tpl.make_inv_solver(),
                            callback=lambda s, v, t: s < stop,
                            callback_chunk=6)
    jax.effects_barrier()
    n_matvecs = counting.count
    assert n_matvecs == 12  # ceil(12/6)*6
    x_ref = tpl.lanczos(op, b, stop, tpl.make_inv_solver())
    np.testing.assert_allclose(np.asarray(x_stopped), np.asarray(x_ref),
                               rtol=0, atol=1e-13)


def test_two_pass_solver_with_callback():
    op, b = _problem(n=60, seed=6)
    counting = CountingOperator(op)
    x_stopped = tpl.lanczos_two_pass(counting, b, 40, tpl.make_inv_solver(),
                                     callback=lambda s, v, t: s < 10,
                                     callback_chunk=5)
    jax.effects_barrier()
    # pass one: ceil(10/5)*5 = 10; pass two: steps-1 = 9 (truncated)
    assert counting.count == 19
    x_ref = tpl.lanczos_two_pass(op, b, 10, tpl.make_inv_solver())
    np.testing.assert_allclose(np.asarray(x_stopped), np.asarray(x_ref),
                               rtol=0, atol=1e-13)


def test_strict_breakdown_raises():
    op = tpl.DiagonalOperator(jnp.array([2.0, 3.0], dtype=jnp.float64))
    b = jnp.array([1.0, 0.0], dtype=jnp.float64)
    with pytest.raises(tpl.BreakdownError) as ei:
        tpl.lanczos(op, b, 5, tpl.make_inv_solver(), strict_breakdown=True)
    assert ei.value.k == 1
    assert "iteration 1" in str(ei.value)
    with pytest.raises(tpl.BreakdownError):
        tpl.lanczos_two_pass(op, b, 5, tpl.make_inv_solver(),
                             strict_breakdown=True)
    # graceful by default: same inputs solve fine without the flag
    x = tpl.lanczos(op, b, 5, tpl.make_inv_solver())
    np.testing.assert_allclose(np.asarray(x), [0.5, 0.0], atol=1e-15)


def test_strict_breakdown_not_triggered_by_callback_stop():
    op, b = _problem(n=30)
    x = tpl.lanczos(op, b, 20, tpl.make_inv_solver(),
                    callback=lambda s, v, t: s < 8,
                    strict_breakdown=True)  # stop is not a breakdown
    assert np.all(np.isfinite(np.asarray(x)))
