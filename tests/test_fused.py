"""Fused VMEM-resident Lanczos kernels (``ops/kkt_fused.py``), interpret mode.

The fused path is the production TPU hot path; these tests run its kernels in
the Pallas interpreter on CPU and hold them to the same oracles as the
scan-based implementation: the XLA structure-aware matvec, the generic
``solve_fAb`` pipeline, and the pass-one decomposition (reference semantics
``src/algorithms/lanczos_two_pass.rs``, ``src/solvers.rs:133-175``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import two_pass_lanczos_tpu as tpl
from two_pass_lanczos_tpu.algorithms.core import pass_one_scan
from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver, SortedKKTLayout


def _random_kkt(rng, m=700, p=300):
    u = rng.integers(0, p, m).astype(np.int32)
    v = ((u + 1 + rng.integers(0, p - 1, m)) % p).astype(np.int32)
    d = rng.uniform(1.0, 3.0, m).astype(np.float32)
    return d, u, v, p


def _xla_op(d, u, v, p):
    return tpl.make_kkt_operator(d, u, v, p, backend="xla", dtype=jnp.float32)


class TestLayout:
    def test_pack_unpack_roundtrip(self, rng):
        d, u, v, p = _random_kkt(rng)
        lay = SortedKKTLayout.build(d, u, v, p)
        x = rng.standard_normal(len(d) + p).astype(np.float32)
        xu, xv, xn = lay.pack(x)
        np.testing.assert_array_equal(lay.unpack(xu, xn), x)
        # the v-copy holds the same arc values in its own ordering
        np.testing.assert_array_equal(xv.reshape(-1)[lay.v.pos], x[: len(d)])

    def test_degree_zero_nodes(self, rng):
        # nodes with zero out-arcs in the u-ordering: the >= 1-group
        # guarantee and the padding invariants must still give a correct
        # matvec (checked against the XLA oracle)
        m, p = 50, 40
        u = rng.integers(0, 10, m).astype(np.int32)  # only nodes 0..9 as tails
        v = (u + 1 + rng.integers(0, p - 1, m)).astype(np.int32) % p
        d = rng.uniform(1.0, 2.0, m).astype(np.float32)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        x = rng.standard_normal(m + p).astype(np.float32)
        y_ref = np.asarray(_xla_op(d, u, v, p).matvec(jnp.asarray(x)))
        np.testing.assert_allclose(s.matvec(x), y_ref, rtol=0, atol=1e-5)


class TestFusedMatvec:
    def test_matches_xla_matvec(self, rng):
        d, u, v, p = _random_kkt(rng)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        x = rng.standard_normal(len(d) + p).astype(np.float32)
        y = s.matvec(x)
        y_ref = np.asarray(_xla_op(d, u, v, p).matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=0, atol=2e-5 * np.abs(y_ref).max())

    def test_skewed_degrees(self, rng):
        # one hub node with most arcs: multi-group nodes + many 1-group nodes
        m, p = 900, 150
        u = np.where(rng.random(m) < 0.6, 0, rng.integers(0, p, m)).astype(np.int32)
        v = ((u + 1 + rng.integers(0, p - 1, m)) % p).astype(np.int32)
        d = rng.uniform(0.5, 4.0, m).astype(np.float32)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        x = rng.standard_normal(m + p).astype(np.float32)
        y = s.matvec(x)
        y_ref = np.asarray(_xla_op(d, u, v, p).matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=0, atol=2e-5 * np.abs(y_ref).max())


class TestFusedSolve:
    @pytest.fixture
    def problem(self, rng):
        d, u, v, p = _random_kkt(rng)
        n = len(d) + p
        b = rng.standard_normal(n).astype(np.float32)
        return d, u, v, p, b

    def test_pass_one_matches_scan(self, problem):
        d, u, v, p, b = problem
        k = 20
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        dec = s.pass_one(s.pack(b), k)
        op = _xla_op(d, u, v, p)
        dec_ref, _ = pass_one_scan(op.matvec, jnp.asarray(b), k, emit_basis=False)
        assert int(dec.steps_taken) == int(dec_ref.steps_taken) == k
        np.testing.assert_allclose(
            np.asarray(dec.alphas), np.asarray(dec_ref.alphas), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(dec.betas), np.asarray(dec_ref.betas), rtol=1e-4)
        np.testing.assert_allclose(
            float(dec.b_norm), float(dec_ref.b_norm), rtol=1e-6)

    @pytest.mark.parametrize("f", ["inv", "exp"])
    def test_two_pass_solve_matches_generic(self, problem, f):
        d, u, v, p, b = problem
        k = 25
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        x, dec = s.solve(b, k=k, f=f)
        op = _xla_op(d, u, v, p)
        x_ref = np.asarray(
            tpl.solve_fAb(op, jnp.asarray(b), k=k, f=f, method="two_pass"))
        rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert rel < 1e-4, rel
        assert int(dec.steps_taken) == k

    @pytest.mark.parametrize("f", ["inv", "exp"])
    def test_one_pass_solve(self, problem, f):
        d, u, v, p, b = problem
        k = 25
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        x1, dec = s.solve(b, k=k, f=f, method="one_pass")
        op = _xla_op(d, u, v, p)
        x_ref = np.asarray(
            tpl.solve_fAb(op, jnp.asarray(b), k=k, f=f, method="one_pass"))
        rel = np.linalg.norm(x1 - x_ref) / np.linalg.norm(x_ref)
        assert rel < 1e-4, rel
        # one-pass and two-pass share pass-one arithmetic: tight agreement
        x2, _ = s.solve(b, k=k, f=f, method="two_pass")
        rel12 = np.linalg.norm(x1 - x2) / np.linalg.norm(x2)
        assert rel12 < 1e-5, rel12

    def test_prepacked_flat_b_bit_identical(self, problem):
        # solve() accepts the pack_flat() device array directly (skips the
        # per-call host scatter + tunnel upload for device-resident rhs);
        # identical program, bit-identical x and decomposition
        d, u, v, p, b = problem
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        x_arr, dec_arr = s.solve(b, k=12, f="inv", raw=True)
        x_pk, dec_pk = s.solve(s.pack_flat(b), k=12, f="inv", raw=True)
        np.testing.assert_array_equal(np.asarray(x_pk), np.asarray(x_arr))
        np.testing.assert_array_equal(np.asarray(dec_pk.alphas),
                                      np.asarray(dec_arr.alphas))

    def test_breakdown_truncates(self, rng):
        # diagonal-only KKT cannot break down easily; force it with b in a
        # 1-D invariant subspace of a *diagonal* top block: use m arcs all
        # with the same endpoints so the Krylov space is tiny.
        m, p = 130, 130
        u = np.zeros(m, np.int32)
        v = np.ones(m, np.int32)
        d = np.full(m, 2.0, np.float32)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        b = np.zeros(m + p, np.float32)
        b[0] = 1.0
        x, dec = s.solve(b, k=12, f="inv")
        assert int(dec.steps_taken) < 12
        # graceful truncation: result finite and matches the generic path
        op = _xla_op(d, u, v, p)
        x_ref = np.asarray(
            tpl.solve_fAb(op, jnp.asarray(b), k=12, f="inv", method="two_pass"))
        assert np.all(np.isfinite(x))
        np.testing.assert_allclose(x, x_ref, atol=1e-5)

    def test_zero_b_gives_zero(self, rng):
        d, u, v, p = _random_kkt(rng, m=300, p=64)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        x, dec = s.solve(np.zeros(len(d) + p, np.float32), k=8, f="inv")
        assert int(dec.steps_taken) == 0
        np.testing.assert_array_equal(x, 0.0)


def test_vmem_size_guard():
    """Instances beyond the per-chip VMEM budget are rejected with guidance."""
    from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver

    big = FusedKKTSolver.MAX_ARCS + 1
    with pytest.raises(ValueError, match="ShardedFusedKKTSolver"):
        # shape-only check: must raise before touching the (huge) arrays
        FusedKKTSolver(np.zeros(big, np.float32), np.zeros(big, np.int32),
                       np.ones(big, np.int32), 100)


def test_vmem_guard_is_layout_derived(rng):
    """The authoritative admission bound is computed from the BUILT layout
    (VERDICT r2 item 9): `pass_vmem_bytes` matches an independent plane
    count, and a pathological-padding instance under the MAX_ARCS
    pre-screen still raises with the measured byte count."""
    from two_pass_lanczos_tpu.ops.kkt_fused import (
        CHUNK, LANE, FusedKKTSolver, SortedKKTLayout)

    d, u, v, p = _random_kkt(rng, m=700, p=90)
    lay = SortedKKTLayout.build(d, u, v, p)
    # independent accounting: per ordering d f32 + eo (int16 here since
    # p <= 32640), 2 b inputs + 6 work buffers + pass-two's xu output in
    # f32, 2 four-channel group tables, 5 node planes (incl. xn output)
    assert lay.u.eo2.dtype == np.int16
    slots = lay.u.R * LANE
    expect = (2 * slots * (4 + 2) + (2 + 6 + 1) * slots * 4
              + 2 * lay.u.C * CHUNK * 4 * 4 + 5 * lay.P2 * LANE * 4)
    assert FusedKKTSolver.pass_vmem_bytes(lay) == expect
    # the chunk kernel's footprint is strictly larger (state in + out)
    assert FusedKKTSolver.chunk_vmem_bytes(lay) > expect

    # every node gets >= 1 group, so p >> m forces huge slot padding: the
    # old constant-only guard admitted this shape, the exact one must not.
    p_huge = 4000
    m_small = 64
    uu = np.arange(m_small, dtype=np.int32)
    vv = (uu + 1).astype(np.int32)
    dd = np.ones(m_small, np.float32)
    lay2 = SortedKKTLayout.build(dd, uu, vv, p_huge)
    need = FusedKKTSolver.pass_vmem_bytes(lay2)
    old = FusedKKTSolver.VMEM_BUDGET
    try:
        FusedKKTSolver.VMEM_BUDGET = need - 1
        with pytest.raises(ValueError, match=str(need)):
            FusedKKTSolver(dd, uu, vv, p_huge)
    finally:
        FusedKKTSolver.VMEM_BUDGET = old


def test_checkpoint_resume_fused(rng, tmp_path):
    """Pass-one state from the fused kernel checkpoints and resumes pass two
    (the reference's 'arbitrary work between passes' capability, SURVEY §5)."""
    from two_pass_lanczos_tpu.checkpoint import (
        load_decomposition, save_decomposition)
    from two_pass_lanczos_tpu.functions import padded_f_e1

    d, u, v, p = _random_kkt(rng, m=500, p=130)
    b = rng.standard_normal(len(d) + p).astype(np.float32)
    k = 15
    s = FusedKKTSolver(d, u, v, p, interpret=True)
    b_rep = s.pack(b)
    dec = s.pass_one(b_rep, k)
    save_decomposition(tmp_path / "dec.npz", dec)

    # "another job": fresh solver, load, replay pass two
    s2 = FusedKKTSolver(d, u, v, p, interpret=True)
    dec2 = load_decomposition(tmp_path / "dec.npz")
    y = padded_f_e1(dec2, "inv")
    y_full = np.where(np.arange(k) < int(dec2.steps_taken),
                      np.asarray(y, np.float32) * float(dec2.b_norm), 0.0)
    xu, xn = s2.pass_two(s2.pack(b), dec2, jnp.asarray(y_full))
    x = s2.layout.unpack(np.asarray(xu), np.asarray(xn))

    x_direct, _ = s.solve(b, k=k, f="inv")
    np.testing.assert_allclose(x, x_direct, rtol=0, atol=1e-6)


class TestWindowedGather:
    """The row-wise windowed other-endpoint gather (wg > 0) — active when
    each node's neighbors are clustered (or its arcs span multiple sorted
    groups); random small graphs fall back to the full p_hi loop."""

    def _banded_kkt(self, rng, m=2500, p=640, band=90):
        u = rng.integers(0, p - band - 1, m).astype(np.int32)
        v = (u + 1 + rng.integers(0, band, m)).astype(np.int32)
        d = rng.uniform(1.0, 3.0, m).astype(np.float32)
        return d, u, v, p

    def test_windowed_path_active_and_correct(self, rng):
        d, u, v, p = self._banded_kkt(rng)
        s = FusedKKTSolver(d, u, v, p, interpret=True, windowed=True)
        assert s.layout.u.wg > 0 and s.layout.v.wg > 0  # windowed, not fallback
        assert s.layout.u.wg < s.layout.p_hi
        x = rng.standard_normal(len(d) + p).astype(np.float32)
        y = s.matvec(x)
        y_ref = np.asarray(_xla_op(d, u, v, p).matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=0,
                                   atol=2e-5 * np.abs(y_ref).max())

    def test_windowed_solve_matches_generic(self, rng):
        d, u, v, p = self._banded_kkt(rng)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        s = FusedKKTSolver(d, u, v, p, interpret=True, windowed=True)
        assert s.layout.u.wg > 0
        x, dec = s.solve(b, k=20, f="inv")
        x_ref = np.asarray(tpl.solve_fAb(
            _xla_op(d, u, v, p), jnp.asarray(b), k=20, f="inv",
            method="two_pass"))
        rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert rel < 1e-4, rel

    def test_windowed_sharded(self, rng):
        from two_pass_lanczos_tpu.parallel import (
            ShardedFusedKKTSolver, make_mesh)

        d, u, v, p = self._banded_kkt(rng, m=3000)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        s8 = ShardedFusedKKTSolver(d, u, v, p, make_mesh(8), interpret=True,
                                   windowed=True)
        assert s8.wg_u > 0
        x8, _ = s8.solve(b, k=15, f="inv")
        s1 = FusedKKTSolver(d, u, v, p, interpret=True)
        x1, _ = s1.solve(b, k=15, f="inv")
        rel = np.linalg.norm(x8 - x1) / np.linalg.norm(x1)
        assert rel < 1e-4, rel


@pytest.mark.parametrize("case", [
    # (m, p, maker) — degenerate and edge-case topologies
    ("tiny", 3, 2),
    ("single_arc", 1, 2),
    ("p_lane_aligned", 300, 256),
    ("p_one_segment", 200, 100),
    ("all_arcs_one_pair", 400, 50),
    ("hub_and_spokes", 600, 130),
    ("m_less_than_p", 64, 500),
], ids=lambda c: c[0])
def test_fused_matvec_fuzz(case, rng):
    """Edge-case layout fuzz: the fused matvec must match the XLA oracle on
    degenerate topologies (tiny m, single arcs, lane-aligned p, hubs,
    m < p, repeated endpoint pairs)."""
    name, m, p = case
    if name == "all_arcs_one_pair":
        u = np.zeros(m, np.int32)
        v = np.ones(m, np.int32)
    elif name == "hub_and_spokes":
        u = np.zeros(m, np.int32)
        v = (1 + rng.integers(0, p - 1, m)).astype(np.int32)
    else:
        u = rng.integers(0, p, m).astype(np.int32)
        v = ((u + 1 + rng.integers(0, max(p - 1, 1), m)) % p).astype(np.int32)
    d = rng.uniform(0.5, 5.0, m).astype(np.float32)
    s = FusedKKTSolver(d, u, v, p, interpret=True)
    x = rng.standard_normal(m + p).astype(np.float32)
    y = s.matvec(x)
    y_ref = np.asarray(_xla_op(d, u, v, p).matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=0,
                               atol=2e-5 * max(np.abs(y_ref).max(), 1.0))


class TestCompensatedReduction:
    """Two-float alpha/beta reductions (FusedKKTSolver(compensated=True))."""

    def test_comp_dot_beats_plain_on_cancellation(self, rng):
        """The compensated block sum recovers the f64 dot to ~f32 rounding
        on cancellation-heavy data where the plain pairwise fold loses
        digits."""
        from two_pass_lanczos_tpu.ops.kkt_fused import (
            _comp_block_sum, _tree_sum)
        import jax

        r = 256
        base = rng.standard_normal((r // 2, 128))
        # pair +x with -x*(1+eps-scale noise): true sum is tiny vs terms
        x = np.concatenate([base, -base * (1 + 1e-7 * rng.standard_normal(
            (r // 2, 128)))]).astype(np.float32)
        y = np.ones((r, 128), np.float32)
        truth = float(np.sum(x.astype(np.float64)))

        xj, yj = jnp.asarray(x), jnp.asarray(y)
        hi, lo = jax.jit(_comp_block_sum)(xj, yj)
        comp = float(np.float64(np.asarray(hi)) + np.float64(np.asarray(lo)))
        plain = float(jax.jit(lambda a, b: _tree_sum(a * b))(xj, yj))
        assert abs(comp - truth) <= abs(plain - truth)
        assert abs(comp - truth) < 1e-4 * np.abs(x).sum() * 1.2e-7

    def test_compensated_solver_matches_plain(self, rng):
        """compensated=True must agree with the plain kernels to f32
        rounding at small k (same trajectory regime) and solve correctly."""
        d, u, v, p = _random_kkt(rng, m=900, p=200)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        k = 12
        s0 = FusedKKTSolver(d, u, v, p, interpret=True)
        s1 = FusedKKTSolver(d, u, v, p, interpret=True, compensated=True)
        x0, dec0 = s0.solve(b, k=k, f="inv")
        x1, dec1 = s1.solve(b, k=k, f="inv")
        assert int(dec0.steps_taken) == int(dec1.steps_taken) == k
        np.testing.assert_allclose(np.asarray(dec1.alphas),
                                   np.asarray(dec0.alphas), rtol=2e-5)
        np.testing.assert_allclose(x1, x0, rtol=0,
                                   atol=1e-4 * np.abs(x0).max())

    def test_compensated_alphas_closer_to_f64(self, rng):
        """At small k (pre-divergence regime) the compensated coefficients
        must track the f64 oracle at least as well as the plain kernels."""
        import jax

        d, u, v, p = _random_kkt(rng, m=1200, p=300)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        k = 6
        op64 = _xla_op(d.astype(np.float64), u, v, p)
        d64, _ = pass_one_scan(op64.matvec, jnp.asarray(b, jnp.float64), k,
                               emit_basis=False)
        a64 = np.asarray(d64.alphas, np.float64)

        dec_p = FusedKKTSolver(d, u, v, p, interpret=True).pass_one(
            FusedKKTSolver(d, u, v, p, interpret=True).pack(b), k)
        s_c = FusedKKTSolver(d, u, v, p, interpret=True, compensated=True)
        dec_c = s_c.pass_one(s_c.pack(b), k)
        err_p = np.abs(np.asarray(dec_p.alphas, np.float64) - a64).max()
        err_c = np.abs(np.asarray(dec_c.alphas, np.float64) - a64).max()
        assert err_c <= err_p * 1.5, (err_c, err_p)


class TestFusedChunked:
    """In-run early stopping on the fused production path
    (`FusedKKTSolver.pass_one_chunked`): chunked coefficients must be
    bit-identical to the monolithic kernel's, the callback must see the
    reference's view contract, and a stop at s must execute at most
    ceil(s/chunk)*chunk steps."""

    def _solver(self, rng, m=900, p=120):
        d, u, v, p = _random_kkt(rng, m=m, p=p)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        return s, s.pack_flat(b)

    def test_bit_identical_to_monolithic(self, rng):
        s, bf = self._solver(rng)
        k = 23  # non-multiple of chunk: exercises the frozen tail steps
        ref = s.pass_one(s._split_flat(bf), k)
        got = s.pass_one_chunked(s._split_flat(bf), k, chunk=8)
        np.testing.assert_array_equal(np.asarray(got.alphas),
                                      np.asarray(ref.alphas))
        np.testing.assert_array_equal(np.asarray(got.betas),
                                      np.asarray(ref.betas))
        assert int(got.steps_taken) == int(ref.steps_taken) == k
        np.testing.assert_allclose(float(got.b_norm), float(ref.b_norm),
                                   rtol=1e-6)

    def test_callback_early_stop_and_view_contract(self, rng):
        s, bf = self._solver(rng)
        k, stop_at = 30, 11
        seen = []

        def cb(step, basis, scalars):
            alphas, betas = scalars
            assert basis is None  # two-pass production path stores no basis
            assert len(alphas) == step and len(betas) == step - 1
            seen.append(step)
            return step < stop_at

        dec = s.pass_one_chunked(s._split_flat(bf), k, callback=cb, chunk=8)
        assert seen == list(range(1, stop_at + 1))
        assert int(dec.steps_taken) == stop_at
        # alphas beyond the stop are zeroed (early-stop truncation)
        a = np.asarray(dec.alphas)
        assert np.all(a[stop_at:] == 0.0) and np.all(a[:stop_at] != 0.0)
        # and the truncated decomposition drives pass two end-to-end
        from two_pass_lanczos_tpu.functions import padded_f_e1
        import jax.numpy as jnp

        y = padded_f_e1(dec, "inv")
        y_full = jnp.where(jnp.arange(k) < dec.steps_taken,
                           y.astype(jnp.float32) * dec.b_norm, 0.0)
        xu, xn = s.pass_two(s._split_flat(bf), dec, y_full)
        assert np.isfinite(np.asarray(xu)).all()

    def test_breakdown_inside_chunk(self, rng):
        # diagonal-invariant subspace: b = e1 on a 2-node decoupled system
        d = np.array([2.0, 3.0], np.float32)
        u = np.array([0, 1], np.int32)
        v = np.array([1, 0], np.int32)
        s = FusedKKTSolver(d, u, v, 2, interpret=True)
        ref = s.pass_one(s._split_flat(s.pack_flat(
            np.eye(4, dtype=np.float32)[0])), 6)
        got = s.pass_one_chunked(s._split_flat(s.pack_flat(
            np.eye(4, dtype=np.float32)[0])), 6, chunk=4)
        assert int(got.steps_taken) == int(ref.steps_taken)
        np.testing.assert_array_equal(np.asarray(got.alphas),
                                      np.asarray(ref.alphas))

    def test_zero_b(self, rng):
        s, _ = self._solver(rng)
        bf = s.pack_flat(np.zeros(s.n, np.float32))
        dec = s.pass_one_chunked(s._split_flat(bf), 8, chunk=4)
        assert int(dec.steps_taken) == 0
        np.testing.assert_array_equal(np.asarray(dec.alphas), 0.0)


def test_solve_with_callback_early_stop(rng):
    """`FusedKKTSolver.solve(callback=...)` wires in-run early stopping
    through the high-level API: a stop at step s produces the same result
    as a plain solve with k = s (same coefficients, pass two masked to
    the executed prefix)."""
    d, u, v, p = _random_kkt(rng, m=800, p=110)
    s = FusedKKTSolver(d, u, v, p, interpret=True)
    b = rng.standard_normal(len(d) + p).astype(np.float32)
    stop_at = 9

    x_cb, dec = s.solve(b, k=20, f="inv", callback=lambda st, V, sc: st < stop_at,
                        callback_chunk=4)
    assert int(dec.steps_taken) == stop_at
    x_ref, dec_ref = s.solve(b, k=stop_at, f="inv")
    np.testing.assert_array_equal(np.asarray(dec.alphas)[:stop_at],
                                  np.asarray(dec_ref.alphas))
    np.testing.assert_allclose(x_cb, x_ref, rtol=0,
                               atol=1e-6 * np.abs(x_ref).max())
    with pytest.raises(ValueError, match="two_pass"):
        s.solve(b, k=8, f="inv", method="one_pass", callback=lambda *a: True)


class TestFusedSLQ:
    """tr f(A) with the probes' pass one in the fused kernel (one scanned
    pallas launch) — held to the XLA SLQ path with identical probes and
    to exact per-probe polynomial quadrature."""

    def test_matches_xla_slq_same_probes(self, rng):
        import jax

        d, u, v, p = _random_kkt(rng, m=400, p=160)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        op = _xla_op(d, u, v, p)
        key = jax.random.key(3)
        k, m_probes = 20, 6
        from two_pass_lanczos_tpu.slq import slq_trace

        res_f = s.slq_trace("exp", k=k, num_probes=m_probes, key=key)
        res_x = slq_trace(op, "exp", k=k, num_probes=m_probes, key=key)
        # identical probes, two f32 implementations: per-sample agreement
        # at small k (forward instability forbids large-k comparison —
        # CLAUDE.md invariants)
        np.testing.assert_allclose(np.asarray(res_f.samples),
                                   np.asarray(res_x.samples), rtol=2e-3)

    def test_polynomial_quadrature_exact_per_probe(self, rng):
        """f(z) = z²: the k-point quadrature is exact for deg ≤ 2k−1, so
        each probe's sample must equal ‖A·z‖² computed by real matvecs."""
        import jax

        d, u, v, p = _random_kkt(rng, m=300, p=120)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        key = jax.random.key(7)
        poly = lambda t: t * t
        res = s.slq_trace(poly, k=8, num_probes=4, key=key)
        from two_pass_lanczos_tpu.slq import _draw_probes

        probes = np.asarray(_draw_probes(key, 4, s.n, jnp.float32,
                                         "rademacher"))
        op = _xla_op(d, u, v, p)
        for i in range(4):
            az = np.asarray(op.matvec(jnp.asarray(probes[i])))
            truth = float(az @ az)
            assert np.abs(float(res.samples[i]) - truth) < 2e-2 * abs(truth)

    def test_validation(self, rng):
        d, u, v, p = _random_kkt(rng, m=100, p=50)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        import jax

        with pytest.raises(ValueError, match="num_probes"):
            s.slq_trace("inv", num_probes=0, key=jax.random.key(0))
        with pytest.raises(ValueError, match="unknown"):
            s.slq_trace("nope", key=jax.random.key(0))


class TestFusedDOS:
    def test_matches_xla_dos_same_probes(self, rng):
        """DOS on the fused kernel vs the XLA estimator with identical
        probes: pointwise agreement at f32 rounding, integral 1."""
        import jax

        from two_pass_lanczos_tpu.slq import slq_spectral_density

        d, u, v, p = _random_kkt(rng, m=300, p=120)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        op = _xla_op(d, u, v, p)
        grid = np.linspace(-4.0, 6.0, 101)
        key = jax.random.key(9)
        phi_f = np.asarray(s.slq_spectral_density(
            grid, k=12, num_probes=4, key=key))
        phi_x = np.asarray(slq_spectral_density(
            op, grid, k=12, num_probes=4, key=key))
        np.testing.assert_allclose(phi_f, phi_x, rtol=5e-3,
                                   atol=5e-4 * phi_x.max())
        mass = np.trapezoid(phi_f, grid)
        assert abs(mass - 1.0) < 0.05, mass


class TestFusedChebyshev:
    def test_matches_xla_chebyshev(self, rng):
        """One jitted scan of resident-kernel matvecs == the XLA-operator
        expansion at f32 rounding."""
        from two_pass_lanczos_tpu.algorithms.chebyshev import chebyshev_fAb

        d, u, v, p = _random_kkt(rng, m=500, p=150)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        x_in = rng.standard_normal(len(d) + p).astype(np.float32)
        interval = (-4.0, 6.0)
        y_f = s.chebyshev_fAb(x_in, "exp", degree=30, interval=interval)
        op = tpl.make_kkt_operator(d, u, v, p, backend="xla",
                                   dtype=jnp.float32)
        y_x = np.asarray(chebyshev_fAb(op, jnp.asarray(x_in), "exp",
                                       degree=30, interval=interval))
        np.testing.assert_allclose(y_f, y_x, rtol=2e-4,
                                   atol=2e-4 * np.abs(y_x).max())

    def test_interval_validation(self, rng):
        d, u, v, p = _random_kkt(rng, m=100, p=50)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        with pytest.raises(ValueError, match="sign-definite"):
            s.chebyshev_fAb(np.ones(len(d) + p, np.float32), "inv",
                            interval=(-1.0, 1.0))

    def test_auto_interval(self, rng):
        """chebyshev_fAb works interval-free on this tier (VERDICT r4
        item 7): the cached eigsh estimate encloses the spectrum and the
        interval-free solve matches the XLA expansion run on the SAME
        estimated interval."""
        from two_pass_lanczos_tpu.algorithms.chebyshev import chebyshev_fAb

        d, u, v, p = _random_kkt(rng, m=400, p=120)
        s = FusedKKTSolver(d, u, v, p, interpret=True)
        iv = s.estimate_interval()
        assert s.estimate_interval() is iv  # cached, eigsh runs once
        op = tpl.make_kkt_operator(d, u, v, p, backend="xla",
                                   dtype=jnp.float32)
        # the estimate must enclose the Ritz extremes of a long run
        import jax

        from two_pass_lanczos_tpu.eigen import eigsh

        hi = float(eigsh(op, nev=1, which="LA", ncv=30,
                         key=jax.random.key(5)).eigenvalues[-1])
        lo = float(eigsh(op, nev=1, which="SA", ncv=30,
                         key=jax.random.key(6)).eigenvalues[0])
        assert iv[0] <= lo and hi <= iv[1], (iv, lo, hi)
        x_in = rng.standard_normal(len(d) + p).astype(np.float32)
        y_f = s.chebyshev_fAb(x_in, "exp", degree=30)  # interval-free
        y_x = np.asarray(chebyshev_fAb(op, jnp.asarray(x_in), "exp",
                                       degree=30, interval=iv))
        np.testing.assert_allclose(y_f, y_x, rtol=2e-4,
                                   atol=2e-4 * np.abs(y_x).max())
