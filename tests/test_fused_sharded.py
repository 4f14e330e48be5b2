"""Arc-sharded fused distributed solves (``parallel/fused_sharded.py``).

Runs on the 8-virtual-device CPU mesh with the Pallas kernels in interpret
mode; oracles are the XLA structure-aware matvec and the single-device fused
solver. The key claims under test: O(p)-communication matvec correctness,
N-device == 1-device to rounding tolerance, and replicated node state.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import two_pass_lanczos_tpu as tpl
from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver
from two_pass_lanczos_tpu.parallel import ShardedFusedKKTSolver, make_mesh


def _random_kkt(rng, m=3000, p=300):
    u = rng.integers(0, p, m).astype(np.int32)
    v = ((u + 1 + rng.integers(0, p - 1, m)) % p).astype(np.int32)
    d = rng.uniform(1.0, 3.0, m).astype(np.float32)
    return d, u, v, p


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestShardedFused:
    def test_matvec_matches_xla(self, rng, mesh):
        d, u, v, p = _random_kkt(rng)
        s = ShardedFusedKKTSolver(d, u, v, p, mesh, interpret=True)
        x = rng.standard_normal(len(d) + p).astype(np.float32)
        y = s.matvec(x)
        op = tpl.make_kkt_operator(d, u, v, p, backend="xla", dtype=jnp.float32)
        y_ref = np.asarray(op.matvec(jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=0,
                                   atol=2e-5 * np.abs(y_ref).max())

    @pytest.mark.parametrize("f", ["inv", "exp"])
    def test_matches_single_device(self, rng, mesh, f):
        d, u, v, p = _random_kkt(rng)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        k = 20
        s8 = ShardedFusedKKTSolver(d, u, v, p, mesh, interpret=True)
        s1 = FusedKKTSolver(d, u, v, p, interpret=True)
        x8, dec8 = s8.solve(b, k=k, f=f)
        x1, dec1 = s1.solve(b, k=k, f=f)
        assert int(dec8.steps_taken) == int(dec1.steps_taken) == k
        rel = np.linalg.norm(x8 - x1) / np.linalg.norm(x1)
        assert rel < 1e-4, rel
        np.testing.assert_allclose(np.asarray(dec8.alphas),
                                   np.asarray(dec1.alphas), rtol=2e-4)

    def test_uneven_arc_split(self, rng, mesh):
        # m not divisible by the device count
        d, u, v, p = _random_kkt(rng, m=1003, p=97)
        s = ShardedFusedKKTSolver(d, u, v, p, mesh, interpret=True)
        x = rng.standard_normal(len(d) + p).astype(np.float32)
        op = tpl.make_kkt_operator(d, u, v, p, backend="xla", dtype=jnp.float32)
        np.testing.assert_allclose(
            s.matvec(x), np.asarray(op.matvec(jnp.asarray(x))),
            rtol=0, atol=2e-5)

    def test_zero_b(self, rng, mesh):
        d, u, v, p = _random_kkt(rng, m=800, p=64)
        s = ShardedFusedKKTSolver(d, u, v, p, mesh, interpret=True)
        x, dec = s.solve(np.zeros(len(d) + p, np.float32), k=6, f="inv")
        assert int(dec.steps_taken) == 0
        np.testing.assert_array_equal(x, 0.0)

    def test_prepacked_b_bit_identical(self, rng, mesh):
        # solve() accepts the pack() triple directly (device-resident rhs:
        # skips the host scatter + upload, ~1.2 s of the 1.45 s end-to-end
        # at 5M arcs through the tunnel) — identical program, identical x
        d, u, v, p = _random_kkt(rng, m=1200, p=96)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        s = ShardedFusedKKTSolver(d, u, v, p, mesh, interpret=True)
        x_arr, dec_arr = s.solve(b, k=12, f="inv")
        x_pk, dec_pk = s.solve(s.pack(b), k=12, f="inv")
        np.testing.assert_array_equal(x_pk, x_arr)
        np.testing.assert_array_equal(np.asarray(dec_pk.alphas),
                                      np.asarray(dec_arr.alphas))


@pytest.mark.parametrize("ndev", [2, 3, 5])
def test_mesh_sizes_consistent(rng, ndev):
    """N-device results agree with 1-device to rounding tolerance across
    uneven mesh sizes (SURVEY §4's multi-node testing strategy)."""
    d, u, v, p = _random_kkt(rng, m=1500, p=150)
    b = rng.standard_normal(len(d) + p).astype(np.float32)
    sn = ShardedFusedKKTSolver(d, u, v, p, make_mesh(ndev), interpret=True)
    xn_, _ = sn.solve(b, k=12, f="inv")
    s1 = FusedKKTSolver(d, u, v, p, interpret=True)
    x1, _ = s1.solve(b, k=12, f="inv")
    rel = np.linalg.norm(xn_ - x1) / np.linalg.norm(x1)
    assert rel < 1e-4, rel


class TestShardedOnePass:
    """`method='one_pass'` on the distributed path (VERDICT r3 item 4): the
    reference's standard Lanczos (src/solvers.rs:46) beyond the single-chip
    resident cap — per-device HBM basis slabs emitted by the same scan, one
    final V_k·y contraction."""

    @pytest.mark.parametrize("ndev", [1, 3, 8])
    def test_one_pass_matches_two_pass(self, rng, ndev):
        d, u, v, p = _random_kkt(rng, m=1500, p=150)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        s = ShardedFusedKKTSolver(d, u, v, p, make_mesh(ndev),
                                  interpret=True)
        x1, dec1 = s.solve(b, k=15, f="inv", method="one_pass")
        x2, dec2 = s.solve(b, k=15, f="inv", method="two_pass")
        # identical pass-one scan => identical coefficients; the solution
        # routes differ only in the final contraction (basis GEMV vs
        # regenerated accumulation), which agree to rounding
        np.testing.assert_array_equal(np.asarray(dec1.alphas),
                                      np.asarray(dec2.alphas))
        np.testing.assert_array_equal(np.asarray(dec1.betas),
                                      np.asarray(dec2.betas))
        rel = np.linalg.norm(x1 - x2) / np.linalg.norm(x2)
        assert rel < 1e-5, rel

    def test_one_pass_matches_single_device_resident(self, rng):
        d, u, v, p = _random_kkt(rng, m=1200, p=120)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        s8 = ShardedFusedKKTSolver(d, u, v, p, make_mesh(8), interpret=True)
        x8, _ = s8.solve(b, k=12, f="inv", method="one_pass")
        s1 = FusedKKTSolver(d, u, v, p, interpret=True)
        x1, _ = s1.solve(b, k=12, f="inv", method="one_pass")
        rel = np.linalg.norm(x8 - x1) / np.linalg.norm(x1)
        assert rel < 1e-4, rel

    def test_one_pass_breakdown_truncates_basis(self, rng):
        # decoupled 2-node system, b = e1: invariant subspace => steps < k
        d = np.array([2.0, 3.0], np.float32)
        u = np.array([0, 1], np.int32)
        v = np.array([1, 0], np.int32)
        s = ShardedFusedKKTSolver(d, u, v, 2, make_mesh(2), interpret=True)
        b = np.eye(4, dtype=np.float32)[0]
        x, dec = s.solve(b, k=6, f="inv", method="one_pass")
        assert int(dec.steps_taken) < 6
        assert np.isfinite(x).all()

    def test_one_pass_hbm_admission(self, rng):
        d, u, v, p = _random_kkt(rng, m=800, p=64)
        s = ShardedFusedKKTSolver(d, u, v, p, make_mesh(2), interpret=True)
        need_k = s.ONE_PASS_HBM_BUDGET // ((s.R + s.P2) * 128 * 4) + 1
        with pytest.raises(ValueError, match="HBM"):
            s.solve(np.zeros(s.n, np.float32), k=need_k, f="inv",
                    method="one_pass")


class TestShardedChunked:
    """In-run early stopping on the distributed path (VERDICT r3 item 5):
    `ShardedFusedKKTSolver.solve(callback=...)` mirrors the single-chip
    `TestFusedChunked` contract — chunked coefficients bit-identical to the
    monolithic scan, reference view contract, and a stop at s costing
    <= ceil(s/chunk)·chunk pass-one matvecs + s pass-two matvecs per
    device."""

    def _solver(self, rng, ndev, m=900, p=120):
        d, u, v, p = _random_kkt(rng, m=m, p=p)
        s = ShardedFusedKKTSolver(d, u, v, p, make_mesh(ndev),
                                  interpret=True)
        b = rng.standard_normal(len(d) + p).astype(np.float32)
        return s, b

    @pytest.mark.parametrize("ndev", [2, 8])
    def test_bit_identical_to_monolithic(self, rng, ndev):
        s, b = self._solver(rng, ndev)
        k = 23  # non-multiple of chunk: exercises the tail chunk
        _, dec_ref = s.solve(b, k=k, f="inv")
        dec, stopped = s.pass_one_chunked(s.pack(b), k, chunk=8)
        assert not stopped
        np.testing.assert_array_equal(np.asarray(dec.alphas),
                                      np.asarray(dec_ref.alphas))
        np.testing.assert_array_equal(np.asarray(dec.betas),
                                      np.asarray(dec_ref.betas))
        assert int(dec.steps_taken) == k

    @pytest.mark.parametrize("ndev", [1, 3, 8])
    def test_callback_stop_cost_and_result(self, rng, ndev):
        s, b = self._solver(rng, ndev)
        k, stop_at, chunk = 30, 11, 4
        seen = []

        def cb(step, basis, scalars):
            alphas, betas = scalars
            assert basis is None
            assert len(alphas) == step and len(betas) == step - 1
            seen.append(step)
            return step < stop_at

        x_cb, dec = s.solve(b, k=k, f="inv", callback=cb,
                            callback_chunk=chunk)
        assert seen == list(range(1, stop_at + 1))
        assert int(dec.steps_taken) == stop_at
        # cost contract: pass one <= ceil(s/chunk) chunk launches of
        # `chunk` matvecs each; pass two compiled at scan length s
        assert s._last_p1_launches <= -(-stop_at // chunk)
        assert s._last_p2_len == stop_at
        # result == plain solve truncated at the stop point
        x_ref, dec_ref = s.solve(b, k=stop_at, f="inv")
        np.testing.assert_array_equal(np.asarray(dec.alphas)[:stop_at],
                                      np.asarray(dec_ref.alphas))
        np.testing.assert_allclose(x_cb, x_ref, rtol=0,
                                   atol=1e-6 * np.abs(x_ref).max())

    def test_breakdown_inside_chunk(self, rng):
        d = np.array([2.0, 3.0], np.float32)
        u = np.array([0, 1], np.int32)
        v = np.array([1, 0], np.int32)
        s = ShardedFusedKKTSolver(d, u, v, 2, make_mesh(2), interpret=True)
        b = np.eye(4, dtype=np.float32)[0]
        _, dec_ref = s.solve(b, k=6, f="inv")
        dec, stopped = s.pass_one_chunked(s.pack(b), 6, chunk=4)
        assert not stopped
        assert int(dec.steps_taken) == int(dec_ref.steps_taken)
        np.testing.assert_array_equal(np.asarray(dec.alphas),
                                      np.asarray(dec_ref.alphas))

    def test_zero_b(self, rng):
        s, _ = self._solver(rng, 2, m=500, p=64)
        dec, stopped = s.pass_one_chunked(
            s.pack(np.zeros(s.n, np.float32)), 8, chunk=4)
        assert not stopped
        assert int(dec.steps_taken) == 0
        x, dec2 = s.solve(np.zeros(s.n, np.float32), k=8, f="inv",
                          callback=lambda *a: True, callback_chunk=4)
        assert int(dec2.steps_taken) == 0
        np.testing.assert_array_equal(x, 0.0)

    def test_callback_requires_two_pass(self, rng):
        s, b = self._solver(rng, 2, m=500, p=64)
        with pytest.raises(ValueError, match="two_pass"):
            s.solve(b, k=8, f="inv", method="one_pass",
                    callback=lambda *a: True)


def test_mesh_of_one_is_the_streaming_single_chip_path(rng):
    """ShardedFusedKKTSolver over a 1-device mesh = the large-instance
    single-chip solver (grid-blocked streaming matvec, no VMEM size cap);
    it must agree with the VMEM-resident FusedKKTSolver."""
    d, u, v, p = _random_kkt(rng, m=2000, p=200)
    b = rng.standard_normal(len(d) + p).astype(np.float32)
    m1 = make_mesh(1)
    s1 = ShardedFusedKKTSolver(d, u, v, p, m1, interpret=True)
    x1, dec1 = s1.solve(b, k=15, f="inv")
    sf = FusedKKTSolver(d, u, v, p, interpret=True)
    xf, decf = sf.solve(b, k=15, f="inv")
    rel = np.linalg.norm(x1 - xf) / np.linalg.norm(xf)
    assert rel < 1e-4, rel


class TestShardedFusedSLQ:
    """tr f(A) on the arc-sharded production path: same probes through
    three implementations (sharded fused, single-chip fused, XLA scan)
    must agree per-sample at small k (f32 rounding tolerance)."""

    @pytest.mark.parametrize("ndev", [1, 2])
    def test_matches_fused_and_xla(self, rng, ndev):
        import jax

        d, u, v, p = _random_kkt(rng, m=600, p=200)
        sh = ShardedFusedKKTSolver(d, u, v, p, make_mesh(ndev),
                                   interpret=True)
        key = jax.random.key(11)
        k, m_probes = 16, 5
        res_sh = sh.slq_trace("exp", k=k, num_probes=m_probes, key=key)
        single = FusedKKTSolver(d, u, v, p, interpret=True)
        res_f = single.slq_trace("exp", k=k, num_probes=m_probes, key=key)
        np.testing.assert_allclose(np.asarray(res_sh.samples),
                                   np.asarray(res_f.samples), rtol=2e-3)
        from two_pass_lanczos_tpu.slq import slq_trace

        op = tpl.make_kkt_operator(d, u, v, p, backend="xla",
                                   dtype=jnp.float32)
        res_x = slq_trace(op, "exp", k=k, num_probes=m_probes, key=key)
        np.testing.assert_allclose(np.asarray(res_sh.samples),
                                   np.asarray(res_x.samples), rtol=2e-3)

    def test_validation(self, rng):
        import jax

        d, u, v, p = _random_kkt(rng, m=200, p=80)
        sh = ShardedFusedKKTSolver(d, u, v, p, make_mesh(2), interpret=True)
        with pytest.raises(ValueError, match="num_probes"):
            sh.slq_trace("inv", num_probes=0, key=jax.random.key(0))
        with pytest.raises(ValueError, match="unknown"):
            sh.slq_trace("bogus", key=jax.random.key(0))


class TestShardedFusedDOS:
    def test_dos_matches_single_chip(self, rng):
        import jax

        d, u, v, p = _random_kkt(rng, m=400, p=150)
        sh = ShardedFusedKKTSolver(d, u, v, p, make_mesh(2), interpret=True)
        single = FusedKKTSolver(d, u, v, p, interpret=True)
        grid = np.linspace(-4.0, 6.0, 81)
        key = jax.random.key(10)
        phi_sh = np.asarray(sh.slq_spectral_density(
            grid, k=10, num_probes=3, key=key))
        phi_1 = np.asarray(single.slq_spectral_density(
            grid, k=10, num_probes=3, key=key))
        np.testing.assert_allclose(phi_sh, phi_1, rtol=5e-3,
                                   atol=5e-4 * phi_1.max())


class TestShardedFusedChebyshev:
    @pytest.mark.parametrize("ndev", [1, 2])
    def test_matches_xla_chebyshev(self, rng, ndev):
        """Rep-space recurrence == the XLA-operator expansion to f32
        rounding (same coefficients, same interval), and the duplication
        invariant survives the scan (xu/xn consistency via unpack)."""
        d, u, v, p = _random_kkt(rng, m=500, p=150)
        sh = ShardedFusedKKTSolver(d, u, v, p, make_mesh(ndev),
                                   interpret=True)
        x_in = rng.standard_normal(len(d) + p).astype(np.float32)
        interval = (-4.0, 6.0)
        y_sh = sh.chebyshev_fAb(x_in, "exp", degree=30, interval=interval)
        from two_pass_lanczos_tpu.algorithms.chebyshev import chebyshev_fAb

        op = tpl.make_kkt_operator(d, u, v, p, backend="xla",
                                   dtype=jnp.float32)
        y_x = np.asarray(chebyshev_fAb(op, jnp.asarray(x_in), "exp",
                                       degree=30, interval=interval))
        np.testing.assert_allclose(y_sh, y_x, rtol=2e-4,
                                   atol=2e-4 * np.abs(y_x).max())

    def test_interval_validation(self, rng):
        d, u, v, p = _random_kkt(rng, m=100, p=50)
        sh = ShardedFusedKKTSolver(d, u, v, p, make_mesh(2), interpret=True)
        with pytest.raises(ValueError, match="sign-definite"):
            sh.chebyshev_fAb(np.ones(len(d) + p, np.float32), "inv",
                             interval=(-1.0, 1.0))

    def test_auto_interval(self, rng):
        """Interval-free chebyshev_fAb on the sharded fused tier (VERDICT
        r4 item 7): the cached estimate drives the same expansion as an
        explicit-interval XLA run."""
        from two_pass_lanczos_tpu.algorithms.chebyshev import chebyshev_fAb

        d, u, v, p = _random_kkt(rng, m=400, p=120)
        sh = ShardedFusedKKTSolver(d, u, v, p, make_mesh(2), interpret=True)
        iv = sh.estimate_interval()
        assert sh.estimate_interval() is iv  # cached
        x_in = rng.standard_normal(len(d) + p).astype(np.float32)
        y_sh = sh.chebyshev_fAb(x_in, "exp", degree=30)  # interval-free
        op = tpl.make_kkt_operator(d, u, v, p, backend="xla",
                                   dtype=jnp.float32)
        y_x = np.asarray(chebyshev_fAb(op, jnp.asarray(x_in), "exp",
                                       degree=30, interval=iv))
        np.testing.assert_allclose(y_sh, y_x, rtol=2e-4,
                                   atol=2e-4 * np.abs(y_x).max())
