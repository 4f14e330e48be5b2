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
