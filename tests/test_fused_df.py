"""Double-float fused kernels (ops/kkt_fused_df.py): interpret-mode suite.

Shapes are chosen to be NON-powers-of-two wherever possible: the original
pairwise-fold implementation silently broadcast (1, w) against (2, w) on odd
counts (caught only on the real chip because the first interpret tests used
power-of-two R/P2 — regression pinned by test_non_pow2_shapes).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import two_pass_lanczos_tpu as tpl
from two_pass_lanczos_tpu.algorithms.core import pass_one_scan
from two_pass_lanczos_tpu.ops.kkt_fused_df import DFFusedKKTSolver


def _kkt(rng, m, p):
    u = rng.integers(0, p, m).astype(np.int32)
    v = ((u + 1 + rng.integers(0, p - 1, m)) % p).astype(np.int32)
    d = rng.uniform(0.5, 5.0, m)
    return d, u, v


def _truth_matvec(d, u, v, p, x):
    m = len(d)
    y = np.zeros(m + p)
    y[:m] = d * x[:m] + x[m + u] - x[m + v]
    np.add.at(y, m + u, x[:m])
    np.add.at(y, m + v, -x[:m])
    return y


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_df_fused_pass_one_tracks_f64(rng):
    # m=5000, p=300 -> R=384 (3 chunks), P2=4: non-pow2 row fold exercised
    m, p = 5000, 300
    d, u, v = _kkt(rng, m, p)
    b = rng.standard_normal(m + p)
    k = 25
    s = DFFusedKKTSolver(d, u, v, p, interpret=True)
    ah, al, bh, bl, bn2, st = s.pass_one(s.pack(b), k)
    assert int(st[0]) == k
    a64 = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
    b64 = np.asarray(bh, np.float64) + np.asarray(bl, np.float64)

    op64 = tpl.KKTOperator(d=jnp.asarray(d), arc_u=jnp.asarray(u),
                           arc_v=jnp.asarray(v), num_nodes=p)
    dref, _ = pass_one_scan(op64.matvec, jnp.asarray(b), k, emit_basis=False)
    np.testing.assert_allclose(a64, np.asarray(dref.alphas)[:k],
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(b64[: k - 1], np.asarray(dref.betas)[: k - 1],
                               rtol=0, atol=1e-11)
    bn = float(np.asarray(bn2)[0]) + float(np.asarray(bn2)[1])
    assert abs(bn - np.linalg.norm(b)) < 1e-12 * np.linalg.norm(b)


def test_df_fused_solve_inv(rng):
    m, p = 3000, 260  # P2 = 4, R = 384
    d, u, v = _kkt(rng, m, p)
    n = m + p
    x_true = np.full(n, 1.0 / np.sqrt(n))
    b = _truth_matvec(d, u, v, p, x_true)
    s = DFFusedKKTSolver(d, u, v, p, interpret=True)
    x, (a64, b64, steps) = s.solve(b, k=60, f="inv")
    rel = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    # Krylov-limited; compare against the f64 generic solve's error level
    op64 = tpl.KKTOperator(d=jnp.asarray(d), arc_u=jnp.asarray(u),
                           arc_v=jnp.asarray(v), num_nodes=p)
    x64 = np.asarray(tpl.solve_fAb(op64, jnp.asarray(b), k=60, f="inv",
                                   method="two_pass"))
    rel64 = np.linalg.norm(x64 - x_true) / np.linalg.norm(x_true)
    assert rel < max(2.0 * rel64, 1e-12), (rel, rel64)


def test_df_fused_matches_generic_df_trajectory(rng):
    """Same working precision => the trajectories must agree tightly
    (unlike cross-precision comparisons). Checks fused df vs XLA df."""
    from two_pass_lanczos_tpu.algorithms.df import (
        DFKKTOperator, lanczos_pass_one_df)

    m, p = 2500, 200
    d, u, v = _kkt(rng, m, p)
    b = rng.standard_normal(m + p)
    k = 20
    s = DFFusedKKTSolver(d, u, v, p, interpret=True)
    ah, al, _, _, _, _ = s.pass_one(s.pack(b), k)
    a_fused = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
    ddf = lanczos_pass_one_df(DFKKTOperator.from_f64(d, u, v, p), b, k)
    np.testing.assert_allclose(a_fused, ddf.alphas_f64(), rtol=0, atol=1e-11)


def test_df_fused_breakdown_and_zero_b(rng):
    m, p = 600, 100
    d, u, v = _kkt(rng, m, p)
    s = DFFusedKKTSolver(d, u, v, p, interpret=True)
    x, (a64, b64, steps) = s.solve(np.zeros(m + p), k=5, f="inv")
    assert steps == 0
    np.testing.assert_array_equal(x, 0.0)


def test_df_fused_exp(rng):
    m, p = 1500, 130
    d, u, v = _kkt(rng, m, p)
    n = m + p
    b = rng.standard_normal(n)
    s = DFFusedKKTSolver(d, u, v, p, interpret=True)
    x, _ = s.solve(b, k=40, f="exp")
    assert np.all(np.isfinite(x))
    # spot check vs dense f64 expm action via eigendecomposition
    a_dense = np.zeros((n, n))
    a_dense[np.arange(m), np.arange(m)] = d
    a_dense[np.arange(m), m + u] += 1
    a_dense[np.arange(m), m + v] -= 1
    a_dense[m + u, np.arange(m)] += 1
    a_dense[m + v, np.arange(m)] -= 1
    lam, q = np.linalg.eigh(a_dense)
    x_true = q @ (np.exp(lam) * (q.T @ b))
    rel = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-2, rel  # Krylov-limited at k=40 on this spectrum


def test_df_fused_vmem_guard():
    with pytest.raises(ValueError, match="arcs"):
        DFFusedKKTSolver(np.ones(900_001), np.zeros(900_001, np.int32),
                         np.ones(900_001, np.int32), 2)


class TestDFSharded:
    """Arc-sharded double-float solver on the virtual CPU mesh.

    Interpret-mode pallas inside shard_map costs ~1 min of compile per
    solver build, so the class builds ONE 4-device solver and validates it
    against the (cheap) XLA df path — which the single-device fused df
    kernel is itself validated against — rather than building per-ndev
    solver pairs."""

    def test_sharded_df_4dev_tracks_df_and_oracle(self, rng):
        import jax
        from jax.sharding import Mesh
        from two_pass_lanczos_tpu.algorithms.df import (
            DFKKTOperator, lanczos_pass_one_df)
        from two_pass_lanczos_tpu.parallel.fused_sharded_df import (
            DFShardedFusedKKTSolver)

        m, p, k = 1500, 200, 12
        d, u, v = _kkt(rng, m, p)
        b = rng.standard_normal(m + p)
        mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
        s = DFShardedFusedKKTSolver(d, u, v, p, mesh, interpret=True)
        x, (a64, b64, steps) = s.solve(b, k=k, f="inv")
        assert steps == k

        # vs the XLA df path (same working precision -> tight agreement)
        ddf = lanczos_pass_one_df(DFKKTOperator.from_f64(d, u, v, p), b, k)
        np.testing.assert_allclose(a64, ddf.alphas_f64(), rtol=0, atol=1e-11)

        # vs the f64 oracle
        op64 = tpl.KKTOperator(d=jnp.asarray(d), arc_u=jnp.asarray(u),
                               arc_v=jnp.asarray(v), num_nodes=p)
        dref, _ = pass_one_scan(op64.matvec, jnp.asarray(b), k,
                                emit_basis=False)
        np.testing.assert_allclose(a64, np.asarray(dref.alphas)[:k],
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(b64, np.asarray(dref.betas)[: k - 1],
                                   rtol=0, atol=1e-10)
        x64 = np.asarray(tpl.solve_fAb(op64, jnp.asarray(b), k=k, f="inv",
                                       method="two_pass"))
        np.testing.assert_allclose(x, x64, rtol=0,
                                   atol=1e-9 * np.abs(x64).max())

    def test_sharded_df_zero_b(self, rng):
        import jax
        from jax.sharding import Mesh
        from two_pass_lanczos_tpu.parallel.fused_sharded_df import (
            DFShardedFusedKKTSolver)

        d, u, v = _kkt(rng, 600, 100)
        mesh = Mesh(np.array(jax.devices()[:2]), ("rows",))
        s = DFShardedFusedKKTSolver(d, u, v, 100, mesh, interpret=True)
        x, (a, b_, steps) = s.solve(np.zeros(700), k=4, f="inv")
        assert steps == 0
        np.testing.assert_array_equal(x, 0.0)

    def test_sharded_df_streaming_autoselect_and_solves(self, rng):
        """Shards beyond the resident df cap auto-select the grid-streaming
        df kernel (no capacity wall); a small forced-streaming solve must
        match the resident path bit-for... to df rounding."""
        import jax
        from jax.sharding import Mesh
        from two_pass_lanczos_tpu.parallel.fused_sharded_df import (
            DFShardedFusedKKTSolver)

        d, u, v = _kkt(rng, 1200, 150)
        b = rng.standard_normal(1350)
        mesh = Mesh(np.array(jax.devices()[:2]), ("rows",))
        s_res = DFShardedFusedKKTSolver(d, u, v, 150, mesh, interpret=True)
        assert not s_res.streaming
        x_res, (a_res, _, _) = s_res.solve(b, k=8, f="inv")
        s_str = DFShardedFusedKKTSolver(d, u, v, 150, mesh, interpret=True)
        s_str.streaming = True  # force the streaming kernel on a small case
        x_str, (a_str, _, _) = s_str.solve(b, k=8, f="inv")
        np.testing.assert_allclose(a_str, a_res, rtol=0, atol=1e-12)
        np.testing.assert_allclose(x_str, x_res, rtol=0,
                                   atol=1e-11 * np.abs(x_res).max())

        # auto-selection flips beyond the cap (constructor-level, no solve)
        from two_pass_lanczos_tpu.ops.kkt_fused import SortedKKTLayout  # noqa
        import two_pass_lanczos_tpu.ops.kkt_fused_df as dfm
        old = dfm.DFFusedKKTSolver.MAX_ARCS
        try:
            dfm.DFFusedKKTSolver.MAX_ARCS = 500  # make the cap tiny
            s_big = DFShardedFusedKKTSolver(d, u, v, 150, mesh,
                                            interpret=True)
            assert s_big.streaming
        finally:
            dfm.DFFusedKKTSolver.MAX_ARCS = old


@pytest.mark.parametrize("case", [
    # (name, m, p) — the same degenerate topologies as the f32 fuzz
    ("tiny", 3, 2),
    ("single_arc", 1, 2),
    ("p_lane_aligned", 300, 256),
    ("p_one_segment", 200, 100),
    ("all_arcs_one_pair", 400, 50),
    ("hub_and_spokes", 600, 130),
    ("m_less_than_p", 64, 500),
], ids=lambda c: c[0])
def test_df_fused_matvec_fuzz(case, rng):
    """Edge-case layout fuzz for the df matvec: must match the f64 truth on
    degenerate topologies (mirrors the f32 kernel's fuzz suite)."""
    from two_pass_lanczos_tpu.ops.kkt_fused_df import DFFusedKKTSolver

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
    d = rng.uniform(0.5, 5.0, m)
    b = rng.standard_normal(m + p)
    s = DFFusedKKTSolver(d, u, v, p, interpret=True)
    # one pass-one step checks the full df matvec + dots on this geometry
    ah, al, bh, bl, bn2, st = s.pass_one(s.pack(b), 2)
    v1 = b / np.linalg.norm(b)
    y_true = _truth_matvec(d, u, v, p, v1)
    a1_true = v1 @ y_true
    a1 = float(np.asarray(ah, np.float64)[0] + np.asarray(al, np.float64)[0])
    assert abs(a1 - a1_true) < 1e-11 * max(abs(a1_true), 1.0), (a1, a1_true)


def test_kernel_eft_helpers_exact_in_interpret_mode():
    """Pin the kernel-side EFTs (`_two_sum_k`, `_two_prod`, `_df_add2` in
    ops/kkt_fused.py, shared by the df kernels) through the interpret-mode
    XLA CPU pipeline — the exact path where LLVM FMA contraction was
    observed zeroing error terms (`ops/df.py` docstring). The kernel `_ob`
    hook is an identity, so nothing but the mask-split construction protects
    these chains; this test is the tripwire for a future XLA upgrade
    re-introducing the hazard (ADVICE r2 item 2)."""
    import jax
    from jax.experimental import pallas as pl
    from two_pass_lanczos_tpu.ops.kkt_fused import (
        LANE, _df_add2, _two_prod, _two_sum_k)

    def kern(a_ref, b_ref, s_ref, e_ref, ph_ref, pl_ref, dh_ref, dl_ref):
        a, b = a_ref[:], b_ref[:]
        s, e = _two_sum_k(a, b)
        s_ref[:], e_ref[:] = s, e
        ph, pe = _two_prod(a, a)
        ph_ref[:], pl_ref[:] = ph, pe
        dh, dl = _df_add2(a, jnp.zeros_like(a), b, jnp.zeros_like(b))
        dh_ref[:], dl_ref[:] = dh, dl

    a = np.full((1, LANE), 1.0 + 2.0 ** -12, np.float32)
    b = np.full((1, LANE), 2.0 ** -30, np.float32)
    out_shape = [jax.ShapeDtypeStruct((1, LANE), jnp.float32)] * 6
    s, e, ph, pe, dh, dl = pl.pallas_call(
        kern, out_shape=out_shape, interpret=True)(
            jnp.asarray(a), jnp.asarray(b))
    # two_sum(1 + 2^-12, 2^-30): s rounds to 1 + 2^-12, error term exactly
    # 2^-30 — an FMA/simplifier-perturbed chain yields e == 0 instead.
    np.testing.assert_array_equal(np.asarray(s), a)
    np.testing.assert_array_equal(np.asarray(e), b)
    # two_prod(1 + 2^-12, 1 + 2^-12) = 1 + 2^-11 + 2^-24 exactly; the f32
    # head is 1 + 2^-11 (round-to-even on the half-ULP tie), tail 2^-24.
    np.testing.assert_array_equal(
        np.asarray(ph), np.float32(1.0 + 2.0 ** -11))
    np.testing.assert_array_equal(np.asarray(pe), np.float32(2.0 ** -24))
    # df_add2 renormalization keeps the tail exactly.
    np.testing.assert_array_equal(np.asarray(dh), a)
    np.testing.assert_array_equal(np.asarray(dl), b)


def test_df_pass_two_direct_subnormal_b_yields_zeros(rng):
    """Direct `pass_two` with a subnormal-norm b (recorded steps=0 by pass
    one) must produce zeros, not NaN: the reciprocal gate uses the same
    1000·tiny cutoff as pass one (ADVICE r2 item 3 — 1/b_norm would
    overflow to inf and 0·inf = NaN in the masked x accumulation)."""
    d, u, v = _kkt(rng, 900, 80)
    s = DFFusedKKTSolver(d, u, v, 80, interpret=True)
    b = np.full(900 + 80, 1e-42)  # subnormal in f32; norm <= 1000*tiny
    b_rep = s.pack(b)
    coeffs = s.pass_one(b_rep, 4)
    assert int(coeffs[5][0]) == 0
    k = 4
    y = jnp.zeros(k, jnp.float32)
    xuh, xul, xnh, xnl = s.pass_two(b_rep, coeffs, y, y)
    for arr in (xuh, xul, xnh, xnl):
        a = np.asarray(arr)
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, 0.0)
