"""Double-float fused Lanczos kernels: near-f64 trajectories at fused speed.

Composes the two production ideas of this framework:

* the **fused VMEM-resident pass** (``ops/kkt_fused.py``): one Pallas kernel
  per Lanczos pass, dual sorted arc layout, zero per-step HBM traffic;
* the **double-float arithmetic** (``ops/df.py`` / ``algorithms/df.py``):
  every value an unevaluated f32 pair (hi, lo), every operation an
  error-free transformation — ~49-bit effective mantissa.

Here the *entire recurrence inside the kernel* — matvec (exact-product
diagonal term, exact hi/lo gathers, compensated segmented-sum scatter),
orthogonalization axpys, inner products, normalization — runs in
double-float. The result: coefficient trajectories that track the CPU f64
oracle at ~1e-11 (vs f32's O(1) divergence at k≈100 on indefinite spectra)
while keeping the fused design's zero-dispatch, zero-HBM-per-step
structure. Measured: **0.70 s** for the 500k-arc/k=500 two-pass solve —
7.5× faster than the reference's own f64 CPU result (5.28 s), on hardware
with no native f64 (REPORT.md §10, PERF.md "Double-float engineering").

VMEM budget: state doubles (vector planes ×2, d stored as a pair), ~120 B
per padded slot — the resident cap is ~0.9M arcs/chip (vs ~1.9M for f32).

Numerical semantics mirror ``algorithms/df.py`` step for step (same op
order, df reciprocal-multiply, breakdown at 1000·2⁻⁴⁹, stored-β replay in
pass two), so pass two regenerates pass one's basis bit-identically in both
hi and lo planes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_pass_lanczos_tpu.ops.kkt_fused import (
    CHUNK,
    LANE,
    VMEM_LIMIT,
    SortedKKTLayout,
    _df_add2,
    _ob,
    _rowwise_window_gather,
    _two_prod,
    _window_gather,
)

__all__ = ["DFFusedKKTSolver", "DF_BREAKDOWN_TOL", "df_kkt_matvec",
           "df_kkt_streaming_matvec"]

#: breakdown tolerance at double-float working precision (1000 · 2⁻⁴⁹).
DF_BREAKDOWN_TOL = 1000.0 * 2.0 ** -49


# ---------------------------------------------------------------------------
# In-kernel double-float building blocks (all slice-only, VPU-friendly)
# ---------------------------------------------------------------------------

def _df_lane_fold(h, l):
    """Pairwise df fold over the lane axis: (R, W) pair -> (R, 1) pair.

    Odd widths accumulate the leftover column separately — a naive halving
    fold would silently BROADCAST (R, 1) against (R, 2) and corrupt the
    sum (hit in practice at non-power-of-two shapes)."""
    w = h.shape[1]
    xh = xl = None
    while w > 1:
        if w % 2:
            if xh is None:
                xh, xl = h[:, w - 1:w], l[:, w - 1:w]
            else:
                xh, xl = _df_add2(xh, xl, h[:, w - 1:w], l[:, w - 1:w])
            w -= 1
        half = w // 2
        h, l = _df_add2(h[:, :half], l[:, :half], h[:, half:w], l[:, half:w])
        w = half
    if xh is not None:
        h, l = _df_add2(h, l, xh, xl)
    return h, l


def _df_row_fold(h, l):
    """Pairwise df fold over the row axis: (R, C) pair -> (1, C) pair.
    Same odd-leftover handling as :func:`_df_lane_fold` (R is a chunk-count
    multiple, frequently NOT a power of two)."""
    r = h.shape[0]
    xh = xl = None
    while r > 1:
        if r % 2:
            if xh is None:
                xh, xl = h[r - 1:r], l[r - 1:r]
            else:
                xh, xl = _df_add2(xh, xl, h[r - 1:r], l[r - 1:r])
            r -= 1
        half = r // 2
        h, l = _df_add2(h[:half], l[:half], h[half:r], l[half:r])
        r = half
    if xh is not None:
        h, l = _df_add2(h, l, xh, xl)
    return h, l


def _df_dot_block(ah, al, bh, bl):
    """Compensated Σ a·b over an (R, 128) df pair: df products + pairwise
    df folds; returns a scalar (hi, lo) pair."""
    ph, pe = _two_prod(ah, bh)
    pe = pe + (ah * bl + al * bh)  # al*bl ~ 2^-98, below df resolution
    ph, pe = _df_lane_fold(ph, pe)
    ph, pe = _df_row_fold(ph, pe)
    return ph[0, 0], pe[0, 0]


def _df_scalar_sqrt(xh, xl):
    """Scalar df sqrt (Karp–Markstein); masks non-positive inputs to 0."""
    safe = jnp.where(xh > 0, xh, jnp.float32(1.0))
    s = jnp.sqrt(safe)
    p, e = _two_prod(s, s)
    rh, rl = _df_add2(xh, xl, -p, -e)
    c = rh / (2.0 * s)
    hi = _ob(s + c)
    lo = c - (hi - s)
    pos = xh > 0
    z = jnp.float32(0.0)
    return jnp.where(pos, hi, z), jnp.where(pos, lo, z)


def _df_scalar_recip(yh, yl):
    """Scalar df reciprocal via two Newton corrections."""
    q1 = jnp.float32(1.0) / yh
    # r = 1 - y*q1 in df
    p, e = _two_prod(yh, q1)
    e = e + yl * q1
    rh, rl = _df_add2(jnp.float32(1.0), jnp.float32(0.0), -p, -e)
    q2 = rh / yh
    p2, e2 = _two_prod(yh, q2)
    e2 = e2 + yl * q2
    r2h, _ = _df_add2(rh, rl, -p2, -e2)
    q3 = r2h / yh
    s = _ob(q1 + q2)
    t = q2 - (s - q1)
    hi = _ob(s + (t + q3))
    lo = (t + q3) - (hi - s)
    return hi, lo


def _df_axpy(wh, wl, a_h, a_l, xh, xl):
    """(wh, wl) -= (a_h, a_l)·(xh, xl), elementwise with scalar a."""
    ph, pe = _two_prod(xh, a_h)
    pe = pe + (xh * a_l + xl * a_h)
    return _df_add2(wh, wl, -ph, -pe)


def _df_scale(xh, xl, a_h, a_l):
    """(xh, xl)·(a_h, a_l) with scalar a (reciprocal-multiply replay)."""
    ph, pe = _two_prod(xh, a_h)
    pe = pe + (xh * a_l + xl * a_h)
    hi = _ob(ph + pe)
    lo = pe - (hi - ph)
    return hi, lo


def _df_emit_matvec(orders, xnh_ref, xnl_ref, wnh_ref, wnl_ref, *, p_hi,
                    c_chunks):
    """w = A·x in the rep layout, fully double-float.

    ``orders`` entries: (xh, xl, wh, wl, dh_ref, dl_ref, es_ref, eo_ref,
    gn_ref, win_ref, sign, wg). Gathers move hi and lo planes exactly (the
    row-wise windowed gather when ``wg`` is set — two planes double the
    full-loop cost, so the window pays off sooner than in the f32 kernel);
    the incidence scatter is a compensated two-level segmented sum.
    """
    wnh_ref[:] = jnp.zeros(wnh_ref.shape, jnp.float32)
    wnl_ref[:] = jnp.zeros(wnl_ref.shape, jnp.float32)
    for (xh_r, xl_r, wh_r, wl_r, dh_r, dl_r, es_r, eo_r, gn_r, win_r,
         sign, wg) in orders:

        def body(c, _, xh_r=xh_r, xl_r=xl_r, wh_r=wh_r, wl_r=wl_r,
                 dh_r=dh_r, dl_r=dl_r, es_r=es_r, eo_r=eo_r, gn_r=gn_r,
                 win_r=win_r, sign=sign, wg=wg):
            sl = pl.ds(c * CHUNK, CHUNK)
            yh, yl = _df_chunk_matvec_scatter(
                xh_r[sl, :], xl_r[sl, :], es_r[sl, :], eo_r[sl, :],
                dh_r[sl, :], dl_r[sl, :], gn_r[c], win_r[c], sign, wg,
                xnh_ref, xnl_ref, wnh_ref, wnl_ref, p_hi=p_hi)
            wh_r[sl, :] = yh
            wl_r[sl, :] = yl
            return 0

        jax.lax.fori_loop(0, c_chunks, body, 0)


def _df_chunk_matvec_scatter(xh, xl, es, eo, dh, dl, gnrb, r0, sign, wg,
                             xnh_ref, xnl_ref, wnh_ref, wnl_ref, *, p_hi):
    """One (CHUNK, 128) df matvec tile: returns the arc outputs (yh, yl)
    and df-accumulates the node scatter partial into ``wn*_ref``. Shared by
    the resident (:func:`_df_emit_matvec`) and grid-streaming
    (:func:`_df_matvec_streaming_kernel`) kernels."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)
    gn = gnrb[:, 0:1]
    es = es.astype(jnp.int32)  # es is i32 already; eo may be an i16 plane
    eo = eo.astype(jnp.int32)

    # gathers: exact moves of both planes
    gsh = _window_gather(xnh_ref, es, r0, 2)
    gsl = _window_gather(xnl_ref, es, r0, 2)
    if wg:
        goh = _rowwise_window_gather(xnh_ref, eo, gnrb[:, 1:2], wg)
        gol = _rowwise_window_gather(xnl_ref, eo, gnrb[:, 1:2], wg)
    else:
        goh = _window_gather(xnh_ref, eo, 0, p_hi)
        gol = _window_gather(xnl_ref, eo, 0, p_hi)

    # y = d⊗x + sign·(gs ⊖ go)
    ph, pe = _two_prod(dh, xh)
    pe = pe + (dh * xl + dl * xh)
    th, tl = _df_add2(gsh, gsl, -goh, -gol)
    yh, yl = _df_add2(ph, pe, sign * th, sign * tl)

    # compensated segmented-sum scatter: df lane fold per group row, then
    # masked df row folds into the chunk's 256-node window
    rsh, rsl = _df_lane_fold(xh, xl)  # (128, 1)
    mlo = (gn == lanes)
    z = jnp.float32(0.0)
    slh, sll = _df_row_fold(jnp.where(mlo, rsh, z), jnp.where(mlo, rsl, z))
    mhi = (gn - LANE == lanes)
    shh, shl = _df_row_fold(jnp.where(mhi, rsh, z), jnp.where(mhi, rsl, z))
    ah, al = _df_add2(wnh_ref[pl.ds(r0, 1), :], wnl_ref[pl.ds(r0, 1), :],
                      sign * slh, sign * sll)
    wnh_ref[pl.ds(r0, 1), :] = ah
    wnl_ref[pl.ds(r0, 1), :] = al
    bh2, bl2 = _df_add2(wnh_ref[pl.ds(r0 + 1, 1), :],
                        wnl_ref[pl.ds(r0 + 1, 1), :],
                        sign * shh, sign * shl)
    wnh_ref[pl.ds(r0 + 1, 1), :] = bh2
    wnl_ref[pl.ds(r0 + 1, 1), :] = bl2
    return yh, yl


def _df_dot_rep(auh, aul, anh, anl, buh, bul, bnh, bnl):
    """df inner product in the rep layout (arc block once + node block)."""
    s1h, s1l = _df_dot_block(auh, aul, buh, bul)
    s2h, s2l = _df_dot_block(anh, anl, bnh, bnl)
    return _df_add2(s1h, s1l, s2h, s2l)


# -- chunk-wise ref helpers -------------------------------------------------
#
# Every full-(R, 128) df expression would materialize ~8-15 R-sized
# temporaries (the split/EFT intermediates), which the Mosaic compiler
# spills — at 500k arcs the first full-array version needed 136 MB of VMEM.
# Processing CHUNK rows at a time bounds temporaries to (128, 128) tiles.

#: rows per elementwise tile: big enough to amortize loop overhead, small
#: enough that the ~10 EFT temporaries stay a few MB (spill-safe).
_EW_BLOCK = 8  # chunks (1024 rows)


def _for_chunks(c_chunks, fn):
    """Run ``fn(row_slice)`` over the R rows in large blocks + a chunk tail
    (c_chunks is often prime — e.g. 37 at 500k arcs — so a single static
    block size cannot tile it)."""
    big = c_chunks // _EW_BLOCK

    if big:
        def body_big(i, _):
            fn(pl.ds(i * (_EW_BLOCK * CHUNK), _EW_BLOCK * CHUNK))
            return 0
        jax.lax.fori_loop(0, big, body_big, 0)

    rem = c_chunks - big * _EW_BLOCK
    if rem:
        base = big * _EW_BLOCK

        def body_rem(c, _):
            fn(pl.ds((base + c) * CHUNK, CHUNK))
            return 0
        jax.lax.fori_loop(0, rem, body_rem, 0)


def _df_scale_ref(dsth, dstl, srch, srcl, a_h, a_l, c_chunks):
    """dst = a·src, chunk-wise."""
    def fn(sl):
        h, l = _df_scale(srch[sl, :], srcl[sl, :], a_h, a_l)
        dsth[sl, :] = h
        dstl[sl, :] = l
    _for_chunks(c_chunks, fn)


def _df_dot_ref(ah, al, bh, bl, c_chunks):
    """Σ a·b over an (R, 128) ref pair.

    Per chunk only the df PRODUCTS are formed and df-accumulated into a
    (128, 128) tile pair; the expensive lane/row fold (≈7 full-width levels
    — lane-halving does NOT shrink VPU cost) runs ONCE at the end instead
    of once per chunk."""
    z = jnp.zeros((CHUNK, LANE), jnp.float32)

    def body(c, carry):
        th, tl = carry
        sl = pl.ds(c * CHUNK, CHUNK)
        ph, pe = _two_prod(ah[sl, :], bh[sl, :])
        pe = pe + (ah[sl, :] * bl[sl, :] + al[sl, :] * bh[sl, :])
        return _df_add2(th, tl, ph, pe)

    th, tl = jax.lax.fori_loop(0, c_chunks, body, (z, z))
    th, tl = _df_lane_fold(th, tl)
    th, tl = _df_row_fold(th, tl)
    return th[0, 0], tl[0, 0]


def _df_axpy_dot_ref(wh, wl, a_h, a_l, xh, xl, gh, gl, c_chunks):
    """Fused ``w -= a·x`` (in place) + tile-accumulated ``Σ g·w'``: one pass
    over the data instead of two, dot folded once at the end. ``gh=None``
    accumulates ``Σ w'·w'`` (the β² reduction). Processes ``_EW_BLOCK``
    chunks per iteration (plus a chunk-sized tail — c_chunks is often
    prime) with a matching pair of accumulator tiles."""

    def make_body(rows, base_chunks):
        def body(c, carry):
            th, tl = carry
            sl = pl.ds((base_chunks + c * (rows // CHUNK)) * CHUNK, rows)
            h, l = _df_axpy(wh[sl, :], wl[sl, :], a_h, a_l,
                            xh[sl, :], xl[sl, :])
            wh[sl, :] = h
            wl[sl, :] = l
            if gh is None:
                ph, pe = _two_prod(h, h)
                pe = pe + 2.0 * (h * l)
            else:
                ph, pe = _two_prod(gh[sl, :], h)
                pe = pe + (gh[sl, :] * l + gl[sl, :] * h)
            return _df_add2(th, tl, ph, pe)
        return body

    big = c_chunks // _EW_BLOCK
    rem = c_chunks - big * _EW_BLOCK
    acc = []
    if big:
        zb = jnp.zeros((_EW_BLOCK * CHUNK, LANE), jnp.float32)
        th, tl = jax.lax.fori_loop(
            0, big, make_body(_EW_BLOCK * CHUNK, 0), (zb, zb))
        acc.append(_df_row_fold(*_df_lane_fold(th, tl)))
    if rem:
        zs = jnp.zeros((CHUNK, LANE), jnp.float32)
        th, tl = jax.lax.fori_loop(
            0, rem, make_body(CHUNK, big * _EW_BLOCK), (zs, zs))
        acc.append(_df_row_fold(*_df_lane_fold(th, tl)))
    (h0, l0) = acc[0]
    sh, sl_ = h0[0, 0], l0[0, 0]
    if len(acc) > 1:
        sh, sl_ = _df_add2(sh, sl_, acc[1][0][0, 0], acc[1][1][0, 0])
    return sh, sl_


def _df_axpy2_ref(wh, wl, b_h, b_l, xh, xl, a_h, a_l, yh, yl, c_chunks):
    """Fused double axpy: ``w -= b·x; w -= a·y`` in one pass per chunk."""
    def fn(sl):
        h, l = _df_axpy(wh[sl, :], wl[sl, :], b_h, b_l, xh[sl, :], xl[sl, :])
        h, l = _df_axpy(h, l, a_h, a_l, yh[sl, :], yl[sl, :])
        wh[sl, :] = h
        wl[sl, :] = l
    _for_chunks(c_chunks, fn)


def _df_dot_rep_ref(auh, aul, anh, anl, buh, bul, bnh, bnl, c_chunks):
    """Rep-layout df inner product on refs (arc block chunked, node full)."""
    s1h, s1l = _df_dot_ref(auh, aul, buh, bul, c_chunks)
    s2h, s2l = _df_dot_block(anh[:], anl[:], bnh[:], bnl[:])
    return _df_add2(s1h, s1l, s2h, s2l)


# ---------------------------------------------------------------------------
# Pass one (scalars only)
# ---------------------------------------------------------------------------

def _df_pass_one_kernel(
    duh, dul, esu, eou, gnu, dvh, dvl, esv, eov, gnv,
    buh, bul, bvh, bvl, bnh, bnl, winu, winv,
    alphas_h, alphas_l, betas_h, betas_l, bnorm2, steps_out,
    su, sv, sn,
    *, k, p_hi, c_chunks, tol, ztol, wg_u=0, wg_v=0,
):
    # stacked scratches: slots 0..2 = hi {v_prev, v_curr, w}; 3..5 = lo
    vpuh, vcuh, wuh = su.at[0], su.at[1], su.at[2]
    vpul, vcul, wul = su.at[3], su.at[4], su.at[5]
    vpvh, vcvh, wvh = sv.at[0], sv.at[1], sv.at[2]
    vpvl, vcvl, wvl = sv.at[3], sv.at[4], sv.at[5]
    vpnh, vcnh, wnh = sn.at[0], sn.at[1], sn.at[2]
    vpnl, vcnl, wnl = sn.at[3], sn.at[4], sn.at[5]

    nbh, nbl = _df_dot_rep_ref(buh, bul, bnh, bnl,
                               buh, bul, bnh, bnl, c_chunks)
    b_nh, b_nl = _df_scalar_sqrt(nbh, nbl)
    bnorm2[0] = b_nh
    bnorm2[1] = b_nl
    zero_b = b_nh <= ztol
    inh, inl = _df_scalar_recip(jnp.where(zero_b, 1.0, b_nh), b_nl)
    inh = jnp.where(zero_b, 0.0, inh)
    inl = jnp.where(zero_b, 0.0, inl)
    _df_scale_ref(vcuh, vcul, buh, bul, inh, inl, c_chunks)
    _df_scale_ref(vcvh, vcvl, bvh, bvl, inh, inl, c_chunks)
    h, l = _df_scale(bnh[:], bnl[:], inh, inl)
    vcnh[:] = h
    vcnl[:] = l
    for ref in (vpuh, vpul, vpvh, vpvl, vpnh, vpnl):
        ref[:] = jnp.zeros(ref.shape, jnp.float32)

    orders = (
        (vcuh, vcul, wuh, wul, duh, dul, esu, eou, gnu, winu, 1.0, wg_u),
        (vcvh, vcvl, wvh, wvl, dvh, dvl, esv, eov, gnv, winv, -1.0, wg_v),
    )

    def step(j, carry):
        bph, bpl, done = carry
        executed = jnp.logical_not(done)
        _df_emit_matvec(orders, vcnh, vcnl, wnh, wnl,
                        p_hi=p_hi, c_chunks=c_chunks)
        # u block: fused (w -= β_prev·vp) + Σ vc·w' tile accumulation
        s1h, s1l = _df_axpy_dot_ref(wuh, wul, bph, bpl, vpuh, vpul,
                                    vcuh, vcul, c_chunks)
        hh, ll = _df_axpy(wnh[:], wnl[:], bph, bpl, vpnh[:], vpnl[:])
        wnh[:] = hh
        wnl[:] = ll
        s2h, s2l = _df_dot_block(vcnh[:], vcnl[:], wnh[:], wnl[:])
        ah, al = _df_add2(s1h, s1l, s2h, s2l)
        # u block: fused (w -= α·vc) + Σ w'·w'
        q1h, q1l = _df_axpy_dot_ref(wuh, wul, ah, al, vcuh, vcul,
                                    None, None, c_chunks)
        # v block: both axpys deferred until α is known, one pass
        _df_axpy2_ref(wvh, wvl, bph, bpl, vpvh, vpvl, ah, al, vcvh, vcvl,
                      c_chunks)
        hh, ll = _df_axpy(wnh[:], wnl[:], ah, al, vcnh[:], vcnl[:])
        wnh[:] = hh
        wnl[:] = ll
        q2h, q2l = _df_dot_block(wnh[:], wnl[:], wnh[:], wnl[:])
        b2h, b2l = _df_add2(q1h, q1l, q2h, q2l)
        bh, bl = _df_scalar_sqrt(b2h, b2l)
        breakdown = bh <= tol
        advance = jnp.logical_and(executed, jnp.logical_not(breakdown))
        alphas_h[j] = jnp.where(executed, ah, 0.0)
        alphas_l[j] = jnp.where(executed, al, 0.0)
        betas_h[j] = jnp.where(advance, bh, 0.0)
        betas_l[j] = jnp.where(advance, bl, 0.0)
        ibh, ibl = _df_scalar_recip(jnp.where(advance, bh, 1.0), bl)
        ibh = jnp.where(advance, ibh, 0.0)
        ibl = jnp.where(advance, ibl, 0.0)

        @pl.when(advance)
        def _advance():
            # fused rotate+normalize per ordering: vp <- vc; vc <- w·(1/β)
            def rot(vph, vpl, vch, vcl, wh, wl):
                def fn(sl):
                    vph[sl, :] = vch[sl, :]
                    vpl[sl, :] = vcl[sl, :]
                    h2, l2 = _df_scale(wh[sl, :], wl[sl, :], ibh, ibl)
                    vch[sl, :] = h2
                    vcl[sl, :] = l2
                _for_chunks(c_chunks, fn)

            rot(vpuh, vpul, vcuh, vcul, wuh, wul)
            rot(vpvh, vpvl, vcvh, vcvl, wvh, wvl)
            vpnh[:] = vcnh[:]
            vpnl[:] = vcnl[:]
            h2, l2 = _df_scale(wnh[:], wnl[:], ibh, ibl)
            vcnh[:] = h2
            vcnl[:] = l2

        steps_out[0] = steps_out[0] + executed.astype(jnp.int32)
        return (jnp.where(advance, bh, bph), jnp.where(advance, bl, bpl),
                jnp.logical_or(done, breakdown))

    steps_out[0] = 0
    jax.lax.fori_loop(0, k, step,
                      (jnp.float32(0.0), jnp.float32(0.0), zero_b))


# ---------------------------------------------------------------------------
# Pass two (stored-β replay, df)
# ---------------------------------------------------------------------------

def _df_pass_two_kernel(
    duh, dul, esu, eou, gnu, dvh, dvl, esv, eov, gnv,
    buh, bul, bvh, bvl, bnh, bnl, winu, winv,
    alphas_h, alphas_l, betas_h, betas_l, yh, yl, bnorm2, steps_in,
    xuh, xul, xnh, xnl,
    su, sv, sn,
    *, k, p_hi, c_chunks, ztol, wg_u=0, wg_v=0,
):
    vpuh, vcuh, wuh = su.at[0], su.at[1], su.at[2]
    vpul, vcul, wul = su.at[3], su.at[4], su.at[5]
    vpvh, vcvh, wvh = sv.at[0], sv.at[1], sv.at[2]
    vpvl, vcvl, wvl = sv.at[3], sv.at[4], sv.at[5]
    vpnh, vcnh, wnh = sn.at[0], sn.at[1], sn.at[2]
    vpnl, vcnl, wnl = sn.at[3], sn.at[4], sn.at[5]

    steps = steps_in[0]
    # Same zero-b cutoff as pass one (ztol = 1000·tiny, the underflow-based
    # zero_tolerance): a subnormal-norm b that pass one recorded as steps=0
    # must not hit the reciprocal (1/b_norm overflows to inf in f32 and the
    # y-masked accumulation would then produce 0·inf = NaN).
    zero_b = bnorm2[0] <= ztol
    inh, inl = _df_scalar_recip(
        jnp.where(zero_b, 1.0, bnorm2[0]), bnorm2[1])
    inh = jnp.where(zero_b, 0.0, inh)
    inl = jnp.where(zero_b, 0.0, inl)
    _df_scale_ref(vcuh, vcul, buh, bul, inh, inl, c_chunks)
    _df_scale_ref(vcvh, vcvl, bvh, bvl, inh, inl, c_chunks)
    h, l = _df_scale(bnh[:], bnl[:], inh, inl)
    vcnh[:] = h
    vcnl[:] = l
    for ref in (vpuh, vpul, vpvh, vpvl, vpnh, vpnl):
        ref[:] = jnp.zeros(ref.shape, jnp.float32)

    # x = y[0]·v1
    y0h, y0l = yh[0], yl[0]
    _df_scale_ref(xuh, xul, vcuh, vcul, y0h, y0l, c_chunks)
    h, l = _df_scale(vcnh[:], vcnl[:], y0h, y0l)
    xnh[:] = h
    xnl[:] = l

    orders = (
        (vcuh, vcul, wuh, wul, duh, dul, esu, eou, gnu, winu, 1.0, wg_u),
        (vcvh, vcvl, wvh, wvl, dvh, dvl, esv, eov, gnv, winv, -1.0, wg_v),
    )

    def step(j, _):
        active = j < steps - 1
        jm1 = jnp.maximum(j - 1, 0)
        a_h, a_l = alphas_h[j], alphas_l[j]
        bp_h = jnp.where(j > 0, betas_h[jm1], 0.0)
        bp_l = jnp.where(j > 0, betas_l[jm1], 0.0)
        bj_h, bj_l = betas_h[j], betas_l[j]
        yn_h, yn_l = yh[j + 1], yl[j + 1]

        _df_emit_matvec(orders, vcnh, vcnl, wnh, wnl,
                        p_hi=p_hi, c_chunks=c_chunks)
        ib_h, ib_l = _df_scalar_recip(jnp.where(bj_h > 0, bj_h, 1.0), bj_l)
        ib_h = jnp.where(active, ib_h, 0.0)
        ib_l = jnp.where(active, ib_l, 0.0)

        # ONE pass per ordering: the identical df FP sequence to pass one —
        # axpy(β_prev), axpy(α), reciprocal-multiply by the STORED df β
        # (bit-faithful replay) — fused with the rotate and, for the
        # u/node blocks, the x += y_{j+1}·v_next accumulation. Inactive
        # steps degrade to no-ops via ib = 0 (v_next = 0, y masked) and
        # `active`-selected rotates; w need not be stored (the next step's
        # matvec overwrites it).
        def fused(wh, wl, vph, vpl, vch, vcl, xh_r, xl_r):
            def fn(sl):
                h, l = _df_axpy(wh[sl, :], wl[sl, :], bp_h, bp_l,
                                vph[sl, :], vpl[sl, :])
                h, l = _df_axpy(h, l, a_h, a_l, vch[sl, :], vcl[sl, :])
                vh, vl = _df_scale(h, l, ib_h, ib_l)
                vpuh_new = jnp.where(active, vch[sl, :], vph[sl, :])
                vpul_new = jnp.where(active, vcl[sl, :], vpl[sl, :])
                vph[sl, :] = vpuh_new
                vpl[sl, :] = vpul_new
                vch[sl, :] = jnp.where(active, vh, vch[sl, :])
                vcl[sl, :] = jnp.where(active, vl, vcl[sl, :])
                if xh_r is not None:
                    ph, pe = _two_prod(vh, yn_h)
                    pe = pe + (vh * yn_l + vl * yn_h)
                    h2, l2 = _df_add2(xh_r[sl, :], xl_r[sl, :], ph, pe)
                    xh_r[sl, :] = h2
                    xl_r[sl, :] = l2
            _for_chunks(c_chunks, fn)

        fused(wuh, wul, vpuh, vpul, vcuh, vcul, xuh, xul)
        fused(wvh, wvl, vpvh, vpvl, vcvh, vcvl, None, None)

        # node block (tiny): same sequence, full-array
        h1, l1 = _df_axpy(wnh[:], wnl[:], bp_h, bp_l, vpnh[:], vpnl[:])
        h1, l1 = _df_axpy(h1, l1, a_h, a_l, vcnh[:], vcnl[:])
        vh, vl = _df_scale(h1, l1, ib_h, ib_l)
        vpn_new_h = jnp.where(active, vcnh[:], vpnh[:])
        vpn_new_l = jnp.where(active, vcnl[:], vpnl[:])
        vpnh[:] = vpn_new_h
        vpnl[:] = vpn_new_l
        vcnh[:] = jnp.where(active, vh, vcnh[:])
        vcnl[:] = jnp.where(active, vl, vcnl[:])
        ph, pe = _two_prod(vh, yn_h)
        pe = pe + (vh * yn_l + vl * yn_h)
        h2, l2 = _df_add2(xnh[:], xnl[:], ph, pe)
        xnh[:] = h2
        xnl[:] = l2

        return 0

    if k > 1:
        jax.lax.fori_loop(0, k - 1, step, 0)


# ---------------------------------------------------------------------------
# Grid-streaming df matvec: instances beyond the resident VMEM cap
# ---------------------------------------------------------------------------

def _df_matvec_streaming_kernel(duh, dul, esu, eou, gnu, dvh, dvl, esv, eov,
                                gnv, xu, xv, xn, winu, winv,
                                yu, yv, yn, acc, *, p_hi, wg_u, wg_v):
    """One grid step = one CHUNK of both orderings, df blocks streamed from
    HBM (Pallas double-buffers them) — the df analogue of
    ``kkt_fused._matvec_streaming_kernel``. The node table and the df
    scatter accumulator stay resident; the accumulator flushes to ``yn`` at
    the last (sequential) grid step."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    for (x_ref, y_ref, dh_ref, dl_ref, es_ref, eo_ref, gn_ref, win_ref,
         sign, wg) in (
            (xu, yu, duh, dul, esu, eou, gnu, winu, 1.0, wg_u),
            (xv, yv, dvh, dvl, esv, eov, gnv, winv, -1.0, wg_v)):
        yh, yl = _df_chunk_matvec_scatter(
            x_ref[0], x_ref[1], es_ref[:], eo_ref[:],
            dh_ref[:], dl_ref[:], gn_ref[0], win_ref[i], sign, wg,
            xn.at[0], xn.at[1], acc.at[0], acc.at[1], p_hi=p_hi)
        y_ref[0] = yh
        y_ref[1] = yl

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        yn[:] = acc[:]


def df_kkt_streaming_matvec(arrs, wins, xu2, xv2, xn2, *, p_hi: int,
                            c_chunks: int, p2: int, wg_u: int = 0,
                            wg_v: int = 0, interpret: bool = False):
    """Grid-blocked double-float A·x in the rep layout; any instance size
    (arc data re-read from HBM per matvec). Same stacked-pair interface as
    :func:`df_kkt_matvec`; the node output is the LOCAL partial when used
    per-shard."""
    r = xu2.shape[1]
    blk = lambda: pl.BlockSpec((CHUNK, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    blk2 = lambda: pl.BlockSpec((2, CHUNK, LANE), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    gnb = lambda: pl.BlockSpec((1, CHUNK, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    full2 = pl.BlockSpec((2, p2, LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = functools.partial(_df_matvec_streaming_kernel, p_hi=p_hi,
                             wg_u=wg_u, wg_v=wg_v)
    return pl.pallas_call(
        kern,
        grid=(c_chunks,),
        in_specs=[blk(), blk(), blk(), blk(), gnb(),
                  blk(), blk(), blk(), blk(), gnb(),
                  blk2(), blk2(), full2, sm, sm],
        out_specs=[blk2(), blk2(), full2],
        out_shape=[
            jax.ShapeDtypeStruct((2, r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2, r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2, p2, LANE), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, p2, LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*arrs, xu2, xv2, xn2, *wins)


# ---------------------------------------------------------------------------
# Standalone df matvec (per-step building block for the sharded df solver)
# ---------------------------------------------------------------------------

def _df_matvec_kernel(duh, dul, esu, eou, gnu, dvh, dvl, esv, eov, gnv,
                      xuh, xul, xvh, xvl, xnh, xnl, winu, winv,
                      yuh, yul, yvh, yvl, ynh, ynl, *, p_hi, c_chunks,
                      wg_u=0, wg_v=0):
    orders = (
        (xuh, xul, yuh, yul, duh, dul, esu, eou, gnu, winu, 1.0, wg_u),
        (xvh, xvl, yvh, yvl, dvh, dvl, esv, eov, gnv, winv, -1.0, wg_v),
    )
    _df_emit_matvec(orders, xnh, xnl, ynh, ynl, p_hi=p_hi, c_chunks=c_chunks)


def df_kkt_matvec(arrs, wins, xu2, xv2, xn2, *, p_hi: int, c_chunks: int,
                  p2: int, wg_u: int = 0, wg_v: int = 0,
                  interpret: bool = False):
    """One double-float A·x in the rep layout (standalone pallas_call).

    ``arrs`` = the 10 per-ordering arc arrays (d hi/lo, es, eo, gn3 × u, v);
    ``xu2``/``xv2`` are stacked (2, R, 128) df pairs (hi plane 0, lo plane
    1), ``xn2`` is (2, P2, 128). Returns ``(yu2, yv2, yn2_partial)`` in the
    same stacked form — ``yn2_partial`` is the LOCAL node scatter partial
    (the sharded solver df-folds partials across devices).
    """
    r = xu2.shape[1]
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kern(*refs):
        (duh, dul, esu, eou, gnu, dvh, dvl, esv, eov, gnv,
         xu, xv, xn, winu, winv, yu, yv, yn) = refs
        _df_matvec_kernel(
            duh, dul, esu, eou, gnu, dvh, dvl, esv, eov, gnv,
            xu.at[0], xu.at[1], xv.at[0], xv.at[1], xn.at[0], xn.at[1],
            winu, winv,
            yu.at[0], yu.at[1], yv.at[0], yv.at[1], yn.at[0], yn.at[1],
            p_hi=p_hi, c_chunks=c_chunks, wg_u=wg_u, wg_v=wg_v)

    yu2, yv2, yn2 = pl.pallas_call(
        kern,
        in_specs=[vm] * 13 + [sm, sm],
        out_specs=[vm] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((2, r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2, r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2, p2, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*arrs, xu2, xv2, xn2, *wins)
    return yu2, yv2, yn2


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

class DFFusedKKTSolver:
    """Fused VMEM-resident two-pass f(A)·b in double-float.

    Usage::

        s = DFFusedKKTSolver(quad_costs_f64, arc_u, arc_v, num_nodes)
        x, (alphas64, betas64, steps) = s.solve(b_f64, k=200, f="inv")

    ``x`` and the coefficients come back as f64 (hi+lo recombined). The
    projected k×k solve runs on the host in f64 (tiny), like
    ``algorithms/df.solve_fAb_df``.
    """

    VMEM_BUDGET = 110 * 1024 * 1024
    #: bytes per padded slot before padding: per ordering d hi/lo + es i32 +
    #: eo i16 = 14, plus 4 b inputs (16) and 12 work slots (48) = 92.
    #: Exact layout-derived check below.
    BYTES_PER_SLOT = 92
    #: conservative pre-screen (≤40% padding assumed) for path selection
    #: without a layout build; exact guard in ``__init__``.
    MAX_ARCS = int(VMEM_BUDGET / (92 * 1.4))  # ~895k

    @classmethod
    def pass_vmem_bytes(cls, layout: SortedKKTLayout) -> int:
        """Exact per-pass VMEM footprint for ``layout`` (df kernels): per
        ordering d hi/lo + es i32 + the (possibly i16) eo plane, 4 b input
        planes, 12 stacked work slots, the (6,P2,128) node scratch + 2 node
        inputs + group tables."""
        slot = layout.u.R * LANE
        small = layout.P2 * LANE * 4
        gn = layout.u.C * CHUNK * 4 * 4
        es_b = layout.u.es2.dtype.itemsize
        eo_b = layout.u.eo2.dtype.itemsize
        per_ordering = slot * (4 + 4 + es_b + eo_b)  # d hi, d lo, es, eo
        # + pass two's xuh/xul outputs (2 big) and xnh/xnl outputs (2 small)
        return (2 * per_ordering + 2 * gn + (4 + 12 + 2) * slot * 4
                + (2 + 6 + 2) * small)

    def __init__(self, quad_costs, arc_u, arc_v, num_nodes,
                 interpret: bool = False, windowed: bool = False):
        d64 = np.asarray(quad_costs, np.float64)
        m = len(d64)
        if m > self.MAX_ARCS and not interpret:
            raise ValueError(
                f"instance has {m} arcs; the df fused solver fits "
                f"~{self.MAX_ARCS} arcs per chip (state is 2x the f32 "
                "kernel's). Use parallel.DFShardedFusedKKTSolver (arc-"
                "sharded over a mesh) or algorithms.df.DFKKTOperator + "
                "solve_fAb_df for larger instances.")
        d_hi = d64.astype(np.float32)
        d_lo = (d64 - d_hi.astype(np.float64)).astype(np.float32)
        self.layout = SortedKKTLayout.build(
            d_hi, arc_u, arc_v, num_nodes, dtype=np.float32,
            windowed=windowed)
        need = self.pass_vmem_bytes(self.layout)
        if need > self.VMEM_BUDGET and not interpret:
            raise ValueError(
                f"instance needs {need} bytes of VMEM for a fused df pass"
                f" (R={self.layout.u.R} padded rows from {m} arcs), over the"
                f" {self.VMEM_BUDGET}-byte per-chip budget. Use"
                " parallel.DFShardedFusedKKTSolver or the df streaming"
                " matvec path.")
        lay = self.layout
        self.interpret = interpret
        self.n = lay.m + lay.p

        def lo_plane(o):
            flat = np.zeros(o.R * LANE, np.float32)
            flat[o.pos] = d_lo
            return flat.reshape(o.R, LANE)

        as_dev = jnp.asarray
        self._arrs = tuple(as_dev(a) for a in (
            lay.u.d2, lo_plane(lay.u), lay.u.es2, lay.u.eo2, lay.u.gn3,
            lay.v.d2, lo_plane(lay.v), lay.v.es2, lay.v.eo2, lay.v.gn3,
        ))
        self._wins = (as_dev(lay.u.win), as_dev(lay.v.win))
        # jit cache: building a pallas_call re-traces the whole Mosaic
        # kernel (~1-2 s host-side at 500k arcs) — cache per k
        self._jits = {}

    # -- packing ----------------------------------------------------------
    def pack(self, b):
        """(n,) f64 -> six df rep planes (buh, bul, bvh, bvl, bnh, bnl)."""
        b64 = np.asarray(b, np.float64)
        hi = b64.astype(np.float32)
        lo = (b64 - hi.astype(np.float64)).astype(np.float32)
        lay = self.layout
        uh, uv, un = lay.pack(hi)
        lh, lv, ln = lay.pack(lo)
        return tuple(jnp.asarray(a) for a in (uh, lh, uv, lv, un, ln))

    def unpack64(self, xuh, xul, xnh, xnl) -> np.ndarray:
        lay = self.layout
        xu = (np.asarray(xuh, np.float64).reshape(-1)
              + np.asarray(xul, np.float64).reshape(-1))
        xn = (np.asarray(xnh, np.float64).reshape(-1)
              + np.asarray(xnl, np.float64).reshape(-1))
        return np.concatenate([xu[lay.u.pos], xn[: lay.p]])

    # -- kernels ----------------------------------------------------------
    def _scratch(self):
        lay = self.layout
        return [
            pltpu.VMEM((6, lay.u.R, LANE), jnp.float32),
            pltpu.VMEM((6, lay.v.R, LANE), jnp.float32),
            pltpu.VMEM((6, lay.P2, LANE), jnp.float32),
        ]

    def _raw_p1(self, k: int):
        key = ("p1raw", k)
        if key not in self._jits:
            lay = self.layout
            vm = pl.BlockSpec(memory_space=pltpu.VMEM)
            sm = pl.BlockSpec(memory_space=pltpu.SMEM)
            kern = functools.partial(
                _df_pass_one_kernel, k=k, p_hi=lay.p_hi, c_chunks=lay.u.C,
                tol=np.float32(DF_BREAKDOWN_TOL),
                ztol=np.float32(1000.0 * np.finfo(np.float32).tiny),
                wg_u=lay.u.wg, wg_v=lay.v.wg)
            self._jits[key] = pl.pallas_call(
                kern,
                in_specs=[vm] * 16 + [sm, sm],
                out_specs=[sm] * 6,
                out_shape=[
                    jax.ShapeDtypeStruct((k,), jnp.float32),
                    jax.ShapeDtypeStruct((k,), jnp.float32),
                    jax.ShapeDtypeStruct((k,), jnp.float32),
                    jax.ShapeDtypeStruct((k,), jnp.float32),
                    jax.ShapeDtypeStruct((2,), jnp.float32),
                    jax.ShapeDtypeStruct((1,), jnp.int32),
                ],
                scratch_shapes=self._scratch(),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT),
                interpret=self.interpret,
            )
        return self._jits[key]

    def _raw_p2(self, k: int):
        key = ("p2raw", k)
        if key not in self._jits:
            lay = self.layout
            vm = pl.BlockSpec(memory_space=pltpu.VMEM)
            sm = pl.BlockSpec(memory_space=pltpu.SMEM)
            kern = functools.partial(
                _df_pass_two_kernel, k=k, p_hi=lay.p_hi, c_chunks=lay.u.C,
                ztol=np.float32(1000.0 * np.finfo(np.float32).tiny),
                wg_u=lay.u.wg, wg_v=lay.v.wg)
            self._jits[key] = pl.pallas_call(
                kern,
                in_specs=[vm] * 16 + [sm] * 10,
                out_specs=[vm] * 4,
                out_shape=[
                    jax.ShapeDtypeStruct((lay.u.R, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((lay.u.R, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((lay.P2, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((lay.P2, LANE), jnp.float32),
                ],
                scratch_shapes=self._scratch(),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT),
                interpret=self.interpret,
            )
        return self._jits[key]

    def pass_one(self, b_rep, k: int):
        key = ("p1", k)
        if key not in self._jits:
            self._jits[key] = jax.jit(self._raw_p1(k))
        ah, al, bh, bl, bnorm2, steps = self._jits[key](
            *self._arrs, *b_rep, *self._wins)
        return ah, al, bh, bl, bnorm2, steps

    def pass_two(self, b_rep, coeffs, y_h, y_l):
        ah, al, bh, bl, bnorm2, steps = coeffs
        k = int(ah.shape[0])
        key = ("p2", k)
        if key not in self._jits:
            self._jits[key] = jax.jit(self._raw_p2(k))
        return self._jits[key](*self._arrs, *b_rep, *self._wins,
                               ah, al, bh, bl, y_h, y_l, bnorm2, steps)

    # -- transfer-batched end-to-end --------------------------------------
    #
    # Every host<->device transfer on the tunneled runtime costs a full
    # ~30 ms round trip, so the solve ships exactly FOUR: b (one stacked
    # array), the packed pass-one coefficients (one readback for the host
    # f(T_k) solve), y (one stacked upload), and x (one stacked readback).
    # The unbatched version paid ~15 round trips = ~0.45 s of fixed cost.

    def pack_flat(self, b) -> jax.Array:
        """(n,) f64 -> ONE stacked (4R + 2·P2, 128) device array."""
        b64 = np.asarray(b, np.float64)
        hi = b64.astype(np.float32)
        lo = (b64 - hi.astype(np.float64)).astype(np.float32)
        lay = self.layout
        uh, vh_, nh = lay.pack(hi)
        ul, vl_, nl = lay.pack(lo)
        return jnp.asarray(np.concatenate([uh, ul, vh_, vl_, nh, nl], axis=0))

    def _split_flat(self, bf):
        r = self.layout.u.R
        p2 = self.layout.P2
        return (bf[:r], bf[r:2 * r], bf[2 * r:3 * r], bf[3 * r:4 * r],
                bf[4 * r:4 * r + p2], bf[4 * r + p2:])

    def _p1_flat(self, k: int):
        key = ("p1f", k)
        if key not in self._jits:

            def run(arrs, wins, bf):
                b_rep = self._split_flat(bf)
                ah, al, bh, bl, bn2, st = self._raw_p1(k)(*arrs, *b_rep, *wins)
                packed = jnp.concatenate(
                    [ah, al, bh, bl, bn2, st.astype(jnp.float32)])
                return packed, ah, al, bh, bl, bn2, st

            self._jits[key] = jax.jit(run)
        return self._jits[key]

    def _p2_flat(self, k: int):
        key = ("p2f", k)
        if key not in self._jits:

            def run(arrs, wins, bf, ah, al, bh, bl, bn2, st, y2):
                b_rep = self._split_flat(bf)
                xuh, xul, xnh, xnl = self._raw_p2(k)(
                    *arrs, *b_rep, *wins, ah, al, bh, bl,
                    y2[0], y2[1], bn2, st)
                return jnp.concatenate([xuh, xul, xnh, xnl], axis=0)

            self._jits[key] = jax.jit(run)
        return self._jits[key]

    def solve(self, b, *, k: int, f="inv"):
        """Two-pass f(A)·b in double-float; x returned as f64.

        Returns ``(x, (alphas_f64, betas_f64, steps))``.
        """
        bf = self.pack_flat(b)  # transfer 1 (up)
        packed, ah, al, bh, bl, bn2, st = self._p1_flat(k)(
            self._arrs, self._wins, bf)
        pk = np.asarray(packed, np.float64)  # transfer 2 (down)
        a64 = pk[:k] + pk[k:2 * k]
        b64 = pk[2 * k:3 * k] + pk[3 * k:4 * k]
        b_norm64 = pk[4 * k] + pk[4 * k + 1]
        steps = int(pk[4 * k + 2])
        if steps == 0:
            return np.zeros(self.n), (a64[:0], b64[:0], 0)
        from two_pass_lanczos_tpu.functions import host_f_tk_solve

        alphas = a64[:steps]
        betas = b64[: steps - 1]
        y = host_f_tk_solve(alphas, betas, f)
        y_full = np.zeros(k)
        y_full[:steps] = y * b_norm64
        y_h = y_full.astype(np.float32)
        y_l = (y_full - y_h.astype(np.float64)).astype(np.float32)
        y2 = jnp.asarray(np.stack([y_h, y_l]))  # transfer 3 (up)
        xf = self._p2_flat(k)(self._arrs, self._wins, bf,
                              ah, al, bh, bl, bn2, st, y2)
        xf = np.asarray(xf, np.float64)  # transfer 4 (down)
        r = self.layout.u.R
        p2 = self.layout.P2
        lay = self.layout
        xu = (xf[:r] + xf[r:2 * r]).reshape(-1)
        xn = (xf[2 * r:2 * r + p2] + xf[2 * r + p2:]).reshape(-1)
        x = np.concatenate([xu[lay.u.pos], xn[: lay.p]])
        return x, (alphas, betas, steps)
