"""Fully-fused VMEM-resident Lanczos passes for the KKT operator.

This is the production TPU hot path: one ``pallas_call`` per Lanczos pass,
with *all* state — the three Krylov work vectors, the arc data, and the node
table — resident in VMEM for the whole pass. It replaces both the reference's
per-iteration native SpMV (``src/algorithms/mod.rs:177``) and its in-process
vector kernels with a single on-chip program, eliminating per-step HBM
round-trips and per-step dispatch entirely.

Why this shape, on this hardware
--------------------------------
The measured per-step cost of the scan-based path on the target chip is
~2 ms: the one-hot MXU scatter streams 6 × m contraction columns per matvec
(6 cycles/arc) and every XLA scan iteration pays dispatch + HBM traffic for
each vector op. The KKT problem at 500k arcs is ~30 MB of state — far below
the ~128 MB of VMEM — so the fastest design is to never leave the chip's
vector memory.

Data layout: dual sorted orderings
----------------------------------
A scatter ``y_n[e_j] += x_j`` is the hard primitive on a TPU. The fix is to
make it *contiguous*: store the arc block **twice**, once sorted by the tail
node ``u`` and once by the head node ``v``, each node's slot run padded to a
multiple of 128 lanes. Then each scatter is a segmented sum with statically
known, lane-aligned segment boundaries:

* first level: a 128-lane row sum per group (pure VPU);
* second level: each chunk of 128 groups lands in a statically-known
  256-node window (guaranteed: every node owns ≥ 1 group, so 128 consecutive
  groups span ≤ 128 nodes) — a compare/select reduction into the window.

The Krylov vectors live in the duplicated representation
``[x_u (R·128), x_v (R·128), x_n (P2·128)]``; all Lanczos updates are
elementwise so both arc copies stay consistent by construction, and inner
products read the ``u`` copy + node block only. Gathers from the small node
table use the per-lane ``dynamic_gather`` (``take_along_axis`` on the lane
axis): the sorted endpoint needs only the chunk's static 2-row window, the
unsorted endpoint loops over all ``p_hi`` rows.

Padding invariants (what keeps the math exact):

* pad/inert slots carry ``d = 0`` and the SENTINEL endpoint ``p_hi·128`` —
  the node table's zero padding row — so both gather terms are exactly 0,
  their matvec output is 0, and they stay zero through every iteration,
  contributing nothing to the segmented sums;
* inert tail groups have relative node id 512 (outside every 256-window) so
  their row sums are discarded.

Numerical semantics match ``algorithms/core.py`` exactly (same op order,
reciprocal-multiply normalization, breakdown at ``1000·ε``, replay from the
stored β in pass two — reference ``src/algorithms/lanczos_two_pass.rs:176-199``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_pass_lanczos_tpu.algorithms.core import (
    LanczosDecomposition,
    breakdown_tolerance,
    zero_tolerance,
)
from two_pass_lanczos_tpu.functions import padded_f_e1

__all__ = ["SortedKKTLayout", "FusedKKTSolver"]

LANE = 128
CHUNK = 128  # groups (rows) per scatter/gather chunk
VMEM_LIMIT = 128 * 1024 * 1024  # v5e VMEM; the default scoped limit is 16 MB


def _round_up(x: int, mlt: int) -> int:
    return ((x + mlt - 1) // mlt) * mlt


def _clamped_window_base(smin, empty, wg, p_hi):
    """Window bases such that [base, base + wg) covers every real segment
    and stays inside the (p_hi + 1)-row padded node table; empty
    (all-sentinel) rows read the zero pad row harmlessly."""
    hi_base = max(p_hi + 1 - wg, 0)
    return np.where(empty, hi_base, np.minimum(smin, hi_base))


def reclamp_window(ordering: "_Ordering", wg: int, p_hi: int) -> "_Ordering":
    """Re-clamp an ordering's gather-window bases for a WIDER window ``wg``
    (>= the ordering's own): used when one kernel program must share a
    common static width across shards. A wider window still covers every
    span as long as the base stays <= the span minimum, which clamping
    downward preserves."""
    gn3 = ordering.gn3.copy()
    gn3[..., 1] = np.minimum(gn3[..., 1], max(p_hi + 1 - wg, 0))
    return dataclasses.replace(ordering, gn3=gn3)


@dataclasses.dataclass(frozen=True)
class _Ordering:
    """One sorted arc ordering (host-side build product).

    ``gn3`` carries four per-group channels: ``[..., 0]`` the group's
    relative node id for the scatter window (512 = inert); ``[..., 1]`` the
    group's other-endpoint gather window base row (valid when ``wg`` is
    set); ``[..., 2]``/``[..., 3]`` the group's *self*-endpoint node-table
    (row, lane) — the self endpoint is constant across a group by
    construction, so the VMEM-RESIDENT kernels build its gather as a
    per-group row-broadcast and drop the ``es`` plane from VMEM entirely
    (time-neutral on-chip, +30% resident arc capacity). The HBM-STREAMING
    kernel keeps the per-slot ``es`` gather instead: the broadcast + pad
    mask measured 8–9% slower there (VPU-gather-bound — PERF.md "Round-3
    layout compression"). The df kernels also use the per-slot planes.

    ``es2``/``eo2`` are stored int16 whenever every endpoint (and the
    sentinel ``p_hi·128``) fits — true for all instances with ≤ 32,640
    nodes — halving the index planes at zero measured widen cost; kernels
    widen to int32 at the read.
    """

    d2: np.ndarray  # (R, 128) f32 — quadratic costs, 0 at pad slots
    es2: np.ndarray  # (R, 128) i16/i32 — sorted ("self") endpoint per slot
    eo2: np.ndarray  # (R, 128) i16/i32 — other endpoint per slot
    gn3: np.ndarray  # (C, 128, 4) i32 — [rel id | eo base | es row | es lane]
    win: np.ndarray  # (C,) i32 — node-table row base of the chunk's window
    pos: np.ndarray  # (m,) i64 — original arc index -> flat slot
    R: int
    C: int
    wg: int  # other-endpoint gather window rows (0 = use the full loop)


def _build_ordering(d, key, other, p, dtype, windowed: bool) -> _Ordering:
    m = len(d)
    p_hi = _round_up(p, LANE) // LANE
    # sort by (key, other): intra-node ordering by the other endpoint gives
    # each 128-slot group a narrow static window of other-endpoint segments.
    order = np.lexsort((other, key))
    ksort = key[order].astype(np.int64)
    osort = other[order].astype(np.int64)
    dsort = np.asarray(d)[order]

    counts = np.bincount(key, minlength=p).astype(np.int64)
    gpn = np.maximum((counts + LANE - 1) // LANE, 1)  # every node >= 1 group
    gstart = np.concatenate([[0], np.cumsum(gpn)])[:-1]
    g_total = int(gpn.sum())
    c_chunks = max((g_total + CHUNK - 1) // CHUNK, 1)
    r_rows = c_chunks * CHUNK
    slots = r_rows * LANE

    node_first = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(m, dtype=np.int64) - node_first[ksort]
    slot = gstart[ksort] * LANE + rank

    # group -> node id (-1 for inert tail groups)
    gnode = np.full(r_rows, -1, np.int64)
    gnode[:g_total] = np.repeat(np.arange(p, dtype=np.int64), gpn)

    gn2 = gnode.reshape(c_chunks, CHUNK)
    first = gn2[:, 0]
    n0 = np.where(first >= 0, (first // LANE) * LANE, 0)

    # pad/inert slots: the sentinel endpoint (row p_hi = the node table's
    # zero padding row) makes BOTH gathers return exactly 0, so the slot's
    # matvec output is 0 and it stays 0 through every iteration.
    sentinel = np.int32(p_hi * LANE)
    dflat = np.zeros(slots, dtype)
    es = np.full(slots, sentinel, np.int32)
    eo = np.full(slots, sentinel, np.int32)
    dflat[slot] = dsort
    es[slot] = ksort
    eo[slot] = osort
    mask = np.zeros(slots, bool)
    mask[slot] = True

    gnrel = np.where(gnode >= 0, gnode - np.repeat(n0, CHUNK), 512)
    if not ((gnrel >= 0) & ((gnrel < 2 * LANE) | (gnrel == 512))).all():
        raise AssertionError("scatter window invariant violated")
    # sorted-endpoint gather shares the chunk's 2-row window: real es values
    # lie within [n0, n0 + 255] by the >= 1-group-per-node guarantee
    # (sentinels hit the zero padding row and contribute 0).
    row_of_es = (es.reshape(c_chunks, CHUNK * LANE) >> 7)
    win = (n0 // LANE).astype(np.int32)
    real2 = mask.reshape(c_chunks, CHUNK * LANE)
    ok = ~real2 | ((row_of_es >= win[:, None]) & (row_of_es <= win[:, None] + 1))
    if not ok.all():
        raise AssertionError("sorted-gather window invariant violated")

    # per-group other-endpoint window: rows [base, base + wg) of the node
    # table cover every real eo in the group; base clamped so the window
    # stays inside the (p_hi + 1)-row padded table.
    wg = 0  # 0 = no structure to exploit: kernels use the full p_hi loop
    base = np.zeros(r_rows, np.int64)
    if windowed:
        seg = (eo >> 7).reshape(r_rows, LANE)
        realr = mask.reshape(r_rows, LANE)
        smin = np.where(realr, seg, np.iinfo(np.int32).max).min(axis=1)
        smax = np.where(realr, seg, -1).max(axis=1)
        empty = smax < 0
        spans = np.where(empty, 1, smax - np.where(empty, 0, smin) + 1)
        wg = int(spans.max()) if r_rows else 1
        if wg >= p_hi:
            wg = 0
        else:
            base = _clamped_window_base(smin, empty, wg, p_hi)
    # per-group self-endpoint (row, lane) in the node table; inert groups
    # point at the zero pad row (their output is masked anyway, but the
    # read must stay in-bounds).
    g_es = np.where(gnode >= 0, gnode, p_hi * LANE)
    gn3 = np.stack([gnrel.reshape(c_chunks, CHUNK),
                    base.reshape(c_chunks, CHUNK),
                    (g_es >> 7).reshape(c_chunks, CHUNK),
                    (g_es & (LANE - 1)).reshape(c_chunks, CHUNK)],
                   axis=-1).astype(np.int32)

    # endpoint planes: int16 when every value incl. the sentinel fits
    es_plane = es.reshape(r_rows, LANE)
    eo_plane = eo.reshape(r_rows, LANE)
    if p_hi * LANE <= np.iinfo(np.int16).max:
        es_plane = es_plane.astype(np.int16)
        eo_plane = eo_plane.astype(np.int16)

    pos = np.empty(m, np.int64)
    pos[order] = slot
    return _Ordering(
        d2=dflat.reshape(r_rows, LANE),
        es2=es_plane,
        eo2=eo_plane,
        gn3=gn3,
        win=win,
        pos=pos,
        R=r_rows,
        C=c_chunks,
        wg=wg,
    )


@dataclasses.dataclass(frozen=True)
class SortedKKTLayout:
    """Host-side dual-ordering layout of one KKT instance.

    Build once per matrix (NumPy, O(m log m)); reused by every solve. The
    device arrays are uploaded lazily by :class:`FusedKKTSolver`.
    """

    u: _Ordering
    v: _Ordering
    m: int
    p: int
    p_hi: int
    P2: int
    dtype: np.dtype

    @classmethod
    def build(cls, quad_costs, arc_u, arc_v, num_nodes, dtype=np.float32,
              windowed: bool = False):
        # ``windowed=True`` enables the row-wise windowed other-endpoint
        # gather (``_rowwise_window_gather``). Measured on the target v5e it
        # is ~12% SLOWER than the full-loop gather (the tiny-K one-hot MXU
        # row-select stalls exceed the VPU savings), so it is opt-in — kept
        # because the trade-off may flip on hardware with different MXU/VPU
        # contention. See PERF.md.
        quad_costs = np.asarray(quad_costs)
        arc_u = np.asarray(arc_u, np.int64)
        arc_v = np.asarray(arc_v, np.int64)
        p = int(num_nodes)
        dtype = np.dtype(dtype)
        ou = _build_ordering(quad_costs, arc_u, arc_v, p, dtype, windowed)
        ov = _build_ordering(quad_costs, arc_v, arc_u, p, dtype, windowed)
        # equalize R (and C) so the kernel's chunk loop is uniform
        r = max(ou.R, ov.R)
        p_hi = _round_up(p, LANE) // LANE
        ou, ov = (_pad_ordering(o, r, p_hi) for o in (ou, ov))
        return cls(u=ou, v=ov, m=len(quad_costs), p=p, p_hi=p_hi,
                   P2=p_hi + 1, dtype=dtype)

    # ---- vector packing (host, NumPy) ----
    def pack(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(n,) -> (xu (R,128), xv (R,128), xn (P2,128)) in the rep layout."""
        x = np.asarray(x)
        xa, xn = x[: self.m], x[self.m:]
        xu = np.zeros(self.u.R * LANE, self.dtype)
        xv = np.zeros(self.v.R * LANE, self.dtype)
        xu[self.u.pos] = xa
        xv[self.v.pos] = xa
        xn_full = np.zeros(self.P2 * LANE, self.dtype)
        xn_full[: self.p] = xn
        return (xu.reshape(self.u.R, LANE), xv.reshape(self.v.R, LANE),
                xn_full.reshape(self.P2, LANE))

    def unpack(self, xu, xn) -> np.ndarray:
        """Rep layout -> (n,) in the original arc order."""
        xu = np.asarray(xu).reshape(-1)
        xn = np.asarray(xn).reshape(-1)
        return np.concatenate([xu[self.u.pos], xn[: self.p]])


def _pad_ordering(o: _Ordering, r: int, p_hi: int) -> _Ordering:
    """Pad an ordering to ``r`` rows with inert tail chunks. Pad slots carry
    the SENTINEL other-endpoint (``p_hi·128`` — masks the gather terms out
    of y) and the zero-pad-row self endpoint, so their matvec output is
    exactly 0 and they stay 0 through every iteration."""
    if o.R == r:
        return o
    c = r // CHUNK
    extra_r, extra_c = r - o.R, c - o.C
    sentinel = p_hi * LANE

    def padr(a, fill=0):
        return np.concatenate(
            [a, np.full((extra_r,) + a.shape[1:], fill, a.dtype)])

    gn_pad = np.stack([np.full((extra_c, CHUNK), 512, np.int32),
                       np.zeros((extra_c, CHUNK), np.int32),
                       np.full((extra_c, CHUNK), p_hi, np.int32),
                       np.zeros((extra_c, CHUNK), np.int32)], axis=-1)
    return _Ordering(
        d2=padr(o.d2), es2=padr(o.es2, sentinel), eo2=padr(o.eo2, sentinel),
        gn3=np.concatenate([o.gn3, gn_pad]),
        win=np.concatenate([o.win, np.zeros(extra_c, np.int32)]),
        pos=o.pos, R=r, C=c, wg=o.wg,
    )


# ---------------------------------------------------------------------------
# In-kernel building blocks
# ---------------------------------------------------------------------------

def _window_gather(xn_ref, e, row0, nrows):
    """g[r, l] = x_n[e[r, l]] for endpoints within rows [row0, row0+nrows).

    Per table row: broadcast to the tile, per-lane ``dynamic_gather``
    (``take_along_axis`` on the lane axis), select by the row each endpoint
    actually targets. ``nrows`` is static; ``row0`` may be traced.
    """
    lo = e & (LANE - 1)
    hi = e >> 7
    g = jnp.zeros(e.shape, jnp.float32)
    for t in range(nrows):
        r = row0 + t
        row = xn_ref[pl.ds(r, 1), :]
        picked = jnp.take_along_axis(jnp.broadcast_to(row, e.shape), lo, axis=1)
        g = jnp.where(hi == r, picked, g)
    return g


def _rowwise_window_gather(xn_ref, e, rb_col, wg):
    """g[r, l] = x_n[e[r, l]] where each ROW r's endpoints lie within its own
    static window [rb_col[r], rb_col[r] + wg) of node-table rows.

    Iteration t selects table row ``rb_col[r] + t`` PER ROW via a tiny exact
    one-hot contraction (K = table rows, one nonzero per output row) on the
    otherwise-idle MXU, then lane-gathers from it. Exploits the intra-node
    sort by the other endpoint: ``wg`` (the max per-group segment span,
    static) is typically 3–5 vs the full ``p_hi`` loop of
    :func:`_window_gather`.
    """
    p2 = xn_ref.shape[0]
    lo = e & (LANE - 1)
    hi = e >> 7
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, p2), 1)
    xn = xn_ref[:]
    g = jnp.zeros(e.shape, jnp.float32)
    for t in range(wg):
        ridx = rb_col + t  # (128, 1)
        oh = (ridx == rows_iota).astype(jnp.float32)  # (128, p2) exact
        tsel = jax.lax.dot_general(
            oh, xn, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (128, 128): row r of table
        picked = jnp.take_along_axis(tsel, lo, axis=1)
        g = jnp.where(hi == ridx, picked, g)
    return g


def _group_self_tile(xn_ref, gnrb, r0):
    """(CHUNK, LANE) tile whose row g is the constant ``x_n[self node of
    group g]``: the self endpoint is shared by every slot of a group, so
    instead of a per-slot gather over a streamed ``es`` plane this is a
    two-candidate-row select (the chunk's static 2-row window invariant)
    plus ONE lane gather of the per-group lane ids. Inert groups point at
    the zero pad row and read exactly 0."""
    es_row = gnrb[:, 2:3]  # (128, 1) — node-table row of each group's node
    es_lane = jnp.broadcast_to(gnrb[:, 3:4], (CHUNK, LANE))
    row0 = jnp.broadcast_to(xn_ref[pl.ds(r0, 1), :], (CHUNK, LANE))
    row1 = jnp.broadcast_to(xn_ref[pl.ds(r0 + 1, 1), :], (CHUNK, LANE))
    # inert groups (es_row = p_hi, outside the 2-row window) read row0
    # garbage here — their y is zeroed by the eo-sentinel mask in the
    # caller, so a 2-way select suffices (cheaper than 2 masked adds).
    t = jnp.where(es_row == r0 + 1, row1, row0)
    return jnp.take_along_axis(t, es_lane, axis=1)


def _emit_matvec(orders, xn_ref, wn_ref, *, p_hi, c_chunks):
    """w = A·x in the rep layout. ``orders`` is a pair of per-ordering tuples
    ``(x_ref, w_ref, d_ref, eo_ref, gn_ref, win_ref, sign, wg)``.

    Pad/inert slots carry the SENTINEL other endpoint ``p_hi·128``: the
    ``valid`` mask zeroes both gather terms for them, so (with d = 0 and
    x = 0 there) their output is exactly 0 every iteration."""
    wn_ref[:] = jnp.zeros(wn_ref.shape, jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)
    sentinel = p_hi * LANE
    for x_ref, w_ref, d_ref, eo_ref, gn_ref, win_ref, sign, wg in orders:

        def body(c, _, x_ref=x_ref, w_ref=w_ref, d_ref=d_ref,
                 eo_ref=eo_ref, gn_ref=gn_ref, win_ref=win_ref, sign=sign,
                 wg=wg):
            sl = pl.ds(c * CHUNK, CHUNK)
            x2 = x_ref[sl, :]
            eo = eo_ref[sl, :].astype(jnp.int32)
            r0 = win_ref[c]
            gnrb = gn_ref[c]  # (128, 4): [rel id|eo base|es row|es lane]
            g_s = _group_self_tile(xn_ref, gnrb, r0)
            if wg:
                g_o = _rowwise_window_gather(xn_ref, eo, gnrb[:, 1:2], wg)
            else:
                g_o = _window_gather(xn_ref, eo, 0, p_hi)
            valid = eo < sentinel
            y2 = d_ref[sl, :] * x2 + sign * jnp.where(valid, g_s - g_o, 0.0)
            if w_ref is not None:
                w_ref[sl, :] = y2
            # segmented-sum scatter: 128-lane row sums, then a compare/select
            # reduction into the chunk's static 256-node window.
            rs = jnp.sum(x2, axis=1, keepdims=True)  # (128, 1)
            gn = gnrb[:, 0:1]  # (128, 1) rel node ids
            s_lo = jnp.sum(jnp.where(gn == lanes, rs, 0.0), axis=0,
                           keepdims=True)
            s_hi = jnp.sum(jnp.where(gn - LANE == lanes, rs, 0.0), axis=0,
                           keepdims=True)
            wn_ref[pl.ds(r0, 1), :] = wn_ref[pl.ds(r0, 1), :] + sign * s_lo
            wn_ref[pl.ds(r0 + 1, 1), :] = (
                wn_ref[pl.ds(r0 + 1, 1), :] + sign * s_hi)
            return 0

        jax.lax.fori_loop(0, c_chunks, body, 0)


def _tree_sum(x):
    """Log-depth pairwise row-fold then reduce — f32 error ~log₂(N)·ε.

    Mosaic's plain ``jnp.sum`` over a tall (R, 128) array chains row adds
    sequentially (error ~√R·ε), which measurably perturbs the Lanczos
    coefficients; the fold restores pairwise-summation accuracy at ~2 extra
    passes over the data.
    """
    rows = x.shape[0]
    extra = None  # odd leftover rows, accumulated separately (slice-only ops)
    while rows > 8:
        if rows % 2:
            last = x[rows - 1:rows, :]
            extra = last if extra is None else extra + last
            rows -= 1
        h = rows // 2
        x = x[:h] + x[h:rows]
        rows = h
    total = jnp.sum(x)
    return total if extra is None else total + jnp.sum(extra)


def _dot_rep(au, an, bu, bn):
    """Inner product in the rep layout: arc block counted once (u copy)."""
    return _tree_sum(au * bu) + jnp.sum(an * bn)


# -- compensated (two-float) reduction option ------------------------------

def _ob(x):
    """Identity hook at the EFT pinch points (kernel-side).

    ``lax.optimization_barrier`` has no Mosaic lowering, and it is not
    needed here: the only compiler transform measured to break the
    error-free transformations is LLVM FMA contraction of *rounded
    products* on the XLA CPU path (interpret mode), which the mask-based
    split neutralizes by construction (every partial product is exact —
    see ``_mask_split``). Plain add-chain EFTs (two_sum) are preserved by
    XLA and Mosaic as-is (pinned by
    ``tests/test_df.py::test_eft_survives_jit_fusion`` and the fused df
    accuracy tests)."""
    return x


def _two_sum_k(a, b):
    """Knuth two_sum (exact addition) for the kernel helpers."""
    s = _ob(a + b)
    bb = _ob(s - a)
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _mask_split(a):
    """12-bit significand split by mantissa masking (integer ops): immune
    to the FMA-contraction hazard that breaks Veltkamp's multiplicative
    split on XLA CPU — see ``ops/df.py::_split`` for the full story. All
    partial products of the split pieces are exact in f32.

    Mosaic's ``tpu.bitcast`` is vector-only, so scalars ride through a
    (1, 128) broadcast (one vreg; the kernel's scalar df ops are O(k))."""
    scalar = getattr(a, "ndim", 0) == 0
    v = jnp.broadcast_to(a, (1, LANE)) if scalar else a
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-4096)), jnp.float32)
    if scalar:
        hi = hi[0, 0]
    return hi, a - hi


def _two_prod(a, b):
    """Compensated product: p + e = a·b to O(2^-48); contraction-proof
    (all partial products exact — see _mask_split)."""
    ah, al = _mask_split(a)
    bh, bl = _mask_split(b)
    p0 = ah * bh
    t1 = ah * bl
    t2 = al * bh
    r2 = al * bl
    s1, e1 = _two_sum_k(t1, t2)
    s2, e2 = _two_sum_k(p0, s1)
    tail = (e1 + e2) + r2
    hi = _ob(s2 + tail)
    lo = tail - (hi - s2)
    return hi, lo


def _df_add2(ah, al, bh, bl):
    """Two-float addition (Knuth two_sum + renormalize)."""
    s = _ob(ah + bh)
    bb = _ob(s - ah)
    e = (ah - (s - bb)) + (bh - bb) + (al + bl)
    hi = _ob(s + e)
    lo = e - (hi - s)
    return hi, lo


def _comp_block_sum(x, y):
    """Σ x·y over an (R, 128) block as a two-float pair: exact products,
    pairwise two-float fold over rows then lanes — reduction error O(ε²·N)
    instead of the plain fold's O(ε·log N)."""
    ph, pe = _two_prod(x, y)
    rows = ph.shape[0]
    xh = xl = None  # odd leftovers
    while rows > 1:
        if rows % 2:
            lh, ll = ph[rows - 1:rows, :], pe[rows - 1:rows, :]
            if xh is None:
                xh, xl = lh, ll
            else:
                xh, xl = _df_add2(xh, xl, lh, ll)
            rows -= 1
        h = rows // 2
        ph, pe = _df_add2(ph[:h], pe[:h], ph[h:rows], pe[h:rows])
        rows = h
    if xh is not None:
        ph, pe = _df_add2(ph, pe, xh, xl)
    w = ph.shape[1]
    while w > 1:
        h = w // 2
        ph, pe = _df_add2(ph[:, :h], pe[:, :h], ph[:, h:w], pe[:, h:w])
        w = h
    return ph[0, 0], pe[0, 0]


def _dot_rep_comp(au, an, bu, bn):
    """Compensated `_dot_rep`: the α/β reductions extracted at ~f32 rounding
    (VERDICT r1 item 4's in-kernel Kahan/two-float accumulation; the full
    double-float recurrence lives in ``algorithms/df.py``)."""
    s1h, s1l = _comp_block_sum(au, bu)
    s2h, s2l = _comp_block_sum(an, bn)
    hi, lo = _df_add2(s1h, s1l, s2h, s2l)
    return hi + lo


# ---------------------------------------------------------------------------
# Pass one: k recurrence steps, scalars only
# ---------------------------------------------------------------------------

def _pass_one_kernel(
    # inputs
    du, eou, gnu, dv, eov, gnv, bu, bv, bn, winu, winv,
    # outputs
    alphas, betas, bnorm, steps_out,
    # scratch
    vpu, vpv, vpn, vcu, vcv, vcn, wu, wv, wn,
    *, k, p_hi, c_chunks, tol, ztol, wg_u, wg_v, comp=False,
):
    dot = _dot_rep_comp if comp else _dot_rep
    nb2 = dot(bu[:], bn[:], bu[:], bn[:])
    b_norm = jnp.sqrt(nb2)
    bnorm[0] = b_norm
    zero_b = b_norm <= ztol
    inv_n = jnp.where(zero_b, 0.0, 1.0 / b_norm)
    vcu[:] = bu[:] * inv_n
    vcv[:] = bv[:] * inv_n
    vcn[:] = bn[:] * inv_n
    vpu[:] = jnp.zeros(vpu.shape, jnp.float32)
    vpv[:] = jnp.zeros(vpv.shape, jnp.float32)
    vpn[:] = jnp.zeros(vpn.shape, jnp.float32)

    orders = (
        (vcu, wu, du, eou, gnu, winu, 1.0, wg_u),
        (vcv, wv, dv, eov, gnv, winv, -1.0, wg_v),
    )

    def step(j, carry):
        beta_prev, done = carry
        executed = jnp.logical_not(done)
        _emit_matvec(orders, vcn, wn, p_hi=p_hi, c_chunks=c_chunks)
        wu[:] = wu[:] - beta_prev * vpu[:]
        wv[:] = wv[:] - beta_prev * vpv[:]
        wn[:] = wn[:] - beta_prev * vpn[:]
        alpha = dot(vcu[:], vcn[:], wu[:], wn[:])
        wu[:] = wu[:] - alpha * vcu[:]
        wv[:] = wv[:] - alpha * vcv[:]
        wn[:] = wn[:] - alpha * vcn[:]
        beta = jnp.sqrt(dot(wu[:], wn[:], wu[:], wn[:]))
        breakdown = beta <= tol
        advance = jnp.logical_and(executed, jnp.logical_not(breakdown))
        alphas[j] = jnp.where(executed, alpha, 0.0)
        betas[j] = jnp.where(advance, beta, 0.0)
        inv_b = jnp.where(advance, 1.0 / beta, 0.0)

        @pl.when(advance)
        def _advance():
            vpu[:] = vcu[:]
            vpv[:] = vcv[:]
            vpn[:] = vcn[:]
            vcu[:] = wu[:] * inv_b
            vcv[:] = wv[:] * inv_b
            vcn[:] = wn[:] * inv_b

        steps_out[0] = steps_out[0] + executed.astype(jnp.int32)
        return (jnp.where(advance, beta, beta_prev),
                jnp.logical_or(done, breakdown))

    steps_out[0] = 0
    jax.lax.fori_loop(0, k, step, (jnp.float32(0.0), zero_b))


# ---------------------------------------------------------------------------
# Chunked / resumable pass one: in-run early stopping on the fused path
# ---------------------------------------------------------------------------

def _pass_one_chunk_kernel(
    # inputs
    du, eou, gnu, dv, eov, gnv, bu, bv, bn, su_in, sv_in, sn_in,
    winu, winv, ctl_in,
    # outputs
    alphas, betas, su, sv, sn, ctl_out,
    # scratch
    wu, wv, wn,
    *, chunk, p_hi, c_chunks, tol, ztol, wg_u, wg_v, comp=False,
):
    """Run ``chunk`` recurrence steps from a carried state (VERDICT-parity
    for the reference's in-loop callback early stop on the PRODUCTION
    path — ``src/algorithms/lanczos.rs:93-113`` — which the monolithic
    whole-pass kernel cannot host).

    State: ``su/sv`` stacked ``(2, R, 128)`` = [v_prev, v_curr] (u/v arc
    copies), ``sn`` the node pair; ``ctl`` = [beta_prev, done, steps,
    b_norm, k_limit]. ``ctl_in[2] < 0`` marks the first chunk: the state
    initializes from b (same FP sequence as ``_pass_one_kernel``, so
    chunked coefficients are bit-identical to the monolithic pass).
    Steps beyond ``k_limit`` or after breakdown freeze exactly like the
    monolithic kernel's masked steps.
    """
    dot = _dot_rep_comp if comp else _dot_rep
    vpu, vcu = su.at[0], su.at[1]
    vpv, vcv = sv.at[0], sv.at[1]
    vpn, vcn = sn.at[0], sn.at[1]
    first = ctl_in[2] < 0

    @pl.when(first)
    def _init():
        nb2 = dot(bu[:], bn[:], bu[:], bn[:])
        b_norm = jnp.sqrt(nb2)
        zero_b = b_norm <= ztol
        inv_n = jnp.where(zero_b, 0.0, 1.0 / b_norm)
        vcu[:] = bu[:] * inv_n
        vcv[:] = bv[:] * inv_n
        vcn[:] = bn[:] * inv_n
        vpu[:] = jnp.zeros(vpu.shape, jnp.float32)
        vpv[:] = jnp.zeros(vpv.shape, jnp.float32)
        vpn[:] = jnp.zeros(vpn.shape, jnp.float32)
        ctl_out[0] = 0.0
        ctl_out[1] = zero_b.astype(jnp.float32)
        ctl_out[2] = 0.0
        ctl_out[3] = b_norm

    @pl.when(jnp.logical_not(first))
    def _resume():
        su[...] = su_in[...]
        sv[...] = sv_in[...]
        sn[...] = sn_in[...]
        ctl_out[0] = ctl_in[0]
        ctl_out[1] = ctl_in[1]
        ctl_out[2] = ctl_in[2]
        ctl_out[3] = ctl_in[3]

    k_limit = ctl_in[4]
    orders = (
        (vcu, wu, du, eou, gnu, winu, 1.0, wg_u),
        (vcv, wv, dv, eov, gnv, winv, -1.0, wg_v),
    )

    def step(j, _):
        beta_prev = ctl_out[0]
        done = jnp.logical_or(ctl_out[1] > 0.0, ctl_out[2] >= k_limit)
        executed = jnp.logical_not(done)
        _emit_matvec(orders, vcn, wn, p_hi=p_hi, c_chunks=c_chunks)
        wu[:] = wu[:] - beta_prev * vpu[:]
        wv[:] = wv[:] - beta_prev * vpv[:]
        wn[:] = wn[:] - beta_prev * vpn[:]
        alpha = dot(vcu[:], vcn[:], wu[:], wn[:])
        wu[:] = wu[:] - alpha * vcu[:]
        wv[:] = wv[:] - alpha * vcv[:]
        wn[:] = wn[:] - alpha * vcn[:]
        beta = jnp.sqrt(dot(wu[:], wn[:], wu[:], wn[:]))
        breakdown = beta <= tol
        advance = jnp.logical_and(executed, jnp.logical_not(breakdown))
        alphas[j] = jnp.where(executed, alpha, 0.0)
        betas[j] = jnp.where(advance, beta, 0.0)
        inv_b = jnp.where(advance, 1.0 / beta, 0.0)

        @pl.when(advance)
        def _advance():
            vpu[:] = vcu[:]
            vpv[:] = vcv[:]
            vpn[:] = vcn[:]
            vcu[:] = wu[:] * inv_b
            vcv[:] = wv[:] * inv_b
            vcn[:] = wn[:] * inv_b

        ctl_out[0] = jnp.where(advance, beta, beta_prev)
        ctl_out[1] = jnp.maximum(
            ctl_out[1], jnp.logical_and(executed, breakdown)
            .astype(jnp.float32))
        ctl_out[2] = ctl_out[2] + executed.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)
    ctl_out[4] = k_limit


# ---------------------------------------------------------------------------
# Pass one with basis capture: the O(nk) one-pass variant
# ---------------------------------------------------------------------------

def _pass_one_basis_kernel(
    du, eou, gnu, dv, eov, gnv, bu, bv, bn, winu, winv,
    # outputs
    alphas, betas, bnorm, steps_out, basis_u, basis_n,
    # scratch
    su, sv, sn, sem_u, sem_n,
    *, k, p_hi, c_chunks, tol, ztol, wg_u, wg_v, comp=False,
):
    """Pass one + per-step DMA of v_{j+1} (u copy + node block) to HBM.

    The basis write overlaps the step's matvec: the DMA starts before the
    recurrence and is awaited only just before the buffers rotate. This is
    the O(n·k) memory variant (reference ``src/algorithms/lanczos.rs:55-156``,
    basis store at ``:117-123``); rows past ``steps_taken`` repeat the frozen
    v_curr, which downstream reconstruction masks with zero coefficients.

    The nine work buffers are packed into three stacked scratches (slot 0 =
    v_prev, 1 = v_curr, 2 = w): with nine separate scratches plus two DMA
    semaphores the TPU runtime aborts at launch (resource-count limit,
    empirically bisected — the same shape works with stacked scratches).
    """
    vpu, vcu, wu = su.at[0], su.at[1], su.at[2]
    vpv, vcv, wv = sv.at[0], sv.at[1], sv.at[2]
    vpn, vcn, wn = sn.at[0], sn.at[1], sn.at[2]
    dot = _dot_rep_comp if comp else _dot_rep
    nb2 = dot(bu[:], bn[:], bu[:], bn[:])
    b_norm = jnp.sqrt(nb2)
    bnorm[0] = b_norm
    zero_b = b_norm <= ztol
    inv_n = jnp.where(zero_b, 0.0, 1.0 / b_norm)
    vcu[:] = bu[:] * inv_n
    vcv[:] = bv[:] * inv_n
    vcn[:] = bn[:] * inv_n
    vpu[:] = jnp.zeros(vpu.shape, jnp.float32)
    vpv[:] = jnp.zeros(vpv.shape, jnp.float32)
    vpn[:] = jnp.zeros(vpn.shape, jnp.float32)

    orders = (
        (vcu, wu, du, eou, gnu, winu, 1.0, wg_u),
        (vcv, wv, dv, eov, gnv, winv, -1.0, wg_v),
    )

    def step(j, carry):
        beta_prev, done = carry
        executed = jnp.logical_not(done)
        # basis row j = v_{j+1} (current vector at step start); DMA overlaps
        # the matvec below.
        dma_u = pltpu.make_async_copy(vcu, basis_u.at[j], sem_u)
        dma_n = pltpu.make_async_copy(vcn, basis_n.at[j], sem_n)
        dma_u.start()
        dma_n.start()
        _emit_matvec(orders, vcn, wn, p_hi=p_hi, c_chunks=c_chunks)
        wu[:] = wu[:] - beta_prev * vpu[:]
        wv[:] = wv[:] - beta_prev * vpv[:]
        wn[:] = wn[:] - beta_prev * vpn[:]
        alpha = dot(vcu[:], vcn[:], wu[:], wn[:])
        wu[:] = wu[:] - alpha * vcu[:]
        wv[:] = wv[:] - alpha * vcv[:]
        wn[:] = wn[:] - alpha * vcn[:]
        beta = jnp.sqrt(dot(wu[:], wn[:], wu[:], wn[:]))
        breakdown = beta <= tol
        advance = jnp.logical_and(executed, jnp.logical_not(breakdown))
        alphas[j] = jnp.where(executed, alpha, 0.0)
        betas[j] = jnp.where(advance, beta, 0.0)
        inv_b = jnp.where(advance, 1.0 / beta, 0.0)
        dma_u.wait()
        dma_n.wait()

        @pl.when(advance)
        def _advance():
            vpu[:] = vcu[:]
            vpv[:] = vcv[:]
            vpn[:] = vcn[:]
            vcu[:] = wu[:] * inv_b
            vcv[:] = wv[:] * inv_b
            vcn[:] = wn[:] * inv_b

        steps_out[0] = steps_out[0] + executed.astype(jnp.int32)
        return (jnp.where(advance, beta, beta_prev),
                jnp.logical_or(done, breakdown))

    steps_out[0] = 0
    jax.lax.fori_loop(0, k, step, (jnp.float32(0.0), zero_b))


# ---------------------------------------------------------------------------
# Pass two: reconstruction + accumulation, replaying stored alpha/beta
# ---------------------------------------------------------------------------

def _pass_two_kernel(
    du, eou, gnu, dv, eov, gnv, bu, bv, bn, winu, winv,
    alphas, betas, y, bnorm, steps_in,
    # outputs
    xu, xn,
    # scratch
    vpu, vpv, vpn, vcu, vcv, vcn, wu, wv, wn,
    *, k, p_hi, c_chunks, tol, ztol, wg_u, wg_v,
):
    # y of shape (k,) reconstructs one solution; a (nf, k) stack evaluates
    # nf matrix functions from the SAME replayed basis — the matvec (the
    # expensive part) runs once per step, only the accumulate axpys (the
    # ~3 µs/step tail of the cost split, PERF.md) fan out per function.
    # xu/xn are then (nf, R, LANE)/(nf, P2, LANE), slot fi static.
    multi = len(y.shape) == 2
    nf = y.shape[0] if multi else 1
    b_norm = bnorm[0]
    steps = steps_in[0]
    inv_n = jnp.where(b_norm <= ztol, 0.0, 1.0 / b_norm)
    vcu[:] = bu[:] * inv_n
    vcv[:] = bv[:] * inv_n
    vcn[:] = bn[:] * inv_n
    vpu[:] = jnp.zeros(vpu.shape, jnp.float32)
    vpv[:] = jnp.zeros(vpv.shape, jnp.float32)
    vpn[:] = jnp.zeros(vpn.shape, jnp.float32)
    for fi in range(nf):
        y0 = y[fi, 0] if multi else y[0]
        if multi:
            xu[fi] = y0 * vcu[:]
            xn[fi] = y0 * vcn[:]
        else:
            xu[:] = y0 * vcu[:]
            xn[:] = y0 * vcn[:]

    orders = (
        (vcu, wu, du, eou, gnu, winu, 1.0, wg_u),
        (vcv, wv, dv, eov, gnv, winv, -1.0, wg_v),
    )

    def step(j, _):
        alpha = alphas[j]
        beta_j = betas[j]
        jm1 = jnp.maximum(j - 1, 0)
        beta_prev = jnp.where(j > 0, betas[jm1], 0.0)
        active = j < steps - 1
        _emit_matvec(orders, vcn, wn, p_hi=p_hi, c_chunks=c_chunks)
        # identical FP sequence to pass one: axpy(beta_prev), axpy(alpha),
        # reciprocal-multiply by the *stored* beta — bit-faithful replay.
        wu[:] = wu[:] - beta_prev * vpu[:] - alpha * vcu[:]
        wv[:] = wv[:] - beta_prev * vpv[:] - alpha * vcv[:]
        wn[:] = wn[:] - beta_prev * vpn[:] - alpha * vcn[:]
        inv_b = jnp.where(
            active, 1.0 / jnp.where(beta_j > 0, beta_j, 1.0), 0.0)
        vnu = wu[:] * inv_b
        vnn = wn[:] * inv_b
        for fi in range(nf):
            y_next = y[fi, j + 1] if multi else y[j + 1]
            if multi:
                xu[fi] = xu[fi] + y_next * vnu
                xn[fi] = xn[fi] + y_next * vnn
            else:
                xu[:] = xu[:] + y_next * vnu
                xn[:] = xn[:] + y_next * vnn

        @pl.when(active)
        def _advance():
            vpu[:] = vcu[:]
            vpv[:] = vcv[:]
            vpn[:] = vcn[:]
            vcu[:] = wu[:] * inv_b
            vcv[:] = wv[:] * inv_b
            vcn[:] = wn[:] * inv_b

        return 0

    if k > 1:
        jax.lax.fori_loop(0, k - 1, step, 0)


# ---------------------------------------------------------------------------
# Matvec-only kernel (correctness oracle hooks / tests)
# ---------------------------------------------------------------------------

def _matvec_kernel(du, eou, gnu, dv, eov, gnv, xu, xv, xn,
                   winu, winv, yu, yv, yn, *, p_hi, c_chunks, wg_u, wg_v):
    orders = (
        (xu, yu, du, eou, gnu, winu, 1.0, wg_u),
        (xv, yv, dv, eov, gnv, winv, -1.0, wg_v),
    )
    _emit_matvec(orders, xn, yn, p_hi=p_hi, c_chunks=c_chunks)


# ---------------------------------------------------------------------------
# Streaming (grid-blocked) matvec: instances larger than VMEM
# ---------------------------------------------------------------------------

def _matvec_streaming_kernel(du, esu, eou, gnu, dv, esv, eov, gnv, xu, xv,
                             xn, winu, winv, yu, yv, yn, acc, *, p_hi, wg_u,
                             wg_v, e_scale=1.0):
    """One grid step = one CHUNK of both orderings, blocks streamed from HBM.

    Same math as :func:`_emit_matvec`, but the arc data and vector chunks are
    grid-blocked so Pallas double-buffers them — this is the path for
    instances whose dual layout does not fit VMEM (it reads arc data from HBM
    once *per matvec* instead of once per pass). The node table and the
    scatter accumulator stay resident; the accumulator is flushed to ``yn``
    at the last grid step (the TPU grid is sequential).

    ``e_scale`` folds a static scalar into the incidence entries (E becomes
    ±e_scale): with ``d`` pre-scaled on the host this computes ``(s·A)·x`` at
    *identical* cost to ``A·x`` — used by the SoL bench to chain matvecs
    without norm growth (spectral radius ≤ 1) and zero extra HBM traffic.
    """
    i = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    # per-slot es gather (NOT the resident kernels' group-broadcast form):
    # this kernel is VPU-gather-bound, and the A/B measured the broadcast +
    # pad-mask variant 8-9% slower here despite streaming 4 fewer bytes
    # per slot; pad slots cancel via the es == eo == sentinel invariant.
    for x_ref, y_ref, d_ref, es_ref, eo_ref, gn_ref, win_ref, sign, wg in (
            (xu, yu, du, esu, eou, gnu, winu, e_scale, wg_u),
            (xv, yv, dv, esv, eov, gnv, winv, -e_scale, wg_v)):
        x2 = x_ref[:]
        es = es_ref[:].astype(jnp.int32)
        eo = eo_ref[:].astype(jnp.int32)
        r0 = win_ref[i]
        gnrb = gn_ref[0]  # (128, 4): [rel id | eo base | es row | es lane]
        g_s = _window_gather(xn, es, r0, 2)
        if wg:
            g_o = _rowwise_window_gather(xn, eo, gnrb[:, 1:2], wg)
        else:
            g_o = _window_gather(xn, eo, 0, p_hi)
        y_ref[:] = d_ref[:] * x2 + sign * (g_s - g_o)
        rs = jnp.sum(x2, axis=1, keepdims=True)
        gn = gnrb[:, 0:1]  # (128, 1) rel node ids of this chunk
        s_lo = jnp.sum(jnp.where(gn == lanes, rs, 0.0), axis=0, keepdims=True)
        s_hi = jnp.sum(jnp.where(gn - LANE == lanes, rs, 0.0), axis=0,
                       keepdims=True)
        acc[pl.ds(r0, 1), :] = acc[pl.ds(r0, 1), :] + sign * s_lo
        acc[pl.ds(r0 + 1, 1), :] = acc[pl.ds(r0 + 1, 1), :] + sign * s_hi

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        yn[:] = acc[:]


def kkt_streaming_matvec(arrs, wins, xu, xv, xn, *, p_hi: int, c_chunks: int,
                         p2: int, wg_u: int = 0, wg_v: int = 0,
                         interpret: bool = False, e_scale: float = 1.0):
    """Grid-blocked A·x in the rep layout; any instance size.

    ``arrs`` = (du2, esu2, eou2, gnu3, dv2, esv2, eov2, gnv3) device arrays
    (endpoint planes i16 or i32), ``wins`` = (winu, winv) int32 arrays.
    Returns (yu, yv, yn).
    """
    r = xu.shape[0]
    blk = lambda: pl.BlockSpec((CHUNK, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    gnb = lambda: pl.BlockSpec((1, CHUNK, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    full = pl.BlockSpec((p2, LANE), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = functools.partial(_matvec_streaming_kernel, p_hi=p_hi,
                             wg_u=wg_u, wg_v=wg_v, e_scale=e_scale)
    return pl.pallas_call(
        kern,
        grid=(c_chunks,),
        in_specs=[blk(), blk(), blk(), gnb(), blk(), blk(), blk(), gnb(),
                  blk(), blk(), full, sm, sm],
        out_specs=[blk(), blk(), full],
        out_shape=[
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((p2, LANE), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((p2, LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*arrs, xu, xv, xn, *wins)


# ---------------------------------------------------------------------------
# Host/jit driver
# ---------------------------------------------------------------------------

class FusedKKTSolver:
    """End-to-end fused f(A)·b solver for one KKT instance.

    Usage::

        s = FusedKKTSolver(quad_costs, arc_u, arc_v, num_nodes)
        x, decomp = s.solve(b, k=500, f="inv")           # x in arc order
        x_rep, decomp = s.solve(b, k=500, f="inv", raw=True)  # no unpermute

    The constructor performs the one-time host-side sort/pad (NumPy) and
    uploads the static arrays. ``interpret=True`` runs the kernels in the
    Pallas interpreter (CPU correctness testing).
    """

    #: probe-verified usable VMEM on the target chip (the scoped default is
    #: 16 MB; ~110 MB is reachable with an explicit CompilerParams limit).
    VMEM_BUDGET = 110 * 1024 * 1024
    #: bytes per padded slot *before* padding: per ordering d f32 (4) +
    #: eo int16 (2) = 12, plus 2 b inputs (8) and 6 work buffers (24) = 44.
    #: The authoritative check is the exact layout-derived one in
    #: ``__init__`` / :meth:`pass_vmem_bytes`.
    BYTES_PER_SLOT = 44
    #: conservative shape-only pre-screen (assumes ≤40% slot padding) used
    #: to pick a path *without* building the layout; the exact guard below
    #: catches pathological-padding instances under this count.
    MAX_ARCS = int(VMEM_BUDGET / (44 * 1.4))  # ~1.87M

    def __init__(self, quad_costs, arc_u, arc_v, num_nodes,
                 dtype=np.float32, interpret: bool = False,
                 windowed: bool = False, compensated: bool = False):
        # ``compensated=True`` switches the in-kernel alpha/beta reductions
        # to two-float (exact-product + two-sum fold) accumulation —
        # coefficients extracted at ~f32 rounding instead of ~log2(R)*eps.
        # Measured cost/accuracy in PERF.md; the full double-float
        # recurrence (near-f64 trajectories) is algorithms/df.py.
        if np.dtype(dtype) != np.float32:
            raise ValueError(
                "FusedKKTSolver kernels are f32 (the TPU-native dtype); use "
                "the generic solve_fAb pipeline for f64 reference semantics "
                "on CPU.")
        m = len(np.asarray(quad_costs))
        if m > self.MAX_ARCS and not interpret:
            raise ValueError(
                f"instance has {m} arcs; the fully VMEM-resident fused solver"
                f" fits ~{self.MAX_ARCS} arcs per chip. Use"
                " parallel.ShardedFusedKKTSolver (per-device VMEM residency"
                " over a mesh) or make_kkt_operator(backend='pallas') +"
                " solve_fAb for larger instances (a 1-device mesh gives the"
                " single-chip streaming path).")
        self.layout = SortedKKTLayout.build(
            quad_costs, arc_u, arc_v, num_nodes, dtype=dtype,
            windowed=windowed)
        need = self.pass_vmem_bytes(self.layout)
        if need > self.VMEM_BUDGET and not interpret:
            raise ValueError(
                f"instance needs {need} bytes of VMEM for a fused pass"
                f" (R={self.layout.u.R} padded rows from {m} arcs,"
                f" P2={self.layout.P2}), over the {self.VMEM_BUDGET}-byte"
                " per-chip budget. Use parallel.ShardedFusedKKTSolver or the"
                " streaming pallas path (a 1-device mesh).")
        self.interpret = interpret
        self.compensated = bool(compensated)
        lay = self.layout
        self.n = lay.m + lay.p
        as_dev = jnp.asarray
        self._arrs = tuple(as_dev(a) for a in (
            lay.u.d2, lay.u.eo2, lay.u.gn3,
            lay.v.d2, lay.v.eo2, lay.v.gn3,
        ))
        self._wins = (as_dev(lay.u.win), as_dev(lay.v.win))
        self.tol = float(breakdown_tolerance(jnp.dtype(lay.dtype)))
        self.ztol = float(zero_tolerance(jnp.dtype(lay.dtype)))
        self._chunk_jits = {}
        # retained host-side for estimate_interval: the spectral interval is
        # a property of A, so the estimate runs through an XLA operator on
        # the same arrays (the rep-layout kernel matvec is not composable
        # with eigsh's jitted driver)
        self._kkt_arrays = (np.asarray(quad_costs, np.float32),
                            np.asarray(arc_u), np.asarray(arc_v),
                            int(num_nodes))
        self._interval_cache = None

    @classmethod
    def pass_vmem_bytes(cls, layout: SortedKKTLayout) -> int:
        """Exact VMEM footprint of the largest solve-path kernel (pass two,
        which adds the xu/xn output planes on top of pass one's buffers):
        the authoritative admission bound (VERDICT r2 item 9 — the old
        ``MAX_ARCS`` constant encoded an 11%-padding guess; this is computed
        from the *built* layout's actual R/C/P2 and plane dtypes)."""
        slot = layout.u.R * LANE  # padded slots per ordering
        big = slot * 4  # one (R,128) f32 plane
        small = layout.P2 * LANE * 4  # one (P2,128) node plane
        gn = layout.u.C * CHUNK * 4 * 4  # one (C,128,4) i32 group table
        eo_b = layout.u.eo2.dtype.itemsize
        per_ordering = slot * (4 + eo_b)  # d f32 + eo plane
        b_inputs = 2 * big  # bu, bv
        work = 6 * big  # v_prev/v_curr/w × u,v copies
        out = big  # pass two's xu output (pass one has only SMEM outputs)
        small_count = 1 + 3 + 1  # bn input + 3 node work buffers + xn out
        return (2 * per_ordering + 2 * gn + b_inputs + work + out
                + small_count * small)

    @classmethod
    def chunk_vmem_bytes(cls, layout: SortedKKTLayout) -> int:
        """Exact VMEM footprint of the resumable chunk kernel
        (:meth:`pass_one_chunked`): it carries the state planes as BOTH
        inputs and outputs (su/sv/sn in + out = 8 big + 4 small beyond the
        shared arc/b planes) with only the w scratch triplet."""
        slot = layout.u.R * LANE
        big = slot * 4
        small = layout.P2 * LANE * 4
        gn = layout.u.C * CHUNK * 4 * 4
        eo_b = layout.u.eo2.dtype.itemsize
        per_ordering = slot * (4 + eo_b)
        return (2 * per_ordering + 2 * gn
                + (2 + 4 + 4 + 2) * big  # b in, state in, state out, w
                + (1 + 2 + 2 + 1) * small)  # bn, sn in, sn out, wn

    # -- shared pallas_call scaffolding --
    def _common_specs(self):
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        return vm, sm

    def _scratch(self):
        lay = self.layout
        big = pltpu.VMEM((lay.u.R, LANE), jnp.float32)
        small = pltpu.VMEM((lay.P2, LANE), jnp.float32)
        return [big, big, small, big, big, small, big, big, small]

    def pack(self, b) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if isinstance(b, jax.Array):
            b = np.asarray(jax.device_get(b))
        return tuple(jnp.asarray(a) for a in self.layout.pack(b))

    def pack_flat(self, b) -> jax.Array:
        """Rep layout as ONE stacked (2R+P2, 128) device array.

        A single host→device transfer: on tunneled targets every transfer
        pays a full round trip (~30 ms measured), so shipping the three rep
        components separately triples the fixed cost.
        """
        if isinstance(b, jax.Array):
            b = np.asarray(jax.device_get(b))
        bu, bv, bn = self.layout.pack(b)
        return jnp.asarray(np.concatenate([bu, bv, bn], axis=0))

    def _split_flat(self, b_flat):
        r = self.layout.u.R
        return b_flat[:r], b_flat[r:2 * r], b_flat[2 * r:]

    def _matvec_rep_call(self, arrs, wins, xu, xv, xn):
        """A·x in the rep layout with the arc planes passed as runtime
        arguments (the class convention — closing over them would bake
        ~100 MB of planes into the executable as constants)."""
        lay = self.layout
        vm, sm = self._common_specs()
        kern = functools.partial(
            _matvec_kernel, p_hi=lay.p_hi, c_chunks=lay.u.C,
            wg_u=lay.u.wg, wg_v=lay.v.wg)
        return pl.pallas_call(
            kern,
            in_specs=[vm] * 9 + [sm, sm],
            out_specs=[vm, vm, vm],
            out_shape=[
                jax.ShapeDtypeStruct((lay.u.R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((lay.v.R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((lay.P2, LANE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=self.interpret,
        )(*arrs, xu, xv, xn, *wins)

    def matvec_rep(self, xu, xv, xn):
        """A·x in the rep layout (testing hook)."""
        return self._matvec_rep_call(self._arrs, self._wins, xu, xv, xn)

    def matvec(self, x) -> np.ndarray:
        """A·x on an (n,) vector via the rep round-trip (testing hook)."""
        xu, xv, xn = self.pack(x)
        yu, _, yn = self.matvec_rep(xu, xv, xn)
        return self.layout.unpack(yu, yn)

    def pass_one(self, b_rep, k: int) -> LanczosDecomposition:
        lay = self.layout
        vm, sm = self._common_specs()
        kern = functools.partial(
            _pass_one_kernel, k=k, p_hi=lay.p_hi, c_chunks=lay.u.C,
            tol=self.tol, ztol=self.ztol,
            wg_u=lay.u.wg, wg_v=lay.v.wg, comp=self.compensated)
        alphas, betas, bnorm, steps = pl.pallas_call(
            kern,
            in_specs=[vm] * 9 + [sm, sm],
            out_specs=[sm, sm, sm, sm],
            out_shape=[
                jax.ShapeDtypeStruct((k,), jnp.float32),
                jax.ShapeDtypeStruct((k,), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ],
            scratch_shapes=self._scratch(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=self.interpret,
        )(*self._arrs, *b_rep, *self._wins)
        return LanczosDecomposition(
            alphas=alphas, betas=betas, steps_taken=steps[0], b_norm=bnorm[0])

    def slq_trace(self, f="inv", *, k: int = 50, num_probes: int = 16,
                  key, probe: str = "rademacher"):
        """Estimate ``tr f(A)`` by stochastic Lanczos quadrature with every
        probe's recurrence running in the fused VMEM-resident kernel — the
        production-path counterpart of :func:`slq.slq_trace` (same
        estimator contract; the reference's scope stops at f(A)·b,
        ``src/solvers.rs``).

        All ``num_probes`` pass-one recurrences execute as ONE jitted
        ``lax.scan`` over the packed probes: one host→device probe
        transfer (stacked — each transfer through the tunnel costs a full
        RTT), one dispatch, and one batched device ``eigh`` for all
        quadratures. Per-probe cost is the fused kernel's k·(matvec+dots)
        instead of the XLA scan path's per-step overhead. Returns
        :class:`slq.SLQResult`.
        """
        from two_pass_lanczos_tpu.slq import (
            _draw_probes,
            batched_quadratic_form,
            slq_stats,
        )
        from two_pass_lanczos_tpu.spectrum import _f_of_theta

        if num_probes < 1:
            raise ValueError("num_probes must be >= 1")
        if not callable(f):
            _f_of_theta(np.ones(1), f)  # reject unknown strings up front
        probes = np.asarray(_draw_probes(
            key, num_probes, self.n, jnp.float32, probe))
        decomp = self._slq_pass_one(probes, k)
        return slq_stats(batched_quadratic_form(decomp, f))

    def slq_spectral_density(self, grid, *, sigma=None, k: int = 50,
                             num_probes: int = 16, key,
                             probe: str = "gaussian"):
        """Smoothed spectral density (DOS) with the unit probes' pass one
        in the fused kernel — :func:`slq.slq_spectral_density` on the
        production path (same Lin–Saad–Yang estimator; the KDE half is
        the shared :func:`slq.dos_from_decomposition`)."""
        from two_pass_lanczos_tpu.slq import (
            _draw_probes,
            dos_from_decomposition,
            validate_dos_params,
        )

        grid, sigma = validate_dos_params(grid, sigma, num_probes)
        probes = np.asarray(_draw_probes(
            key, num_probes, self.n, jnp.float32, probe))
        probes = probes / np.linalg.norm(probes, axis=1, keepdims=True)
        decomp = self._slq_pass_one(probes.astype(np.float32), k)
        return dos_from_decomposition(
            decomp, grid.astype(jnp.float32),
            jnp.asarray(sigma, jnp.float32))

    def _slq_pass_one(self, probes: np.ndarray, k: int):
        """Batched pass one for (m, n) host probes: ONE jitted scan of the
        fused kernel over the packed probe planes; returns the stacked
        :class:`LanczosDecomposition` the batched quadratures consume."""
        lay = self.layout
        flat = jnp.asarray(np.stack(
            [np.concatenate(lay.pack(z), axis=0) for z in probes]))
        ck = ("slq_p1", k)
        if ck not in self._chunk_jits:
            vm, sm = self._common_specs()
            kern = functools.partial(
                _pass_one_kernel, k=k, p_hi=lay.p_hi, c_chunks=lay.u.C,
                tol=self.tol, ztol=self.ztol,
                wg_u=lay.u.wg, wg_v=lay.v.wg, comp=self.compensated)
            call = pl.pallas_call(
                kern,
                in_specs=[vm] * 9 + [sm, sm],
                out_specs=[sm, sm, sm, sm],
                out_shape=[
                    jax.ShapeDtypeStruct((k,), jnp.float32),
                    jax.ShapeDtypeStruct((k,), jnp.float32),
                    jax.ShapeDtypeStruct((1,), jnp.float32),
                    jax.ShapeDtypeStruct((1,), jnp.int32),
                ],
                scratch_shapes=self._scratch(),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT),
                interpret=self.interpret,
            )
            def run(arrs, wins, flat_probes):
                def body(_, bp):
                    # _split_flat: the one place the stacked-rep row
                    # offsets live
                    a, b, bno, st = call(
                        *arrs, *self._split_flat(bp), *wins)
                    return None, (a, b, bno[0], st[0])

                _, outs = jax.lax.scan(body, None, flat_probes)
                return outs

            self._chunk_jits[ck] = jax.jit(run)
        al, be, bno, stp = self._chunk_jits[ck](
            self._arrs, self._wins, flat)
        return LanczosDecomposition(
            alphas=al, betas=be, steps_taken=stp, b_norm=bno)


    def slq_trace_adaptive(self, f="inv", *, k: int = 50, key,
                           probe: str = "rademacher",
                           target_rel_stderr: float = 0.01,
                           batch: int = 8, max_probes: int = 512):
        """:meth:`slq_trace` with the probe count chosen adaptively —
        the shared :func:`slq.adaptive_probe_loop` driver drawing
        ``batch`` probes per round through THIS tier's kernel path until
        the sample standard error certifies ``target_rel_stderr`` (or
        ``max_probes``). One compiled shape per distinct batch size."""
        from two_pass_lanczos_tpu.slq import adaptive_probe_loop

        return adaptive_probe_loop(
            lambda sub, take: self.slq_trace(
                f, k=k, num_probes=take, key=sub, probe=probe).samples,
            key, batch=batch, max_probes=max_probes,
            target_rel_stderr=target_rel_stderr)

    def estimate_interval(self, *, margin: float = 0.05, tol: float = 1e-3,
                          key=None):
        """Cached spec(A) interval: two 1-eigenpair :func:`eigen.eigsh`
        runs (LA/SA) on an XLA :class:`operators.KKTOperator` built from
        the same arrays, widened exactly like
        :func:`algorithms.chebyshev.estimate_interval`. The interval is a
        property of A, not of the kernel path, so the XLA route is both
        legitimate and jit-composable with eigsh; cost is ~2·ncv small
        matvecs, paid once (cached). Makes :meth:`chebyshev_fAb` work
        interval-free on this tier like the host and row-sharded tiers
        (VERDICT r4 item 7)."""
        if self._interval_cache is None:
            from two_pass_lanczos_tpu.algorithms.chebyshev import (
                estimate_interval,
            )
            from two_pass_lanczos_tpu.operators import KKTOperator

            d, u, v, p = self._kkt_arrays
            op = KKTOperator(d=jnp.asarray(d), arc_u=jnp.asarray(u),
                             arc_v=jnp.asarray(v), num_nodes=p)
            self._interval_cache = estimate_interval(
                op, margin=margin, tol=tol, key=key)
        return self._interval_cache

    def chebyshev_fAb(self, b, f, *, degree: int = 100, interval=None,
                      raw: bool = False):
        """Storage-free Chebyshev f(A)·b through the VMEM-resident matvec
        kernel: the three-term recurrence runs on the duplicated
        (xu, xv, xn) rep (elementwise updates preserve the duplication
        invariant) as ONE jitted scan of kernel calls — one dispatch for
        all ``degree`` matvecs, no basis, no (α, β). The no-inner-product
        alternative when only f(A)b is needed and spec(A) ⊆ ``interval``
        is known (see :func:`algorithms.chebyshev.chebyshev_fAb`);
        ``interval=None`` auto-estimates via :meth:`estimate_interval`
        (cached — pass it explicitly in production).
        """
        from two_pass_lanczos_tpu.algorithms.chebyshev import (
            chebyshev_coefficients,
            chebyshev_scan,
            validate_interval_for_f,
        )

        if interval is None:
            interval = self.estimate_interval()
        a_lo, a_hi = float(interval[0]), float(interval[1])
        validate_interval_for_f(f, a_lo, a_hi)
        cs = jnp.asarray(
            chebyshev_coefficients(f, interval, degree), jnp.float32)
        scale = jnp.asarray(
            [2.0 / (a_hi - a_lo), (a_hi + a_lo) / (a_hi - a_lo)],
            jnp.float32)
        b_flat = self.pack_flat(b)

        ck = ("cheb", degree)
        if ck not in self._chunk_jits:
            def run(arrs, wins, b_flat_, cs_, scale_):
                mv = lambda t: tuple(
                    self._matvec_rep_call(arrs, wins, *t))
                acc = chebyshev_scan(
                    mv, self._split_flat(b_flat_), cs_, scale_)
                return acc[0], acc[2]

            self._chunk_jits[ck] = jax.jit(run)
        xu, xn = self._chunk_jits[ck](
            self._arrs, self._wins, b_flat, cs, scale)
        if raw:
            return xu, xn
        return self.layout.unpack(np.asarray(xu), np.asarray(xn))

    def _chunk_call(self, chunk: int):
        key = ("p1chunk", chunk)
        if key not in self._chunk_jits:
            lay = self.layout
            vm, sm = self._common_specs()
            kern = functools.partial(
                _pass_one_chunk_kernel, chunk=chunk, p_hi=lay.p_hi,
                c_chunks=lay.u.C, tol=self.tol, ztol=self.ztol,
                wg_u=lay.u.wg, wg_v=lay.v.wg, comp=self.compensated)
            call = pl.pallas_call(
                kern,
                in_specs=[vm] * 12 + [sm, sm, sm],
                out_specs=[sm, sm, vm, vm, vm, sm],
                out_shape=[
                    jax.ShapeDtypeStruct((chunk,), jnp.float32),
                    jax.ShapeDtypeStruct((chunk,), jnp.float32),
                    jax.ShapeDtypeStruct((2, lay.u.R, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((2, lay.v.R, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((2, lay.P2, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((5,), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((lay.u.R, LANE), jnp.float32),
                    pltpu.VMEM((lay.v.R, LANE), jnp.float32),
                    pltpu.VMEM((lay.P2, LANE), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT),
                interpret=self.interpret,
            )

            def run(arrs, wins, b_rep, su, sv, sn, ctl):
                a, b_, su2, sv2, sn2, ctl2 = call(
                    *arrs, *b_rep, su, sv, sn, *wins, ctl)
                # ONE stacked scalar readback per chunk (each host<->device
                # transfer costs a tunnel round trip)
                packed = jnp.concatenate([a, b_, ctl2])
                return packed, su2, sv2, sn2, ctl2

            self._chunk_jits[key] = jax.jit(run)
        return self._chunk_jits[key]

    def pass_one_chunked(self, b_rep, k: int, callback=None, chunk: int = 64):
        """Pass one with a live per-iteration callback (in-run early stop on
        the fused production path — the reference's ``LanczosCallback``
        break-out, ``src/algorithms/lanczos.rs:93-113``).

        Runs ``ceil(k/chunk)`` resumable kernel launches; between chunks the
        (α, β) prefix is read back (one stacked transfer) and
        ``callback(s, None, (alphas[:s], betas[:s-1]))`` is replayed per
        iteration — return False to stop. A stop at iteration s costs at
        most ``ceil(s/chunk)·chunk`` matvecs; the coefficients are
        bit-identical to the monolithic :meth:`pass_one`.
        """
        lay = self.layout
        need = self.chunk_vmem_bytes(lay)
        if need > self.VMEM_BUDGET and not self.interpret:
            raise ValueError(
                f"chunked pass one needs {need} bytes of VMEM (the resumable"
                f" state rides as kernel inputs AND outputs), over the"
                f" {self.VMEM_BUDGET}-byte budget; use the monolithic"
                " pass_one with post-hoc observability.replay_iterations, or"
                " a smaller instance.")
        run = self._chunk_call(chunk)
        su = jnp.zeros((2, lay.u.R, LANE), jnp.float32)
        sv = jnp.zeros((2, lay.v.R, LANE), jnp.float32)
        sn = jnp.zeros((2, lay.P2, LANE), jnp.float32)
        ctl = jnp.asarray([0.0, 0.0, -1.0, 0.0, float(k)], jnp.float32)
        alphas = np.zeros(k, np.float32)
        betas = np.zeros(k, np.float32)
        b_norm = 0.0
        visited = 0
        stopped = False
        n_chunks = -(-k // chunk)
        for _ in range(n_chunks):
            packed, su, sv, sn, ctl = run(
                self._arrs, self._wins, b_rep, su, sv, sn, ctl)
            packed = np.asarray(packed)
            a_c, b_c, ctl_np = (packed[:chunk], packed[chunk:2 * chunk],
                                packed[2 * chunk:])
            steps_now = int(ctl_np[2])
            b_norm = float(ctl_np[3])
            got = steps_now - visited
            if got > 0:
                alphas[visited:steps_now] = a_c[:got]
                betas[visited:steps_now] = b_c[:got]
            if callback is not None:
                for s in range(visited + 1, steps_now + 1):
                    if not callback(s, None,
                                    (alphas[:s], betas[: s - 1])):
                        visited = s
                        stopped = True
                        break
                else:
                    visited = steps_now
            else:
                visited = steps_now
            if stopped or ctl_np[1] > 0 or steps_now >= k:
                break
        steps = visited
        # truncate to the stop point. On a callback stop, zero from step-1
        # (`observability.truncate_decomposition` early-stop semantics); a
        # full/breakdown run keeps β_steps like the monolithic kernel.
        alphas[steps:] = 0.0
        betas[max(steps - 1, 0) if stopped else steps:] = 0.0
        return LanczosDecomposition(
            alphas=jnp.asarray(alphas), betas=jnp.asarray(betas),
            steps_taken=jnp.asarray(steps, jnp.int32),
            b_norm=jnp.asarray(b_norm, jnp.float32))

    def pass_one_with_basis(self, b_rep, k: int):
        """O(n·k) pass one: also returns the basis ``(basis_u (k,R,128),
        basis_n (k,P2,128))`` stored in HBM (reference one-pass variant)."""
        lay = self.layout
        vm, sm = self._common_specs()
        hbm = pl.BlockSpec(memory_space=pl.ANY)
        kern = functools.partial(
            _pass_one_basis_kernel, k=k, p_hi=lay.p_hi, c_chunks=lay.u.C,
            tol=self.tol, ztol=self.ztol,
            wg_u=lay.u.wg, wg_v=lay.v.wg, comp=self.compensated)
        alphas, betas, bnorm, steps, basis_u, basis_n = pl.pallas_call(
            kern,
            in_specs=[vm] * 9 + [sm, sm],
            out_specs=[sm, sm, sm, sm, hbm, hbm],
            out_shape=[
                jax.ShapeDtypeStruct((k,), jnp.float32),
                jax.ShapeDtypeStruct((k,), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
                jax.ShapeDtypeStruct((k, lay.u.R, LANE), jnp.float32),
                jax.ShapeDtypeStruct((k, lay.P2, LANE), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((3, lay.u.R, LANE), jnp.float32),
                pltpu.VMEM((3, lay.u.R, LANE), jnp.float32),
                pltpu.VMEM((3, lay.P2, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=self.interpret,
        )(*self._arrs, *b_rep, *self._wins)
        decomp = LanczosDecomposition(
            alphas=alphas, betas=betas, steps_taken=steps[0], b_norm=bnorm[0])
        return decomp, basis_u, basis_n

    def pass_two(self, b_rep, decomp: LanczosDecomposition, y_full):
        """Reconstruction pass. ``y_full`` is the length-k coefficient vector
        already masked beyond ``steps_taken`` and scaled by ‖b‖ — or a
        ``(nf, k)`` stack of them, reconstructing nf matrix-function
        solutions from one replayed basis (one matvec per step shared by
        all; outputs gain a leading nf axis)."""
        lay = self.layout
        k = decomp.k_max
        y_full = jnp.asarray(y_full)
        out_lead = y_full.shape[:-1]  # () or (nf,)
        vm, sm = self._common_specs()
        kern = functools.partial(
            _pass_two_kernel, k=k, p_hi=lay.p_hi, c_chunks=lay.u.C,
            tol=self.tol, ztol=self.ztol,
            wg_u=lay.u.wg, wg_v=lay.v.wg)
        xu, xn = pl.pallas_call(
            kern,
            in_specs=[vm] * 9 + [sm] * 7,
            out_specs=[vm, vm],
            out_shape=[
                jax.ShapeDtypeStruct(out_lead + (lay.u.R, LANE), jnp.float32),
                jax.ShapeDtypeStruct(out_lead + (lay.P2, LANE), jnp.float32),
            ],
            scratch_shapes=self._scratch(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=self.interpret,
        )(*self._arrs, *b_rep, *self._wins,
          decomp.alphas, decomp.betas, y_full.astype(jnp.float32),
          decomp.b_norm.reshape(1), decomp.steps_taken.reshape(1))
        return xu, xn

    def _solve_rep(self, b_flat, k: int, f, method: str):
        b_rep = self._split_flat(b_flat)
        if method == "one_pass":
            decomp, basis_u, basis_n = self.pass_one_with_basis(b_rep, k)
        else:
            decomp = self.pass_one(b_rep, k)
        multi = isinstance(f, tuple)
        fs = f if multi else (f,)
        y = jnp.stack([padded_f_e1(decomp, fi) for fi in fs])
        if not multi:
            y = y[0]
        idx = jnp.arange(k)
        y_full = jnp.where(idx < decomp.steps_taken,
                           y.astype(jnp.float32) * decomp.b_norm, 0.0)
        if method == "one_pass":
            # x = V_k · y: one big memory-bound contraction over the stored
            # basis (reference ``src/solvers.rs:96-104``); a multi-f stack
            # turns the GEMV into a GEMM over the same basis read.
            xu = jnp.einsum("krl,...k->...rl", basis_u, y_full,
                            precision=jax.lax.Precision.HIGHEST)
            xn = jnp.einsum("krl,...k->...rl", basis_n, y_full,
                            precision=jax.lax.Precision.HIGHEST)
        else:
            xu, xn = self.pass_two(b_rep, decomp, y_full)
        # one stacked output array => one device→host transfer on fetch
        return jnp.concatenate([xu, xn], axis=-2), decomp

    def solve(self, b, k: int, f="inv", method: str = "two_pass",
              raw: bool = False, callback=None, callback_chunk: int = 64):
        """f(A)·b via the fused kernels. ``method`` ∈ {"one_pass",
        "two_pass"}. Returns ``(x, decomposition)``; ``x`` is an (n,) NumPy
        array in the original ordering, or the raw stacked ``(R+P2, 128)``
        rep-layout device array when ``raw=True`` (cheaper: skips the
        unpermute and the host round-trip).

        ``f`` may be a TUPLE of function specs: all of them are evaluated
        from one decomposition — pass one runs once and pass two replays
        the basis once, accumulating every function's solution in the same
        kernel (nf solves for ~the price of one; ``x`` gains a leading nf
        axis). The kernel replay is y-independent — a stack slice is
        bit-identical to a single-``f`` kernel run on the same y — but the
        in-jit projected solve compiles into a different XLA program for
        the stack, so end-to-end slices agree with single-``f`` solves to
        f32 rounding, not bitwise.

        ``callback`` (two_pass only) enables in-run early stopping: pass
        one runs via :meth:`pass_one_chunked` in ``callback_chunk``-step
        kernel launches and a stop at step s truncates the solve to s
        (the reference's in-loop ``LanczosCallback`` break-out).

        ``b`` may be the pre-packed flat ``(2R+P2, 128)`` device array
        (the :meth:`pack_flat` output, or any device computation in the
        rep): the host scatter + tunnel upload (~30 ms RTT + pack per
        call) is skipped — the path for device-resident right-hand
        sides and repeated-solve pipelines."""
        if isinstance(f, tuple) and method == "two_pass" and not self.interpret:
            lay = self.layout
            extra = (len(f) - 1) * (lay.u.R + lay.P2) * LANE * 4
            if self.pass_vmem_bytes(lay) + extra > self.VMEM_BUDGET:
                raise ValueError(
                    f"multi-f pass two needs {extra} extra VMEM bytes for "
                    f"{len(f)} accumulator planes, over the per-chip budget "
                    "at this instance size; run the functions as separate "
                    "solves (pass one is the cheaper half) or use "
                    "method='one_pass'.")
        lay = self.layout
        if (getattr(b, "ndim", 1) == 2
                and b.shape == (2 * lay.u.R + lay.P2, LANE)):
            b_flat = jnp.asarray(b)  # pre-packed flat rep, already on device
        else:
            b_flat = self.pack_flat(b)
        if callback is not None:
            if method != "two_pass":
                raise ValueError(
                    "callback early stopping is implemented for the "
                    "two_pass method (the one-pass variant streams its "
                    "basis in one monolithic kernel)")
            b_rep = self._split_flat(b_flat)
            decomp = self.pass_one_chunked(
                b_rep, k, callback=callback, chunk=callback_chunk)
            if "_finish" not in self._chunk_jits:
                def finish(b_flat2, alphas, betas, steps, b_norm, kk, ff):
                    dec = LanczosDecomposition(
                        alphas=alphas, betas=betas, steps_taken=steps,
                        b_norm=b_norm)
                    ffs = ff if isinstance(ff, tuple) else (ff,)
                    y = jnp.stack([padded_f_e1(dec, fi) for fi in ffs])
                    if not isinstance(ff, tuple):
                        y = y[0]
                    y_full = jnp.where(jnp.arange(kk) < steps,
                                       y.astype(jnp.float32) * b_norm, 0.0)
                    xu, xn = self.pass_two(
                        self._split_flat(b_flat2), dec, y_full)
                    return jnp.concatenate([xu, xn], axis=-2)
                self._chunk_jits["_finish"] = jax.jit(
                    finish, static_argnums=(5, 6))
            x_flat = self._chunk_jits["_finish"](
                b_flat, decomp.alphas, decomp.betas, decomp.steps_taken,
                decomp.b_norm, k, f)
        else:
            if not hasattr(self, "_solve_jit"):
                self._solve_jit = jax.jit(
                    self._solve_rep, static_argnums=(1, 2, 3))
            x_flat, decomp = self._solve_jit(b_flat, k, f, method)
        if raw:
            return x_flat, decomp
        x_np = np.asarray(x_flat)
        r = self.layout.u.R
        if isinstance(f, tuple):  # (nf, R+P2, LANE) -> (nf, n)
            return np.stack([
                self.layout.unpack(xf[:r], xf[r:]) for xf in x_np
            ]), decomp
        return self.layout.unpack(x_np[:r], x_np[r:]), decomp
