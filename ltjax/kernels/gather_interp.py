"""Fused RK4 gather-interpolation Pallas TPU kernel.

Reference semantics: LTRANS.f90 ``update_particles`` RK4 advection via
4x ``find_currents`` (SURVEY.md SS3.2 [conf: H]) — horizontal bilinear
of every s-level, vertical tension spline of the blended profile
(blend-then-fit, the reference ordering), near-bottom log-layer decay.

Why a kernel: the XLA lowering of this path is bound by (a) the fixed
row-gather rate (~0.4 G rows/s on v5e regardless of width) and (b) HBM
round-trips of the (N, levels) profile intermediates between fusions
(measured ~30 ms per RK4 stage at 1M particles vs a ~3 ms roofline).
The kernel keeps everything in VMEM:

- Particles are Morton-sorted per external step (ltjax.spatial), so a
  block of ``P = 1024`` consecutive particles is spatially compact.
- Per block, the 16x16-cell windows of the 3 RK4 stage tables
  (ltjax.packed.ValueTable ``full``, (Ny, Nx, HL) f32) are DMA'd
  HBM->VMEM at block-dependent origins (scalar-prefetched).
- The 4-corner bilinear gather+blend is ONE MXU matmul per stage:
  win (WC, HL) contracted with the bilinear one-hot weight matrix
  W (WC, P) built on the VPU -> blended profiles (HL, P).
- The vertical tension-spline fit (Thomas solve over ~20 levels) and
  evaluation run unrolled on (8, 128)-shaped registers (particles on
  sublanes x lanes, levels as the unrolled axis).
- All 4 RK4 stage evaluations (stages 2/3 share the midpoint table)
  happen in-kernel; only (dx, dy, dz, oob) leave.

Particles whose bilinear stencil falls outside their block's window
(Morton discontinuities) are flagged ``oob`` (their in-kernel result
used clamped indices) and recomputed exactly by the XLA mirror
(ltjax.packed.rk4_displacement_collapsed) on a compressed fixed-size
subset; if the overflow exceeds the static capacity the whole batch
falls back via ``lax.cond``.  Either way the result equals the mirror
scheme for every particle.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import packed as pk
from ..grid import Grid, locate

P = 2048           # particles per block (default; callers may override)
WY = 16            # window cells (eta)  (default; callers may override)
WX = 16            # window cells (xi)
WC = WY * WX       # window cells, flattened


def _recip_fn(fast_math: bool):
    """Division helper for kernel bodies.

    fast_math=True uses the VPU's approximate-reciprocal instruction
    plus two Newton iterations — ~1-2 ulp of an exact f32 divide (each
    Newton step squares the relative error of the ~8-bit seed) at a
    fraction of the divide latency.  The hot spline path spends ~40
    divides per particle-stage (interval widths, Thomas factorization,
    knot depths), which makes this one of the larger VPU savings in the
    fused kernels.  Exact divides remain the default for the XLA
    mirror paths so the oob patch stays the reference arbiter.
    """
    if not fast_math:
        def recip(v):
            return 1.0 / v
        return recip

    def recip(v):
        r = pl.reciprocal(v, approx=True)
        r = r * (2.0 - v * r)
        return r * (2.0 - v * r)
    return recip

# params SMEM layout: 32 head scalars then interleaved (s, Cs) pairs.
# Slots 6..31 are reserved for the external-step kernel's extra head
# scalars (ltjax.kernels.ext_step) so both kernels share one layout.
_IDX_X0, _IDX_INVDX, _IDX_Y0, _IDX_INVDY, _IDX_HC, _IDX_Z0 = range(6)
_IDX_SC0 = 32      # s_rho/Cs_r pairs, then s_w/Cs_w pairs


def _gs_fns(sigma: float):
    """Static-sigma spline basis gs(u, B) and Thomas coefficients.

    For uniform static tension the Thomas coefficients are h * const
    and gs is the cubic polynomial at sigma == 0, the exp form else
    (cf. ltjax.tension._gs / _coefs with u a compile-time constant).
    """
    if sigma == 0.0:
        def gs(B):
            return (B * B * B - B) / 6.0
        return gs, (1.0 / 6.0), (1.0 / 3.0)
    u = float(sigma)
    inv_u2 = 1.0 / (u * u)
    c_off = inv_u2 * (1.0 - u / math.sinh(u))
    c_diag = inv_u2 * (u / math.tanh(u) - 1.0)
    den = -math.expm1(-2.0 * u)

    def gs(B):
        # sinh(uB)/sinh(u) = exp(u(B-1)) * (1 - exp(-2uB)) / (1 - exp(-2u))
        ratio = jnp.exp(u * (B - 1.0)) * (-jnp.expm1(-2.0 * u * B)) / den
        return (ratio - B) * inv_u2
    return gs, c_off, c_diag


def _ds_fn(sigma: float):
    """Spline basis derivative ds(u, B) at static tension (cf.
    ltjax.tension._ds): H'(x) = (y1-y0)/h + h*(s0*ds(B1) - s1*ds(B2))."""
    if sigma == 0.0:
        def ds(B):
            return 1.0 / 6.0 - 0.5 * B * B
        return ds
    u = float(sigma)
    inv_u2 = 1.0 / (u * u)
    den = -math.expm1(-2.0 * u)

    def ds(B):
        # u*cosh(uB)/sinh(u) = u exp(u(B-1)) (1+exp(-2uB)) / (1-exp(-2u))
        ratio = u * jnp.exp(u * (B - 1.0)) * (1.0 + jnp.exp(-2.0 * u * B)) / den
        return (1.0 - ratio) * inv_u2
    return ds


def _eval_spline_deriv(zq, zk, yk, z2, ds):
    """dH/dz at zq (clamped); same unrolled interval masks as
    _eval_spline."""
    K = len(zk)
    zq = jnp.minimum(jnp.maximum(zq, zk[0]), zk[K - 1])
    one = jnp.ones_like(zq)
    zero = jnp.zeros_like(zq)
    z0 = zero
    z1 = zero
    y0 = zero
    y1 = zero
    s0 = zero
    s1 = zero
    prev = one
    for k in range(K - 1):
        nxt = jnp.where(zq >= zk[k + 1], one, zero) if k < K - 2 else zero
        ind = prev - nxt
        prev = nxt
        z0 = z0 + ind * zk[k]
        z1 = z1 + ind * zk[k + 1]
        y0 = y0 + ind * yk[k]
        y1 = y1 + ind * yk[k + 1]
        s0 = s0 + ind * z2[k]
        s1 = s1 + ind * z2[k + 1]
    hh = z1 - z0
    B2 = (zq - z0) / hh
    B1 = 1.0 - B2
    return (y1 - y0) / hh + hh * (s0 * ds(B1) - s1 * ds(B2))


def _fit_thomas_multi(zk, yks, c_off, c_diag, recip=None):
    """Natural tension-spline fit: knot second derivatives z2, for
    several value profiles sharing the SAME knots.

    zk: list of K (PS, 128) knot depths; yks: list of profiles, each a
    list of K (PS, 128) values.  Unrolled Thomas solve; mirrors
    ltjax.tension.fit for uniform static sigma (off = h*c_off,
    diag = h*c_diag per interval, natural ends z2 = 0).  The matrix
    factorization (cp, inv) is computed once and shared across the
    right-hand sides — u and v live on the same rho knots.
    """
    if recip is None:
        recip = _recip_fn(False)
    K = len(zk)
    h = [zk[k + 1] - zk[k] for k in range(K - 1)]
    inv_h = [recip(hh) for hh in h]
    off = [hh * c_off for hh in h]
    dia = [hh * c_diag for hh in h]
    zero = jnp.zeros_like(zk[0])
    cp = [zero] * K
    invs = [zero] * K
    for i in range(1, K - 1):
        invs[i] = recip((dia[i - 1] + dia[i]) - off[i - 1] * cp[i - 1])
        cp[i] = off[i] * invs[i]
    outs = []
    for yk in yks:
        dy = [(yk[k + 1] - yk[k]) * inv_h[k] for k in range(K - 1)]
        dp = [zero] * K
        for i in range(1, K - 1):
            dp[i] = ((dy[i] - dy[i - 1]) - off[i - 1] * dp[i - 1]) * invs[i]
        z2 = [zero] * K
        x = zero
        for i in range(K - 2, 0, -1):
            x = dp[i] - cp[i] * x
            z2[i] = x
        outs.append(z2)
    return outs


def _fit_thomas(zk, yk, c_off, c_diag, recip=None):
    """Single-profile wrapper around _fit_thomas_multi."""
    return _fit_thomas_multi(zk, [yk], c_off, c_diag, recip=recip)[0]


def _eval_spline_multi(zq, zk, yks, z2s, gs, recip=None):
    """Evaluate several splines sharing knots zk at the same zq
    (clamped to the knot range).

    zq: (PS, 128); zk: list of K (PS, 128); yks/z2s: per-profile lists.
    Interval selection by unrolled mask accumulation — no gathers, pure
    VPU; the interval masks, basis fractions, and gs() evaluations are
    shared across profiles (u and v live on the same rho knots).
    """
    if recip is None:
        recip = _recip_fn(False)
    K = len(zk)
    nprof = len(yks)
    zq = jnp.minimum(jnp.maximum(zq, zk[0]), zk[K - 1])
    one = jnp.ones_like(zq)
    zero = jnp.zeros_like(zq)
    z0 = zero
    z1 = zero
    y0 = [zero] * nprof
    y1 = [zero] * nprof
    s0 = [zero] * nprof
    s1 = [zero] * nprof
    prev = one                                  # zq >= zk[0] after clamp
    for k in range(K - 1):
        nxt = jnp.where(zq >= zk[k + 1], one, zero) if k < K - 2 else zero
        ind = prev - nxt                        # 1 iff zq in interval k
        prev = nxt
        z0 = z0 + ind * zk[k]
        z1 = z1 + ind * zk[k + 1]
        for p in range(nprof):
            y0[p] = y0[p] + ind * yks[p][k]
            y1[p] = y1[p] + ind * yks[p][k + 1]
            s0[p] = s0[p] + ind * z2s[p][k]
            s1[p] = s1[p] + ind * z2s[p][k + 1]
    hh = z1 - z0
    B2 = (zq - z0) * recip(hh)
    B1 = 1.0 - B2
    g1 = gs(B1)
    g2 = gs(B2)
    hh2 = hh * hh
    return [y0[p] * B1 + y1[p] * B2 + hh2 * (s0[p] * g1 + s1[p] * g2)
            for p in range(nprof)]


def _eval_spline(zq, zk, yk, z2, gs, recip=None):
    """Single-profile wrapper around _eval_spline_multi."""
    return _eval_spline_multi(zq, zk, [yk], [z2], gs, recip=recip)[0]


def const_ladder(ladder, sigma: float) -> dict:
    """Host-precomputed spline constants for a FIXED knot ladder
    (grid.affine_ladders): interval widths, their reciprocals, Thomas
    off-diagonals and factorization — all compile-time Python floats.

    The "sfast" vertical scheme: on affine-ladder grids the fit/eval
    runs in s-space at these constant knots (exactly equal to the
    z-space scheme by the affine invariance documented at
    grid.affine_ladders), deleting the per-particle knot ladders,
    interval widths, and Thomas factorization sweeps from the kernel —
    the single largest VPU cost of a stage evaluation.
    """
    L = [float(v) for v in np.asarray(ladder, np.float64)]
    K = len(L)
    _, c_off, c_diag = _gs_fns(sigma)
    hs = [L[k + 1] - L[k] for k in range(K - 1)]
    inv_hs = [1.0 / h for h in hs]
    off = [h * c_off for h in hs]
    dia = [h * c_diag for h in hs]
    cp = [0.0] * K
    invs = [0.0] * K
    for i in range(1, K - 1):
        invs[i] = 1.0 / ((dia[i - 1] + dia[i]) - off[i - 1] * cp[i - 1])
        cp[i] = off[i] * invs[i]
    return dict(L=L, hs=hs, inv_hs=inv_hs, off=off, invs=invs, cp=cp)


def _fit_thomas_const_groups(groups):
    """Natural tension-spline fits on constant ladders, INTERLEAVED
    across all profiles of all groups.

    ``groups``: list of (yks, C) with yks a list of profiles sharing
    the ladder constants ``C`` (const_ladder).  Returns the per-group
    z2 lists in order.  Value-identical (bit-for-bit) to running
    _fit_thomas_const_multi per group: every op has the same operands
    in the same within-chain order — only ops from INDEPENDENT chains
    (u, v, w) are interleaved, giving the VPU scheduler parallel work
    inside the serial Thomas recurrences (the per-profile-sequential
    form left the forward/backward sweeps as back-to-back dependency
    chains; the spline phase measured ~55% of the calibrated VPU rate,
    BASELINE.md round-4 anatomy)."""
    chains = []   # flat list of dicts, one per profile
    for yks, C in groups:
        K = len(C["L"])
        for yk in yks:
            chains.append(dict(yk=yk, C=C, K=K))
    zero = jnp.zeros_like(chains[0]["yk"][0])
    Kmax = max(c["K"] for c in chains)
    # raw value differences (the 1/h slope normalization folds into
    # the forward-sweep constants below — saves one multiply per knot
    # per profile vs materializing dy = e * inv_h first)
    for c in chains:
        c["e"] = [c["yk"][k + 1] - c["yk"][k]
                  for k in range(c["K"] - 1)]
        c["dp"] = [zero] * c["K"]
        c["z2"] = [zero] * c["K"]
        c["x"] = zero
    # forward sweep, knot-outer / chain-inner:
    #   dp[i] = (dy[i] - dy[i-1] - off[i-1]*dp[i-1]) * invs[i]
    #         = e[i]*(inv_h[i]*invs[i]) - e[i-1]*(inv_h[i-1]*invs[i])
    #           - (off[i-1]*invs[i]) * dp[i-1]
    # with every parenthesized factor a compile-time scalar (value
    # differences are ulp-level reassociation only)
    for i in range(1, Kmax - 1):
        for c in chains:
            if i >= c["K"] - 1:
                continue
            inv_hs = c["C"]["inv_hs"]
            off = c["C"]["off"]
            invs = c["C"]["invs"]
            t = (c["e"][i] * (inv_hs[i] * invs[i])
                 - c["e"][i - 1] * (inv_hs[i - 1] * invs[i]))
            if i > 1:
                t = t - (off[i - 1] * invs[i]) * c["dp"][i - 1]
            c["dp"][i] = t
    # backward sweep, knot-outer / chain-inner (descending offset from
    # each chain's own end so within-chain order is unchanged)
    for step in range(Kmax - 2):
        for c in chains:
            i = c["K"] - 2 - step
            if i < 1:
                continue
            c["x"] = c["dp"][i] - c["C"]["cp"][i] * c["x"]
            c["z2"][i] = c["x"]
    outs = []
    pos = 0
    for yks, C in groups:
        outs.append([chains[pos + p]["z2"] for p in range(len(yks))])
        pos += len(yks)
    return outs


def _fit_thomas_const_multi(yks, C: dict):
    """Natural tension-spline fit on the constant ladder ``C``
    (const_ladder): value-identical to _fit_thomas_multi with knots
    z_k = a + b*L_k up to the 1/b^2 scale that _eval_spline_const_multi
    absorbs (affine invariance).  All matrix data are scalar constants;
    only the per-profile rhs sweeps remain vector work."""
    return _fit_thomas_const_groups([(yks, C)])[0]


def _eval_spline_const_groups(sq, groups, gs):
    """Evaluate splines on constant ladders at sq, INTERLEAVED across
    groups (see _fit_thomas_const_groups — same motivation, same
    bit-identical-per-group guarantee).

    ``groups``: list of (yks, z2s, C); all groups share the query sq
    (clamped per-ladder).  Returns the per-group value lists.
    """
    st_ = []
    for yks, z2s, C in groups:
        K = len(C["L"])
        L = C["L"]
        sqc = jnp.minimum(jnp.maximum(sq, L[0]), L[K - 1])
        one = jnp.ones_like(sqc)
        zero = jnp.zeros_like(sqc)
        nprof = len(yks)
        st_.append(dict(
            yks=yks, z2s=z2s, C=C, K=K, sqc=sqc, nprof=nprof,
            y0=[zero] * nprof, y1=[zero] * nprof,
            s0=[zero] * nprof, s1=[zero] * nprof,
            invh=zero, c0=zero, hsq=zero, prev=one, one=one,
            zero=zero))
    Kmax = max(g["K"] for g in st_)
    for k in range(Kmax - 1):
        for g in st_:
            K = g["K"]
            if k >= K - 1:
                continue
            L = g["C"]["L"]
            inv_hs = g["C"]["inv_hs"]
            hs = g["C"]["hs"]
            sqc = g["sqc"]
            nxt = (jnp.where(sqc >= L[k + 1], g["one"], g["zero"])
                   if k < K - 2 else g["zero"])
            ind = g["prev"] - nxt
            g["prev"] = nxt
            g["invh"] = g["invh"] + ind * inv_hs[k]
            g["c0"] = g["c0"] + ind * (L[k] * inv_hs[k])
            g["hsq"] = g["hsq"] + ind * (hs[k] * hs[k])
            for p in range(g["nprof"]):
                g["y0"][p] = g["y0"][p] + ind * g["yks"][p][k]
                g["y1"][p] = g["y1"][p] + ind * g["yks"][p][k + 1]
                g["s0"][p] = g["s0"][p] + ind * g["z2s"][p][k]
                g["s1"][p] = g["s1"][p] + ind * g["z2s"][p][k + 1]
    outs = []
    for g in st_:
        B2 = g["sqc"] * g["invh"] - g["c0"]
        B1 = 1.0 - B2
        g1 = gs(B1)
        g2 = gs(B2)
        outs.append([g["y0"][p] * B1 + g["y1"][p] * B2
                     + g["hsq"] * (g["s0"][p] * g1 + g["s1"][p] * g2)
                     for p in range(g["nprof"])])
    return outs


def _eval_spline_const_multi(sq, C: dict, yks, z2s, gs):
    """Evaluate splines fit on the constant ladder at sq (clamped).

    The interval bookkeeping (knots, widths, reciprocals) folds into
    three scalar-coefficient accumulators (invh, c0, hsq); only the
    per-profile y/z2 corner accumulation remains per-interval vector
    work.  B2 = (sq - L_k)/hs_k = sq*invh - c0 for the active interval.
    """
    return _eval_spline_const_groups(sq, [(yks, z2s, C)], gs)[0]


def _eval_spline_deriv_const(sq, C: dict, yk, z2, ds):
    """dH/ds at sq on the constant ladder (multiply by ds/dz = 1/b for
    the z-space derivative); mirrors _eval_spline_deriv."""
    K = len(C["L"])
    L = C["L"]
    inv_hs = C["inv_hs"]
    hs = C["hs"]
    sq = jnp.minimum(jnp.maximum(sq, L[0]), L[K - 1])
    one = jnp.ones_like(sq)
    zero = jnp.zeros_like(sq)
    dyq = zero
    s0 = zero
    s1 = zero
    invh = zero
    c0 = zero
    hsv = zero
    prev = one
    for k in range(K - 1):
        nxt = jnp.where(sq >= L[k + 1], one, zero) if k < K - 2 else zero
        ind = prev - nxt
        prev = nxt
        dyq = dyq + ind * ((yk[k + 1] - yk[k]) * inv_hs[k])
        s0 = s0 + ind * z2[k]
        s1 = s1 + ind * z2[k + 1]
        invh = invh + ind * inv_hs[k]
        c0 = c0 + ind * (L[k] * inv_hs[k])
        hsv = hsv + ind * hs[k]
    B2 = sq * invh - c0
    B1 = 1.0 - B2
    return dyq + hsv * (s0 * ds(B1) - s1 * ds(B2))


# One-hot builders.  All three construct the (wy*wx, P) weight matrix
# DIRECTLY from the flat window-cell index k = lj*wx + li compared
# against a (wc, P) sublane iota — a handful of elementwise compare/
# select ops and NO cross-sublane relayouts.  The previous formulation
# (separate (wy, P)/(wx, P) row/col one-hots combined via broadcast +
# reshape + pltpu.repeat + multiply) lowered to sublane-broadcast
# relayouts that dominated the build cost (~0.67 ms per (128, 1024)
# f32 build measured by benchmarks/kernel_anatomy.py — the largest
# VPU item after the vertical spline, BASELINE.md round-4 anatomy).
# The produced matrices are bit-identical to the old ones.


def make_bilinear_onehot(li, lj, fx, fy, P: int, wy: int = WY,
                         wx: int = WX):
    """Bilinear one-hot weight matrix W (wy*wx, P) from window-local
    cell indices + fractions (all (PS, 128) f32).

    Nonzeros per particle column: (1-fx)(1-fy) at k, fx(1-fy) at k+1,
    (1-fx)fy at k+wx, fx*fy at k+wx+1, with k = lj*wx + li (li <=
    wx-2, lj <= wy-2 by the callers' clips, so all four stay in 0..wc-1
    and the flat-index compares need no row/col separation)."""
    wc = wy * wx
    k = (lj * float(wx) + li).reshape(1, P)
    fx_l = fx.reshape(1, P)
    fy_l = fy.reshape(1, P)
    idx = jax.lax.broadcasted_iota(
        jnp.int32, (wc, P), 0).astype(jnp.float32)
    w00 = (1.0 - fx_l) * (1.0 - fy_l)
    w10 = fx_l * (1.0 - fy_l)
    w01 = (1.0 - fx_l) * fy_l
    w11 = fx_l * fy_l
    return (jnp.where(idx == k, w00, 0.0)
            + jnp.where(idx == k + 1.0, w10, 0.0)
            + jnp.where(idx == k + float(wx), w01, 0.0)
            + jnp.where(idx == k + float(wx + 1), w11, 0.0))


def make_cell_onehot(li, lj, P: int, wy: int = WY, wx: int = WX):
    """{0,1} cell-selection matrix (wy*wx, P) from window-local indices."""
    wc = wy * wx
    k = (lj * float(wx) + li).reshape(1, P)
    idx = jax.lax.broadcasted_iota(
        jnp.int32, (wc, P), 0).astype(jnp.float32)
    return jnp.where(idx == k, 1.0, 0.0)


def make_rowpair_onehot(li, lj, fy_q, P: int, wy: int = WY, wx: int = WX):
    """Row-blending one-hot for the pair2 scheme, built in bf16.

    Entries are {0, 1-fy_q, fy_q} with fy_q on the 1/256 lattice —
    EXACTLY representable in bf16 (k/256 and (256-k)/256 both need at
    most 8 significand bits), so bf16 matmul passes lose nothing on the
    weight side, and the four bilinear weights still sum to exactly 1
    (no Σw≠1 absolute-error term — the flaw of plain bf16 weights).
    The x-corner selection is exact {0,1}; fx blends post-matmul on the
    VPU in f32 (pair-packed windows deliver both x-corners per row).
    Nonzeros per column: 1-fy_q at k = lj*wx + li, fy_q at k + wx."""
    wc = wy * wx
    k = (lj * float(wx) + li).reshape(1, P)
    fy_l = fy_q.reshape(1, P)
    idx = jax.lax.broadcasted_iota(
        jnp.int32, (wc, P), 0).astype(jnp.float32)
    return (jnp.where(idx == k, 1.0 - fy_l, 0.0)
            + jnp.where(idx == k + float(wx), fy_l, 0.0)
            ).astype(jnp.bfloat16)


def pair_dot(win, wt_bf16):
    """(wc, HLp) f32 x (wc, P) bf16 one-hot -> (HLp, P) f32 in 2 bf16
    passes: the window splits hi/lo (wh + wl carries ~16 value bits),
    the weights are bf16-exact by construction (make_rowpair_onehot).
    Relative error ~2^-16 — hilo3 quality at 2/3 the MXU passes."""
    dims = (((0,), (0,)), ((), ()))
    wh = win.astype(jnp.bfloat16)
    wl = (win - wh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a):
        return jax.lax.dot_general(
            a, wt_bf16, dimension_numbers=dims,
            preferred_element_type=jnp.float32)

    return d(wh) + d(wl)


def blend_dot_fn(precision):
    """(WC, HL) x (WC, P) -> (HL, P) one-hot blend matmul builder.

    ``precision`` is a jax.lax.Precision (DEFAULT = one bf16 pass,
    ~4e-3 relative; HIGHEST = 6-pass f32-exact) or the string "hilo3":
    a manual hi/lo bf16 mantissa split of BOTH operands with the lo*lo
    term dropped — 3 bf16 passes, ~2^-16 relative (~1.5e-5), on par
    with the f32 scheme's own roundoff accumulation.  Mosaic has no
    native 3-pass mode (Precision.HIGH is rejected).
    """
    dims = (((0,), (0,)), ((), ()))

    if precision == "hilo3":
        def dot(win, wt):
            wh = win.astype(jnp.bfloat16)
            wl = (win - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            th = wt.astype(jnp.bfloat16)
            tl = (wt - th.astype(jnp.float32)).astype(jnp.bfloat16)

            def d(a, b):
                return jax.lax.dot_general(
                    a, b, dimension_numbers=dims,
                    preferred_element_type=jnp.float32)

            return d(wh, th) + d(wl, th) + d(wh, tl)
        return dot

    def dot(win, wt):
        return jax.lax.dot_general(
            win, wt, dimension_numbers=dims,
            preferred_element_type=jnp.float32, precision=precision)
    return dot


def make_stage_eval(grid: Grid, sigma: float, nv: int, HL: int,
                    p_block: int, precision, window=(WY, WX),
                    fast_math: bool = False, ntot: "int | None" = None,
                    ladder=None):
    """Build the shared find_currents evaluator for fused kernels.

    Returns ``stage_eval(par_ref, oy_f, ox_f, win, xv, yv, zv, oob)``
    where ``win`` is a (wy*wx, HL) f32 *value* (callers read/collapse
    their VMEM window refs).  ``precision``: see blend_dot_fn, plus
    "pair2" — pair-packed windows ([cell | east] lanes,
    packed.build_record_tables(paired=True)), row-blending bf16-exact
    one-hot (make_rowpair_onehot), 2 MXU passes, fx blended post-matmul
    in f32; ``window``: (wy, wx) VMEM window cell extent; ``fast_math``:
    see _recip_fn; ``ntot``: data lanes per cell (pair stride for
    pair2; defaults to nv — pass the aks-extended count when the
    tables carry Aks lanes); ``ladder``: fixed vertical knot ladders
    (L_r, L_w) from grid.affine_ladders — engages the s-space constant-
    knot vertical scheme ("sfast", see const_ladder), value-equal to
    the z-space scheme up to f32 rounding.

    With extras=True, stage_eval additionally returns an aux tuple:
    ``(bl, z_r, z_w)`` on the z-space scheme or ``(bl, sq, binv)`` on
    sfast (s-space query + d(s)/d(z)), for in-kernel turbulence.
    """
    P = p_block
    PS = P // 128
    wy, wx = window
    us, ws = grid.us, grid.ws
    nx, ny = grid.nx, grid.ny
    gs, c_off, c_diag = _gs_fns(sigma)
    vt = grid.vtransform
    pair2 = precision == "pair2"
    blend_dot = None if pair2 else blend_dot_fn(precision)
    recip = _recip_fn(fast_math)
    nt = nv if ntot is None else ntot
    if ladder is not None:
        CR = const_ladder(ladder[0], sigma)
        CW = const_ladder(ladder[1], sigma)
        LR0 = CR["L"][0]

    def stage_eval(par_ref, oy_f, ox_f, win, xv, yv, zv, oob,
                   extras: bool = False):
        """One find_currents evaluation on a (PS, 128) particle block."""
        # --- locate (uniform-grid arithmetic) ---------------------------
        tx = (xv - par_ref[_IDX_X0]) * par_ref[_IDX_INVDX]
        ty = (yv - par_ref[_IDX_Y0]) * par_ref[_IDX_INVDY]
        i = jnp.clip(jnp.floor(tx), 0.0, float(nx - 2))
        j = jnp.clip(jnp.floor(ty), 0.0, float(ny - 2))
        fx = jnp.clip(tx - i, 0.0, 1.0)
        fy = jnp.clip(ty - j, 0.0, 1.0)
        li = i - ox_f
        lj = j - oy_f
        # pair2 rows carry the east corner in-lane, so li may reach the
        # window's last column; bilinear needs li+1 in-window
        li_max = float(wx - 1) if pair2 else float(wx - 2)
        bad = ((li < 0.0) | (li > li_max)
               | (lj < 0.0) | (lj > float(wy - 2)))
        oob = oob | bad
        li = jnp.clip(li, 0.0, li_max)
        lj = jnp.clip(lj, 0.0, float(wy - 2))

        # --- MXU gather+blend -------------------------------------------
        # callers pre-slice win to the 64-lane multiple covering the
        # data lanes (the rest of the 128-lane table width is DMA
        # padding) — half the MXU passes for us=20 (nv=63 -> 64 lanes)
        HLc = win.shape[-1]
        if pair2:
            fy_q = jnp.round(fy * 256.0) * jnp.float32(1.0 / 256.0)
            wt = make_rowpair_onehot(li, lj, fy_q, P, wy, wx)
            blended = pair_dot(win, wt)                   # (HLc, P)
            blv = blended.reshape(HLc, PS, 128)
            # fx blend of the two in-row x-corners, full f32 on the VPU
            bl = [blv[k] + fx * (blv[nt + k] - blv[k]) for k in range(nt)]
        else:
            wt = make_bilinear_onehot(li, lj, fx, fy, P, wy, wx)
            blended = blend_dot(win, wt)                      # (HLc, P)
            bla = blended.reshape(HLc, PS, 128)
            bl = [bla[k] for k in range(HLc)]

        zeta = bl[nv - 2]
        h = bl[nv - 1]
        hc = par_ref[_IDX_HC]

        prof_u = [bl[k] for k in range(us)]
        prof_v = [bl[us + k] for k in range(us)]
        prof_w = [bl[2 * us + k] for k in range(ws)]

        if ladder is not None:
            # --- sfast: constant-ladder fit/eval in s-space --------------
            # u/v (rho ladder) and w (w ladder) fits/evals run through
            # the chain-INTERLEAVED group forms: same ops, same
            # within-chain order (bit-identical values), but the three
            # serial Thomas recurrences overlap on the VPU
            binv = recip(zeta + h)
            sq = (zv - zeta) * binv
            (z2u, z2v), (z2w,) = _fit_thomas_const_groups(
                [([prof_u, prof_v], CR), ([prof_w], CW)])
            (u, v), (w,) = _eval_spline_const_groups(
                sq, [([prof_u, prof_v], [z2u, z2v], CR),
                     ([prof_w], [z2w], CW)], gs)
            # first rho knot above bottom: z_r[0] + h = (zeta+h)(1+L_r0)
            zr0_ab = (zeta + h) * (1.0 + LR0)
        else:
            # --- knots (s-coordinate depths, Vtransform 1|2) -------------
            # one reciprocal for the whole ladder (the per-knot divide
            # was ~us+ws divides per stage — the single largest VPU cost
            # here)
            hinv = recip(h) if vt == 1 else recip(hc + h)

            def knots(pair0, K):
                out = []
                for k in range(K):
                    s = par_ref[_IDX_SC0 + 2 * (pair0 + k)]
                    cs = par_ref[_IDX_SC0 + 2 * (pair0 + k) + 1]
                    if vt == 1:
                        zz0 = hc * s + (h - hc) * cs
                        out.append(zz0 + zeta * (1.0 + zz0 * hinv))
                    else:
                        s_ = (hc * s + h * cs) * hinv
                        out.append(zeta + (zeta + h) * s_)
                return out
            z_r = knots(0, us)
            z_w = knots(us, ws)

            z2u, z2v = _fit_thomas_multi(z_r, [prof_u, prof_v], c_off,
                                         c_diag, recip=recip)
            z2w = _fit_thomas(z_w, prof_w, c_off, c_diag, recip=recip)

            u, v = _eval_spline_multi(zv, z_r, [prof_u, prof_v],
                                      [z2u, z2v], gs, recip=recip)
            w = _eval_spline(zv, z_w, prof_w, z2w, gs, recip=recip)
            zr0_ab = z_r[0] + h

        # --- near-bottom log layer ---------------------------------------
        z0m = par_ref[_IDX_Z0]
        zab = zv + h
        ztb = jnp.maximum(zr0_ab, 2.0 * z0m)
        decay = jnp.log(jnp.maximum(zab, z0m) / z0m) * recip(
            jnp.log(ztb / z0m))
        factor = jnp.where(zab < ztb, jnp.clip(decay, 0.0, 1.0), 1.0)
        if extras:
            # blended lanes + vertical-scheme aux for in-kernel
            # turbulence/behavior (Aks/salt lanes ride beyond nv when
            # the tables pack them): knots on the z-space scheme,
            # (s-query, 1/b) on sfast
            aux = ((bl, sq, binv) if ladder is not None
                   else (bl, z_r, z_w))
            return u * factor, v * factor, w, oob, aux
        return u * factor, v * factor, w, oob

    return stage_eval


def _make_kernel(grid: Grid, sigma: float, idt: float, nv: int, HL: int,
                 p_block: int = P,
                 precision=jax.lax.Precision.HIGHEST,
                 window=(WY, WX), fast_math: bool = False, ladder=None):
    """Build the single-internal-step RK4 kernel body."""
    P_ = p_block
    PS = P_ // 128
    wy, wx = window
    stage_eval = make_stage_eval(grid, sigma, nv, HL, P_, precision,
                                 window=window, fast_math=fast_math,
                                 ladder=ladder)
    HLc = min(HL, ((nv + 63) // 64) * 64)

    def kernel(org_ref, par_ref, x_ref, y_ref, z_ref,
               t1_hbm, t2_hbm, t4_hbm,
               dx_ref, dy_ref, dz_ref, oob_ref,
               w1s, w2s, w4s, sems):
        b = pl.program_id(0)
        # org is flat (2B,): a (B, 2) SMEM operand pads its minor dim
        # to 128 lanes and overflows SMEM at large block counts
        oy = org_ref[2 * b]
        ox = org_ref[2 * b + 1]
        d1 = pltpu.make_async_copy(
            t1_hbm.at[pl.ds(oy, wy), pl.ds(ox, wx), :], w1s, sems.at[0])
        d2 = pltpu.make_async_copy(
            t2_hbm.at[pl.ds(oy, wy), pl.ds(ox, wx), :], w2s, sems.at[1])
        d4 = pltpu.make_async_copy(
            t4_hbm.at[pl.ds(oy, wy), pl.ds(ox, wx), :], w4s, sems.at[2])
        d1.start()
        d2.start()
        d4.start()

        oy_f = oy.astype(jnp.float32)
        ox_f = ox.astype(jnp.float32)
        xv = x_ref[0]
        yv = y_ref[0]
        zv = z_ref[0]
        oob = jnp.zeros((PS, 128), jnp.bool_)

        half = 0.5 * idt
        d1.wait()
        u1, v1, w1, oob = stage_eval(par_ref, oy_f, ox_f,
                                     w1s[:].reshape(wy * wx, HL)[:, :HLc],
                                     xv, yv, zv, oob)
        d2.wait()
        win2 = w2s[:].reshape(wy * wx, HL)[:, :HLc]
        u2, v2, w2, oob = stage_eval(
            par_ref, oy_f, ox_f, win2,
            xv + u1 * half, yv + v1 * half, zv + w1 * half, oob)
        u3, v3, w3, oob = stage_eval(
            par_ref, oy_f, ox_f, win2,
            xv + u2 * half, yv + v2 * half, zv + w2 * half, oob)
        d4.wait()
        u4, v4, w4, oob = stage_eval(
            par_ref, oy_f, ox_f, w4s[:].reshape(wy * wx, HL)[:, :HLc],
            xv + u3 * idt, yv + v3 * idt, zv + w3 * idt, oob)
        sixth = idt / 6.0
        dx_ref[0] = sixth * (u1 + 2.0 * u2 + 2.0 * u3 + u4)
        dy_ref[0] = sixth * (v1 + 2.0 * v2 + 2.0 * v3 + v4)
        dz_ref[0] = sixth * (w1 + 2.0 * w2 + 2.0 * w3 + w4)
        oob_ref[0] = oob.astype(jnp.int32)

    return kernel


def _params_array(grid: Grid, z0m: float) -> jax.Array:
    """SMEM params vector (see _IDX_* layout)."""
    us, ws = grid.us, grid.ws
    x = np.asarray(grid.x_rho, np.float64)
    y = np.asarray(grid.y_rho, np.float64)
    head = [x[0], 1.0 / (x[1] - x[0]), y[0], 1.0 / (y[1] - y[0]),
            float(grid.hc), float(z0m)] + [0.0] * (_IDX_SC0 - 6)
    inter = np.empty(2 * (us + ws), np.float64)
    inter[0:2 * us:2] = np.asarray(grid.s_rho, np.float64)
    inter[1:2 * us:2] = np.asarray(grid.Cs_r, np.float64)
    inter[2 * us::2] = np.asarray(grid.s_w, np.float64)
    inter[2 * us + 1::2] = np.asarray(grid.Cs_w, np.float64)
    return jnp.asarray(np.concatenate([head, inter]), jnp.float32)


def block_origins(grid: Grid, x, y, p_block: int = P,
                  window=(WY, WX)) -> jax.Array:
    """Per-block window origins (B, 2) int32 [oy, ox] from positions.

    One margin cell left/below for RK4 substep excursions; clipped so
    the window stays inside the table.
    """
    wy, wx = window
    n = x.shape[0]
    B = n // p_block
    i, _ = locate(grid.x_rho, x, grid.uniform)
    j, _ = locate(grid.y_rho, y, grid.uniform)
    # center the window on the block's middle particle: blocks are
    # Hilbert-contiguous, so the median particle sits mid-cluster and a
    # lone discontinuity straggler cannot drag the window off the rest
    # (min-based origins did; the straggler itself just takes the exact
    # oob-patch path)
    jm = j.reshape(B, p_block)[:, p_block // 2]
    im = i.reshape(B, p_block)[:, p_block // 2]
    oy = jnp.clip(jm - wy // 2, 0, max(grid.ny - wy, 0))
    ox = jnp.clip(im - wx // 2, 0, max(grid.nx - wx, 0))
    # flat (2B,) layout: see the kernel-side comment on SMEM padding
    return jnp.stack([oy, ox], axis=1).astype(jnp.int32).reshape(-1)


def rk4_displacement_fused(grid: Grid, vtabs, x, y, z, sigma: float,
                           z0m: float, idt: float,
                           overflow_frac: int = 64,
                           p_block: int = P,
                           precision=jax.lax.Precision.HIGHEST,
                           window=(WY, WX), fast_math: bool = False,
                           sfast: bool = True,
                           interpret: bool = False):
    """RK4 displacement via the fused kernel + exact XLA overflow patch.

    x, y, z: (N,) f32 positions, N a multiple of p_block, Hilbert-sorted
    (callers sort once per external step via ltjax.spatial).  Returns
    (dx, dy, dz) — same scheme as rk4_displacement_collapsed.
    """
    t1, t2, t4 = vtabs
    n = x.shape[0]
    P_ = p_block
    PS = P_ // 128
    assert n % P_ == 0, (n, P_)
    B = n // P_
    wy, wx = window
    nv = pk.n_value_lanes(grid.us, grid.ws)
    HL = t1.full.shape[-1]
    org = block_origins(grid, x, y, P_, window=window)
    params = _params_array(grid, z0m)

    from ..grid import affine_ladders
    ladder = affine_ladders(grid) if sfast else None
    kern = _make_kernel(grid, float(sigma), float(idt), nv, HL, P_,
                        precision, window=window, fast_math=fast_math,
                        ladder=ladder)
    out_shape = [jax.ShapeDtypeStruct((B, PS, 128), jnp.float32)] * 3 + [
        jax.ShapeDtypeStruct((B, PS, 128), jnp.int32)]

    def blk(b, org_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # params
            pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),             # t1 (HBM)
            pl.BlockSpec(memory_space=pl.ANY),             # t2
            pl.BlockSpec(memory_space=pl.ANY),             # t4
        ],
        out_specs=[pl.BlockSpec((1, PS, 128), blk,
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((wy, wx, HL), jnp.float32),
            pltpu.VMEM((wy, wx, HL), jnp.float32),
            pltpu.VMEM((wy, wx, HL), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    xb = x.astype(jnp.float32).reshape(B, PS, 128)
    yb = y.astype(jnp.float32).reshape(B, PS, 128)
    zb = z.astype(jnp.float32).reshape(B, PS, 128)
    dx, dy, dz, oob = pl.pallas_call(
        kern, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(org, params, xb, yb, zb, t1.full, t2.full, t4.full)
    dx = dx.reshape(n)
    dy = dy.reshape(n)
    dz = dz.reshape(n)
    oob = oob.reshape(n) != 0

    # --- exact recompute of out-of-window particles ----------------------
    # first ``cap`` flagged particles are recomputed by the XLA mirror;
    # overflow beyond that is reported via the returned mask (callers
    # flag status=ERROR) — a full-batch lax.cond fallback would have
    # its HBM budgeted at compile time and OOMs at 10M particles
    cap = min(n, max(256, n // overflow_frac))
    rank = jnp.cumsum(oob.astype(jnp.int32)) - 1
    overflow = oob & (rank >= cap)
    # fill_value=n: out of bounds on purpose — gathers clamp (the row is
    # unused) and scatters drop, avoiding full-batch sentinel copies
    idxs = jnp.nonzero(oob, size=cap, fill_value=n)[0]
    dxf, dyf, dzf = pk.rk4_displacement_collapsed(
        grid, vtabs, x.at[idxs].get(mode="clip"),
        y.at[idxs].get(mode="clip"), z.at[idxs].get(mode="clip"),
        sigma, z0m, idt)
    dx = dx.at[idxs].set(dxf, mode="drop")
    dy = dy.at[idxs].set(dyf, mode="drop")
    dz = dz.at[idxs].set(dzf, mode="drop")
    return dx, dy, dz, overflow
