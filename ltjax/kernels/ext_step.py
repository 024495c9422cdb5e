"""Whole-external-step fused Pallas TPU kernel.

Reference semantics: ``run_External_Timestep`` -> ``run_Internal_Timestep``
-> ``update_particles`` in LTRANS.f90 (SURVEY.md SS3.2 [conf: H]) for the
advection path: release at DOB, RK4 advection via 4x find_currents,
horizontal boundary reflection (``intersect_reflect``), open-boundary
exit, vertical surface/bottom reflection, status bookkeeping.

Why one kernel per EXTERNAL step (vs. the per-internal-step kernel in
ltjax.kernels.gather_interp): at 1M particles the per-step launch, the
grid-sized stage-table builds, the XLA row-gathers for boundary
reflection and the zeta/h lookups, and the HBM round-trips of positions
between steps together cost several ms per internal step — more than
the RK4 math itself.  This kernel keeps a particle block resident in
VMEM across ALL internal steps of one external step:

- per block, per internal step, the 16x16-cell windows of the THREE
  RAW time records (b, c, f; ltjax.packed.build_record_tables) are
  DMA'd at origins that track the block's drifting mean position;
- the quadratic time interpolation (polintd) is applied to the WINDOW
  (3 scalar-coefficient FMAs per lane) per RK4 stage — collapsing time
  first commutes with the bilinear blend exactly (ltjax.packed notes);
- the 4-corner bilinear gather+blend is one MXU matmul per stage
  against the one-hot weight matrix (see gather_interp.make_stage_eval);
- boundary reflection gathers each particle's per-cell segment bucket
  row by a {0,1} one-hot MXU matmul against the boundary-row window,
  then runs the same specular-reflection math as
  ltjax.physics.boundary.reflect, slot-unrolled on the VPU; interior
  blocks (no segments in the window) skip it via lax.cond;
- only the final state (x, y, z, status, collision counters) and a
  per-particle ``oob`` flag leave the kernel.  Particles that ever
  left their block's window are recomputed exactly by the XLA mirror
  path (scan of internal_step in "collapsed" mode) — see ltjax.step.

The scheme equals the collapsed XLA path (blend-then-fit vertical
tension spline on time-collapsed tables) to f32 round-off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid
from ..physics.behavior import (BOTTOM_ZONE, P_BIAS, SURFACE_ZONE,
                               TST_MIN_SPEED)
from ..physics.boundary import Boundaries, LAND, OPEN
from .. import rng as _rng
from .gather_interp import (WC, WX, WY, _IDX_HC, _IDX_INVDX, _IDX_INVDY,
                            _IDX_SC0, _IDX_X0, _IDX_Y0, _IDX_Z0, _ds_fn,
                            _eval_spline, _eval_spline_const_multi,
                            _eval_spline_deriv, _eval_spline_deriv_const,
                            _fit_thomas, _fit_thomas_const_multi, _gs_fns,
                            const_ladder, make_bilinear_onehot,
                            make_cell_onehot, make_stage_eval)

# extra head-scalar slots (gather_interp reserves 0..5; 6..31 ours)
_IDX_BX0 = 6       # boundary cell-edge x origin
_IDX_INVBDX = 7
_IDX_BY0 = 8
_IDX_INVBDY = 9
_IDX_T0 = 10       # external-step start time [s]
_IDX_IDT = 11      # internal step [s]
_IDX_HSCALE = 12   # sqrt(2 * ConstantHTurb * idt)
_IDX_VCONST = 13   # sqrt(2 * ConstantVTurb * idt / r_var), r_var = 1/3
_IDX_SINKDZ = 14   # -sink * idt (behavior type 6 constant sinking)
_IDX_DEADAGE = 15  # mortality age threshold [s] (inf when off)
_IDX_MAXSTEP2 = 16  # (1.5 * x cell edge)^2 displacement guard (x axis)
_IDX_MAXSTEP2Y = 17  # (1.5 * y cell edge)^2 displacement guard (y axis).
                    # GLOBAL scalars are correct here ONLY because the
                    # megakernel is gated to uniform grids
                    # (step.mode_flags), where they equal the per-cell
                    # radii the XLA path reads from cell_rows lanes 3/4.
_REFLECT_EPS = 1e-6


def _head_len(us: int, ws: int) -> int:
    return _IDX_SC0 + 2 * (us + ws)


def params_static_ext(grid: Grid, bounds: Boundaries, z0m: float,
                      idt: float,
                      const_hturb: float = 0.0,
                      const_vturb: float = 0.0,
                      sink: float = 0.0,
                      deadage: float = np.inf,
                      curv: bool = False) -> np.ndarray:
    """Static (host-precomputable) part of the kernel params: head
    scalars + interleaved s/Cs pairs.  Per-tile variants for the
    sharded megakernel overwrite the eta-origin slots (Y0 / BY0).

    ``curv``: identity lattice transform (X0=0, 1/dx=1, ...) — the
    curvilinear kernel's particles carry LOGICAL coordinates, so the
    position->lattice arithmetic must be the identity (see
    _make_ext_kernel curv_mode)."""
    us, ws = grid.us, grid.ws
    x = np.asarray(grid.x_rho, np.float64)
    y = np.asarray(grid.y_rho, np.float64)
    xe = np.asarray(bounds.x_edges, np.float64)
    ye = np.asarray(bounds.y_edges, np.float64)
    head = np.zeros(_IDX_SC0, np.float64)
    if curv:
        head[_IDX_X0] = 0.0
        head[_IDX_INVDX] = 1.0
        head[_IDX_Y0] = 0.0
        head[_IDX_INVDY] = 1.0
    else:
        head[_IDX_X0] = x[0]
        head[_IDX_INVDX] = 1.0 / (x[1] - x[0])
        head[_IDX_Y0] = y[0]
        head[_IDX_INVDY] = 1.0 / (y[1] - y[0])
    head[_IDX_HC] = float(grid.hc)
    head[_IDX_Z0] = float(z0m)
    head[_IDX_BX0] = xe[0]
    head[_IDX_INVBDX] = 1.0 / (xe[1] - xe[0])
    head[_IDX_BY0] = ye[0]
    head[_IDX_INVBDY] = 1.0 / (ye[1] - ye[0])
    head[_IDX_HSCALE] = np.sqrt(2.0 * const_hturb * idt)
    head[_IDX_VCONST] = np.sqrt(2.0 * const_vturb * idt * 3.0)
    head[_IDX_SINKDZ] = -sink * idt
    head[_IDX_DEADAGE] = deadage
    head[_IDX_IDT] = idt
    crows = np.asarray(bounds.cell_rows)
    head[_IDX_MAXSTEP2] = float(crows[:, 3].min())
    head[_IDX_MAXSTEP2Y] = float(crows[:, 4].min())
    inter = np.empty(2 * (us + ws), np.float64)
    inter[0:2 * us:2] = np.asarray(grid.s_rho, np.float64)
    inter[1:2 * us:2] = np.asarray(grid.Cs_r, np.float64)
    inter[2 * us::2] = np.asarray(grid.s_w, np.float64)
    inter[2 * us + 1::2] = np.asarray(grid.Cs_w, np.float64)
    return np.concatenate([head, inter]).astype(np.float32)


def finish_params(static, t0, times, idt: float, n_int: int,
                  dvm=None) -> jax.Array:
    """Append the dynamic params: start time + per-(step, stage)
    polintd Lagrange coefficients (n_int * 9 floats; stage times are
    t0 + i*idt + {0, idt/2, idt}).  ``static`` may be a host array or a
    traced per-tile row inside shard_map.

    ``dvm``: (twistart, twiend, Em) — appends n_int per-step surface
    irradiance values E0(t_i) for in-kernel DVM (behavior type 3;
    mirrors physics.behavior.surface_irradiance exactly)."""
    static = jnp.asarray(static, jnp.float32)
    static = static.at[_IDX_T0].set(jnp.asarray(t0, jnp.float32))

    tdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    tt = jnp.asarray(times, tdt)
    ii = jnp.arange(n_int, dtype=tdt)
    offs = jnp.asarray([0.0, 0.5 * idt, idt], tdt)
    ts = (jnp.asarray(t0, tdt) + ii[:, None] * jnp.asarray(idt, tdt)
          + offs[None, :])                                   # (n_int, 3)
    t0r, t1r, t2r = tt[0], tt[1], tt[2]
    l0 = (ts - t1r) * (ts - t2r) / ((t0r - t1r) * (t0r - t2r))
    l1 = (ts - t0r) * (ts - t2r) / ((t1r - t0r) * (t1r - t2r))
    l2 = (ts - t0r) * (ts - t1r) / ((t2r - t0r) * (t2r - t1r))
    coef = jnp.stack([l0, l1, l2], axis=-1).reshape(-1).astype(jnp.float32)
    parts = [static, coef]
    if dvm is not None:
        twistart, twiend, Em = dvm
        t_i = (jnp.asarray(t0, jnp.float32)
               + jnp.arange(n_int, dtype=jnp.float32)
               * jnp.float32(idt))
        hours = (t_i / 3600.0) % 24.0
        tau = (hours - twistart) / (twiend - twistart)
        day = (tau > 0.0) & (tau < 1.0)
        e0 = jnp.where(day, Em * jnp.sin(jnp.pi * tau), 0.0)
        parts.append(e0.astype(jnp.float32))
    return jnp.concatenate(parts)


def params_array_ext(grid: Grid, bounds: Boundaries, z0m: float,
                     t0, times, idt: float, n_int: int,
                     const_hturb: float = 0.0,
                     const_vturb: float = 0.0,
                     sink: float = 0.0,
                     deadage: float = np.inf,
                     dvm=None, curv: bool = False) -> jax.Array:
    """SMEM params: head scalars + s/Cs pairs + dynamic tail
    (finish_params)."""
    static = params_static_ext(grid, bounds, z0m, idt,
                               const_hturb=const_hturb,
                               const_vturb=const_vturb,
                               sink=sink, deadage=deadage, curv=curv)
    return finish_params(static, t0, times, idt, n_int, dvm=dvm)


def rng_keys_array(base_key, ext_idx, n_int: int,
                   behave: bool = False) -> jax.Array:
    """(n_int * 4 [or 8],) int32: per-internal-step derived Threefry
    key pairs for the HTURB and VTURB substreams — EXACTLY
    ltjax.rng.stream_key(base_key, ext_idx*n_int + i, substream), so
    kernel draws match the XLA paths bit-for-bit.  ``behave`` appends
    the BEHAVE and MORTALITY substream pairs (behavior types 1-3)."""
    k0, k1 = _rng.seed_words(base_key)
    steps = (jnp.asarray(ext_idx, jnp.uint32) * jnp.uint32(n_int)
             + jnp.arange(n_int, dtype=jnp.uint32))
    cols = []
    subs = [_rng.HTURB, _rng.VTURB]
    if behave:
        subs += [_rng.BEHAVE, _rng.MORTALITY]
    for sub in subs:
        s0, s1 = _rng.threefry2x32(k0, k1, steps,
                                   jnp.full_like(steps, sub))
        cols += [s0, s1]
    arr = jnp.stack(cols, axis=-1).reshape(-1)
    return jax.lax.bitcast_convert_type(arr, jnp.int32)


def boundary_rows_table(bounds: Boundaries, ny: int, nx: int,
                        polys=None, holes=None) -> np.ndarray:
    """(Ny, Nx, BL) f32 boundary cell-row table, lanes padded to a
    128-multiple (window-DMA minor-dim tiling requirement).

    With ``polys`` (settlement on), lanes 1/2 carry the per-cell
    settlement classification (see settle_lanes)."""
    rows = np.asarray(bounds.cell_rows, np.float32)
    BL = ((rows.shape[1] + 127) // 128) * 128
    out = np.zeros((ny * nx, BL), np.float32)
    out[:, :rows.shape[1]] = rows
    out = out.reshape(ny, nx, BL)
    if polys is not None:
        state, pid = settle_lanes(polys, holes, bounds.x_edges,
                                  bounds.y_edges)
        out[:, :, 1] = state
        out[:, :, 2] = pid
    return out


def _seg_crosses_box(ax, ay, bx, by, x0, x1, y0, y1) -> np.ndarray:
    """Vectorized: does segment (a, b) intersect the axis box?  (Both
    endpoints-outside cases included; touching counts.)"""
    # Liang-Barsky clip of the parametric segment against the box
    dx = bx - ax
    dy = by - ay
    shape = np.broadcast_shapes(np.shape(ax), np.shape(x0))
    t0 = np.zeros(shape)
    t1 = np.ones(shape)
    ok = np.ones(shape, bool)
    for p, q in ((-dx, ax - x0), (dx, x1 - ax),
                 (-dy, ay - y0), (dy, y1 - ay)):
        par = np.abs(p) < 1e-30
        ok &= ~(par & (q < 0))
        psafe = np.where(par, 1.0, p)
        r = q / psafe
        t0 = np.where(~par & (p < 0), np.maximum(t0, r), t0)
        t1 = np.where(~par & (p > 0), np.minimum(t1, r), t1)
    return ok & (t0 <= t1)


def settle_lanes(polys, holes, x_edges, y_edges):
    """Per-boundary-cell settlement classification for the in-kernel
    fast path (host numpy, once at init).

    state 0: no habitat polygon overlaps the cell — settlement
             impossible there;
    state 1: the cell is FULLY inside exactly one habitat polygon and
             no hole polygon comes near — the kernel settles an
             eligible particle immediately with ``pid``;
    state 2: partial / ambiguous (polygon edge crosses the cell,
             multiple overlapping candidates, or a hole nearby) — the
             kernel defers the particle to the exact XLA recompute
             (the oob patch runs full test_settlement, value-identical
             to the pure XLA path).
    Reference: testSettlement point-in-polygon + initSettlement's
    element mapping (settlement_module.f90, SURVEY.md SS2.1 #9).

    Pure host numpy, batched PER POLYGON over all its bbox-candidate
    cells (the previous per-cell JAX point_in_polygon calls were one
    device dispatch — and a retrace per distinct vertex count — per
    cell x candidate, blowing up init time on production habitat files
    with thousands of polygons; advisor finding r4-low).
    """
    xe = np.asarray(x_edges, np.float64)
    ye = np.asarray(y_edges, np.float64)
    ny, nx = len(ye) - 1, len(xe) - 1
    cands = np.asarray(polys.cell_cands)            # (ny, nx, Cmax)
    vx = np.asarray(polys.verts_x, np.float64)
    vy = np.asarray(polys.verts_y, np.float64)
    pid = np.asarray(polys.poly_id)
    hc = (np.asarray(holes.cell_cands) if holes is not None else None)

    crossed = np.zeros((ny, nx), bool)
    n_cover = np.zeros((ny, nx), np.int32)
    cover_pid = np.full((ny, nx), -1.0, np.float32)
    for k in range(vx.shape[0]):
        cj, ci = np.nonzero((cands == k).any(axis=-1))
        if cj.size == 0:
            continue
        x0 = xe[ci]
        x1 = xe[ci + 1]
        y0 = ye[cj]
        y1 = ye[cj + 1]
        ax, ay = vx[k], vy[k]                       # (V,) padded loop
        bx = np.roll(ax, -1)
        by = np.roll(ay, -1)
        # any polygon edge crossing the cell box => partial; (C, V)
        cr = _seg_crosses_box(ax[None, :], ay[None, :],
                              bx[None, :], by[None, :],
                              x0[:, None], x1[:, None],
                              y0[:, None], y1[:, None]).any(axis=1)
        # all 4 cell corners inside => covering (numpy mirror of
        # settlement.point_in_polygon's ray cast; padding by repeated
        # vertices is a degenerate edge and contributes no crossing)
        px = np.stack([x0, x1, x0, x1], axis=1)     # (C, 4)
        py = np.stack([y0, y0, y1, y1], axis=1)
        p = px[..., None]                           # (C, 4, 1)
        q = py[..., None]
        a_y = ay[None, None, :]
        straddles = (a_y > q) != (by[None, None, :] > q)
        dy = np.where(straddles, (by - ay)[None, None, :], 1.0)
        x_cross = ax[None, None, :] + (q - a_y) * (
            bx - ax)[None, None, :] / dy
        inside = ((straddles & (p < x_cross)).sum(axis=-1) % 2 == 1)
        covers = (~cr) & inside.all(axis=1)
        crossed[cj, ci] |= cr
        n_cover[cj, ci] += covers.astype(np.int32)
        cover_pid[cj[covers], ci[covers]] = float(pid[k])
        # corners all outside + no edge crossing => disjoint (bbox-only
        # candidate): contributes neither crossing nor cover

    has_cand = (cands >= 0).any(axis=-1)
    state = np.zeros((ny, nx), np.float32)
    partial = crossed | (n_cover > 1)
    state[has_cand & partial] = 2.0
    full = has_cand & ~partial & (n_cover == 1)
    state[full] = 1.0
    out_pid = np.where(full, cover_pid, -1.0).astype(np.float32)
    if hc is not None:
        # any hole candidate near the cell => defer to the exact path
        hole_near = (hc >= 0).any(axis=-1) & has_cand
        state[hole_near] = 2.0
        out_pid[hole_near] = -1.0
    return state, out_pid


def curv_xy_table(grid: Grid, bounds: Boundaries) -> np.ndarray:
    """(Ny, Nx, 8) f32 corner-coordinate rows for the CURVILINEAR
    megakernel: [x, y, x_east, y_east, near_seg, 0, 0, 0] at rho point
    (j, i) (east = (j, i+1), clamped at the rim).

    Windowed alongside the record/boundary windows; the kernel's
    in-window Newton refinements (see _make_ext_kernel curv_mode) pull
    the 4 corners of a particle's cell from rows (lj, li) and
    (lj+1, li) with two cell-one-hot selects.  ``near_seg`` flags
    cells whose 3x3 boundary bucket is non-empty — particles entering
    such cells are DEFERRED to the exact XLA patch (reflection,
    open-boundary exits, and the tunnel guards all happen there),
    keeping the kernel free of curvilinear boundary geometry."""
    assert grid.curv is not None
    ny, nx = grid.ny, grid.nx
    xy = np.asarray(grid.curv.xy_flat, np.float64).reshape(ny, nx, 2)
    # 128-lane padded: the window DMA's minor dim must be a multiple of
    # the 128-lane tiling (same constraint as boundary_rows_table)
    out = np.zeros((ny, nx, 128), np.float32)
    out[:, :, 0] = xy[:, :, 0]
    out[:, :, 1] = xy[:, :, 1]
    east = np.concatenate([xy[:, 1:], xy[:, -1:]], axis=1)
    out[:, :, 2] = east[:, :, 0]
    out[:, :, 3] = east[:, :, 1]
    near = np.asarray(bounds.bucket)[:, :, 0] >= 0     # 3x3 bucket used
    out[:, :, 4] = near.astype(np.float32)
    return out


# status codes (must mirror ltjax.state)
_NOT_RELEASED = 0
_ACTIVE = 1
_SETTLED = 2
_DEAD = 3
_OUT_OF_DOMAIN = 4
_ERROR = 5


def _make_ext_kernel(grid: Grid, sigma: float, idt: float, nv: int,
                     ntot: int, HL: int, BL: int, n_int: int, n_iter: int,
                     p_block: int, precision, open_exits: bool,
                     s_max: int, hturb_on: bool, vturb_on: bool,
                     vturb_aks: bool, window=(WY, WX),
                     fast_math: bool = False,
                     sink_on: bool = False, mortality: bool = False,
                     ladder=None, behavior: int = 0, beh=None,
                     settle_on: bool = False, align_x8: bool = False,
                     salt_on: bool = False, salt0: int = 0,
                     curv_mode: bool = False, aks_split: bool = False,
                     aux_n: int = 0):
    P = p_block
    PS = P // 128
    wy, wx = window
    wc = wy * wx
    ws = grid.ws
    nx, ny = grid.nx, grid.ny
    pair2 = precision == "pair2"
    stage_eval = make_stage_eval(grid, sigma, nv, HL, P, precision,
                                 window=window, fast_math=fast_math,
                                 ntot=ntot, ladder=ladder)
    CW_k = const_ladder(ladder[1], sigma) if ladder is not None else None
    beh_swim = behavior in (1, 2, 3, 4, 5)  # in-kernel swim behaviors
    beh_salt = behavior in (4, 5)      # salinity-cued (needs dS/dz)
    beh_tst = behavior == 7            # tidal-stream transport
    rng_stride = 8 if beh_swim else 4  # words per step in rngk
    us_ = grid.us
    if beh_salt or salt_on:
        # in-kernel salt paths are gated to pair2 + affine ladders by
        # the caller (ext_step_fused); the constant rho ladder carries
        # the salt/temp spline fits
        assert pair2 and ladder is not None
    CR_k = const_ladder(ladder[0], sigma) if ladder is not None else None
    coef0 = _head_len(grid.us, grid.ws)
    ir0 = coef0 + 9 * n_int            # per-step E0 tail (behavior 3)
    gs, c_off, c_diag = _gs_fns(sigma)
    ds = _ds_fn(sigma)
    any_turb = hturb_on or vturb_on
    from .gather_interp import blend_dot_fn, make_rowpair_onehot, pair_dot
    zh_dot = None if pair2 else blend_dot_fn(precision)
    # boundary row-selects stay f32-exact: segment coords are O(1e5) m,
    # where even a 16-bit mantissa leaves ~1 m geometry error; these
    # matmuls only run on rim blocks (lax.cond), so the 6-pass cost is
    # negligible overall
    row_precision = jax.lax.Precision.HIGHEST

    def reflect_block(par_ref, wbd_rows, oy_f, ox_f, x0, y0, x1, y1, act,
                      hitl, oob):
        """In-kernel mirror of ltjax.physics.boundary.reflect.

        ``wbd_rows`` is the (wc, BL) boundary-row window VALUE (the
        caller selects the active DMA bank)."""
        exited = jnp.zeros((PS, 128), jnp.bool_)
        interacted = jnp.zeros((PS, 128), jnp.bool_)
        xi0, yi0 = x0, y0                     # pre-move (tunnel guard)

        for _ in range(n_iter):
            tbx = (x0 - par_ref[_IDX_BX0]) * par_ref[_IDX_INVBDX]
            tby = (y0 - par_ref[_IDX_BY0]) * par_ref[_IDX_INVBDY]
            ib = jnp.clip(jnp.floor(tbx), 0.0, float(nx - 1))
            jb = jnp.clip(jnp.floor(tby), 0.0, float(ny - 1))
            lib = ib - ox_f
            ljb = jb - oy_f
            bad = ((lib < 0.0) | (lib > float(wx - 1))
                   | (ljb < 0.0) | (ljb > float(wy - 1)))
            oob = oob | (bad & act)
            lib = jnp.clip(lib, 0.0, float(wx - 1))
            ljb = jnp.clip(ljb, 0.0, float(wy - 1))
            oh = make_cell_onehot(lib, ljb, P, wy, wx)       # (wc, P)
            rows = jax.lax.dot_general(
                wbd_rows, oh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=row_precision)                      # (BL, P)
            rp = rows.reshape(BL, PS, 128)

            dx = x1 - x0
            dy = y1 - y0
            inf = jnp.full((PS, 128), jnp.inf, jnp.float32)
            zero = jnp.zeros((PS, 128), jnp.float32)
            tpm, exf, eyf, kindf = inf, zero, zero, zero
            for s in range(s_max):
                o = 8 + 8 * s
                ax, ay = rp[o], rp[o + 1]
                ex = rp[o + 2] - ax
                ey = rp[o + 3] - ay
                kind = rp[o + 4]
                valid = rp[o + 5] > 0.5
                apx = ax - x0
                apy = ay - y0
                denom = dx * ey - dy * ex
                dsafe = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
                tp = (apx * ey - apy * ex) / dsafe
                ts = (apx * dy - apy * dx) / dsafe
                cross = (valid & (jnp.abs(denom) > 1e-30)
                         & (tp > 0.0) & (tp <= 1.0)
                         & (ts >= 0.0) & (ts <= 1.0))
                better = cross & (tp < tpm)
                tpm = jnp.where(better, tp, tpm)
                exf = jnp.where(better, ex, exf)
                eyf = jnp.where(better, ey, eyf)
                kindf = jnp.where(better, kind, kindf)

            anyc = tpm < inf
            acth = act & anyc & ~exited
            tpf = jnp.where(acth, tpm, 0.0)
            ix = x0 + tpf * dx
            iy = y0 + tpf * dy
            rx = x1 - ix
            ry = y1 - iy
            elen2 = jnp.maximum(exf * exf + eyf * eyf, 1e-30)
            proj = (rx * exf + ry * eyf) / elen2
            rrx = 2.0 * proj * exf - rx
            rry = 2.0 * proj * eyf - ry
            is_open = kindf > (LAND + 0.5)
            if open_exits:
                newly_exited = acth & is_open
                do_reflect = acth & ~is_open
            else:
                newly_exited = jnp.zeros_like(acth)
                do_reflect = acth
            nrm = jnp.sqrt(jnp.maximum(rrx * rrx + rry * rry, 1e-30))
            x0 = jnp.where(do_reflect, ix + _REFLECT_EPS * rrx / nrm, x0)
            y0 = jnp.where(do_reflect, iy + _REFLECT_EPS * rry / nrm, y0)
            x1 = jnp.where(do_reflect, ix + rrx, x1)
            y1 = jnp.where(do_reflect, iy + rry, y1)
            x1 = jnp.where(newly_exited, ix, x1)
            y1 = jnp.where(newly_exited, iy, y1)
            hitl = hitl + jnp.where(do_reflect & ~is_open, 1, 0)
            exited = exited | newly_exited
            interacted = interacted | do_reflect | newly_exited

        # stuck check: water flag (lane 0) of the endpoint's cell row
        tbx = (x1 - par_ref[_IDX_BX0]) * par_ref[_IDX_INVBDX]
        tby = (y1 - par_ref[_IDX_BY0]) * par_ref[_IDX_INVBDY]
        lib = jnp.clip(jnp.clip(jnp.floor(tbx), 0.0, float(nx - 1)) - ox_f,
                       0.0, float(wx - 1))
        ljb = jnp.clip(jnp.clip(jnp.floor(tby), 0.0, float(ny - 1)) - oy_f,
                       0.0, float(wy - 1))
        oh = make_cell_onehot(lib, ljb, P, wy, wx)
        rows = jax.lax.dot_general(
            wbd_rows, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=row_precision)
        water = rows.reshape(BL, PS, 128)[0] > 0.5
        stuck = act & ~exited & ~water

        # tunnel guard (mirrors physics.boundary.reflect): particles
        # with NO boundary interaction whose straight-path midpoint is
        # on land stepped over a spit outside their bucket -> stuck
        xm = 0.5 * (xi0 + x1)
        ym = 0.5 * (yi0 + y1)
        tmx = (xm - par_ref[_IDX_BX0]) * par_ref[_IDX_INVBDX]
        tmy = (ym - par_ref[_IDX_BY0]) * par_ref[_IDX_INVBDY]
        lmx = jnp.clip(jnp.clip(jnp.floor(tmx), 0.0, float(nx - 1)) - ox_f,
                       0.0, float(wx - 1))
        lmy = jnp.clip(jnp.clip(jnp.floor(tmy), 0.0, float(ny - 1)) - oy_f,
                       0.0, float(wy - 1))
        ohm = make_cell_onehot(lmx, lmy, P, wy, wx)
        rows_m = jax.lax.dot_general(
            wbd_rows, ohm,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=row_precision)
        water_m = rows_m.reshape(BL, PS, 128)[0] > 0.5
        stuck = stuck | (act & ~exited & ~interacted & ~water_m)
        return x1, y1, exited, stuck, hitl, oob

    def kernel(*refs):
        if curv_mode:
            # curvilinear variant: logical-coordinate inputs/outputs
            # (ti/tj) + the xy corner window (curv_xy_table)
            (par_ref, rngk_ref, x_ref, y_ref, z_ref, ti_ref, tj_ref,
             dob_ref, st_ref, pid_ref, spol_ref, sal_ref, tem_ref,
             tab_hbm, brows_hbm, wxy_hbm,
             xo_ref, yo_ref, zo_ref, tio_ref, tjo_ref, sto_ref,
             spolo_ref, salo_ref, temo_ref, hitl_ref, hitb_ref,
             oob_ref, wtab, wbd, wxyw, sems) = refs
        elif aks_split:
            # Aks-split variant: a separate paired 128-lane Aks record
            # table + window (build_record_tables_split) keeps the main
            # tables at HL 128 (16x8 window, 1x blend)
            (par_ref, rngk_ref, x_ref, y_ref, z_ref, dob_ref, st_ref,
             pid_ref, spol_ref, sal_ref, tem_ref, tab_hbm, brows_hbm,
             aks_hbm,
             xo_ref, yo_ref, zo_ref, sto_ref, spolo_ref, salo_ref,
             temo_ref, hitl_ref, hitb_ref, oob_ref,
             wtab, wbd, waks, sems) = refs
        else:
            (par_ref, rngk_ref, x_ref, y_ref, z_ref, dob_ref, st_ref,
             pid_ref, spol_ref, sal_ref, tem_ref, tab_hbm, brows_hbm,
             xo_ref, yo_ref, zo_ref, sto_ref, spolo_ref, salo_ref,
             temo_ref, hitl_ref, hitb_ref, oob_ref,
             wtab, wbd, sems) = refs
        b = pl.program_id(0)
        idtc = jnp.float32(idt)
        half = jnp.float32(0.5 * idt)
        sixth = jnp.float32(idt / 6.0)

        # Window DMA is double-banked and PREDICTIVE: while step i
        # computes on bank i%2, the windows for step i+1 are already in
        # flight into the other bank at an origin extrapolated from the
        # block mean's drift (means drift smoothly — a linear predictor
        # on the fractional mean is almost always right, since origins
        # only move when the mean crosses a cell boundary).  On the
        # rare mispredict the kernel falls back to a blocking fetch at
        # the true origin, so the window USED is always the one derived
        # from current positions — semantics identical to the previous
        # per-step blocking re-DMA, minus ~25% of kernel wall-clock
        # (measured: DMA issue+wait was ~1.9 ms of a 7.1 ms internal
        # step at 1M particles; transfer time is ~0.2 ms of that — the
        # rest was per-copy latency, which this scheme hides).
        def dma_objs(bank, oy, ox):
            if align_x8:
                # the 8-alignment fact (_ox_from) does not survive the
                # fori-loop carry — re-assert it at the slice site
                ox = pl.multiple_of(ox, 8)
            # ONE strided copy fetches all 3 record windows (the record
            # axis is just another slice dim): DMA cost on v5e is
            # dominated by per-copy issue overhead, not bytes, so 2
            # descriptors per refresh instead of 4 is a direct win
            cps = [pltpu.make_async_copy(
                tab_hbm.at[:, pl.ds(oy, wy), pl.ds(ox, wx), :],
                wtab.at[bank], sems.at[bank, 0])]
            cps.append(pltpu.make_async_copy(
                brows_hbm.at[pl.ds(oy, wy), pl.ds(ox, wx), :],
                wbd.at[bank], sems.at[bank, 1]))
            if curv_mode:
                cps.append(pltpu.make_async_copy(
                    wxy_hbm.at[pl.ds(oy, wy), pl.ds(ox, wx), :],
                    wxyw.at[bank], sems.at[bank, 2]))
            if aks_split:
                cps.append(pltpu.make_async_copy(
                    aks_hbm.at[:, pl.ds(oy, wy), pl.ds(ox, wx), :],
                    waks.at[bank], sems.at[bank, 2]))
            return cps

        def dma_start(bank, oy, ox):
            for c in dma_objs(bank, oy, ox):
                c.start()

        def dma_blocking(bank, oy, ox):
            cps = dma_objs(bank, oy, ox)
            for c in cps:
                c.start()
            for c in cps:
                c.wait()

        def dma_wait(bank, oy, ox):
            for c in dma_objs(bank, oy, ox):
                c.wait()

        xv = x_ref[0]
        yv = y_ref[0]
        zv = z_ref[0]
        if curv_mode:
            tiv0 = ti_ref[0]
            tjv0 = tj_ref[0]
        dob = dob_ref[0]
        st = st_ref[0]
        spol = spol_ref[0]
        sal = sal_ref[0]
        tem = tem_ref[0]
        hitl = jnp.zeros((PS, 128), jnp.int32)
        hitb = jnp.zeros((PS, 128), jnp.int32)
        oob = jnp.zeros((PS, 128), jnp.bool_)

        def _ox_from(im_val):
            ox = jnp.floor(im_val).astype(jnp.int32) - wx // 2
            if align_x8:
                # HL > 128 record tables carry 2 lane-tiles per cell;
                # Mosaic then requires the x (sublane-tiled) slice
                # origin to be 8-aligned — round to the nearest aligned
                # origin (callers widen wx so the ±4-cell offset never
                # costs window margin).  pl.multiple_of carries the
                # alignment fact to the compiler (its divisibility
                # analysis does not see through clip/floordiv chains).
                k = jnp.clip((ox + 4) // 8, 0, max((nx - wx) // 8, 0))
                return pl.multiple_of(k * 8, 8)
            return jnp.clip(ox, 0, max(nx - wx, 0))

        def origin(xv, yv, oob):
            """Window origin + fractional mean of in-window particles
            (a lone discontinuity straggler barely moves the mean, gets
            flagged oob on its first stage eval, and is excluded from
            the mean afterwards)."""
            w = jnp.where(oob, 0.0, 1.0)
            cnt = jnp.maximum(jnp.sum(w), 1.0)
            tx = (xv - par_ref[_IDX_X0]) * par_ref[_IDX_INVDX]
            ty = (yv - par_ref[_IDX_Y0]) * par_ref[_IDX_INVDY]
            im = jnp.sum(jnp.clip(tx, 0.0, float(nx - 1)) * w) / cnt
            jm = jnp.sum(jnp.clip(ty, 0.0, float(ny - 1)) * w) / cnt
            ox = _ox_from(im)
            oy = jnp.clip(jnp.floor(jm).astype(jnp.int32) - wy // 2, 0,
                          max(ny - wy, 0))
            return oy, ox, im, jm

        def predict_origin(im, jm, im_prev, jm_prev):
            """Linear drift extrapolation of the block mean -> next
            step's window origin (same floor/clip as origin())."""
            ip = im + (im - im_prev)
            jp = jm + (jm - jm_prev)
            ox = _ox_from(ip)
            oy = jnp.clip(jnp.floor(jp).astype(jnp.int32) - wy // 2, 0,
                          max(ny - wy, 0))
            return oy, ox

        # All-frozen blocks (every particle settled/dead/exited/errored
        # — absorbing states) skip the WHOLE external step: no DMA, no
        # stages, no reflection.  ltjax.spatial.sort_by_cell sorts
        # frozen particles to the tail, so late-run settlement/
        # mortality configs concentrate them into trailing blocks and
        # the step cost tracks the LIVE population.  NOT_RELEASED (0)
        # and ACTIVE (1) both count as live; statuses only ever grow,
        # so a block live at entry is handled by the compute path for
        # the whole call (it may freeze mid-call — correct, just not
        # skipped), and a block frozen at entry can never wake.
        live_any = jnp.min(st) <= _ACTIVE

        # curv_mode: the head params set X0=0, INVDX=1 (etc.), so
        # origin()/stage_eval's "position -> lattice" arithmetic works
        # VERBATIM on the logical coordinates the particles carry
        pu0, pv0 = (tiv0, tjv0) if curv_mode else (xv, yv)
        oy0, ox0, im0, jm0 = origin(pu0, pv0, oob)

        def prime(_):
            dma_start(0, oy0, ox0)      # bank 0 primed for step 0
            return 0

        jax.lax.cond(live_any, prime, lambda _: 0, 0)

        def body(i, carry):
            def compute(carry):
                # oob rides as int32: Mosaic cannot legalize i1-vector loop
                # carries (scf.for legalization failure, observed on v5e)
                #
                # Per-bank CONTENT tracking (c?y/c?x = window origin the
                # bank holds or has in flight; if? = a started copy not
                # yet waited): the window tables are STATIC within one
                # external step and block origins move only when the
                # drifting mean crosses a cell boundary (~every several
                # internal steps at bench drift rates), so a prefetch
                # whose target origin the bank ALREADY holds is skipped
                # entirely — in steady state both banks converge on the
                # current origin and the kernel issues no DMA at all.
                # Values are bit-identical (same windows either way);
                # only the per-copy issue overhead (~0.6 ms/step at 977
                # blocks, BASELINE.md) is saved.
                if curv_mode:
                    (xv, yv, zv, tiv, tjv, st, spol, sal, tem, hitl,
                     hitb, oobi, c0y, c0x, c1y, c1x, if0, if1,
                     im_prev, jm_prev) = carry
                else:
                    (xv, yv, zv, st, spol, sal, tem, hitl, hitb, oobi,
                     c0y, c0x, c1y, c1x, if0, if1,
                     im_prev, jm_prev) = carry
                oob = oobi != 0
                pu, pv = (tiv, tjv) if curv_mode else (xv, yv)
                oy, ox, im, jm = origin(pu, pv, oob)
                bank0 = i % 2 == 0

                def sync(bank, cy, cx, infl):
                    def go(_):
                        def w(_):
                            dma_wait(bank, cy, cx)
                            return 0

                        jax.lax.cond(infl != 0, w, lambda _: 0, 0)
                        mis = (cy != oy) | (cx != ox)

                        def fix(_):
                            dma_blocking(bank, oy, ox)
                            return 0

                        jax.lax.cond(mis, fix, lambda _: 0, 0)
                        return 0
                    return go

                jax.lax.cond(bank0, sync(0, c0y, c0x, if0),
                             sync(1, c1y, c1x, if1), 0)
                # the active bank now holds (oy, ox), nothing pending
                c0y = jnp.where(bank0, oy, c0y)
                c0x = jnp.where(bank0, ox, c0x)
                c1y = jnp.where(bank0, c1y, oy)
                c1x = jnp.where(bank0, c1x, ox)
                if0 = jnp.where(bank0, 0, if0)
                if1 = jnp.where(bank0, if1, 0)

                # prefetch the NEXT step's windows into the other bank
                # at the drift-predicted origin — unless that bank
                # already holds them (skipped on the last step)
                npy, npx = predict_origin(im, jm, im_prev, jm_prev)
                if n_int > 1:
                    def pf(bank):
                        def go(_):
                            dma_start(bank, npy, npx)
                            return 0
                        return go

                    nop = lambda _: 0
                    issue = i < n_int - 1
                    need1 = (issue & bank0
                             & ((c1y != npy) | (c1x != npx)))
                    need0 = (issue & ~bank0
                             & ((c0y != npy) | (c0x != npx)))
                    jax.lax.cond(need1, pf(1), nop, 0)
                    jax.lax.cond(need0, pf(0), nop, 0)
                    c1y = jnp.where(need1, npy, c1y)
                    c1x = jnp.where(need1, npx, c1x)
                    if1 = jnp.where(need1, 1, if1)
                    c0y = jnp.where(need0, npy, c0y)
                    c0x = jnp.where(need0, npx, c0x)
                    if0 = jnp.where(need0, 1, if0)

                # active-bank window values: dynamic-slice the bank (major
                # dim) so only ONE bank's window is ever read — a
                # jnp.where select would load both banks every step
                # (measured ~1.2 ms/int-step of pure extra VMEM reads)
                bank = i % 2
                w3 = wtab[pl.ds(bank, 1)][0]       # (3, wy, wx, HL)
                wbv = w3[0]
                wcv = w3[1]
                wfv = w3[2]
                oy_f = oy.astype(jnp.float32)
                ox_f = ox.astype(jnp.float32)

                # release at DOB
                i_f = i.astype(jnp.float32)
                t_i = par_ref[_IDX_T0] + i_f * par_ref[_IDX_IDT]
                release = (st == _NOT_RELEASED) & (t_i >= dob)
                st = jnp.where(release, _ACTIVE, st)
                act = st == _ACTIVE

                # time-collapsed stage windows from the 3 record windows
                # (collapse only the data lanes; the rest is DMA padding)
                nlanes = 2 * ntot if pair2 else ntot
                HLc = min(HL, ((nlanes + 63) // 64) * 64)

                def win_at(stage):
                    c = coef0 + 9 * i + 3 * stage
                    return (par_ref[c] * wbv.reshape(wc, HL)[:, :HLc]
                            + par_ref[c + 1] * wcv.reshape(wc, HL)[:, :HLc]
                            + par_ref[c + 2] * wfv.reshape(wc, HL)[:, :HLc])

                if curv_mode:
                    wxy_rows = wxyw[pl.ds(bank, 1)][0].reshape(
                        wc, 128)[:, :8]

                    def corners(li, lj):
                        """4-corner xy (+ lane-4 flag) of cell (lj, li)
                        via two one-hot selects on the xy window."""
                        ohA = make_cell_onehot(li, lj, P, wy, wx)
                        ohB = make_cell_onehot(li, lj + 1.0, P, wy, wx)
                        A = jax.lax.dot_general(
                            wxy_rows, ohA,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=row_precision).reshape(8, PS, 128)
                        B = jax.lax.dot_general(
                            wxy_rows, ohB,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=row_precision).reshape(8, PS, 128)
                        return A, B

                    def newton(ti, tj, X, Y, iters, oobn):
                        """Refine logical coords toward physical (X, Y)
                        (mirrors grid.curv_logical's bilinear Newton;
                        the carried seed is already within a fraction
                        of a cell, so 1-2 iterations reach f32
                        convergence)."""
                        for _ in range(iters):
                            i_ = jnp.clip(jnp.floor(ti), 0.0,
                                          float(nx - 2))
                            j_ = jnp.clip(jnp.floor(tj), 0.0,
                                          float(ny - 2))
                            li = i_ - ox_f
                            lj = j_ - oy_f
                            bad = ((li < 0.0) | (li > float(wx - 1))
                                   | (lj < 0.0) | (lj > float(wy - 2)))
                            oobn = oobn | bad
                            li = jnp.clip(li, 0.0, float(wx - 1))
                            lj = jnp.clip(lj, 0.0, float(wy - 2))
                            A, B = corners(li, lj)
                            fx = ti - i_
                            fy = tj - j_
                            axX = A[2] - A[0]
                            axY = A[3] - A[1]
                            ayX = B[0] - A[0]
                            ayY = B[1] - A[1]
                            axyX = B[2] - A[2] - B[0] + A[0]
                            axyY = B[3] - A[3] - B[1] + A[1]
                            px = A[0] + fx * axX + fy * ayX + fx * fy * axyX
                            py = A[1] + fx * axY + fy * ayY + fx * fy * axyY
                            jx0 = axX + fy * axyX
                            jx1 = axY + fy * axyY
                            jy0 = ayX + fx * axyX
                            jy1 = ayY + fx * axyY
                            det = jx0 * jy1 - jx1 * jy0
                            det = jnp.where(jnp.abs(det) < 1e-30, 1e-30,
                                            det)
                            rx = X - px
                            ry = Y - py
                            dfx = (jy1 * rx - jy0 * ry) / det
                            dfy = (-jx1 * rx + jx0 * ry) / det
                            ti = i_ + jnp.clip(fx + dfx, -1.5, 2.5)
                            tj = j_ + jnp.clip(fy + dfy, -1.5, 2.5)
                        return ti, tj, oobn

                    def nearseg(ti, tj):
                        """Lane-4 boundary-proximity flag of the
                        BOUNDARY cell containing logical (ti, tj)."""
                        lib = jnp.clip(jnp.clip(
                            jnp.floor(ti + 0.5), 0.0, float(nx - 1))
                            - ox_f, 0.0, float(wx - 1))
                        ljb = jnp.clip(jnp.clip(
                            jnp.floor(tj + 0.5), 0.0, float(ny - 1))
                            - oy_f, 0.0, float(wy - 1))
                        oh = make_cell_onehot(lib, ljb, P, wy, wx)
                        r = jax.lax.dot_general(
                            wxy_rows, oh,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=row_precision).reshape(8, PS, 128)
                        return r[4] > 0.5

                w1 = win_at(0)
                if curv_mode:
                    if vturb_aks or beh_swim or beh_tst:
                        u1, v1, ww1, oob1, aux1 = stage_eval(
                            par_ref, oy_f, ox_f, w1, tiv, tjv, zv, oob,
                            extras=True)
                    else:
                        u1, v1, ww1, oob1 = stage_eval(
                            par_ref, oy_f, ox_f, w1, tiv, tjv, zv, oob)
                    t2i, t2j, oob1 = newton(tiv, tjv, xv + u1 * half,
                                            yv + v1 * half, 1, oob1)
                    w2 = win_at(1)
                    u2, v2, ww2, oob1 = stage_eval(
                        par_ref, oy_f, ox_f, w2, t2i, t2j,
                        zv + ww1 * half, oob1)
                    t3i, t3j, oob1 = newton(t2i, t2j, xv + u2 * half,
                                            yv + v2 * half, 1, oob1)
                    u3, v3, ww3, oob1 = stage_eval(
                        par_ref, oy_f, ox_f, w2, t3i, t3j,
                        zv + ww2 * half, oob1)
                    t4i, t4j, oob1 = newton(t3i, t3j, xv + u3 * idtc,
                                            yv + v3 * idtc, 1, oob1)
                    w4 = win_at(2)
                    u4, v4, ww4, oob1 = stage_eval(
                        par_ref, oy_f, ox_f, w4, t4i, t4j,
                        zv + ww3 * idtc, oob1)
                else:
                    if vturb_aks or beh_swim or beh_tst or salt_on:
                        u1, v1, ww1, oob1, aux1 = stage_eval(
                            par_ref, oy_f, ox_f, w1, xv, yv, zv, oob,
                            extras=True)
                    else:
                        u1, v1, ww1, oob1 = stage_eval(
                            par_ref, oy_f, ox_f, w1, xv, yv, zv, oob)
                    w2 = win_at(1)
                    u2, v2, ww2, oob1 = stage_eval(
                        par_ref, oy_f, ox_f, w2,
                        xv + u1 * half, yv + v1 * half, zv + ww1 * half,
                        oob1)
                    u3, v3, ww3, oob1 = stage_eval(
                        par_ref, oy_f, ox_f, w2,
                        xv + u2 * half, yv + v2 * half, zv + ww2 * half,
                        oob1)
                    w4 = win_at(2)
                    u4, v4, ww4, oob1 = stage_eval(
                        par_ref, oy_f, ox_f, w4,
                        xv + u3 * idtc, yv + v3 * idtc, zv + ww3 * idtc,
                        oob1)
                # only active particles' window misses matter
                oob = oob | (oob1 & act)

                x1 = xv + sixth * (u1 + 2.0 * u2 + 2.0 * u3 + u4)
                y1 = yv + sixth * (v1 + 2.0 * v2 + 2.0 * v3 + v4)
                z1 = zv + sixth * (ww1 + 2.0 * ww2 + 2.0 * ww3 + ww4)

                if aks_split and (vturb_aks or beh_salt):
                    # AUX-split: blend the Aks/salt/temp profiles from
                    # the separate paired aux window at the STAGE-1
                    # position (one small pair_dot — the split keeps
                    # the main tables at HL 128 / 16x8 windows /
                    # 1x blend, see packed.build_record_tables_split)
                    txa = ((xv - par_ref[_IDX_X0])
                           * par_ref[_IDX_INVDX])
                    tya = ((yv - par_ref[_IDX_Y0])
                           * par_ref[_IDX_INVDY])
                    ia = jnp.clip(jnp.floor(txa), 0.0, float(nx - 2))
                    ja = jnp.clip(jnp.floor(tya), 0.0, float(ny - 2))
                    fxa = jnp.clip(txa - ia, 0.0, 1.0)
                    fya = jnp.clip(tya - ja, 0.0, 1.0)
                    lia = jnp.clip(ia - ox_f, 0.0, float(wx - 1))
                    lja = jnp.clip(ja - oy_f, 0.0, float(wy - 2))
                    fyqa = (jnp.round(fya * 256.0)
                            * jnp.float32(1.0 / 256.0))
                    wta = make_rowpair_onehot(lia, lja, fyqa, P, wy, wx)
                    wa3 = waks[pl.ds(bank, 1)][0]
                    HLa = ((2 * aux_n + 63) // 64) * 64
                    c_a = coef0 + 9 * i
                    wac = (par_ref[c_a]
                           * wa3[0].reshape(wc, 128)[:, :HLa]
                           + par_ref[c_a + 1]
                           * wa3[1].reshape(wc, 128)[:, :HLa]
                           + par_ref[c_a + 2]
                           * wa3[2].reshape(wc, 128)[:, :HLa])
                    bla = pair_dot(wac, wta).reshape(HLa, PS, 128)
                    auxbl1 = [bla[k] + fxa * (bla[aux_n + k] - bla[k])
                              for k in range(aux_n)]

                # --- turbulence (in-kernel Threefry; identical streams to
                # ltjax.rng, so kernel and XLA-patch paths agree) ----------
                if any_turb or beh_swim:
                    pidv = pid_ref[0].astype(jnp.uint32)
                    zero_u = jnp.zeros_like(pidv)
                if hturb_on:
                    kh0 = rngk_ref[rng_stride * i].astype(jnp.uint32)
                    kh1 = rngk_ref[rng_stride * i + 1].astype(jnp.uint32)
                    hb0, hb1 = _rng.threefry2x32(kh0, kh1, pidv, zero_u)
                    n0, n1 = _rng.box_muller(hb0, hb1, jnp.float32)
                    x1 = x1 + n0 * par_ref[_IDX_HSCALE]
                    y1 = y1 + n1 * par_ref[_IDX_HSCALE]
                if vturb_on:
                    kv0 = rngk_ref[rng_stride * i + 2].astype(jnp.uint32)
                    kv1 = rngk_ref[rng_stride * i + 3].astype(jnp.uint32)
                    vb0, _ = _rng.threefry2x32(kv0, kv1, pidv, zero_u)
                    R = _rng.bits_to_symmetric(vb0, jnp.float32)
                    if vturb_aks:
                        # Visser RDM on the spline-fit Aks(z) profile
                        # (mirrors ltjax.physics.turb.vturb)
                        if aks_split:
                            prof_a = [jnp.maximum(auxbl1[k], 0.0)
                                      for k in range(ws)]
                        else:
                            bl1 = aux1[0]
                            prof_a = [jnp.maximum(bl1[nv + k], 0.0)
                                      for k in range(ws)]
                        if ladder is not None:
                            # sfast: constant w-ladder in s-space;
                            # dK/dz = dK/ds * (1/b)
                            _, sq1, binv1 = aux1
                            z2a = _fit_thomas_const_multi([prof_a], CW_k)[0]
                            kprime = _eval_spline_deriv_const(
                                sq1, CW_k, prof_a, z2a, ds) * binv1
                            smid = sq1 + 0.5 * kprime * idtc * binv1
                            kmid = jnp.maximum(_eval_spline_const_multi(
                                smid, CW_k, [prof_a], [z2a], gs)[0], 0.0)
                        else:
                            _, _z_r1, z_w1 = aux1
                            z2a = _fit_thomas(z_w1, prof_a, c_off, c_diag)
                            kprime = _eval_spline_deriv(zv, z_w1, prof_a,
                                                        z2a, ds)
                            zmid = jnp.clip(zv + 0.5 * kprime * idtc,
                                            z_w1[0], z_w1[-1])
                            kmid = jnp.maximum(
                                _eval_spline(zmid, z_w1, prof_a, z2a, gs),
                                0.0)
                        z1 = z1 + kprime * idtc + R * jnp.sqrt(
                            6.0 * kmid * idtc)
                    else:
                        z1 = z1 + R * par_ref[_IDX_VCONST]

                if sink_on:
                    # behavior type 6: constant sinking velocity
                    # (behavior_module.f90 `sink`, SURVEY.md SS2.1 #8)
                    z1 = z1 + par_ref[_IDX_SINKDZ]

                if beh_swim:
                    # behavior types 1-3 in-kernel (mirrors
                    # physics.behavior.behave: zone-biased vertical walk
                    # for 1/2, irradiance-driven DVM for 3; identical
                    # BEHAVE/MORTALITY Threefry streams, so kernel and
                    # XLA-patch paths take the same stochastic walk)
                    bl1v = aux1[0]
                    zeta_b = bl1v[nv - 2]
                    h_b = bl1v[nv - 1]
                    age_pre = t_i - dob
                    denom = max(beh["pediage"] - beh["swimstart"], 1e-30)
                    frac = jnp.clip(
                        (age_pre - jnp.float32(beh["swimstart"]))
                        * jnp.float32(1.0 / denom), 0.0, 1.0)
                    wsw = (jnp.float32(beh["swimslow"])
                           + jnp.float32(beh["swimfast"]
                                         - beh["swimslow"]) * frac)
                    wsw = jnp.where(age_pre >= beh["swimstart"], wsw, 0.0)
                    kb0 = rngk_ref[rng_stride * i + 4].astype(jnp.uint32)
                    kb1 = rngk_ref[rng_stride * i + 5].astype(jnp.uint32)
                    km0 = rngk_ref[rng_stride * i + 6].astype(jnp.uint32)
                    km1 = rngk_ref[rng_stride * i + 7].astype(jnp.uint32)
                    bb0, _ = _rng.threefry2x32(kb0, kb1, pidv, zero_u)
                    mb0, _ = _rng.threefry2x32(km0, km1, pidv, zero_u)
                    r_dir = _rng.bits_to_uniform(bb0, jnp.float32)
                    r_mix = _rng.bits_to_symmetric(mb0, jnp.float32)
                    rnd_dz = r_mix * wsw * idtc
                    up_dz = jnp.where(r_dir < P_BIAS, 1.0, -1.0) * (
                        wsw * idtc)
                    down_dz = jnp.where(r_dir < P_BIAS, -1.0, 1.0) * (
                        wsw * idtc)
                    if behavior == 1:
                        below_zone = zv < (zeta_b - SURFACE_ZONE)
                        dzb = jnp.where(below_zone, up_dz, rnd_dz)
                    elif behavior == 2:
                        above_zone = zv > (-h_b + BOTTOM_ZONE)
                        dzb = jnp.where(above_zone, down_dz, rnd_dz)
                    elif behavior == 3:
                        e0 = par_ref[ir0 + i]
                        light = e0 * jnp.exp(
                            -jnp.float32(beh["Kp"])
                            * jnp.maximum(zeta_b - zv, 0.0))
                        dzb = jnp.where(light > beh["thresh"],
                                        -wsw * idtc,
                                        jnp.where(e0 > 0.0, wsw * idtc,
                                                  rnd_dz))
                    else:
                        # behaviors 4/5: salinity-gradient cue (mirrors
                        # physics.behavior; dS/dz via the constant-
                        # ladder spline derivative on the salt lanes —
                        # from the aux window in split mode)
                        _, sq1, binv1 = aux1
                        if aks_split:
                            prof_s = [auxbl1[salt0 + k]
                                      for k in range(us_)]
                        else:
                            prof_s = [bl1v[salt0 + k]
                                      for k in range(us_)]
                        z2sl = _fit_thomas_const_multi([prof_s], CR_k)[0]
                        dsdz = _eval_spline_deriv_const(
                            sq1, CR_k, prof_s, z2sl, ds) * binv1
                        cue = jnp.abs(dsdz) >= jnp.float32(
                            beh["Sgradient"])
                        veliger = jnp.where(cue, up_dz, rnd_dz)
                        dzb = jnp.where(age_pre >= beh["pediage"],
                                        down_dz, veliger)
                        if behavior == 5:
                            dzb = jnp.where(
                                age_pre < beh["pediage"],
                                jnp.where(cue, up_dz,
                                          up_dz * 0.5 + rnd_dz * 0.5),
                                dzb)
                    z1 = z1 + dzb

                if beh_tst:
                    # behavior 7: tidal-stream transport (mirrors
                    # physics.behavior.behave b7): ride at Swimdepth
                    # below the surface with Hswimspeed along the
                    # current when it runs faster than TST_MIN_SPEED,
                    # else hold near the bottom.  Currents/zeta/h come
                    # from the stage-1 evaluation (the XLA path samples
                    # them at the same position/time).
                    bl1v = aux1[0]
                    zeta_b = bl1v[nv - 2]
                    h_b = bl1v[nv - 1]
                    age_pre = t_i - dob
                    denom = max(beh["pediage"] - beh["swimstart"], 1e-30)
                    frac = jnp.clip(
                        (age_pre - jnp.float32(beh["swimstart"]))
                        * jnp.float32(1.0 / denom), 0.0, 1.0)
                    wsw = (jnp.float32(beh["swimslow"])
                           + jnp.float32(beh["swimfast"]
                                         - beh["swimslow"]) * frac)
                    wsw = jnp.where(age_pre >= beh["swimstart"], wsw, 0.0)
                    speed = jnp.sqrt(u1 * u1 + v1 * v1)
                    riding = speed > TST_MIN_SPEED
                    target_z = jnp.where(riding,
                                         zeta_b - jnp.float32(
                                             beh["Swimdepth"]),
                                         -h_b + 0.5)
                    bound = wsw * idtc + 1.0
                    z1 = z1 + jnp.clip(target_z - zv, -bound, bound)
                    spd_safe = jnp.maximum(speed, 1e-12)
                    ride_d = jnp.float32(beh["Hswimspeed"]) * idtc / spd_safe
                    x1 = x1 + jnp.where(riding, ride_d * u1, 0.0)
                    y1 = y1 + jnp.where(riding, ride_d * v1, 0.0)

                if curv_mode:
                    # CURVILINEAR boundary handling: every particle
                    # whose step starts or ends in a cell with a
                    # non-empty 3x3 segment bucket, or whose LOGICAL
                    # per-axis displacement exceeds the 1.5-cell bucket
                    # guarantee, is DEFERRED to the exact XLA patch
                    # (reflection, open-ocean exits, stuck detection,
                    # and the tunnel guards all run there,
                    # value-identical to physics.boundary.reflect on
                    # the curvilinear segment chains).  The kernel
                    # itself never reflects on curvilinear geometry.
                    ti1, tj1, oobn = newton(t4i, t4j, x1, y1, 2,
                                            jnp.zeros((PS, 128),
                                                      jnp.bool_))
                    over_l = ((jnp.abs(ti1 - tiv) > 1.5)
                              | (jnp.abs(tj1 - tjv) > 1.5))
                    defer = (nearseg(tiv, tjv) | nearseg(ti1, tj1)
                             | oobn | over_l)
                    oob = oob | (act & defer)
                    xr, yr = x1, y1
                    falseb = jnp.zeros((PS, 128), jnp.bool_)
                    exited = falseb
                    stuck = falseb
                else:
                    # horizontal boundary reflection (skipped when the
                    # window holds no segments — interior blocks).  The
                    # trigger reads only the lane-13 slice of the ACTIVE
                    # bank (tiny; the other bank may have a prefetch DMA
                    # in flight, so it must not be read); the FULL
                    # boundary-row window is loaded inside the cond so
                    # interior blocks never touch it.
                    s13 = wbd[pl.ds(bank, 1)][0][:, :, 13]
                    any_seg = jnp.max(s13) > 0.5

                    def with_reflect(args):
                        x0_, y0_, x1_, y1_, act_, hitl_, oob_ = args
                        wbd_rows = wbd[pl.ds(bank, 1)][0].reshape(wc, BL)
                        xr_, yr_, ex_, stk_, hl_, ob_ = reflect_block(
                            par_ref, wbd_rows, oy_f, ox_f, x0_, y0_,
                            x1_, y1_, act_ != 0, hitl_, oob_ != 0)
                        return (xr_, yr_, ex_.astype(jnp.int32),
                                stk_.astype(jnp.int32), hl_,
                                ob_.astype(jnp.int32))

                    def no_reflect(args):
                        x0_, y0_, x1_, y1_, act_, hitl_, oob_ = args
                        false = jnp.zeros((PS, 128), jnp.int32)
                        return x1_, y1_, false, false, hitl_, oob_

                    xri, yri, exitedi, stucki, hitl, oobi2 = jax.lax.cond(
                        any_seg, with_reflect, no_reflect,
                        (xv, yv, x1, y1, act.astype(jnp.int32), hitl,
                         oob.astype(jnp.int32)))
                    xr, yr = xri, yri
                    exited = exitedi != 0
                    stuck = stucki != 0
                    oob = oobi2 != 0
                    # max-displacement guard (mirrors
                    # physics.boundary.reflect): a candidate per-axis
                    # displacement beyond the 3x3 bucket's guaranteed-
                    # detection radius could tunnel past segments not in
                    # its bucket/window -> flag ERROR, never silent
                    over_d = (((x1 - xv) * (x1 - xv)
                               > par_ref[_IDX_MAXSTEP2])
                              | ((y1 - yv) * (y1 - yv)
                                 > par_ref[_IDX_MAXSTEP2Y]))
                    stuck = stuck | (act & ~exited & over_d)

                # vertical reflection about zeta/h at the new column (t+idt)
                if curv_mode:
                    tx = ti1
                    ty = tj1
                else:
                    tx = (xr - par_ref[_IDX_X0]) * par_ref[_IDX_INVDX]
                    ty = (yr - par_ref[_IDX_Y0]) * par_ref[_IDX_INVDY]
                ii2 = jnp.clip(jnp.floor(tx), 0.0, float(nx - 2))
                jj2 = jnp.clip(jnp.floor(ty), 0.0, float(ny - 2))
                fx = jnp.clip(tx - ii2, 0.0, 1.0)
                fy = jnp.clip(ty - jj2, 0.0, 1.0)
                li_max = float(wx - 1) if pair2 else float(wx - 2)
                li = jnp.clip(ii2 - ox_f, 0.0, li_max)
                lj = jnp.clip(jj2 - oy_f, 0.0, float(wy - 2))
                if pair2:
                    fy_q = jnp.round(fy * 256.0) * jnp.float32(1.0 / 256.0)
                    wtp = make_rowpair_onehot(li, lj, fy_q, P, wy, wx)
                    in_main = salt_on and not aks_split
                    lanes = [w4[:, nv - 2:nv]]
                    if in_main:
                        lanes.append(w4[:, salt0:salt0 + 2 * us_])
                    lanes.append(w4[:, ntot + nv - 2:ntot + nv])
                    if in_main:
                        lanes.append(
                            w4[:, ntot + salt0:ntot + salt0 + 2 * us_])
                    nl = 2 + (2 * us_ if in_main else 0)
                    zh4 = pair_dot(jnp.concatenate(lanes, axis=1), wtp)
                    z4 = zh4.reshape(2 * nl, PS, 128)
                    zeta_p = z4[0] + fx * (z4[nl] - z4[0])
                    h_p = z4[1] + fx * (z4[nl + 1] - z4[1])
                    if in_main:
                        # salt+temp profiles at the post-reflect column
                        stp = [z4[2 + k] + fx * (z4[nl + 2 + k]
                                                 - z4[2 + k])
                               for k in range(2 * us_)]
                    elif salt_on:
                        # AUX-split: blend salt/temp from the aux
                        # window at the STAGE-4 time with the SAME
                        # (li, lj, fy_q) one-hot as zeta/h
                        wa3s = waks[pl.ds(bank, 1)][0]
                        HLa = ((2 * aux_n + 63) // 64) * 64
                        c_s = coef0 + 9 * i + 6
                        was = (par_ref[c_s]
                               * wa3s[0].reshape(wc, 128)[:, :HLa]
                               + par_ref[c_s + 1]
                               * wa3s[1].reshape(wc, 128)[:, :HLa]
                               + par_ref[c_s + 2]
                               * wa3s[2].reshape(wc, 128)[:, :HLa])
                        sts = pair_dot(was, wtp).reshape(HLa, PS, 128)
                        stp = [sts[salt0 + k]
                               + fx * (sts[aux_n + salt0 + k]
                                       - sts[salt0 + k])
                               for k in range(2 * us_)]
                else:
                    wt = make_bilinear_onehot(li, lj, fx, fy, P, wy, wx)
                    zh = zh_dot(w4[:, nv - 2:nv], wt)         # (2, P)
                    zhr = zh.reshape(2, PS, 128)
                    zeta_p = zhr[0]
                    h_p = zhr[1]
                above = z1 > zeta_p
                z1r = jnp.where(above, 2.0 * zeta_p - z1, z1)
                below = z1r < -h_p
                z2r = jnp.where(below, -2.0 * h_p - z1r, z1r)
                zr = jnp.clip(z2r, -h_p, zeta_p)
                hitb = hitb + jnp.where(act & below, 1, 0)

                if salt_on:
                    # SaltTempOn: sample salt/temp at the new position
                    # at t+idt (the w4 stage window), constant-ladder
                    # spline on the blended profiles — mirrors
                    # internal_step's sample_scalar to the collapsed
                    # scheme's rounding
                    sqs = (zr - zeta_p) / (zeta_p + h_p)
                    z2sa, z2te = _fit_thomas_const_multi(
                        [stp[:us_], stp[us_:]], CR_k)
                    s_smp, t_smp = _eval_spline_const_multi(
                        sqs, CR_k, [stp[:us_], stp[us_:]],
                        [z2sa, z2te], gs)
                    sal = jnp.where(act, s_smp, sal)
                    tem = jnp.where(act, t_smp, tem)

                # apply updates under masks (matches ltjax.step.internal_step)
                xv = jnp.where(act, xr, xv)
                yv = jnp.where(act, yr, yv)
                zv = jnp.where(act, zr, zv)
                if curv_mode:
                    tiv = jnp.where(act, ti1, tiv)
                    tjv = jnp.where(act, tj1, tjv)
                st = jnp.where(act & exited, _OUT_OF_DOMAIN, st)
                st = jnp.where(act & stuck, _ERROR, st)
                if mortality:
                    # deterministic death at deadage (mirrors
                    # ltjax.physics.behavior; [conf: M] — see its docstring);
                    # the XLA path tests the PRE-step age (behave() sees
                    # p.age = t_i - dob), and DEAD overrides a same-step
                    # stuck ERROR but not an exit, matching internal_step's
                    # status-update order
                    age_m = t_i - dob
                    dies = act & ~exited & (age_m >= par_ref[_IDX_DEADAGE])
                    st = jnp.where(dies, _DEAD, st)

                if settle_on:
                    # settlement fast path: per-cell classification
                    # lanes (settle_lanes via boundary_rows_table) at
                    # the post-reflect cell.  Fully-inside cells settle
                    # here (exactly what the XLA point-in-polygon would
                    # decide); partial/ambiguous cells DEFER the
                    # particle to the exact XLA recompute through the
                    # oob patch — value-identical to the pure XLA path.
                    tbx2 = (xr - par_ref[_IDX_BX0]) * par_ref[_IDX_INVBDX]
                    tby2 = (yr - par_ref[_IDX_BY0]) * par_ref[_IDX_INVBDY]
                    lib2 = jnp.clip(jnp.clip(jnp.floor(tbx2), 0.0,
                                             float(nx - 1)) - ox_f,
                                    0.0, float(wx - 1))
                    ljb2 = jnp.clip(jnp.clip(jnp.floor(tby2), 0.0,
                                             float(ny - 1)) - oy_f,
                                    0.0, float(wy - 1))
                    ohs = make_cell_onehot(lib2, ljb2, P, wy, wx)
                    rows_s = jax.lax.dot_general(
                        wbd[pl.ds(bank, 1)][0].reshape(wc, BL)[:, :8], ohs,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=row_precision)               # (8, P)
                    rs8 = rows_s.reshape(8, PS, 128)
                    s_state = rs8[1]
                    s_pid = rs8[2]
                    age_ok = (t_i - dob + idtc) >= jnp.float32(
                        beh["pediage"])
                    base_el = act & ~exited & ~stuck & age_ok
                    settles = (base_el & (st == _ACTIVE)
                               & (s_state > 0.5) & (s_state < 1.5))
                    st = jnp.where(settles, _SETTLED, st)
                    spol = jnp.where(settles & (spol < 0),
                                     s_pid.astype(jnp.int32), spol)
                    oob = oob | (base_el & (s_state > 1.5))
                if curv_mode:
                    return (xv, yv, zv, tiv, tjv, st, spol, sal, tem,
                            hitl, hitb, oob.astype(jnp.int32),
                            c0y, c0x, c1y, c1x, if0, if1, im, jm)
                return (xv, yv, zv, st, spol, sal, tem, hitl, hitb,
                        oob.astype(jnp.int32), c0y, c0x, c1y, c1x,
                        if0, if1, im, jm)

            return jax.lax.cond(live_any, compute,
                                lambda c: c, carry)

        # bank-1 content starts at an impossible origin so the first
        # prefetch into it can never be skipped
        init_dma = (oy0, ox0, jnp.int32(-1 << 20), jnp.int32(-1 << 20),
                    jnp.int32(1), jnp.int32(0), im0, jm0)
        if curv_mode:
            (xv, yv, zv, tiv, tjv, st, spol, sal, tem, hitl, hitb,
             oobi, *_) = jax.lax.fori_loop(
                0, n_int, body,
                (xv, yv, zv, tiv0, tjv0, st, spol, sal, tem, hitl,
                 hitb, oob.astype(jnp.int32)) + init_dma)
            tio_ref[0] = tiv
            tjo_ref[0] = tjv
        else:
            (xv, yv, zv, st, spol, sal, tem, hitl, hitb, oobi,
             *_) = jax.lax.fori_loop(
                0, n_int, body,
                (xv, yv, zv, st, spol, sal, tem, hitl, hitb,
                 oob.astype(jnp.int32)) + init_dma)
        oob = oobi != 0
        xo_ref[0] = xv
        yo_ref[0] = yv
        zo_ref[0] = zv
        sto_ref[0] = st
        spolo_ref[0] = spol
        salo_ref[0] = sal
        temo_ref[0] = tem
        hitl_ref[0] = hitl
        hitb_ref[0] = hitb
        oob_ref[0] = oob.astype(jnp.int32)

    return kernel


def ext_step_fused(grid: Grid, rtab, brows, params, x, y, z, dob, status,
                   sigma: float, n_int: int, idt: float,
                   n_iter: int = 4, p_block: int = 2048,
                   precision=jax.lax.Precision.HIGHEST,
                   s_max: "int | None" = None,
                   open_exits: bool = True,
                   pids=None, rngk=None,
                   hturb_on: bool = False, vturb_on: bool = False,
                   with_aks: bool = False,
                   window=(WY, WX), fast_math: bool = False,
                   sink_on: bool = False, mortality: bool = False,
                   sfast: bool = True,
                   behavior: int = 0, beh=None, settle_on: bool = False,
                   spols=None,
                   salt_on: bool = False, with_scalars: bool = False,
                   salts=None, temps=None,
                   wxy=None, tis=None, tjs=None,
                   rtab_aks=None,
                   interpret: bool = False):
    """Run one full external step in-kernel.

    rtab: (3, Ny, Nx, HL) f32 record value tables
    (ltjax.packed.build_record_tables); brows: (Ny, Nx, BL) f32 boundary
    rows (boundary_rows_table — with settle lanes when settle_on);
    params: params_array_ext (with the dvm tail when behavior == 3).
    x/y/z/dob f32 and status int32 are Hilbert-sorted, length a
    multiple of p_block.  ``behavior`` in {1, 2, 3} runs the in-kernel
    swimming behaviors (``beh`` dict: pediage, swimstart, swimslow,
    swimfast, Kp, thresh; rngk must carry the BEHAVE/MORTALITY pairs —
    rng_keys_array(behave=True)); settle_on needs ``beh['pediage']``
    and spols (settle_poly ids, -1 unset).

    CURVILINEAR grids: pass ``wxy`` (curv_xy_table) plus ``tis``/
    ``tjs`` (per-particle logical coordinates, grid.logical_coords of
    x/y — params must come from params_static_ext(curv=True) so the
    kernel's lattice arithmetic runs on logical coordinates); the
    return tuple gains updated (ti, tj) at the end.  Boundary-
    interacting particles are deferred to the exact patch via the oob
    flag (see _make_ext_kernel curv_mode).

    Returns (x, y, z, status, settle_poly, salt, temp, hit_land,
    hit_bottom, oob[, ti, tj]).
    """
    from . import gather_interp as gi
    from .. import packed as pk

    n = x.shape[0]
    P_ = p_block
    PS = P_ // 128
    assert n % P_ == 0, (n, P_)
    B = n // P_
    nv = pk.n_value_lanes(grid.us, grid.ws)
    HL = rtab.shape[-1]
    BL = brows.shape[-1]
    # lanes beyond the real row width are zero-valid padding; unrolling
    # over them is correct (valid>0.5 fails) but wasted ops — callers
    # pass the true slot count via s_max
    s_real = (BL - 8) // 8 if s_max is None else int(s_max)

    # no precomputed origins: the kernel tracks them in-kernel from the
    # block means (a (B, 2) SMEM prefetch operand pads its minor dim to
    # 128 and blows the 1 MB SMEM budget at 10M particles)
    # true data-lane count: rtab lanes are 128-padded; recover from the
    # packed layout (nv core lanes + optional ws aks lanes; with the
    # Aks SPLIT the aks lanes live in their own table/window)
    aks_split = rtab_aks is not None
    aux_n = 0
    if aks_split:
        assert (with_aks or with_scalars) and wxy is None
        assert precision == "pair2"
        aux_n = ((grid.ws if with_aks else 0)
                 + (2 * grid.us if with_scalars else 0))
    ntot = nv if aks_split else (
        nv + (grid.ws if with_aks else 0)
        + (2 * grid.us if with_scalars else 0))
    # lane offset of the salt profiles: within the AUX window (split)
    # or within the main tables (combined)
    salt0 = ((grid.ws if with_aks else 0) if aks_split
             else nv + (grid.ws if with_aks else 0))
    wy, wx = window
    align_x8 = HL > 128
    if align_x8 and wx < 16:
        # 8-aligned x origins (see _ox_from) cost up to 4 cells of
        # centering; a 16-wide window keeps the effective margin
        wx = 16
        window = (wy, wx)
    from ..grid import affine_ladders
    ladder = affine_ladders(grid) if sfast else None
    curv_mode = wxy is not None
    if curv_mode:
        # the curv kernel covers passive/sinking transport, turbulence,
        # mortality, the salt-free swimming behaviors (1-3) and TST
        # (7); salinity-cued behaviors (4/5), settlement and salt
        # sampling drop to the per-step XLA path (step.mode_flags)
        assert behavior in (0, 1, 2, 3, 6, 7)
        assert not settle_on and not salt_on
        assert tis is not None and tjs is not None
    kern = _make_ext_kernel(grid, float(sigma), float(idt), nv, ntot,
                            HL, BL, n_int, n_iter, P_, precision,
                            open_exits=open_exits, s_max=s_real,
                            hturb_on=hturb_on, vturb_on=vturb_on,
                            vturb_aks=vturb_on and with_aks,
                            window=window, fast_math=fast_math,
                            sink_on=sink_on, mortality=mortality,
                            ladder=ladder, behavior=behavior, beh=beh,
                            settle_on=settle_on, align_x8=align_x8,
                            salt_on=salt_on, salt0=salt0,
                            curv_mode=curv_mode, aks_split=aks_split,
                            aux_n=aux_n)

    fshape = jax.ShapeDtypeStruct((B, PS, 128), jnp.float32)
    ishape = jax.ShapeDtypeStruct((B, PS, 128), jnp.int32)

    def blk(b, par_ref, rngk_ref):
        return (b, 0, 0)

    n_in = 11 if curv_mode else 9
    n_out = 12 if curv_mode else 10
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                          # params, rngk
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM)
        ] * n_in + [
            pl.BlockSpec(memory_space=pl.ANY),             # rtab (HBM)
            pl.BlockSpec(memory_space=pl.ANY),             # brows
        ] + ([pl.BlockSpec(memory_space=pl.ANY)]           # wxy / aks
             if (curv_mode or aks_split) else []),
        out_specs=[pl.BlockSpec((1, PS, 128), blk,
                                memory_space=pltpu.VMEM)] * n_out,
        scratch_shapes=[
            # double-banked windows: bank i%2 computes step i while the
            # other bank prefetches step i+1 (predictive DMA overlap);
            # the 3 record windows share one strided copy
            pltpu.VMEM((2, 3, wy, wx, HL), jnp.float32),
            pltpu.VMEM((2, wy, wx, BL), jnp.float32),
        ] + ([pltpu.VMEM((2, wy, wx, 128), jnp.float32)]
             if curv_mode else []) + (
            [pltpu.VMEM((2, 3, wy, wx, 128), jnp.float32)]
            if aks_split else []) + [
            pltpu.SemaphoreType.DMA(
                (2, 3 if (curv_mode or aks_split) else 2)),
        ],
    )

    def rs(a, dt):
        return a.astype(dt).reshape(B, PS, 128)

    if rngk is None:
        rngk = jnp.zeros(4 * n_int, jnp.int32)
    if pids is None:
        pids = jnp.arange(n, dtype=jnp.int32)
    if spols is None:
        spols = jnp.full(n, -1, jnp.int32)
    if salts is None:
        salts = jnp.zeros(n, jnp.float32)
    if temps is None:
        temps = jnp.zeros(n, jnp.float32)
    ins = [params, rngk, rs(x, jnp.float32), rs(y, jnp.float32),
           rs(z, jnp.float32)]
    if curv_mode:
        ins += [rs(tis, jnp.float32), rs(tjs, jnp.float32)]
    ins += [rs(dob, jnp.float32), rs(status, jnp.int32),
            rs(pids, jnp.int32), rs(spols, jnp.int32),
            rs(salts, jnp.float32), rs(temps, jnp.float32), rtab, brows]
    if curv_mode:
        ins.append(wxy)
    if aks_split:
        ins.append(rtab_aks)
    out_shape = [fshape, fshape, fshape]
    if curv_mode:
        out_shape += [fshape, fshape]
    out_shape += [ishape, ishape, fshape, fshape, ishape, ishape,
                  ishape]
    outs = pl.pallas_call(
        kern, out_shape=out_shape,
        grid_spec=grid_spec, interpret=interpret,
    )(*ins)
    if curv_mode:
        (xo, yo, zo, tio, tjo, sto, spolo, salo, temo, hitl, hitb,
         oob) = outs
        return (xo.reshape(n), yo.reshape(n), zo.reshape(n),
                sto.reshape(n), spolo.reshape(n), salo.reshape(n),
                temo.reshape(n), hitl.reshape(n), hitb.reshape(n),
                oob.reshape(n) != 0, tio.reshape(n), tjo.reshape(n))
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb, oob) = outs
    return (xo.reshape(n), yo.reshape(n), zo.reshape(n), sto.reshape(n),
            spolo.reshape(n), salo.reshape(n), temo.reshape(n),
            hitl.reshape(n), hitb.reshape(n), oob.reshape(n) != 0)
