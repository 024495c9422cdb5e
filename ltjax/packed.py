"""Packed-table fast interpolation path (TPU gather-optimized).

Reference semantics (SURVEY.md SS3.2, ``find_currents``): per time
record, horizontal bilinear of every s-level; vertical tension spline
of the blended profile; quadratic time interpolation last.

The TPU memory system serves *row gathers* at a fixed row rate
(~0.4 G rows/s on v5e, measured; independent of row width up to 128
lanes) — so the native path's ~12 row-gather sets + per-particle
spline fits per internal step are gather-count-bound.  This module
reformulates the interpolation to minimize gathered rows per
particle-step, using two exact identities and one standard scheme
choice:

1. **Time-collapse first** (exact commute): the quadratic Lagrange
   time interpolation is linear with scalar coefficients shared by all
   particles, so collapsing the 3 time records into per-RK4-stage
   tables *on the grid* (dense, grid-sized work) commutes exactly
   with the bilinear horizontal interpolation.  (It does not commute
   with the level-depth dependence on zeta(t) — the knot positions use
   the stage-time zeta instead of per-record zeta — a standard choice,
   cf. time-first interpolation in other Lagrangian frameworks.)
2. **Column-spline / eval-then-blend** (scheme choice): fit the
   vertical tension spline *densely per grid column* (one tridiagonal
   solve per cell, grid-sized) and horizontally blend the 4 corner
   *evaluations* — instead of blending profiles and fitting per
   particle.  Both are consistent interpolants of the same data; the
   native path (ltjax.physics.advect) remains available as
   ``Config.fast_interp=False`` for reference-ordered semantics.
3. **Collocate u,v to rho points** (scheme choice): one cell-row table
   holds every field, so a particle-stage costs 2 gathered rows (the
   two eta-adjacent cell *pairs*) instead of 12+.

Packed cell-row layout, ``LANES = 128`` f32 lanes per cell:

    0:20    u (rho-collocated, us levels)       [us=20 shown]
    20:40   v
    40:61   w (ws levels)
    61      zeta
    62      h
    63      pad
    64:84   u z2 (spline second derivatives)
    84:104  v z2
    104:125 w z2
    125:128 pad

Pair-packed gather table: row c = [cell c | cell c+1] (2*LANES lanes),
so one row gather returns both x-corners of the bilinear stencil.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import tension
from .fields import FieldSet
from .grid import Grid, locate, locate_rho_ij
from .interp import polintd
from .scoord import s_depths


class PackedRecords(NamedTuple):
    """Per-record packed cell tables (built once per external step)."""
    tab: jax.Array      # (3, C, L) value lanes only (no z2 yet):
                        #   [u us | v us | w ws | zeta | h [| aks ws]
                        #    [| salt us | temp us]] — the optional
                        #   trailing aks lanes feed the in-kernel
                        #   Visser turbulence path; the salt/temp lanes
                        #   feed in-kernel SaltTempOn sampling and the
                        #   salinity-cued behaviors (4/5)
    times: jax.Array    # (3,)
    with_aks: bool = False  # static: aks lanes present
    with_scalars: bool = False  # static: salt/temp lanes present


class StageTable(NamedTuple):
    """One time-collapsed, spline-fitted, pair-packed gather table."""
    rows: jax.Array     # (C, 2*LANES) pair-packed cell rows
    zh_rows: jax.Array  # (C, 8) pair-packed [zeta, h, 0, 0] mini rows —
                        #   zeta/h-only lookups gather 8 lanes, not 256
    t: jax.Array        # scalar stage time


def _collocate_u(u):
    """(..., Ny, Nx-1, K) u-grid -> (..., Ny, Nx, K) rho-collocated."""
    mid = 0.5 * (u[..., :, 1:, :] + u[..., :, :-1, :])
    return jnp.concatenate([u[..., :, :1, :], mid, u[..., :, -1:, :]],
                           axis=-2)


def _collocate_v(v, ny: int):
    """v-grid -> rho-collocated along eta.

    Handles both layouts: native (..., Ny-1, Nx, K) and the tiled
    pre-padded one where v already carries Ny(=ny_ext) rows (row j
    between rho rows j and j+1; see ltjax.shard.pad_fieldset_eta).
    Output always has ny rows.
    """
    mid = 0.5 * (v[..., 1:, :, :] + v[..., :-1, :, :])
    if v.shape[-3] == ny - 1:
        return jnp.concatenate([v[..., :1, :, :], mid, v[..., -1:, :, :]],
                               axis=-3)
    assert v.shape[-3] == ny, (v.shape, ny)
    return jnp.concatenate([v[..., :1, :, :], mid], axis=-3)


def n_value_lanes(us: int, ws: int) -> int:
    return us + us + ws + 2


def half_lanes(us: int, ws: int) -> int:
    """Lane count of each cell half-section (values / z2), padded so a
    full cell row is lane-aligned.  For us=20: 64 -> 128-lane cells."""
    need = max(n_value_lanes(us, ws), us + us + ws)  # values ; z2
    return ((need + 63) // 64) * 64


def build_packed_records(grid: Grid, fields: FieldSet,
                         with_aks: bool = False,
                         with_scalars: bool = False) -> PackedRecords:
    """Dense per-record packing (jit; grid-sized work).

    Collocates u, v onto rho points and concatenates value lanes;
    with_aks appends the ws Aks lanes after h; with_scalars appends the
    us salt + us temp lanes after those (indices of the nv core lanes
    are unchanged).
    """
    u = _collocate_u(fields.u)                     # (3, Ny, Nx, us)
    v = _collocate_v(fields.v, grid.ny)            # (3, Ny, Nx, us)
    w = fields.w                                   # (3, Ny, Nx, ws)
    z = fields.zeta[..., None]                     # (3, Ny, Nx, 1)
    h = jnp.broadcast_to(grid.h.astype(u.dtype)[None, ..., None],
                         z.shape)
    parts = [u, v, w, z, h]
    if with_aks:
        parts.append(fields.aks.astype(u.dtype))
    if with_scalars:
        parts.append(fields.salt.astype(u.dtype))
        parts.append(fields.temp.astype(u.dtype))
    tab = jnp.concatenate(parts, axis=-1)
    three, ny, nx, L = tab.shape
    tab = tab.reshape(three, ny * nx, L)
    return PackedRecords(tab=tab, times=fields.times, with_aks=with_aks,
                         with_scalars=with_scalars)


def _knots(zeta, h, s, cs, hc, vtransform):
    """s-level depths, broadcast over trailing knot axis.

    zeta/h: (...,); s/cs: (K,) -> (..., K).  Mirrors scoord.s_depths.
    """
    zeta = zeta[..., None]
    h = h[..., None]
    if vtransform == 1:
        z0 = hc * s + (h - hc) * cs
        return z0 + zeta * (1.0 + z0 / h)
    s_ = (hc * s + h * cs) / (hc + h)
    return zeta + (zeta + h) * s_


def collapse_stage(grid: Grid, rec: PackedRecords, t, sigma: float
                   ) -> StageTable:
    """Time-collapse records to stage time t, dense-fit the vertical
    splines per grid column, and pair-pack the gather rows."""
    us, ws = grid.us, grid.ws
    dtype = rec.tab.dtype
    tt = jnp.asarray(t, rec.times.dtype)
    nv = n_value_lanes(us, ws)
    vals = polintd(rec.tab[..., :nv], rec.times, tt)   # (C, nv)
    zeta = vals[:, nv - 2]
    h = vals[:, nv - 1]

    sdt = grid.s_rho.dtype
    z_r = _knots(zeta.astype(sdt), h.astype(sdt), grid.s_rho, grid.Cs_r,
                 grid.hc, grid.vtransform).astype(dtype)   # (C, us)
    z_w = _knots(zeta.astype(sdt), h.astype(sdt), grid.s_w, grid.Cs_w,
                 grid.hc, grid.vtransform).astype(dtype)   # (C, ws)

    sig = jnp.asarray(sigma, dtype)
    z2_u = tension.fit(z_r, vals[:, 0:us], sig)
    z2_v = tension.fit(z_r, vals[:, us:2 * us], sig)
    z2_w = tension.fit(z_w, vals[:, 2 * us:2 * us + ws], sig)

    HL = half_lanes(us, ws)
    C = vals.shape[0]
    pad1 = jnp.zeros((C, HL - nv), dtype)
    pad2 = jnp.zeros((C, HL - (2 * us + ws)), dtype)
    cell = jnp.concatenate([vals, pad1, z2_u, z2_v, z2_w, pad2], axis=-1)
    # pair rows: row c = [cell c | cell c+1]
    rows = jnp.concatenate([cell, jnp.roll(cell, -1, axis=0)], axis=-1)
    zh = jnp.stack([zeta, h, jnp.zeros_like(zeta), jnp.zeros_like(zeta)],
                   axis=-1)
    zh_rows = jnp.concatenate([zh, jnp.roll(zh, -1, axis=0)], axis=-1)
    return StageTable(rows=rows, zh_rows=zh_rows, t=tt)


def _eval_cubic_like(zq, zk, yk, z2, sigma: float):
    """Evaluate the tension spline at zq given per-corner knots.

    zq: (...,); zk: (..., K); yk/z2: (..., K).  sigma is the static
    uniform tension (0 => natural cubic fast path).  zq is clamped to
    the knot range (reference clamps to the water column).
    """
    K = zk.shape[-1]
    zq = jnp.clip(zq, zk[..., 0], zk[..., -1])
    # containing-interval one-hot over the K-1 intervals
    j = jnp.sum((zq[..., None] >= zk[..., 1:]).astype(jnp.int32), axis=-1)
    j = jnp.clip(j, 0, K - 2)
    oh = (j[..., None] == jnp.arange(K - 1, dtype=j.dtype)).astype(zk.dtype)

    def sel(a, off):
        return jnp.sum(a[..., off:off + K - 1] * oh, axis=-1)

    z0 = sel(zk, 0)
    z1 = jnp.sum(zk[..., 1:] * oh, axis=-1)
    y0 = sel(yk, 0)
    y1 = jnp.sum(yk[..., 1:] * oh, axis=-1)
    s0 = sel(z2, 0)
    s1 = jnp.sum(z2[..., 1:] * oh, axis=-1)

    hh = z1 - z0
    B2 = (zq - z0) / hh
    B1 = 1.0 - B2
    if sigma == 0.0:
        g1 = (B1 * B1 * B1 - B1) / 6.0
        g2 = (B2 * B2 * B2 - B2) / 6.0
    else:
        u = jnp.asarray(sigma, zk.dtype)
        g1 = tension._gs(u, B1)
        g2 = tension._gs(u, B2)
    return y0 * B1 + y1 * B2 + hh * hh * (s0 * g1 + s1 * g2)


def gather_corners(grid: Grid, table: StageTable, x, y):
    """Pair-row corner gather -> per-corner cell lanes + weights.

    Returns (cells, wx, wy): cells (N, 2, 2, HL) with axes
    (eta-corner, xi-corner); wx/wy (N,) fractional weights.
    """
    cw = table.rows.shape[-1] // 2          # full cell width (2 * HL)
    i, j, fx, fy = locate_rho_ij(grid, x, y)
    nx = grid.nx
    c00 = j.astype(jnp.int32) * nx + i.astype(jnp.int32)
    r0 = table.rows[c00]                    # (N, 2*cw) cells (j,i),(j,i+1)
    r1 = table.rows[c00 + nx]               # cells (j+1,i),(j+1,i+1)
    cells = jnp.stack([r0, r1], axis=1).reshape(x.shape[0], 2, 2, cw)
    return cells, fx, fy


def _blend(vals, wx, wy):
    """Bilinear blend of per-corner scalars vals (N, 2, 2)."""
    wx = wx.astype(vals.dtype)
    wy = wy.astype(vals.dtype)
    top = vals[:, 0, 0] * (1 - wx) + vals[:, 0, 1] * wx
    bot = vals[:, 1, 0] * (1 - wx) + vals[:, 1, 1] * wx
    return top * (1 - wy) + bot * wy


def find_currents_packed(grid: Grid, table: StageTable, x, y, z,
                         sigma: float, z0m: float):
    """(u, v, w) at particle positions from one stage table.

    Per-corner spline evaluation, bilinear blend of the 4 corner
    values, near-bottom log-layer decay (reference find_currents
    semantics, LTRANS.f90 [conf: M]).
    """
    dtype = x.dtype
    us, ws = grid.us, grid.ws
    nv = n_value_lanes(us, ws)
    HL = half_lanes(us, ws)
    cells, wx, wy = gather_corners(grid, table, x, y)
    cd = cells.dtype
    zq = z.astype(cd)[:, None, None]
    zq = jnp.broadcast_to(zq, cells.shape[:3])

    zeta_c = cells[..., nv - 2]
    h_c = cells[..., nv - 1]
    sdt = grid.s_rho.dtype
    z_r = _knots(zeta_c.astype(sdt), h_c.astype(sdt), grid.s_rho,
                 grid.Cs_r, grid.hc, grid.vtransform).astype(cd)
    z_w = _knots(zeta_c.astype(sdt), h_c.astype(sdt), grid.s_w,
                 grid.Cs_w, grid.hc, grid.vtransform).astype(cd)

    u_c = _eval_cubic_like(zq, z_r, cells[..., 0:us],
                           cells[..., HL:HL + us], sigma)
    v_c = _eval_cubic_like(zq, z_r, cells[..., us:2 * us],
                           cells[..., HL + us:HL + 2 * us], sigma)
    w_c = _eval_cubic_like(zq, z_w, cells[..., 2 * us:2 * us + ws],
                           cells[..., HL + 2 * us:HL + 2 * us + ws], sigma)

    u_t = _blend(u_c, wx, wy).astype(dtype)
    v_t = _blend(v_c, wx, wy).astype(dtype)
    w_t = _blend(w_c, wx, wy).astype(dtype)
    zeta_p = _blend(zeta_c, wx, wy).astype(dtype)
    h_p = _blend(h_c, wx, wy).astype(dtype)
    z_r0 = _blend(z_r[..., 0], wx, wy).astype(dtype)

    # near-bottom log layer (cf. physics.advect.find_currents)
    z0m = jnp.asarray(z0m, dtype)
    zab = z + h_p
    ztb = jnp.maximum(z_r0 + h_p, 2.0 * z0m)
    decay = jnp.log(jnp.maximum(zab, z0m) / z0m) / jnp.log(ztb / z0m)
    factor = jnp.where(zab < ztb, jnp.clip(decay, 0.0, 1.0), 1.0)
    return u_t * factor, v_t * factor, w_t, zeta_p, h_p


def zeta_h_packed(grid: Grid, table: StageTable, x, y):
    """Free surface + bathymetry at particles (8-lane mini rows)."""
    dtype = x.dtype
    i, j, fx, fy = locate_rho_ij(grid, x, y)
    nx = grid.nx
    c00 = j.astype(jnp.int32) * nx + i.astype(jnp.int32)
    r0 = table.zh_rows[c00]                  # (N, 8)
    r1 = table.zh_rows[c00 + nx]
    cells = jnp.stack([r0, r1], axis=1).reshape(x.shape[0], 2, 2, 4)
    zeta_p = _blend(cells[..., 0], fx, fy).astype(dtype)
    h_p = _blend(cells[..., 1], fx, fy).astype(dtype)
    return zeta_p, h_p


def rk4_displacement_packed(grid: Grid, tables, x, y, z, sigma: float,
                            z0m: float, idt: float):
    """RK4 advective displacement (dx, dy, dz) from the 3 stage tables
    (t, t+idt/2, t+idt); stages 2 and 3 share the midpoint table."""
    t1, t2, t4 = tables
    dt = jnp.asarray(idt, x.dtype)
    half = 0.5 * dt
    u1, v1, w1, _, _ = find_currents_packed(grid, t1, x, y, z, sigma, z0m)
    u2, v2, w2, _, _ = find_currents_packed(
        grid, t2, x + u1 * half, y + v1 * half, z + w1 * half, sigma, z0m)
    u3, v3, w3, _, _ = find_currents_packed(
        grid, t2, x + u2 * half, y + v2 * half, z + w2 * half, sigma, z0m)
    u4, v4, w4, _, _ = find_currents_packed(
        grid, t4, x + u3 * dt, y + v3 * dt, z + w3 * dt, sigma, z0m)
    sixth = dt / 6.0
    dx = sixth * (u1 + 2.0 * u2 + 2.0 * u3 + u4)
    dy = sixth * (v1 + 2.0 * v2 + 2.0 * v3 + v4)
    dz = sixth * (w1 + 2.0 * w2 + 2.0 * w3 + w4)
    return dx, dy, dz


class ValueTable(NamedTuple):
    """One time-collapsed values-only table for the Pallas kernel path.

    ``zh_rows`` are the 8-lane pair rows for zeta/h-only lookups;
    ``full`` is the f32 table the kernels window-DMA (any bf16
    decomposition for the MXU happens in-kernel, see
    kernels.gather_interp.blend_dot_fn).
    """
    full: jax.Array   # (Ny, Nx, HL) f32 value lanes [u|v|w|zeta|h|pad]
    zh_rows: jax.Array  # (Ny*Nx, 8) pair rows [zeta,h,0,0]x2
    t: jax.Array


def collapse_stage_values(grid: Grid, rec: PackedRecords, t) -> ValueTable:
    """Time-collapse to stage time t, values only (no spline fits —
    the kernel fits per particle on the blended profile, the native
    vertical scheme)."""
    us, ws = grid.us, grid.ws
    tt = jnp.asarray(t, rec.times.dtype)
    vals = polintd(rec.tab, rec.times, tt)        # (C, ntot)
    nv = n_value_lanes(us, ws)
    ntot = vals.shape[-1]
    # pad to a 128-lane multiple: HBM minor-dim tiling requirement of
    # the fused kernel's window DMA (kernels/gather_interp)
    HL = ((ntot + 127) // 128) * 128
    C = vals.shape[0]
    vals = jnp.concatenate(
        [vals, jnp.zeros((C, HL - ntot), vals.dtype)], axis=-1)
    zeta = vals[:, nv - 2]
    h = vals[:, nv - 1]
    zh = jnp.stack([zeta, h, jnp.zeros_like(zeta), jnp.zeros_like(zeta)],
                   axis=-1)
    zh_rows = jnp.concatenate([zh, jnp.roll(zh, -1, axis=0)], axis=-1)
    shape = (grid.ny, grid.nx, HL)
    return ValueTable(full=vals.reshape(shape), zh_rows=zh_rows, t=tt)


def _fit_eval_profile(grid: Grid, prof_u, prof_v, prof_w, zeta_p, h_p, z,
                      sigma: float):
    """Blend-then-fit vertical scheme on blended profiles (the native
    reference ordering; exact XLA mirror of the kernel's in-VMEM math).

    prof_u/v: (..., us); prof_w: (..., ws); zeta_p/h_p/z: (...,).
    """
    dtype = prof_u.dtype
    sdt = grid.s_rho.dtype
    z_r = _knots(zeta_p.astype(sdt), h_p.astype(sdt), grid.s_rho,
                 grid.Cs_r, grid.hc, grid.vtransform).astype(dtype)
    z_w = _knots(zeta_p.astype(sdt), h_p.astype(sdt), grid.s_w,
                 grid.Cs_w, grid.hc, grid.vtransform).astype(dtype)
    sig = jnp.asarray(sigma, dtype)
    z2u = tension.fit(z_r, prof_u, sig)
    z2v = tension.fit(z_r, prof_v, sig)
    z2w = tension.fit(z_w, prof_w, sig)
    u = _eval_cubic_like(z, z_r, prof_u, z2u, sigma)
    v = _eval_cubic_like(z, z_r, prof_v, z2v, sigma)
    w = _eval_cubic_like(z, z_w, prof_w, z2w, sigma)
    return u, v, w, z_r[..., 0]


def find_currents_collapsed(grid: Grid, vt: ValueTable, x, y, z,
                            sigma: float, z0m: float):
    """Blend-then-fit currents from a values table (XLA path).

    This is the exact reference-ordered vertical scheme on the
    time-collapsed table — the oracle for (and fallback of) the Pallas
    kernel.
    """
    dtype = x.dtype
    us, ws = grid.us, grid.ws
    nv = n_value_lanes(us, ws)
    i, j, fx, fy = locate_rho_ij(grid, x, y)
    flat = vt.full.reshape(-1, vt.full.shape[-1])
    nx = grid.nx
    c00 = j.astype(jnp.int32) * nx + i.astype(jnp.int32)
    r00 = flat[c00]
    r01 = flat[c00 + 1]
    r10 = flat[c00 + nx]
    r11 = flat[c00 + nx + 1]
    fxd = fx.astype(flat.dtype)[:, None]
    fyd = fy.astype(flat.dtype)[:, None]
    blended = ((r00 * (1 - fxd) + r01 * fxd) * (1 - fyd)
               + (r10 * (1 - fxd) + r11 * fxd) * fyd)      # (N, HL)
    zeta_p = blended[:, nv - 2]
    h_p = blended[:, nv - 1]
    u, v, w, z_r0 = _fit_eval_profile(
        grid, blended[:, 0:us], blended[:, us:2 * us],
        blended[:, 2 * us:2 * us + ws], zeta_p, h_p, z.astype(blended.dtype),
        sigma)
    z0m = jnp.asarray(z0m, dtype)
    u = u.astype(dtype)
    v = v.astype(dtype)
    w = w.astype(dtype)
    zab = z + h_p.astype(dtype)
    ztb = jnp.maximum(z_r0.astype(dtype) + h_p.astype(dtype), 2.0 * z0m)
    decay = jnp.log(jnp.maximum(zab, z0m) / z0m) / jnp.log(ztb / z0m)
    factor = jnp.where(zab < ztb, jnp.clip(decay, 0.0, 1.0), 1.0)
    return u * factor, v * factor, w


def rk4_displacement_collapsed(grid: Grid, vtabs, x, y, z, sigma: float,
                               z0m: float, idt: float):
    """RK4 from 3 values tables, blend-then-fit scheme (kernel mirror)."""
    t1, t2, t4 = vtabs
    dt = jnp.asarray(idt, x.dtype)
    half = 0.5 * dt
    u1, v1, w1 = find_currents_collapsed(grid, t1, x, y, z, sigma, z0m)
    u2, v2, w2 = find_currents_collapsed(
        grid, t2, x + u1 * half, y + v1 * half, z + w1 * half, sigma, z0m)
    u3, v3, w3 = find_currents_collapsed(
        grid, t2, x + u2 * half, y + v2 * half, z + w2 * half, sigma, z0m)
    u4, v4, w4 = find_currents_collapsed(
        grid, t4, x + u3 * dt, y + v3 * dt, z + w3 * dt, sigma, z0m)
    sixth = dt / 6.0
    return (sixth * (u1 + 2 * u2 + 2 * u3 + u4),
            sixth * (v1 + 2 * v2 + 2 * v3 + v4),
            sixth * (w1 + 2 * w2 + 2 * w3 + w4))


class RecordsFlat(NamedTuple):
    """Record-concatenated flat rows for the table-free collapsed
    scheme: row c = [rec_b lanes | rec_c lanes | rec_f lanes] (3*nv).

    Built ONCE per external step; per internal step the consumer
    gathers 4 corner rows and applies polintd per particle — the exact
    same per-corner arithmetic as collapse_stage_values + gather, with
    no grid-sized work inside the step scan (the oob-patch path of the
    external-step megakernel runs this on small subsets).
    """
    rows: jax.Array    # (C, 3*nv)
    times: jax.Array   # (3,)


def build_records_flat(grid: Grid, rec: PackedRecords) -> RecordsFlat:
    three, C, nv = rec.tab.shape
    rows = jnp.moveaxis(rec.tab, 0, 1).reshape(C, three * nv)
    return RecordsFlat(rows=rows, times=rec.times)


def _polintd_coefs(times, t):
    t0, t1, t2 = times[0], times[1], times[2]
    l0 = (t - t1) * (t - t2) / ((t0 - t1) * (t0 - t2))
    l1 = (t - t0) * (t - t2) / ((t1 - t0) * (t1 - t2))
    l2 = (t - t0) * (t - t1) / ((t2 - t0) * (t2 - t1))
    return l0, l1, l2


def find_currents_records(grid: Grid, rft: RecordsFlat, x, y, z, t,
                          sigma: float, z0m: float):
    """Blend-then-fit currents straight from record rows (gather 4
    corners x 3 records in ONE row gather, polintd per corner, bilinear
    blend, vertical fit) — value-identical to find_currents_collapsed
    on the stage table at time t."""
    dtype = x.dtype
    us, ws = grid.us, grid.ws
    nv = n_value_lanes(us, ws)
    i, j, fx, fy = locate_rho_ij(grid, x, y)
    nx = grid.nx
    c00 = j.astype(jnp.int32) * nx + i.astype(jnp.int32)
    rows = rft.rows
    nt = rows.shape[-1] // 3          # record stride (nv [+ ws aks])
    r00 = rows[c00]
    r01 = rows[c00 + 1]
    r10 = rows[c00 + nx]
    r11 = rows[c00 + nx + 1]
    tdt = rft.times.dtype
    l0, l1, l2 = _polintd_coefs(rft.times, jnp.asarray(t, tdt))
    cd = rows.dtype
    l0 = jnp.asarray(l0, cd)
    l1 = jnp.asarray(l1, cd)
    l2 = jnp.asarray(l2, cd)

    def collapse(r):
        return r[:, :nt] * l0 + r[:, nt:2 * nt] * l1 + r[:, 2 * nt:] * l2

    v00 = collapse(r00)
    v01 = collapse(r01)
    v10 = collapse(r10)
    v11 = collapse(r11)
    fxd = fx.astype(cd)[:, None]
    fyd = fy.astype(cd)[:, None]
    blended = ((v00 * (1 - fxd) + v01 * fxd) * (1 - fyd)
               + (v10 * (1 - fxd) + v11 * fxd) * fyd)        # (N, nv)
    zeta_p = blended[:, nv - 2]
    h_p = blended[:, nv - 1]
    u, v, w, z_r0 = _fit_eval_profile(
        grid, blended[:, 0:us], blended[:, us:2 * us],
        blended[:, 2 * us:2 * us + ws], zeta_p, h_p,
        z.astype(blended.dtype), sigma)
    z0m = jnp.asarray(z0m, dtype)
    u = u.astype(dtype)
    v = v.astype(dtype)
    w = w.astype(dtype)
    zab = z + h_p.astype(dtype)
    ztb = jnp.maximum(z_r0.astype(dtype) + h_p.astype(dtype), 2.0 * z0m)
    decay = jnp.log(jnp.maximum(zab, z0m) / z0m) / jnp.log(ztb / z0m)
    factor = jnp.where(zab < ztb, jnp.clip(decay, 0.0, 1.0), 1.0)
    return u * factor, v * factor, w, zeta_p.astype(dtype), h_p.astype(dtype)


def rk4_displacement_records(grid: Grid, rft: RecordsFlat, x, y, z, t,
                             sigma: float, z0m: float, idt: float):
    """RK4 from record rows (table-free collapsed scheme)."""
    dt = jnp.asarray(idt, x.dtype)
    half = 0.5 * dt
    tdt = rft.times.dtype
    tt = jnp.asarray(t, tdt)
    t2 = tt + jnp.asarray(0.5 * idt, tdt)
    t4 = tt + jnp.asarray(idt, tdt)
    u1, v1, w1, _, _ = find_currents_records(grid, rft, x, y, z, tt,
                                             sigma, z0m)
    u2, v2, w2, _, _ = find_currents_records(
        grid, rft, x + u1 * half, y + v1 * half, z + w1 * half, t2,
        sigma, z0m)
    u3, v3, w3, _, _ = find_currents_records(
        grid, rft, x + u2 * half, y + v2 * half, z + w2 * half, t2,
        sigma, z0m)
    u4, v4, w4, _, _ = find_currents_records(
        grid, rft, x + u3 * dt, y + v3 * dt, z + w3 * dt, t4, sigma, z0m)
    sixth = dt / 6.0
    return (sixth * (u1 + 2 * u2 + 2 * u3 + u4),
            sixth * (v1 + 2 * v2 + 2 * v3 + v4),
            sixth * (w1 + 2 * w2 + 2 * w3 + w4))


def zeta_h_records(grid: Grid, rft: RecordsFlat, x, y, t):
    """Free surface + bathymetry at particles from record rows."""
    dtype = x.dtype
    us, ws = grid.us, grid.ws
    nv = n_value_lanes(us, ws)
    i, j, fx, fy = locate_rho_ij(grid, x, y)
    nx = grid.nx
    c00 = j.astype(jnp.int32) * nx + i.astype(jnp.int32)
    rows = rft.rows
    nt = rows.shape[-1] // 3
    tdt = rft.times.dtype
    l0, l1, l2 = _polintd_coefs(rft.times, jnp.asarray(t, tdt))
    cd = rows.dtype
    l0 = jnp.asarray(l0, cd)
    l1 = jnp.asarray(l1, cd)
    l2 = jnp.asarray(l2, cd)

    def zh(r):
        zc = (r[:, nv - 2] * l0 + r[:, nt + nv - 2] * l1
              + r[:, 2 * nt + nv - 2] * l2)
        hc_ = (r[:, nv - 1] * l0 + r[:, nt + nv - 1] * l1
               + r[:, 2 * nt + nv - 1] * l2)
        return zc, hc_

    z00, h00 = zh(rows[c00])
    z01, h01 = zh(rows[c00 + 1])
    z10, h10 = zh(rows[c00 + nx])
    z11, h11 = zh(rows[c00 + nx + 1])
    fxd = fx.astype(cd)
    fyd = fy.astype(cd)
    zeta_p = ((z00 * (1 - fxd) + z01 * fxd) * (1 - fyd)
              + (z10 * (1 - fxd) + z11 * fxd) * fyd)
    h_p = ((h00 * (1 - fxd) + h01 * fxd) * (1 - fyd)
           + (h10 * (1 - fxd) + h11 * fxd) * fyd)
    return zeta_p.astype(dtype), h_p.astype(dtype)


def build_record_tables(grid: Grid, rec: PackedRecords,
                        paired: bool = False) -> jax.Array:
    """(3, Ny, Nx, HL) f32 raw record value tables for the external-step
    kernel (ltjax.kernels.ext_step) — no time collapse (the kernel
    collapses its VMEM windows per stage), lanes padded to a
    128-multiple (window-DMA minor-dim tiling requirement).

    ``paired``: row (j, i) carries [cell (j,i) lanes | cell (j,i+1)
    lanes] (the east x-corner; the last column pairs with itself).
    This feeds the "pair2" blend scheme (ltjax.kernels.gather_interp):
    the one-hot matmul then selects/fy-blends ROWS only and delivers
    BOTH x-corners per pass — for us=20 the 63 value lanes were padded
    to a 128-lane MXU output tile anyway, so the east corner rides in
    otherwise-wasted M columns.
    """
    tab = rec.tab.astype(jnp.float32)                 # (3, C, ntot)
    three, C, L = tab.shape
    if paired:
        t3 = tab.reshape(three, grid.ny, grid.nx, L)
        east = jnp.concatenate([t3[:, :, 1:], t3[:, :, -1:]], axis=2)
        tab = jnp.concatenate([t3, east], axis=-1).reshape(three, C, 2 * L)
        L = 2 * L
    HL = ((L + 127) // 128) * 128
    pad = jnp.zeros((three, C, HL - L), jnp.float32)
    return jnp.concatenate([tab, pad], axis=-1).reshape(
        three, grid.ny, grid.nx, HL)


def build_record_tables_split(grid: Grid, rec: PackedRecords):
    """(main, aux) paired record tables for the AUX-SPLIT megakernel.

    Packing the Aks / salt / temp lanes INTO the main record tables
    pushes the paired row width past 128 lanes (e.g. 2*(63+21) = 168
    -> HL 256 for Aks alone), which forces 8-aligned window DMA
    origins, a 16x16 window, and ~3x the blend MXU flops — the
    measured 0.50x turb / 0.45x salt vs-advect tax (BASELINE.md).  The
    consumers only need these PROFILES once or twice per internal step
    (Visser + the salinity cue at the stage-1 position; SaltTempOn
    sampling at the post-step column), so the kernel gathers them from
    a SEPARATE paired table with one small pair_dot per use — and the
    main tables stay at HL 128 (16x8 window, 1x blend).  Even Aks AND
    salt+temp together fit one aux table: (21 + 40) paired = 122
    lanes.
    """
    nv = n_value_lanes(grid.us, grid.ws)
    assert rec.with_aks or rec.with_scalars
    main = PackedRecords(tab=rec.tab[..., :nv], times=rec.times)
    aux = PackedRecords(tab=rec.tab[..., nv:], times=rec.times)
    return (build_record_tables(grid, main, paired=True),
            build_record_tables(grid, aux, paired=True))


def stage_value_tables(grid: Grid, rec: PackedRecords, t, idt: float):
    """The 3 RK4 stage values tables for the kernel path."""
    tdt = rec.times.dtype
    tt = jnp.asarray(t, tdt)
    return (collapse_stage_values(grid, rec, tt),
            collapse_stage_values(grid, rec,
                                  tt + jnp.asarray(0.5 * idt, tdt)),
            collapse_stage_values(grid, rec, tt + jnp.asarray(idt, tdt)))


class ValueTablesAll(NamedTuple):
    """ALL stage-value tables of one external step, stacked.

    Stage times are t0 + (idt/2)*k for k = 0 .. 2*n_int (consecutive
    internal steps share their boundary time, so S = 2*n_int + 1
    distinct tables instead of 3*n_int).  Built ONCE per external step
    so the megakernel's exact-recompute patch does NO grid-sized work
    inside its internal-step scan — the per-step table builds were
    ~2/3 of the patch cost (measured 52.6 -> ~25 ms per external step
    at 1M particles / cap 15.6k).
    """
    full: jax.Array      # (S, Ny, Nx, HL)
    zh_rows: jax.Array   # (S, Ny*Nx, 8)
    t0: jax.Array
    idt: float


def stage_value_tables_all(grid: Grid, rec: PackedRecords, t0,
                           idt: float, n_int: int) -> ValueTablesAll:
    """Stack collapse_stage_values over every stage time of the
    external step (one fused linear-combination pass over the records;
    the downstream per-step consumers dynamic-slice three tables)."""
    S = 2 * n_int + 1
    tdt = rec.times.dtype
    ts = (jnp.asarray(t0, tdt)
          + jnp.arange(S, dtype=tdt) * jnp.asarray(0.5 * idt, tdt))
    tt = rec.times
    t0r, t1r, t2r = tt[0], tt[1], tt[2]
    l0 = (ts - t1r) * (ts - t2r) / ((t0r - t1r) * (t0r - t2r))
    l1 = (ts - t0r) * (ts - t2r) / ((t1r - t0r) * (t1r - t2r))
    l2 = (ts - t0r) * (ts - t1r) / ((t2r - t0r) * (t2r - t1r))
    coef = jnp.stack([l0, l1, l2], axis=-1).astype(rec.tab.dtype)  # (S,3)
    vals = jnp.einsum("sr,rcl->scl", coef, rec.tab)      # (S, C, ntot)
    us, ws = grid.us, grid.ws
    nv = n_value_lanes(us, ws)
    ntot = vals.shape[-1]
    HL = ((ntot + 127) // 128) * 128
    C = vals.shape[1]
    vals = jnp.concatenate(
        [vals, jnp.zeros((S, C, HL - ntot), vals.dtype)], axis=-1)
    zeta = vals[:, :, nv - 2]
    h = vals[:, :, nv - 1]
    zh = jnp.stack([zeta, h, jnp.zeros_like(zeta), jnp.zeros_like(zeta)],
                   axis=-1)                                 # (S, C, 4)
    zh_rows = jnp.concatenate([zh, jnp.roll(zh, -1, axis=1)], axis=-1)
    return ValueTablesAll(
        full=vals.reshape(S, grid.ny, grid.nx, HL), zh_rows=zh_rows,
        t0=jnp.asarray(t0, tdt), idt=float(idt))


def slice_stage_tables(vt_all: ValueTablesAll, i):
    """The (t1, t2, t4) ValueTables of internal step ``i`` (traced ok:
    dynamic slices of the stacked tables — ~60 MB/step of copies vs
    the ~1 ms/step rebuild they replace)."""
    k0 = 2 * jnp.asarray(i, jnp.int32)

    def tab(k):
        full = jax.lax.dynamic_index_in_dim(vt_all.full, k0 + k, 0,
                                            keepdims=False)
        zh = jax.lax.dynamic_index_in_dim(vt_all.zh_rows, k0 + k, 0,
                                          keepdims=False)
        t = vt_all.t0 + (k0 + k).astype(vt_all.t0.dtype) * jnp.asarray(
            0.5 * vt_all.idt, vt_all.t0.dtype)
        return ValueTable(full=full, zh_rows=zh, t=t)

    return tab(0), tab(1), tab(2)


def _find_currents_rows(grid: Grid, flat, base, x, y, z, sigma: float,
                        z0m: float):
    """find_currents_collapsed gathering from a flat (M, HL) row array
    at row offset ``base`` (a traced scalar) — lets per-internal-step
    consumers index the per-ext-step STACKED tables directly instead of
    dynamic-slicing three ~20 MB tables per step (~60 MB/step of pure
    copies, several ms/ext at 1M; the direct gathers cost the same row
    rate either way)."""
    dtype = x.dtype
    us, ws = grid.us, grid.ws
    nv = n_value_lanes(us, ws)
    i, j, fx, fy = locate_rho_ij(grid, x, y)
    nx = grid.nx
    c00 = base + j.astype(jnp.int32) * nx + i.astype(jnp.int32)
    r00 = flat[c00]
    r01 = flat[c00 + 1]
    r10 = flat[c00 + nx]
    r11 = flat[c00 + nx + 1]
    fxd = fx.astype(flat.dtype)[:, None]
    fyd = fy.astype(flat.dtype)[:, None]
    blended = ((r00 * (1 - fxd) + r01 * fxd) * (1 - fyd)
               + (r10 * (1 - fxd) + r11 * fxd) * fyd)      # (N, HL)
    zeta_p = blended[:, nv - 2]
    h_p = blended[:, nv - 1]
    u, v, w, z_r0 = _fit_eval_profile(
        grid, blended[:, 0:us], blended[:, us:2 * us],
        blended[:, 2 * us:2 * us + ws], zeta_p, h_p, z.astype(blended.dtype),
        sigma)
    z0m = jnp.asarray(z0m, dtype)
    u = u.astype(dtype)
    v = v.astype(dtype)
    w = w.astype(dtype)
    zab = z + h_p.astype(dtype)
    ztb = jnp.maximum(z_r0.astype(dtype) + h_p.astype(dtype), 2.0 * z0m)
    decay = jnp.log(jnp.maximum(zab, z0m) / z0m) / jnp.log(ztb / z0m)
    factor = jnp.where(zab < ztb, jnp.clip(decay, 0.0, 1.0), 1.0)
    return u * factor, v * factor, w


def zeta_h_all(grid: Grid, vt_all: ValueTablesAll, k, x, y):
    """zeta/h at particles from stage table ``k`` of the stacked
    per-ext-step tables (flat-index gather, no slicing)."""
    dtype = x.dtype
    i, j, fx, fy = locate_rho_ij(grid, x, y)
    nx = grid.nx
    C = vt_all.zh_rows.shape[1]
    flat = vt_all.zh_rows.reshape(-1, vt_all.zh_rows.shape[-1])
    c00 = k * C + j.astype(jnp.int32) * nx + i.astype(jnp.int32)
    r0 = flat[c00]
    r1 = flat[c00 + nx]
    cells = jnp.stack([r0, r1], axis=1).reshape(x.shape[0], 2, 2, 4)
    zeta_p = _blend(cells[..., 0], fx, fy).astype(dtype)
    h_p = _blend(cells[..., 1], fx, fy).astype(dtype)
    return zeta_p, h_p


def find_currents_all(grid: Grid, vt_all: ValueTablesAll, k, x, y, z,
                      sigma: float, z0m: float):
    """find_currents_collapsed on stage table ``k`` of the stack."""
    S, ny, nx, HL = vt_all.full.shape
    flat = vt_all.full.reshape(S * ny * nx, HL)
    return _find_currents_rows(grid, flat, k * ny * nx, x, y, z, sigma,
                               z0m)


def rk4_displacement_collapsed_all(grid: Grid, vt_all: ValueTablesAll,
                                   i, x, y, z, sigma: float, z0m: float,
                                   idt: float):
    """rk4_displacement_collapsed for internal step ``i`` gathering
    straight from the stacked tables (stages 2i, 2i+1, 2i+1, 2i+2)."""
    S, ny, nx, HL = vt_all.full.shape
    flat = vt_all.full.reshape(S * ny * nx, HL)
    C = ny * nx
    k0 = 2 * jnp.asarray(i, jnp.int32)
    dt = jnp.asarray(idt, x.dtype)
    half = 0.5 * dt

    def fc(k, xx, yy, zz):
        return _find_currents_rows(grid, flat, k * C, xx, yy, zz, sigma,
                                   z0m)

    u1, v1, w1 = fc(k0, x, y, z)
    u2, v2, w2 = fc(k0 + 1, x + u1 * half, y + v1 * half, z + w1 * half)
    u3, v3, w3 = fc(k0 + 1, x + u2 * half, y + v2 * half, z + w2 * half)
    u4, v4, w4 = fc(k0 + 2, x + u3 * dt, y + v3 * dt, z + w3 * dt)
    sixth = dt / 6.0
    return (sixth * (u1 + 2 * u2 + 2 * u3 + u4),
            sixth * (v1 + 2 * v2 + 2 * v3 + v4),
            sixth * (w1 + 2 * w2 + 2 * w3 + w4))


def stage_tables(grid: Grid, rec: PackedRecords, t, idt: float,
                 sigma: float):
    """The 3 RK4 stage tables for an internal step starting at t."""
    tdt = rec.times.dtype
    tt = jnp.asarray(t, tdt)
    return (collapse_stage(grid, rec, tt, sigma),
            collapse_stage(grid, rec, tt + jnp.asarray(0.5 * idt, tdt),
                           sigma),
            collapse_stage(grid, rec, tt + jnp.asarray(idt, tdt), sigma))
