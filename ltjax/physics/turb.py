"""Horizontal and vertical turbulence operators.

Reference:
  * ``HTurb`` (hor_turb_module.f90, SURVEY.md SS2.1 #6 [conf: H]):
    random-walk displacement = N(0,1) * sqrt(2*ConstantHTurb*idt) per
    horizontal axis, constant diffusivity.
  * ``VTurb`` (ver_turb_module.f90, SS2.1 #7 [conf: H algorithm]):
    Visser (1997) random-displacement model on the ROMS vertical
    diffusivity profile Aks(z): horizontally interpolate Aks at the 3
    time records, interpolate in time (polintd), fit the tension
    spline, then

        dz = K'(z)*dt + R * sqrt(2 K(z + K'(z) dt/2) dt / r)

    with R ~ uniform[-1,1], r = Var(R) = 1/3.  The derivative term and
    midpoint evaluation make a nonuniform-K profile satisfy the
    well-mixed condition (the unit test for this operator).

Both return displacement vectors; reflection at the surface/bottom and
coastline happens downstream in the step assembly, matching the
reference's operator order (SURVEY.md SS3.2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import rng, tension
from ..fields import FieldSet
from ..grid import Grid
from ..interp import interp2d, interp_columns, locate_rho, polintd
from ..scoord import s_depths


class TurbParams(NamedTuple):
    ConstantHTurb: float = 0.0
    ConstantVTurb: float = 0.0
    use_aks: bool = True      # spline the ROMS Aks profile (readAks)
    sigma: float = 0.0        # spline tension for the K(z) profile
    idt: float = 120.0


def hturb(base_key, step, pids, idt, constant_hturb, dtype):
    """(dx, dy) horizontal random-walk displacements."""
    r = rng.normal(base_key, step, rng.HTURB, pids, (2,), dtype)
    scale = jnp.sqrt(2.0 * constant_hturb * idt).astype(dtype)
    return r[:, 0] * scale, r[:, 1] * scale


def vturb(grid: Grid, fields: FieldSet, base_key, step, pids, x, y, z, t,
          params: TurbParams):
    """dz vertical random-displacement (Visser RDM)."""
    dtype = x.dtype
    idt = jnp.asarray(params.idt, dtype)
    R = rng.uniform(base_key, step, rng.VTURB, pids, (),
                    minval=-1.0, maxval=1.0, dtype=dtype)
    r_var = 1.0 / 3.0

    if not params.use_aks:
        K = jnp.asarray(params.ConstantVTurb, dtype)
        return R * jnp.sqrt(2.0 * K * idt / r_var)

    ir, jr_, fxr, fyr = locate_rho(grid, x, y)
    fd = fields.aks.dtype
    aks_prof = interp_columns(fields.aks, ir, jr_, fxr.astype(fd),
                              fyr.astype(fd)).astype(dtype)       # (3,N,ws)
    zeta_l = interp2d(fields.zeta, ir, jr_, fxr.astype(fd),
                      fyr.astype(fd)).astype(dtype)               # (3,N)
    h_p = interp2d(grid.h, ir, jr_, fxr.astype(grid.h.dtype),
                   fyr.astype(grid.h.dtype)).astype(dtype)        # (N,)

    times = fields.times.astype(dtype)
    tt = jnp.asarray(t, dtype)
    prof_t = polintd(aks_prof, times, tt)                         # (N,ws)
    zeta_t = polintd(zeta_l, times, tt)                           # (N,)
    z_w = s_depths(zeta_t, h_p, grid.s_w.astype(dtype),
                   grid.Cs_w.astype(dtype), grid.hc, grid.vtransform)  # (N,ws)

    # Aks must be non-negative; clip before the spline, and clip the
    # spline output too (tension splines can undershoot slightly).
    prof_t = jnp.maximum(prof_t, 0.0)
    sig = jnp.asarray(params.sigma, dtype)
    z2 = tension.fit(z_w, prof_t, sig)
    sigb = jnp.broadcast_to(sig, z_w[..., :-1].shape)
    kprime = tension.evaluate_deriv(z_w, prof_t, z2, sigb, z)
    z_mid = jnp.clip(z + 0.5 * kprime * idt, z_w[..., 0], z_w[..., -1])
    k_mid = jnp.maximum(
        tension.evaluate(z_w, prof_t, z2, sigb, z_mid), 0.0)
    return kprime * idt + R * jnp.sqrt(2.0 * k_mid * idt / r_var)
