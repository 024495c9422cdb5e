"""ROMS s-coordinate depths (getSlevel/getWlevel analog).

Reference: ``hydrodynamic_module.f90`` ``getSlevel``/``getWlevel``
(SURVEY.md SS2.1 #3 [conf: H]): z of each s-level given free surface
``zeta`` and bathymetry ``h`` under the Song-Haidvogel stretching, for
both ROMS ``Vtransform`` conventions.  The stretching curves ``Cs``
and s values are inputs (read from the ROMS file), so any stretching
function the file was built with is honored.

All ops broadcast: ``s``/``Cs`` have shape (K,), ``zeta``/``h`` any
shape B; result (B..., K).  Pure jnp; jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def s_depths(zeta, h, s, Cs, hc, vtransform: int):
    """z of s-levels (negative below surface).

    Vtransform=1:  z0 = hc*s + (h-hc)*Cs ;  z = z0 + zeta*(1 + z0/h)
    Vtransform=2:  z0 = (hc*s + h*Cs)/(hc+h) ;  z = zeta + (zeta+h)*z0
    """
    zeta = jnp.asarray(zeta)[..., None]
    h = jnp.asarray(h)[..., None]
    s = jnp.asarray(s)
    Cs = jnp.asarray(Cs)
    if vtransform == 1:
        z0 = hc * s + (h - hc) * Cs
        return z0 + zeta * (1.0 + z0 / h)
    elif vtransform == 2:
        z0 = (hc * s + h * Cs) / (hc + h)
        return zeta + (zeta + h) * z0
    raise ValueError(f"Vtransform must be 1 or 2, got {vtransform}")
