"""Arakawa-C grid container and structured cell location.

Reference: ``initGrid`` in hydrodynamic_module.f90 builds node arrays
for the rho/u/v grids, forms quad elements, and searches for the
element containing each particle (``setEle``/``gridcell()``,
SURVEY.md SS2.1 #3/#4).  ROMS grids are *structured*, so the TPU-native
design replaces element search entirely with index arithmetic
(SURVEY.md SS7.1): cell location is a searchsorted (or a multiply for
uniform grids) on the 1D coordinate axes — O(log n) with zero
divergence, vmap-free and fully batched.

v1 supports rectilinear grids (1D x/y coordinate axes, the common ROMS
idealized/estuary configuration and all bundled test cases); the grid
stores projected meter coordinates.  Curvilinear support would add a
Newton inverse-bilinear refinement on top of the same API.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Grid(NamedTuple):
    """Static grid data (a pytree of arrays; axes are (eta, xi)=(y, x)).

    ``uniform`` (static bool) marks exactly-uniform coordinate axes; the
    cell locate then becomes index arithmetic (one multiply) instead of
    a searchsorted — searchsorted lowers to a serialized binary-search
    loop on TPU and dominated the profile before this fast path.
    """

    x_rho: jax.Array       # (Nx,)  xi-axis rho-point coords [m]
    y_rho: jax.Array       # (Ny,)
    x_u: jax.Array         # (Nx-1,) u points: between rho points in x
    y_v: jax.Array         # (Ny-1,) v points: between rho points in y
    h: jax.Array           # (Ny, Nx) bathymetry (positive depth) at rho
    mask_rho: jax.Array    # (Ny, Nx) 1=water 0=land
    mask_u: jax.Array      # (Ny, Nx-1)
    mask_v: jax.Array      # (Ny-1, Nx)
    s_rho: jax.Array       # (us,)
    Cs_r: jax.Array        # (us,)
    s_w: jax.Array         # (ws,)
    Cs_w: jax.Array        # (ws,)
    hc: jax.Array          # scalar
    vtransform: int        # static: 1 or 2
    uniform: bool = False  # static: all four axes exactly uniform

    @property
    def nx(self) -> int:
        return self.x_rho.shape[0]

    @property
    def ny(self) -> int:
        return self.y_rho.shape[0]

    @property
    def us(self) -> int:
        return self.s_rho.shape[0]

    @property
    def ws(self) -> int:
        return self.s_w.shape[0]


# Register vtransform as static-friendly: it is a plain int in a NamedTuple,
# which JAX treats as a leaf; keep it an int (weak-typed scalar) — jit will
# retrace if it changes, which is correct behavior.


def _is_uniform(ax: np.ndarray, rtol: float = 1e-9) -> bool:
    d = np.diff(np.asarray(ax, np.float64))
    if d.size == 0:
        return True
    d0 = float(np.mean(d))
    return bool(np.all(np.abs(d - d0) <= rtol * max(abs(d0), 1.0)))


def make_grid(x_rho, y_rho, h, mask_rho, s_rho, Cs_r, s_w, Cs_w, hc,
              vtransform=1, dtype=jnp.float64, uniform=None) -> Grid:
    """Build a Grid from rho-point axes + bathymetry (+s-coord data).

    uniform=None auto-detects exactly-uniform coordinate axes (host
    side, once) to enable the arithmetic locate fast path.
    """
    if uniform is None:
        uniform = _is_uniform(np.asarray(x_rho)) and _is_uniform(
            np.asarray(y_rho))
    x_rho = jnp.asarray(x_rho, dtype)
    y_rho = jnp.asarray(y_rho, dtype)
    h = jnp.asarray(h, dtype)
    mask_rho = jnp.asarray(mask_rho, jnp.int32)
    x_u = 0.5 * (x_rho[1:] + x_rho[:-1])
    y_v = 0.5 * (y_rho[1:] + y_rho[:-1])
    mask_u = mask_rho[:, 1:] * mask_rho[:, :-1]
    mask_v = mask_rho[1:, :] * mask_rho[:-1, :]
    return Grid(
        x_rho=x_rho, y_rho=y_rho, x_u=x_u, y_v=y_v, h=h,
        mask_rho=mask_rho, mask_u=mask_u, mask_v=mask_v,
        s_rho=jnp.asarray(s_rho, dtype), Cs_r=jnp.asarray(Cs_r, dtype),
        s_w=jnp.asarray(s_w, dtype), Cs_w=jnp.asarray(Cs_w, dtype),
        hc=jnp.asarray(hc, dtype), vtransform=int(vtransform),
        uniform=bool(uniform),
    )


def locate(coords: jax.Array, x: jax.Array, uniform: bool = False):
    """Cell index + fractional coordinate along one axis.

    coords: (n,) strictly increasing node coordinates.
    x: (...,) query points.  Returns (i, f) with i in [0, n-2] and
    f = (x - coords[i]) / (coords[i+1] - coords[i]) clipped to [0, 1]
    (queries outside the axis clamp to the edge cells, matching the
    reference's treatment of particles at the domain rim [conf: M]).

    uniform=True (static) replaces the searchsorted with index
    arithmetic — searchsorted is a serialized binary-search loop on
    TPU, and this is the hot path's first op.
    """
    n = coords.shape[0]
    if uniform and n >= 2:
        c0 = coords[0]
        dx = coords[1] - coords[0]
        t = (x - c0) / dx
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
        f = jnp.clip(t - i.astype(t.dtype), 0.0, 1.0)
        return i, f
    i = jnp.clip(jnp.searchsorted(coords, x, side="right") - 1, 0, n - 2)
    c0 = coords[i]
    c1 = coords[i + 1]
    f = jnp.clip((x - c0) / (c1 - c0), 0.0, 1.0)
    return i.astype(jnp.int32), f


def song_haidvogel_cs(s, theta_s=0.0, theta_b=0.0):
    """Stretching curve C(s) (for building synthetic grids; ROMS files
    normally ship Cs_r/Cs_w directly)."""
    s = np.asarray(s, np.float64)
    if theta_s > 0:
        c = (1 - theta_b) * np.sinh(theta_s * s) / np.sinh(theta_s) + theta_b * (
            np.tanh(theta_s * (s + 0.5)) / (2 * np.tanh(0.5 * theta_s)) - 0.5
        )
    else:
        c = s
    return c


def uniform_sigma_levels(us: int):
    """Uniform s_rho / s_w in [-1, 0] (synthetic-dataset helper)."""
    ws = us + 1
    s_w = np.linspace(-1.0, 0.0, ws)
    s_rho = 0.5 * (s_w[1:] + s_w[:-1])
    return s_rho, s_w
