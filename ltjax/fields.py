"""Triple-buffered hydrodynamic field slabs (device side).

Reference: the back/center/forward time-record buffers filled by
``initHydro``/``updateHydro`` (hydrodynamic_module.f90, SURVEY.md SS3.3
[conf: H]).  Axis order is (time=3, [level], eta, xi); the record times
ride along as a (3,) array so the whole struct is one jit-able pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FieldSet(NamedTuple):
    zeta: jax.Array   # (3, Ny, Nx)
    u: jax.Array      # (3, us, Ny, Nx-1)
    v: jax.Array      # (3, us, Ny-1, Nx)
    w: jax.Array      # (3, ws, Ny, Nx)
    aks: jax.Array    # (3, ws, Ny, Nx)   vertical diffusivity at w-levels
    salt: jax.Array   # (3, us, Ny, Nx)  (zeros when SaltTempOn is off)
    temp: jax.Array   # (3, us, Ny, Nx)
    times: jax.Array  # (3,) record times [s since run start]


def make_fieldset(zeta, u, v, w, aks, times, salt=None, temp=None,
                  dtype=jnp.float32) -> FieldSet:
    zeta = jnp.asarray(zeta, dtype)
    u = jnp.asarray(u, dtype)
    w = jnp.asarray(w, dtype)
    # salt/temp live on the rho grid: (3, us, Ny, Nx)
    rho_shape = u.shape[:2] + w.shape[2:]
    if salt is None:
        salt = jnp.zeros(rho_shape, dtype)
    if temp is None:
        temp = jnp.zeros(rho_shape, dtype)
    return FieldSet(
        zeta=zeta,
        u=u,
        v=jnp.asarray(v, dtype),
        w=jnp.asarray(w, dtype),
        aks=jnp.asarray(aks, dtype),
        salt=jnp.asarray(salt, dtype),
        temp=jnp.asarray(temp, dtype),
        times=jnp.asarray(times, jnp.float64
                          if dtype == jnp.float64 else jnp.float32),
    )


def rotate(fs: FieldSet, zeta, u, v, w, aks, t_new, salt=None, temp=None
           ) -> FieldSet:
    """Shift b<-c, c<-f and install a new forward record (updateHydro)."""

    def shift(buf, new):
        return jnp.concatenate([buf[1:], new[None].astype(buf.dtype)], axis=0)

    return FieldSet(
        zeta=shift(fs.zeta, jnp.asarray(zeta)),
        u=shift(fs.u, jnp.asarray(u)),
        v=shift(fs.v, jnp.asarray(v)),
        w=shift(fs.w, jnp.asarray(w)),
        aks=shift(fs.aks, jnp.asarray(aks)),
        salt=(shift(fs.salt, jnp.asarray(salt)) if salt is not None
              else shift(fs.salt, fs.salt[2])),
        temp=(shift(fs.temp, jnp.asarray(temp)) if temp is not None
              else shift(fs.temp, fs.temp[2])),
        times=shift(fs.times, jnp.asarray(t_new)),
    )
