"""Particle state: structure-of-arrays pytree.

Reference: the driver's per-particle scalar arrays + status bookkeeping
spread across LTRANS.f90 / behavior_module.f90 (SURVEY.md SS3.2).  Here
the full prognostic state is one NamedTuple of device arrays, sharded
over the mesh; every physics operator is ``(state, fields) -> state``
with masked (branchless) control flow.

Status lattice (reference 'color' codes [conf: M on exact values]):
  0 NOT_RELEASED  — before date of birth
  1 ACTIVE        — in the water column
  2 SETTLED       — frozen in a habitat polygon
  3 DEAD          — mortality (behavior module)
  4 OUT_OF_DOMAIN — exited through an open boundary
  5 ERROR         — interpolation/location failure (ErrorFlag policy)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NOT_RELEASED = 0
ACTIVE = 1
SETTLED = 2
DEAD = 3
OUT_OF_DOMAIN = 4
ERROR = 5


class Particles(NamedTuple):
    x: jax.Array            # (N,) internal meters (east)
    y: jax.Array            # (N,) internal meters (north)
    z: jax.Array            # (N,) meters, negative below surface
    dob: jax.Array          # (N,) release time [s since run start]
    age: jax.Array          # (N,) seconds since release
    status: jax.Array       # (N,) int32 status lattice above
    pid: jax.Array          # (N,) int32 global particle id (RNG stream id)
    settle_poly: jax.Array  # (N,) int32 polygon id if settled, else -1
    hit_land: jax.Array     # (N,) int32 collision counters (TrackCollisions)
    hit_bottom: jax.Array   # (N,) int32
    salt: jax.Array         # (N,) sampled salinity (SaltTempOn)
    temp: jax.Array         # (N,) sampled temperature

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def active_mask(self):
        return self.status == ACTIVE


def init_particles(x, y, z, dob=None, dtype=jnp.float64) -> Particles:
    x = jnp.asarray(x, dtype)
    n = x.shape[0]
    zeros = jnp.zeros(n, dtype)
    if dob is None:
        dob = zeros
    return Particles(
        x=x,
        y=jnp.asarray(y, dtype),
        z=jnp.asarray(z, dtype),
        dob=jnp.asarray(dob, dtype),
        age=zeros,
        status=jnp.full(n, NOT_RELEASED, jnp.int32),
        pid=jnp.arange(n, dtype=jnp.int32),
        settle_poly=jnp.full(n, -1, jnp.int32),
        hit_land=jnp.zeros(n, jnp.int32),
        hit_bottom=jnp.zeros(n, jnp.int32),
        salt=zeros,
        temp=zeros,
    )


def read_parfile(path: str) -> np.ndarray:
    """Read the reference's initial-particle CSV.

    ``parfile`` rows are (lon, lat, depth, date-of-birth-seconds) per
    particle (LTRANS.f90 ini_LTRANS [conf: H], SURVEY.md SS3.1).
    Returns an (N, 4) float64 array.
    """
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = [p for p in line.replace(",", " ").split() if p]
            rows.append([float(p) for p in parts[:4]])
    arr = np.asarray(rows, np.float64)
    if arr.shape[1] < 4:
        arr = np.pad(arr, ((0, 0), (0, 4 - arr.shape[1])))
    return arr
