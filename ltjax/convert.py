"""Lon/lat <-> internal meter coordinates.

Reference: ``conversion_module.f90`` (lon2x/lat2y/x2lon/y2lat [conf: M],
SURVEY.md SS2.1 #14): an equirectangular projection about a reference
point (``lonmin``, ``latmin``) on a sphere of radius ``Earth_Radius``,
with a planar (identity-scale) fallback when ``SphericalProjection`` is
off.  All functions are elementwise and dtype-preserving, usable under
``jit`` on device or with numpy arrays on host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _xp(a):
    return jnp if isinstance(a, jnp.ndarray) else np


def lon2x(lon, lat, lonmin, latmin, radius=6378e3, spherical=True):
    xp = _xp(lon)
    if not spherical:
        return lon - lonmin
    d2r = np.pi / 180.0
    # cosine at the *particle* latitude (local scale), as in the reference
    return radius * d2r * (lon - lonmin) * xp.cos(d2r * lat)


def lat2y(lat, latmin, radius=6378e3, spherical=True):
    if not spherical:
        return lat - latmin
    d2r = np.pi / 180.0
    return radius * d2r * (lat - latmin)


def x2lon(x, y, lonmin, latmin, radius=6378e3, spherical=True):
    xp = _xp(x)
    if not spherical:
        return x + lonmin
    d2r = np.pi / 180.0
    lat = y2lat(y, latmin, radius, spherical)
    return lonmin + x / (radius * d2r * xp.cos(d2r * lat))


def y2lat(y, latmin, radius=6378e3, spherical=True):
    if not spherical:
        return y + latmin
    d2r = np.pi / 180.0
    return latmin + y / (radius * d2r)
