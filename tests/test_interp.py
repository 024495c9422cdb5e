"""Bilinear / time interpolation unit tests vs. independent oracles."""

import numpy as np
import jax.numpy as jnp

from ltjax import interp
from ltjax.grid import locate


def test_locate_uniform():
    coords = jnp.linspace(0.0, 10.0, 11)
    x = jnp.asarray([0.0, 0.5, 3.7, 9.99, 10.0, -1.0, 11.0])
    i, f = locate(coords, x)
    np.testing.assert_array_equal(np.asarray(i), [0, 0, 3, 9, 9, 0, 9])
    np.testing.assert_allclose(np.asarray(f), [0, 0.5, 0.7, 0.99, 1.0, 0.0, 1.0],
                               atol=1e-12)


def test_locate_nonuniform():
    coords = jnp.asarray([0.0, 1.0, 4.0, 5.0, 10.0])
    x = jnp.asarray([2.5, 4.5, 7.5])
    i, f = locate(coords, x)
    np.testing.assert_array_equal(np.asarray(i), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(f), [0.5, 0.5, 0.5], atol=1e-12)


def test_interp2d_vs_scipy():
    from scipy.interpolate import RegularGridInterpolator

    rng = np.random.default_rng(0)
    ny, nx = 12, 15
    xc = np.sort(rng.uniform(0, 100, nx))
    yc = np.sort(rng.uniform(0, 80, ny))
    field = rng.normal(size=(ny, nx))
    rgi = RegularGridInterpolator((yc, xc), field)
    n = 50
    xs = rng.uniform(xc[0], xc[-1], n)
    ys = rng.uniform(yc[0], yc[-1], n)
    i, fx = locate(jnp.asarray(xc), jnp.asarray(xs))
    j, fy = locate(jnp.asarray(yc), jnp.asarray(ys))
    got = interp.interp2d(jnp.asarray(field), i, j, fx, fy)
    want = rgi(np.stack([ys, xs], -1))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_interp_columns_matches_per_level():
    rng = np.random.default_rng(1)
    K, ny, nx = 7, 9, 11
    xc = np.linspace(0, 10, nx)
    yc = np.linspace(0, 10, ny)
    field = rng.normal(size=(3, K, ny, nx))  # 3 time levels (ROMS layout)
    field_klast = np.moveaxis(field, 1, -1)  # engine storage layout
    xs = rng.uniform(0, 10, 20)
    ys = rng.uniform(0, 10, 20)
    i, fx = locate(jnp.asarray(xc), jnp.asarray(xs))
    j, fy = locate(jnp.asarray(yc), jnp.asarray(ys))
    prof = interp.interp_columns(jnp.asarray(field_klast), i, j, fx, fy)
    assert prof.shape == (3, 20, K)
    for k in range(K):
        lvl = interp.interp2d(jnp.asarray(field[:, k]), i, j, fx, fy)
        np.testing.assert_allclose(np.asarray(prof[..., k]), np.asarray(lvl),
                                   rtol=1e-13)


def test_polintd_vs_polyfit():
    rng = np.random.default_rng(2)
    times = np.array([0.0, 3600.0, 7200.0])
    f = rng.normal(size=(3, 5))
    ts = np.linspace(0, 7200, 13)
    for t in ts:
        got = interp.polintd(jnp.asarray(f), jnp.asarray(times), t)
        for col in range(5):
            co = np.polyfit(times, f[:, col], 2)
            want = np.polyval(co, t)
            np.testing.assert_allclose(np.asarray(got[col]), want,
                                       rtol=1e-9, atol=1e-10)


def test_polintd_exact_on_quadratic():
    times = np.array([10.0, 20.0, 30.0])
    a, b, c = 0.3, -1.2, 5.0
    f = (a * times ** 2 + b * times + c)[:, None]
    for t in [12.3, 25.0, 30.0]:
        got = interp.polintd(jnp.asarray(f), jnp.asarray(times), t)
        np.testing.assert_allclose(np.asarray(got)[0], a * t * t + b * t + c,
                                   rtol=1e-12)
