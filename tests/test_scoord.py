"""s-coordinate depth tests (both Vtransforms)."""

import numpy as np
import jax.numpy as jnp

from ltjax.scoord import s_depths
from ltjax.grid import uniform_sigma_levels


def test_vt1_surface_and_bottom():
    s_rho, s_w = uniform_sigma_levels(10)
    h = jnp.asarray([50.0, 100.0])
    zeta = jnp.asarray([0.5, -0.3])
    z_w = s_depths(zeta, h, jnp.asarray(s_w), jnp.asarray(s_w), 10.0, 1)
    # top w-level == zeta; bottom w-level == -h
    np.testing.assert_allclose(np.asarray(z_w[:, -1]), np.asarray(zeta),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(z_w[:, 0]), -np.asarray(h),
                               atol=1e-12)


def test_vt2_surface_and_bottom():
    s_rho, s_w = uniform_sigma_levels(10)
    h = jnp.asarray([50.0, 100.0])
    zeta = jnp.asarray([0.5, -0.3])
    z_w = s_depths(zeta, h, jnp.asarray(s_w), jnp.asarray(s_w), 10.0, 2)
    np.testing.assert_allclose(np.asarray(z_w[:, -1]), np.asarray(zeta),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(z_w[:, 0]), -np.asarray(h),
                               atol=1e-12)


def test_vt1_hc_eq_h_is_linear():
    # with hc == h and Cs = s, Vtransform-1 gives z = h*s + zeta*(1+s)
    s_rho, s_w = uniform_sigma_levels(8)
    h = jnp.asarray([30.0])
    zeta = jnp.asarray([0.0])
    z_r = s_depths(zeta, h, jnp.asarray(s_rho), jnp.asarray(s_rho), 30.0, 1)
    np.testing.assert_allclose(np.asarray(z_r[0]), 30.0 * s_rho, atol=1e-12)


def test_monotone_in_k():
    s_rho, s_w = uniform_sigma_levels(20)
    h = jnp.asarray([5.0, 500.0, 4000.0])
    zeta = jnp.asarray([0.2, 0.0, -0.4])
    for vt in (1, 2):
        z = s_depths(zeta, h, jnp.asarray(s_w), jnp.asarray(s_w), 5.0, vt)
        assert np.all(np.diff(np.asarray(z), axis=-1) > 0)
