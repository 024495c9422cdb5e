"""Packed-table fast interpolation path vs the native path.

The packed path (ltjax.packed) reorders exact-commuting operations
(time interpolation first) and uses per-column splines; on fields that
are linear in x, y (solid-body rotation) and with vertically-resolved
profiles both schemes agree to round-off with the native path
(ltjax.physics.advect), so the golden analytic cases pin both.
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from ltjax import packed as pk
from ltjax import synth
from ltjax import state as st
from ltjax.config import Config
from ltjax.physics import boundary as bd
from ltjax.physics.advect import AdvectParams, rk4_displacement, zeta_h_at
from ltjax.step import StepContext, make_external_step


@pytest.fixture(scope="module")
def case():
    dtype = jnp.float64
    c = synth.make_solid_body_case(nx=41, ny=41, us=10, lx=100e3, ly=100e3,
                                   h0=50.0, omega=1e-4, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=1800.0, dt=3600.0, dtype=dtype)
    rng = np.random.default_rng(7)
    n = 512
    x = jnp.asarray(rng.uniform(20e3, 80e3, n))
    y = jnp.asarray(rng.uniform(20e3, 80e3, n))
    z = jnp.asarray(rng.uniform(-40.0, -5.0, n))
    return c, fs, x, y, z


def test_rk4_packed_matches_native(case):
    c, fs, x, y, z = case
    grid = c.grid
    adv = AdvectParams(sigma=0.0, z0=5e-4, idt=120.0)
    dx0, dy0, dz0 = rk4_displacement(grid, fs, x, y, z, 100.0, adv)
    rec = pk.build_packed_records(grid, fs)
    tabs = pk.stage_tables(grid, rec, 100.0, 120.0, 0.0)
    dx1, dy1, dz1 = pk.rk4_displacement_packed(grid, tabs, x, y, z, 0.0,
                                               5e-4, 120.0)
    np.testing.assert_allclose(dx1, dx0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dy1, dy0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dz1, dz0, rtol=1e-9, atol=1e-9)


def test_zeta_h_packed_matches_native(case):
    c, fs, x, y, z = case
    grid = c.grid
    rec = pk.build_packed_records(grid, fs)
    tabs = pk.stage_tables(grid, rec, 100.0, 120.0, 0.0)
    z0, h0 = zeta_h_at(grid, fs, x, y, 100.0)
    z1, h1 = pk.zeta_h_packed(grid, tabs[0], x, y)
    np.testing.assert_allclose(z1, z0, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(h1, h0, rtol=1e-9, atol=1e-12)


def test_external_step_fast_vs_native(case):
    """Full external step: fast_interp result == native result (the
    analytic case is linear in x,y so the schemes coincide)."""
    c, fs, x, y, z = case
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    p = st.init_particles(np.asarray(x), np.asarray(y), np.asarray(z),
                          dtype=jnp.float64)
    p = p._replace(status=jnp.full(p.n, st.ACTIVE, jnp.int32))
    kw = dict(numpar=p.n, dt=1800, idt=360, us=10, ws=11,
              OpenOceanBoundary=True, dtype_pos="float64")
    fast = make_external_step(ctx, Config(fast_interp=True, **kw), jr.key(0))
    nat = make_external_step(ctx, Config(fast_interp=False, **kw), jr.key(0))
    pf = fast(p, fs, 0.0, 0)
    pn = nat(p, fs, 0.0, 0)
    np.testing.assert_allclose(pf.x, pn.x, rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(pf.y, pn.y, rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(pf.z, pn.z, rtol=1e-9, atol=1e-9)
    assert np.array_equal(np.asarray(pf.status), np.asarray(pn.status))


def test_rk4_collapsed_matches_native(case):
    """Kernel-mirror path (values tables + blend-then-fit) vs native.

    The analytic case has time-constant zeta, so time-collapse commutes
    with the (linear-in-y) spline fit and the blend-then-fit ordering
    reproduces the native path exactly."""
    c, fs, x, y, z = case
    grid = c.grid
    adv = AdvectParams(sigma=0.0, z0=5e-4, idt=120.0)
    dx0, dy0, dz0 = rk4_displacement(grid, fs, x, y, z, 100.0, adv)
    rec = pk.build_packed_records(grid, fs)
    vtabs = pk.stage_value_tables(grid, rec, 100.0, 120.0)
    dx1, dy1, dz1 = pk.rk4_displacement_collapsed(grid, vtabs, x, y, z,
                                                  0.0, 5e-4, 120.0)
    np.testing.assert_allclose(dx1, dx0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dy1, dy0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dz1, dz0, rtol=1e-9, atol=1e-9)


def test_rk4_records_matches_collapsed(case):
    """Table-free records scheme == collapsed stage-table scheme (the
    gather commutes with polintd exactly)."""
    c, fs, x, y, z = case
    grid = c.grid
    rec = pk.build_packed_records(grid, fs)
    vtabs = pk.stage_value_tables(grid, rec, 100.0, 120.0)
    dx0, dy0, dz0 = pk.rk4_displacement_collapsed(grid, vtabs, x, y, z,
                                                  0.0, 5e-4, 120.0)
    rft = pk.build_records_flat(grid, rec)
    dx1, dy1, dz1 = pk.rk4_displacement_records(grid, rft, x, y, z, 100.0,
                                                0.0, 5e-4, 120.0)
    np.testing.assert_allclose(dx1, dx0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(dy1, dy0, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(dz1, dz0, rtol=1e-12, atol=1e-12)
    z0c, h0c = pk.zeta_h_packed(grid, pk.stage_tables(
        grid, rec, 100.0, 120.0, 0.0)[0], x, y)
    z1c, h1c = pk.zeta_h_records(grid, rft, x, y, 100.0)
    np.testing.assert_allclose(z1c, z0c, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(h1c, h0c, rtol=1e-9, atol=1e-12)


def test_rk4_packed_sheared_time_ramped():
    """Vertical shear + time ramp: still linear data, so the packed
    schemes (collocation, time-collapse, column splines) remain exact
    vs the analytic trajectory factors through RK4 truncation only."""
    dtype = jnp.float64
    c = synth.make_solid_body_case(nx=41, ny=41, us=10, lx=100e3,
                                   ly=100e3, h0=50.0, omega=1e-4,
                                   shear_a=0.004, ramp_b=1e-5, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=1800.0, dt=3600.0, dtype=dtype)
    rng = np.random.default_rng(3)
    n = 256
    x = jnp.asarray(rng.uniform(30e3, 70e3, n))
    y = jnp.asarray(rng.uniform(30e3, 70e3, n))
    z = jnp.asarray(rng.uniform(-40.0, -5.0, n))
    adv = AdvectParams(sigma=0.0, z0=5e-4, idt=120.0)
    dx0, dy0, dz0 = rk4_displacement(c.grid, fs, x, y, z, 900.0, adv)
    rec = pk.build_packed_records(c.grid, fs)
    tabs = pk.stage_tables(c.grid, rec, 900.0, 120.0, 0.0)
    dx1, dy1, dz1 = pk.rk4_displacement_packed(c.grid, tabs, x, y, z, 0.0,
                                               5e-4, 120.0)
    np.testing.assert_allclose(dx1, dx0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dy1, dy0, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dz1, dz0, rtol=1e-9, atol=1e-9)
