"""Golden advection tests on the analytic solid-body case (SURVEY.md SS4).

The synthetic field is exactly representable by the interpolation stack
(see ltjax.synth), so RK4 trajectories must match the analytic circle
to RK4 truncation accuracy — this pins the entire
locate->bilinear->spline->polintd->RK4 path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ltjax import synth
from ltjax.physics.advect import (AdvectParams, find_currents,
                                  rk4_displacement)


def _case(**kw):
    return synth.make_solid_body_case(nx=41, ny=41, us=10, lx=100e3,
                                      ly=100e3, h0=50.0, omega=1e-4, **kw)


def test_find_currents_matches_analytic():
    case = _case(shear_a=0.004, ramp_b=1e-5)
    fs = synth.fieldset_for(case, t_center=3600.0, dt=3600.0)
    rng = np.random.default_rng(0)
    n = 200
    x = jnp.asarray(rng.uniform(20e3, 80e3, n))
    y = jnp.asarray(rng.uniform(20e3, 80e3, n))
    # keep z inside the rho-level knot range [-47.5, -2.5] (outside it
    # the engine clamps to the water-column ends, by design)
    z = jnp.asarray(rng.uniform(-45.0, -3.0, n))
    t = 4321.0
    u, v, w = find_currents(case.grid, fs, x, y, z, t, AdvectParams())
    ue, ve, we = case.velocity(np.asarray(x), np.asarray(y), np.asarray(z), t)
    np.testing.assert_allclose(np.asarray(u), ue, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), ve, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(w), we, atol=1e-12)


def test_rk4_matches_analytic_circle():
    case = _case(shear_a=0.002)
    idt = 120.0
    params = AdvectParams(idt=idt)
    fs = synth.fieldset_for(case, t_center=0.0, dt=86400.0)

    rng = np.random.default_rng(1)
    n = 64
    x = jnp.asarray(rng.uniform(35e3, 65e3, n))
    y = jnp.asarray(rng.uniform(35e3, 65e3, n))
    z = jnp.asarray(rng.uniform(-40.0, -5.0, n))
    x0, y0, z0 = np.asarray(x), np.asarray(y), np.asarray(z)

    nsteps = 60  # 2 hours

    @jax.jit
    def roll(carry):
        x, y, z, t = carry
        dx, dy, dz = rk4_displacement(case.grid, fs, x, y, z, t, params)
        return (x + dx, y + dy, z + dz, t + idt)

    carry = (x, y, z, jnp.asarray(0.0, x.dtype))
    for _ in range(nsteps):
        carry = roll(carry)
    xf, yf, zf, tf = carry

    xa, ya, za = case.analytic(x0, y0, z0, nsteps * idt)
    # RK4 local error ~ (omega*idt)^5; global ~ nsteps * r * (w dt)^5 ~ 1e-9 m
    np.testing.assert_allclose(np.asarray(xf), xa, atol=1e-6)
    np.testing.assert_allclose(np.asarray(yf), ya, atol=1e-6)
    np.testing.assert_allclose(np.asarray(zf), za, atol=1e-9)


def test_rk4_time_ramp():
    case = _case(ramp_b=2e-5)
    idt = 60.0
    params = AdvectParams(idt=idt)
    fs = synth.fieldset_for(case, t_center=1800.0, dt=1800.0)

    x = jnp.asarray([60e3, 40e3])
    y = jnp.asarray([50e3, 30e3])
    z = jnp.asarray([-10.0, -20.0])
    x0, y0, z0 = np.asarray(x), np.asarray(y), np.asarray(z)
    t = 0.0
    for k in range(30):
        dx, dy, dz = rk4_displacement(case.grid, fs, x, y, z, t, params)
        x, y, z, t = x + dx, y + dy, z + dz, t + idt
    xa, ya, za = case.analytic(x0, y0, z0, 30 * idt)
    np.testing.assert_allclose(np.asarray(x), xa, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), ya, atol=1e-5)


def test_log_layer_decays_velocity_near_bottom():
    case = _case()
    fs = synth.fieldset_for(case, t_center=0.0, dt=3600.0)
    x = jnp.asarray([60e3])
    y = jnp.asarray([60e3])  # off-center in y so the solid-body u is nonzero
    params = AdvectParams(z0=0.0005)
    # mid-depth: full speed
    u_mid, _, _ = find_currents(case.grid, fs, x, y, jnp.asarray([-25.0]),
                                0.0, params)
    # just above the bottom: strongly decayed
    u_bot, _, _ = find_currents(case.grid, fs, x, y, jnp.asarray([-49.99]),
                                0.0, params)
    assert abs(float(u_bot[0])) < 0.7 * abs(float(u_mid[0]))
    # at/below roughness height: zero
    u_z0, _, _ = find_currents(case.grid, fs, x, y, jnp.asarray([-50.0]),
                               0.0, params)
    assert abs(float(u_z0[0])) < 1e-12
