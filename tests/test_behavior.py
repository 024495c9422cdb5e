"""Behavior types 0-7: per-type sanity + state-machine tests."""

import numpy as np
import jax.numpy as jnp
import jax.random as jr

from ltjax import synth
from ltjax.fields import make_fieldset
from ltjax.physics import behavior as bh


def _setup(n=500, h0=50.0):
    case = synth.make_solid_body_case(nx=5, ny=5, us=10, lx=10e3, ly=10e3,
                                      h0=h0, omega=0.0)
    fs = synth.fieldset_for(case, t_center=3600.0, dt=3600.0)
    x = jnp.full(n, 5e3, jnp.float64)
    y = jnp.full(n, 5e3, jnp.float64)
    zeta = jnp.zeros(n, jnp.float64)
    h = jnp.full(n, h0, jnp.float64)
    pids = jnp.arange(n, dtype=jnp.int32)
    cur = (jnp.zeros(n, jnp.float64), jnp.zeros(n, jnp.float64))
    return case, fs, x, y, zeta, h, pids, cur


def _params(**kw):
    base = dict(pediage=86400.0, swimstart=0.0, swimslow=0.001,
                swimfast=0.005, idt=60.0)
    base.update(kw)
    return bh.BehaveParams(**base)


def test_swim_speed_ramp():
    p = _params()
    age = jnp.asarray([0.0, 43200.0, 86400.0, 1e6])
    w = bh.swim_speed(age, p, jnp.float64)
    np.testing.assert_allclose(np.asarray(w), [0.001, 0.003, 0.005, 0.005],
                               rtol=1e-12)


def test_type0_passive_no_displacement():
    case, fs, x, y, zeta, h, pids, cur = _setup()
    p = _params(behavior=0)
    n = x.shape[0]
    z = jnp.full(n, -25.0, jnp.float64)
    age = jnp.full(n, 3600.0, jnp.float64)
    dx, dy, dz, dies = bh.behave(case.grid, fs, jr.key(0), 0, pids, x, y, z,
                                 0.0, age, zeta, h, cur, p)
    assert float(jnp.abs(dx).max()) == 0.0
    assert float(jnp.abs(dz).max()) == 0.0
    assert not bool(dies.any())


def test_type1_seeks_surface():
    case, fs, x, y, zeta, h, pids, cur = _setup()
    p = _params(behavior=1, swimslow=0.01, swimfast=0.01)
    n = x.shape[0]
    z = jnp.full(n, -30.0, jnp.float64)   # well below the surface zone
    age = jnp.full(n, 3600.0, jnp.float64)
    dx, dy, dz, _ = bh.behave(case.grid, fs, jr.key(1), 0, pids, x, y, z,
                              0.0, age, zeta, h, cur, p)
    # biased walk: mean displacement up ~ (2*P_BIAS-1)*w*idt
    assert float(jnp.mean(dz)) > 0.3 * 0.01 * 60.0


def test_type2_seeks_bottom():
    case, fs, x, y, zeta, h, pids, cur = _setup()
    p = _params(behavior=2, swimslow=0.01, swimfast=0.01)
    n = x.shape[0]
    z = jnp.full(n, -10.0, jnp.float64)
    age = jnp.full(n, 3600.0, jnp.float64)
    _, _, dz, _ = bh.behave(case.grid, fs, jr.key(2), 0, pids, x, y, z,
                            0.0, age, zeta, h, cur, p)
    assert float(jnp.mean(dz)) < -0.3 * 0.01 * 60.0


def test_type3_dvm_light_response():
    case, fs, x, y, zeta, h, pids, cur = _setup()
    p = _params(behavior=3, swimslow=0.01, swimfast=0.01)
    n = x.shape[0]
    age = jnp.full(n, 3600.0, jnp.float64)
    # noon, shallow: strong light -> swim DOWN
    z_sh = jnp.full(n, -1.0, jnp.float64)
    noon = 12.0 * 3600.0
    _, _, dz_day, _ = bh.behave(case.grid, fs, jr.key(3), 0, pids, x, y,
                                z_sh, noon, age, zeta, h, cur, p)
    assert float(jnp.max(dz_day)) < 0.0
    # midnight: no light -> random walk (mean ~ 0)
    midnight = 0.0
    _, _, dz_night, _ = bh.behave(case.grid, fs, jr.key(3), 1, pids, x, y,
                                  z_sh, midnight, age, zeta, h, cur, p)
    assert abs(float(jnp.mean(dz_night))) < 0.3 * 0.01 * 60.0
    # noon but very deep: below the photic threshold -> swim UP
    z_dp = jnp.full(n, -45.0, jnp.float64)
    _, _, dz_deep, _ = bh.behave(case.grid, fs, jr.key(3), 2, pids, x, y,
                                 z_dp, noon, age, zeta, h, cur, p)
    assert float(jnp.min(dz_deep)) > 0.0


def test_type6_sinking():
    case, fs, x, y, zeta, h, pids, cur = _setup()
    p = _params(behavior=6, sink=0.002)
    n = x.shape[0]
    z = jnp.full(n, -20.0, jnp.float64)
    age = jnp.zeros(n, jnp.float64)
    _, _, dz, _ = bh.behave(case.grid, fs, jr.key(4), 0, pids, x, y, z,
                            0.0, age, zeta, h, cur, p)
    np.testing.assert_allclose(np.asarray(dz), -0.002 * 60.0, rtol=1e-12)


def test_type7_tst_rides_current():
    case, fs, x, y, zeta, h, pids, cur = _setup()
    n = x.shape[0]
    p = _params(behavior=7, Hswimspeed=0.05, Swimdepth=2.0)
    age = jnp.full(n, 3600.0, jnp.float64)
    z = jnp.full(n, -20.0, jnp.float64)
    # strong current: ride at Swimdepth, swim along current
    strong = (jnp.full(n, 0.5, jnp.float64), jnp.zeros(n, jnp.float64))
    dx, dy, dz, _ = bh.behave(case.grid, fs, jr.key(5), 0, pids, x, y, z,
                              0.0, age, zeta, h, strong, p)
    np.testing.assert_allclose(np.asarray(dx), 0.05 * 60.0, rtol=1e-9)
    assert float(jnp.mean(dz)) > 0.0  # heads up toward Swimdepth
    # slack current: sit near bottom, no horizontal swimming
    dx2, dy2, dz2, _ = bh.behave(case.grid, fs, jr.key(5), 1, pids, x, y, z,
                                 0.0, age, zeta, h, cur, p)
    assert float(jnp.abs(dx2).max()) == 0.0
    assert float(jnp.mean(dz2)) < 0.0


def test_mortality_at_deadage():
    case, fs, x, y, zeta, h, pids, cur = _setup(n=4)
    p = _params(behavior=0, mortality=True, deadage=7200.0)
    z = jnp.full(4, -20.0, jnp.float64)
    age = jnp.asarray([0.0, 7000.0, 7200.0, 9000.0])
    _, _, _, dies = bh.behave(case.grid, fs, jr.key(6), 0, pids, x, y, z,
                              0.0, age, zeta, h, cur, p)
    np.testing.assert_array_equal(np.asarray(dies), [False, False, True, True])


def test_surface_irradiance_shape():
    p = _params(behavior=3)
    # zero at night, positive mid-day, peak near the window middle
    e_night = bh.surface_irradiance(2.0 * 3600, p, jnp.float64)
    e_noon = bh.surface_irradiance(12.0 * 3600, p, jnp.float64)
    assert float(e_night) == 0.0
    assert float(e_noon) > 0.9 * p.Em


def test_stochastic_mortality_rate_and_determinism():
    """Config-selectable random death (CONSTANTS.md row 9): constant
    hazard 1/deadage -> per-step death probability 1-exp(-idt/deadage),
    expected lifetime = deadage (matches the deterministic mode in
    expectation); counter-based DEATH substream -> bit-repeatable."""
    n = 20000
    case, fs, x, y, zeta, h, pids, cur = _setup(n=n)
    deadage = 7200.0
    idt = 60.0
    p = _params(behavior=0, mortality=True, deadage=deadage,
                stochastic=True, idt=idt)
    z = jnp.full(n, -20.0, jnp.float64)
    age = jnp.full(n, 100.0, jnp.float64)   # all alive, all at risk
    _, _, _, dies = bh.behave(case.grid, fs, jr.key(6), 3, pids, x, y, z,
                              0.0, age, zeta, h, cur, p)
    frac = float(jnp.mean(dies))
    p_die = -np.expm1(-idt / deadage)       # ~0.00830
    # binomial(20000, 0.0083): sd ~ 6.4e-4 -> +-5 sd window
    assert abs(frac - p_die) < 5 * np.sqrt(p_die * (1 - p_die) / n), frac

    # bit-repeatable: same (key, step, pid) -> same draw
    _, _, _, dies2 = bh.behave(case.grid, fs, jr.key(6), 3, pids, x, y, z,
                               0.0, age, zeta, h, cur, p)
    np.testing.assert_array_equal(np.asarray(dies), np.asarray(dies2))
    # different step -> different draw pattern
    _, _, _, dies3 = bh.behave(case.grid, fs, jr.key(6), 4, pids, x, y, z,
                               0.0, age, zeta, h, cur, p)
    assert not np.array_equal(np.asarray(dies), np.asarray(dies3))

    # the walk draws are untouched by the mode (independent substream):
    # type-1 displacement identical with stochastic mortality on/off
    p_on = _params(behavior=1, mortality=True, deadage=deadage,
                   stochastic=True, idt=idt)
    p_off = _params(behavior=1, mortality=True, deadage=deadage,
                    stochastic=False, idt=idt)
    zdeep = jnp.full(n, -30.0, jnp.float64)
    _, _, dz_on, _ = bh.behave(case.grid, fs, jr.key(6), 3, pids, x, y,
                               zdeep, 0.0, age, zeta, h, cur, p_on)
    _, _, dz_off, _ = bh.behave(case.grid, fs, jr.key(6), 3, pids, x, y,
                                zdeep, 0.0, age, zeta, h, cur, p_off)
    np.testing.assert_array_equal(np.asarray(dz_on), np.asarray(dz_off))
