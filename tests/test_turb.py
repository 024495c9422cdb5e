"""Turbulence operator tests: variance + the well-mixed condition."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from ltjax import synth
from ltjax.fields import make_fieldset
from ltjax.physics import turb as tb
from ltjax.physics.boundary import reflect_vertical


def test_hturb_moments():
    key = jr.key(0)
    pids = jnp.arange(20000, dtype=jnp.int32)
    idt = 120.0
    K = 2.5
    dx, dy = tb.hturb(key, 7, pids, idt, K, jnp.float64)
    var = 2.0 * K * idt
    assert abs(float(jnp.mean(dx))) < 3 * np.sqrt(var / 20000)
    np.testing.assert_allclose(float(jnp.var(dx)), var, rtol=0.05)
    np.testing.assert_allclose(float(jnp.var(dy)), var, rtol=0.05)
    # independent across substeps and axes
    dx2, _ = tb.hturb(key, 8, pids, idt, K, jnp.float64)
    corr = np.corrcoef(np.asarray(dx), np.asarray(dx2))[0, 1]
    assert abs(corr) < 0.03


def test_hturb_deterministic_and_order_invariant():
    key = jr.key(42)
    pids = jnp.arange(100, dtype=jnp.int32)
    a1, b1 = tb.hturb(key, 3, pids, 60.0, 1.0, jnp.float64)
    a2, b2 = tb.hturb(key, 3, pids, 60.0, 1.0, jnp.float64)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # a permuted subset gets the same per-particle draws (sharding
    # invariance, SURVEY.md SS4)
    perm = jnp.asarray([5, 17, 3])
    a3, _ = tb.hturb(key, 3, perm, 60.0, 1.0, jnp.float64)
    np.testing.assert_array_equal(np.asarray(a3), np.asarray(a1)[perm])


def _aks_case(n_part=3000, us=20, h0=50.0):
    """Uniform-in-z particles + a strongly nonuniform Aks(z) profile."""
    case = synth.make_solid_body_case(nx=5, ny=5, us=us, lx=10e3, ly=10e3,
                                      h0=h0, omega=0.0)
    g = case.grid
    ws = us + 1
    z_w = h0 * np.asarray(g.s_w)              # (ws,) since hc=h0, Cs=s
    # parabolic K: large mid-depth, small at boundaries (+ floor)
    K = 1e-4 + 4e-3 * (1.0 - (2.0 * z_w / h0 + 1.0) ** 2)
    aks = np.broadcast_to(K[:, None, None], (ws, 5, 5)).copy()
    zeros = np.zeros((3, 5, 5))
    mk = lambda a: np.broadcast_to(a, (3,) + a.shape).copy()
    fs = make_fieldset(
        zeros, mk(np.zeros((us, 5, 4))), mk(np.zeros((us, 4, 5))),
        mk(np.zeros((ws, 5, 5))), mk(aks), [0.0, 3600.0, 7200.0],
        dtype=jnp.float64)
    return case, fs, K


def test_vturb_well_mixed_condition():
    """Uniform concentration must stay uniform under nonuniform K(z)
    (Visser 1997) — the standard validity test for RDM schemes."""
    case, fs, K = _aks_case()
    g = case.grid
    h0 = 50.0
    n = 3000
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.uniform(-h0, 0.0, n))
    x = jnp.full(n, 5e3, jnp.float64)
    y = jnp.full(n, 5e3, jnp.float64)
    pids = jnp.arange(n, dtype=jnp.int32)
    params = tb.TurbParams(use_aks=True, idt=60.0)
    key = jr.key(1)

    @jax.jit
    def run(z0):
        def body(z, i):
            dz = tb.vturb(g, fs, key, i, pids, x, y, z, 3600.0, params)
            z1, _, _ = reflect_vertical(z + dz, jnp.zeros(n), jnp.full(n, h0))
            return z1, None
        zf, _ = jax.lax.scan(body, z0, jnp.arange(400))
        return zf

    zf = np.asarray(run(z))
    # histogram in 10 bins must stay uniform within sampling noise
    hist, _ = np.histogram(zf, bins=10, range=(-h0, 0.0))
    expected = n / 10
    chi2 = np.sum((hist - expected) ** 2 / expected)
    # 9 dof; chi2 < 27 is p>0.001 — catches the classic naive-random-walk
    # failure (accumulation at low-K boundaries), which gives chi2 >> 100
    assert chi2 < 35.0, f"well-mixed condition violated: chi2={chi2}, {hist}"


def test_vturb_constant_k_variance():
    case, fs, _ = _aks_case()
    g = case.grid
    n = 20000
    params = tb.TurbParams(use_aks=False, ConstantVTurb=1e-3, idt=60.0)
    z = jnp.full(n, -25.0, jnp.float64)
    x = jnp.full(n, 5e3, jnp.float64)
    y = jnp.full(n, 5e3, jnp.float64)
    pids = jnp.arange(n, dtype=jnp.int32)
    dz = tb.vturb(g, fs, jr.key(2), 0, pids, x, y, z, 3600.0, params)
    var = 2 * 1e-3 * 60.0
    np.testing.assert_allclose(float(jnp.var(dz)), var, rtol=0.05)
    # 3-sigma bound on the sample mean of n draws
    assert abs(float(jnp.mean(dz))) < 3 * np.sqrt(var / n)
