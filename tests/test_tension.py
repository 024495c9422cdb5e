"""Tension spline vs. the brute-force dense-solve oracle (SURVEY.md SS4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ltjax import tension
from ltjax.oracle import tension_np


@pytest.mark.parametrize("sigma", [0.0, 0.3, 1.0, 5.0, 15.0])
def test_matches_oracle(sigma):
    rng = np.random.default_rng(0)
    n = 21
    xk = np.sort(rng.uniform(-50, 0, n))
    yk = rng.normal(size=n)
    xs = np.linspace(xk[0], xk[-1], 200)

    z2 = tension.fit(jnp.asarray(xk), jnp.asarray(yk), sigma)
    got = tension.evaluate(
        jnp.asarray(xk)[None, :].repeat(200, 0),
        jnp.asarray(yk)[None, :].repeat(200, 0),
        jnp.asarray(z2)[None, :].repeat(200, 0),
        sigma,
        jnp.asarray(xs),
    )
    want = tension_np.evaluate(xk, yk, sigma, xs)
    # the dense-solve oracle itself carries ~1e-8 conditioning error at
    # small tension; the production path separately matches an
    # independent z-form hand check to ~1e-13
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("sigma", [0.0, 2.0, 10.0])
def test_deriv_matches_oracle(sigma):
    rng = np.random.default_rng(1)
    n = 15
    xk = np.sort(rng.uniform(0, 10, n))
    yk = np.sin(xk) + 0.1 * rng.normal(size=n)
    xs = np.linspace(xk[0] + 1e-6, xk[-1] - 1e-6, 97)

    z2 = tension.fit(jnp.asarray(xk), jnp.asarray(yk), sigma)
    got = tension.evaluate_deriv(
        jnp.asarray(xk)[None, :].repeat(97, 0),
        jnp.asarray(yk)[None, :].repeat(97, 0),
        jnp.asarray(z2)[None, :].repeat(97, 0),
        sigma,
        jnp.asarray(xs),
    )
    want = tension_np.evaluate(xk, yk, sigma, xs, deriv=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-8)


def test_interpolates_knots():
    rng = np.random.default_rng(2)
    xk = np.sort(rng.uniform(-30, 0, 12))
    yk = rng.normal(size=12)
    for sigma in (0.0, 4.0):
        got = tension.fit_eval(
            jnp.asarray(xk)[None].repeat(12, 0),
            jnp.asarray(yk)[None].repeat(12, 0),
            sigma,
            jnp.asarray(xk),
        )
        np.testing.assert_allclose(np.asarray(got), yk, rtol=1e-9, atol=1e-10)


def test_zero_sigma_is_natural_cubic():
    # Against scipy's natural cubic spline.
    from scipy.interpolate import CubicSpline

    rng = np.random.default_rng(3)
    xk = np.sort(rng.uniform(0, 1, 17))
    yk = rng.normal(size=17)
    cs = CubicSpline(xk, yk, bc_type="natural")
    xs = np.linspace(0, 1, 100)
    xs = np.clip(xs, xk[0], xk[-1])
    got = tension.fit_eval(
        jnp.asarray(xk)[None].repeat(100, 0),
        jnp.asarray(yk)[None].repeat(100, 0),
        0.0,
        jnp.asarray(xs),
    )
    np.testing.assert_allclose(np.asarray(got), cs(xs), rtol=1e-8, atol=1e-9)


def test_high_tension_approaches_linear():
    xk = np.linspace(0, 1, 8)
    yk = np.array([0, 1, 0, 1, 0, 1, 0, 1.0])
    xs = np.linspace(0, 1, 50)
    got = tension.fit_eval(
        jnp.asarray(xk)[None].repeat(50, 0),
        jnp.asarray(yk)[None].repeat(50, 0),
        100.0,
        jnp.asarray(xs),
    )
    lin = np.interp(xs, xk, yk)
    np.testing.assert_allclose(np.asarray(got), lin, atol=1e-2)


def test_adaptive_sigma_preserves_monotonicity():
    # Step-like monotone data that a cubic spline overshoots.
    xk = np.array([0.0, 1, 2, 3, 4, 5, 6, 7.0])
    yk = np.array([0.0, 0.01, 0.02, 0.5, 0.98, 0.99, 1.0, 1.0])
    xs = np.linspace(0, 7, 400)
    xkb = jnp.asarray(xk)[None].repeat(400, 0)
    ykb = jnp.asarray(yk)[None].repeat(400, 0)
    # cubic overshoots outside the data range
    cubic = np.asarray(tension.fit_eval(xkb, ykb, 0.0, jnp.asarray(xs)))
    assert cubic.min() < -1e-4 or cubic.max() > 1 + 1e-4
    sig = tension.adaptive_sigma(jnp.asarray(xk), jnp.asarray(yk))
    z2 = tension.fit(jnp.asarray(xk), jnp.asarray(yk), sig)
    vals = np.asarray(
        tension.evaluate(xkb, ykb, jnp.asarray(z2)[None].repeat(400, 0),
                         jnp.asarray(sig)[None].repeat(400, 0),
                         jnp.asarray(xs)))
    assert vals.min() >= -5e-3 and vals.max() <= 1 + 5e-3
    # and still interpolates
    at_knots = np.asarray(
        tension.evaluate(jnp.asarray(xk)[None].repeat(8, 0),
                         jnp.asarray(yk)[None].repeat(8, 0),
                         jnp.asarray(z2)[None].repeat(8, 0),
                         jnp.asarray(sig)[None].repeat(8, 0),
                         jnp.asarray(xk)))
    np.testing.assert_allclose(at_knots, yk, atol=1e-9)
