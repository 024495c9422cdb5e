"""Brute-force tension-spline oracle (NumPy, float64).

Solves for the C2 spline-under-tension directly from its defining
conditions: on interval j the interpolant is
    H_j(t) = a_j + b_j t + c_j cosh(T_j t) + d_j sinh(T_j t),  t = x - x_j
(or the cubic basis {1, t, t^2, t^3} when the interval tension is ~0),
with unknown coefficients found from one dense global linear system:
interpolation at both interval ends, C1 + C2 continuity at interior
knots, and natural end conditions H'' = 0.  This is an entirely
different algorithm from ltjax.tension (tridiagonal z2 form), which is
the point — agreement between the two validates both.
"""

from __future__ import annotations

import numpy as np


def _coshm(x):
    """cosh(x) - 1, accurate for small x."""
    if abs(x) < 0.5:
        x2 = x * x
        return x2 / 2 * (1 + x2 / 12 + x2 * x2 / 360 + x2 ** 3 / 20160)
    return np.cosh(x) - 1.0


def _sinhm(x):
    """sinh(x) - x, accurate for small x."""
    if abs(x) < 0.5:
        x2 = x * x
        return x ** 3 / 6 * (1 + x2 / 20 + x2 * x2 / 840 + x2 ** 3 / 60480)
    return np.sinh(x) - x


def _basis(u_j, h_j):
    """Return (f, f', f'') rows of the 4-function basis at local t.

    For u>0 the basis is the *scaled* {1, t/h, 2 coshm(Tt)/(Th)^2,
    6 sinhm(Tt)/(Th)^3} — spanning the same space as {1,t,cosh,sinh}
    but limiting smoothly to the cubic basis {1, t/h, (t/h)^2, (t/h)^3}
    as u->0, which keeps the dense solve well-conditioned at any
    tension (the raw cosh/sinh columns are numerically collinear with
    {1, t} for small u).
    """
    if u_j < 1e-8:
        def f(t):
            s = t / h_j
            return np.array([1.0, s, s * s, s ** 3])

        def f1(t):
            s = t / h_j
            return np.array([0.0, 1.0, 2 * s, 3 * s * s]) / h_j

        def f2(t):
            s = t / h_j
            return np.array([0.0, 0.0, 2.0, 6 * s]) / h_j ** 2
    else:
        T = u_j / h_j
        c2 = 2.0 / u_j ** 2
        c3 = 6.0 / u_j ** 3

        def f(t):
            return np.array([1.0, t / h_j, c2 * _coshm(T * t),
                             c3 * _sinhm(T * t)])

        def f1(t):
            return np.array([0.0, 1.0 / h_j, c2 * T * np.sinh(T * t),
                             c3 * T * _coshm(T * t)])

        def f2(t):
            return np.array([0.0, 0.0, c2 * T * T * np.cosh(T * t),
                             c3 * T * T * np.sinh(T * t)])
    return f, f1, f2


def fit_coefs(xk, yk, sigma):
    """Dense solve for all interval coefficients; returns (n-1, 4)."""
    xk = np.asarray(xk, np.float64)
    yk = np.asarray(yk, np.float64)
    n = len(xk)
    m = n - 1
    sig = np.broadcast_to(np.asarray(sigma, np.float64), (m,))
    h = np.diff(xk)
    A = np.zeros((4 * m, 4 * m))
    rhs = np.zeros(4 * m)
    row = 0
    bases = [_basis(sig[j], h[j]) for j in range(m)]
    # interpolation
    for j in range(m):
        f, _, _ = bases[j]
        A[row, 4 * j:4 * j + 4] = f(0.0)
        rhs[row] = yk[j]
        row += 1
        A[row, 4 * j:4 * j + 4] = f(h[j])
        rhs[row] = yk[j + 1]
        row += 1
    # C1, C2 at interior knots
    for j in range(m - 1):
        _, f1a, f2a = bases[j]
        _, f1b, f2b = bases[j + 1]
        A[row, 4 * j:4 * j + 4] = f1a(h[j])
        A[row, 4 * (j + 1):4 * (j + 1) + 4] = -f1b(0.0)
        row += 1
        A[row, 4 * j:4 * j + 4] = f2a(h[j])
        A[row, 4 * (j + 1):4 * (j + 1) + 4] = -f2b(0.0)
        row += 1
    # natural ends
    _, _, f2a = bases[0]
    A[row, 0:4] = f2a(0.0)
    row += 1
    _, _, f2b = bases[m - 1]
    A[row, 4 * (m - 1):4 * m] = f2b(h[m - 1])
    row += 1
    assert row == 4 * m
    return np.linalg.solve(A, rhs).reshape(m, 4)


def evaluate(xk, yk, sigma, x, deriv=0):
    """Evaluate the oracle spline (scalar or 1D x), clamped to range."""
    xk = np.asarray(xk, np.float64)
    coefs = fit_coefs(xk, yk, sigma)
    m = len(xk) - 1
    sig = np.broadcast_to(np.asarray(sigma, np.float64), (m,))
    h = np.diff(xk)
    xs = np.atleast_1d(np.asarray(x, np.float64))
    xs = np.clip(xs, xk[0], xk[-1])
    out = np.empty_like(xs)
    for i, xv in enumerate(xs):
        j = min(max(int(np.searchsorted(xk, xv, side="right") - 1), 0), m - 1)
        fs = _basis(sig[j], h[j])
        out[i] = fs[deriv](xv - xk[j]) @ coefs[j]
    return out if np.ndim(x) else out[0]
