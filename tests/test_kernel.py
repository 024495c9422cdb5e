"""Fused Pallas RK4 kernel (interpret mode) vs its XLA mirror.

The kernel (ltjax.kernels.gather_interp) must reproduce the
blend-then-fit collapsed scheme (ltjax.packed.rk4_displacement_collapsed)
for every particle: in-window particles via the in-VMEM math, Hilbert
discontinuity stragglers via the exact oob patch.  Interpret mode
executes the same program on CPU, so this pins the kernel logic without
TPU hardware (the TPU numeric check runs in benchmarks/kernel_check.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ltjax import packed as pk
from ltjax import spatial
from ltjax import synth
from ltjax.grid import locate
from ltjax.kernels import gather_interp as gi


@pytest.fixture(scope="module")
def case():
    dtype = jnp.float32
    c = synth.make_solid_body_case(nx=41, ny=41, us=10, lx=100e3, ly=100e3,
                                   h0=50.0, omega=1e-4, shear_a=0.004,
                                   dtype=dtype)
    fs = synth.fieldset_for(c, t_center=1800.0, dt=3600.0, dtype=dtype)
    rec = pk.build_packed_records(c.grid, fs)
    vtabs = pk.stage_value_tables(c.grid, rec, 100.0, 120.0)
    rng = np.random.default_rng(11)
    n = 512
    x = jnp.asarray(rng.uniform(15e3, 85e3, n), dtype)
    y = jnp.asarray(rng.uniform(15e3, 85e3, n), dtype)
    z = jnp.asarray(rng.uniform(-40.0, -5.0, n), dtype)
    # Hilbert-sort (kernel precondition)
    i, _ = locate(c.grid.x_rho, x, c.grid.uniform)
    j, _ = locate(c.grid.y_rho, y, c.grid.uniform)
    key = spatial.hilbert_key(i, j)
    perm = jnp.argsort(key)
    return c.grid, vtabs, x[perm], y[perm], z[perm]


def test_fused_interpret_matches_mirror(case):
    grid, vtabs, x, y, z = case
    dx0, dy0, dz0 = pk.rk4_displacement_collapsed(grid, vtabs, x, y, z,
                                                  0.0, 5e-4, 120.0)
    dx1, dy1, dz1 = gi.rk4_displacement_fused(
        grid, vtabs, x, y, z, 0.0, 5e-4, 120.0, p_block=256,
        interpret=True)
    # interpret-mode dots run in f64-ish numpy; mirror is f32 XLA —
    # agreement is to f32 round-off, not bitwise
    np.testing.assert_allclose(dx1, dx0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dy1, dy0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dz1, dz0, rtol=2e-4, atol=2e-4)


def test_block_origins_centered(case):
    grid, vtabs, x, y, z = case
    org = gi.block_origins(grid, x, y, p_block=256)
    assert org.shape == (x.shape[0] // 256, 2)
    # windows must lie inside the table
    assert int(org.min()) >= 0
    assert int(org[:, 0].max()) <= grid.ny - gi.WY
    assert int(org[:, 1].max()) <= grid.nx - gi.WX
