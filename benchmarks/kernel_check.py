"""Dev check: validate + time rk4_displacement_fused vs the XLA mirror.

Run from anywhere: ``python benchmarks/kernel_check.py``.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build
from ltjax import packed as pk
from ltjax import spatial
from ltjax.grid import locate
from ltjax.kernels.gather_interp import rk4_displacement_fused

cfg, ctx, fs, p = build(numpar=1_000_000)
grid = ctx.grid
sigma = cfg.tension_sigma
z0 = cfg.z0
idt = float(cfg.idt)

rec = pk.build_packed_records(grid, fs)
vtabs = pk.stage_value_tables(grid, rec, 0.0, idt)
vtabs = jax.block_until_ready(vtabs)

# Hilbert sort
i, _ = locate(grid.x_rho, p.x, grid.uniform)
j, _ = locate(grid.y_rho, p.y, grid.uniform)
ps, perm = spatial.sort_by_cell(p, i, j)
ps = jax.block_until_ready(ps)
x, y, z = ps.x, ps.y, ps.z
P = 1024
n0 = x.shape[0]
pad = (-n0) % P
x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,))])
y = jnp.concatenate([y, jnp.broadcast_to(y[-1:], (pad,))])
z = jnp.concatenate([z, jnp.broadcast_to(z[-1:], (pad,))])

fused = jax.jit(lambda x, y, z: rk4_displacement_fused(
    grid, vtabs, x, y, z, sigma, z0, idt)[:3])
mirror = jax.jit(lambda x, y, z: pk.rk4_displacement_collapsed(
    grid, vtabs, x, y, z, sigma, z0, idt))

t0 = time.perf_counter()
dxf, dyf, dzf = jax.block_until_ready(fused(x, y, z))
print("fused compile+run:", time.perf_counter() - t0)
t0 = time.perf_counter()
dxm, dym, dzm = jax.block_until_ready(mirror(x, y, z))
print("mirror compile+run:", time.perf_counter() - t0)

for name, a, b in [("dx", dxf, dxm), ("dy", dyf, dym), ("dz", dzf, dzm)]:
    a = np.asarray(a); b = np.asarray(b)
    err = np.abs(a - b)
    scale = np.abs(b).max() + 1e-30
    print(f"{name}: max_abs_err={err.max():.3e} rel={err.max()/scale:.3e} "
          f"allclose={np.allclose(a, b, rtol=1e-4, atol=1e-6)}")

def timeit(f, n=10):
    f(x, y, z)
    jax.block_until_ready(f(x, y, z))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x, y, z)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

tf = timeit(fused)
tm = timeit(mirror)
n = x.shape[0]
print(f"fused:  {tf*1e3:.2f} ms -> {n/tf:.3e} particle-RK4/s")
print(f"mirror: {tm*1e3:.2f} ms -> {n/tm:.3e} particle-RK4/s")
