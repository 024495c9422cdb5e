import time
import numpy as np
import jax
import jax.numpy as jnp
from bench import build
from ltjax import packed as pk
from ltjax import spatial
from ltjax.grid import locate
from ltjax.kernels.gather_interp import rk4_displacement_fused

for N in (8192, 65536, 262144):
    cfg, ctx, fs, p = build(numpar=N)
    grid = ctx.grid
    rec = pk.build_packed_records(grid, fs)
    vtabs = jax.block_until_ready(pk.stage_value_tables(grid, rec, 0.0, 120.0))
    i, _ = locate(grid.x_rho, p.x, grid.uniform)
    j, _ = locate(grid.y_rho, p.y, grid.uniform)
    ps, perm = spatial.sort_by_cell(p, i, j)
    x, y, z = ps.x, ps.y, ps.z
    f = jax.jit(lambda x, y, z: rk4_displacement_fused(
        grid, vtabs, x, y, z, cfg.tension_sigma, cfg.z0, 120.0))
    out = jax.block_until_ready(f(x, y, z))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(x, y, z)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"N={N}: {dt*1e3:.2f} ms -> {N/dt:.3e} RK4/s", flush=True)
