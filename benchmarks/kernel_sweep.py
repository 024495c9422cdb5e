"""Dev sweep: fused-kernel accuracy/throughput vs block size + precision.

Run from anywhere: ``python benchmarks/kernel_sweep.py [N]``.
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

cfg, ctx, fs, p = build(numpar=N)
grid = ctx.grid
sigma = cfg.tension_sigma
z0 = cfg.z0
idt = float(cfg.idt)

rec = pk.build_packed_records(grid, fs)
vtabs = jax.block_until_ready(pk.stage_value_tables(grid, rec, 0.0, idt))

i, _ = locate(grid.x_rho, p.x, grid.uniform)
j, _ = locate(grid.y_rho, p.y, grid.uniform)
ps, perm = spatial.sort_by_cell(p, i, j)
ps = jax.block_until_ready(ps)
x, y, z = ps.x, ps.y, ps.z

mirror = jax.jit(lambda x, y, z: pk.rk4_displacement_collapsed(
    grid, vtabs, x, y, z, sigma, z0, idt))
dxm, dym, dzm = jax.block_until_ready(mirror(x, y, z))
dxm = np.asarray(dxm)
dym = np.asarray(dym)


def timeit(f, *args, n=10):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


for p_block in (1024, 2048, 4096):
    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        pad = (-N) % p_block
        xx = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,))])
        yy = jnp.concatenate([y, jnp.broadcast_to(y[-1:], (pad,))])
        zz = jnp.concatenate([z, jnp.broadcast_to(z[-1:], (pad,))])
        f = jax.jit(lambda a, b, c, pb=p_block, pr=prec:
                    rk4_displacement_fused(grid, vtabs, a, b, c, sigma,
                                           z0, idt, p_block=pb,
                                           precision=pr))
        try:
            dt, out = timeit(f, xx, yy, zz)
        except Exception as e:
            print(f"P={p_block} prec={prec}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        dxf = np.asarray(out[0])[:N]
        err = max(np.abs(dxf - dxm).max() / (np.abs(dxm).max() + 1e-30),
                  np.abs(np.asarray(out[1])[:N] - dym).max()
                  / (np.abs(dym).max() + 1e-30))
        print(f"P={p_block} prec={str(prec).split('.')[-1]:8s}: "
              f"{dt*1e3:7.2f} ms -> {N/dt:.3e} RK4/s  rel_err={err:.2e}",
              flush=True)
