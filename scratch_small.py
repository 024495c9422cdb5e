import time
import numpy as np
import jax
import jax.numpy as jnp
from bench import build
from ltjax import packed as pk
from ltjax.kernels.gather_interp import rk4_displacement_fused

cfg, ctx, fs, p = build(numpar=8192)
grid = ctx.grid
rec = pk.build_packed_records(grid, fs)
vtabs = jax.block_until_ready(pk.stage_value_tables(grid, rec, 0.0, 120.0))
x, y, z = p.x, p.y, p.z
print("lowering...", flush=True)
t0 = time.perf_counter()
f = jax.jit(lambda x, y, z: rk4_displacement_fused(
    grid, vtabs, x, y, z, cfg.tension_sigma, cfg.z0, 120.0))
lowered = f.lower(x, y, z)
print("lowered in", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print("compiled in", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
out = jax.block_until_ready(compiled(x, y, z))
print("ran in", time.perf_counter() - t0, flush=True)
dxm, dym, dzm = pk.rk4_displacement_collapsed(grid, vtabs, x, y, z,
                                              cfg.tension_sigma, cfg.z0, 120.0)
for name, a, b in [("dx", out[0], dxm), ("dy", out[1], dym), ("dz", out[2], dzm)]:
    a = np.asarray(a); b = np.asarray(b)
    err = np.abs(a - b).max()
    print(name, "max_abs_err", err, flush=True)
