"""Distribution-overhead measurement on the virtual CPU mesh.

All virtual devices share ONE physical CPU, so wall-clock cannot speed
up with device count — what the mesh DOES expose is the *added* cost
of distribution at fixed total work: halo ppermute payloads,
all_to_all migration, slot-buffer padding, and any per-tile work that
fails to decompose.  Ideal is a flat line (overhead 0%); a growing
T_N/T_1 reveals exactly the overheads that would eat the >=80%
multi-host efficiency target (BASELINE.json north_star) once each
shard has its own chip.  Real ICI efficiency additionally needs real
multi-chip hardware (one chip in this container — SURVEY.md SS4).

Run: ``python benchmarks/scaling.py [numpar]`` (forces the CPU backend
with 8 virtual devices; one row per mesh shape).
"""
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import jax.random as jr

from ltjax import shard, synth
from ltjax import state as st
from ltjax.config import Config
from ltjax.physics import boundary as bd
from ltjax.step import StepContext

NUMPAR = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000


def build():
    cfg = Config(numpar=NUMPAR, dt=3600, idt=720, us=10, ws=11,
                 HTurbOn=True, ConstantHTurb=1.0, OpenOceanBoundary=True,
                 dtype_pos="float32", dtype_field="float32",
                 reflect_iters=2)
    case = synth.make_solid_body_case(nx=128, ny=128, us=10, lx=200e3,
                                      ly=200e3, h0=50.0, omega=5e-5,
                                      dtype=jnp.float32)
    grid = case.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    fs = synth.fieldset_for(case, t_center=1800.0, dt=3600.0,
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    p = st.init_particles(rng.uniform(30e3, 170e3, NUMPAR),
                          rng.uniform(30e3, 170e3, NUMPAR),
                          rng.uniform(-40.0, -5.0, NUMPAR),
                          dtype=jnp.float32)
    p = p._replace(status=jnp.full(NUMPAR, st.ACTIVE, jnp.int32))
    return cfg, ctx, fs, p


def run_mesh(cfg, ctx, fs, p, ndp, ntiles, reps=2):
    spec = shard.make_spec(cfg, ctx.grid.ny, cfg.numpar, ndp, ntiles,
                           halo=4, slack=2.0)
    mesh = shard.make_mesh(spec, jax.devices()[:ndp * ntiles])
    tiled = shard.build_tiled_static(ctx.grid, spec)
    fs_pad = shard.pad_fieldset_eta(fs, spec.ny_pad)
    step = shard.make_tiled_step(ctx, cfg, spec, tiled, mesh, jr.key(0))
    pbuf = shard.scatter_particles(p, spec, tiled.tile_edges)
    pbuf2, _ = step(pbuf, fs_pad, 0.0, 0)       # compile + warm
    jax.block_until_ready(pbuf2)
    t0 = time.perf_counter()
    pb = pbuf
    for r in range(reps):
        pb, _ = step(pb, fs_pad, 0.0, r)
    jax.block_until_ready(pb)
    dt_s = (time.perf_counter() - t0) / reps
    return cfg.numpar * cfg.internal_steps / dt_s


def main():
    cfg, ctx, fs, p = build()
    shapes = [(1, 1), (1, 2), (2, 2), (1, 4), (2, 4), (1, 8)]
    base = None
    print(f"numpar={NUMPAR} grid=128x128x10 idt=720 (fixed total work, "
          f"virtual CPU mesh — flat is ideal)")
    print(f"{'mesh':>8} {'devices':>8} {'Msteps/s':>10} "
          f"{'T_N/T_1':>8} {'dist overhead':>14}")
    for ndp, ntiles in shapes:
        n = ndp * ntiles
        rate = run_mesh(cfg, ctx, fs, p, ndp, ntiles)
        if base is None:
            base = rate
        ratio = base / rate
        print(f"{ndp}x{ntiles:>2}     {n:>8} {rate/1e6:>10.2f} "
              f"{ratio:>8.2f} {(ratio - 1) * 100:>13.1f}%")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
