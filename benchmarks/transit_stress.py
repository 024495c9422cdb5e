"""On-chip transit stress: the 4M sinking-front log-layer crossing.

The round-4 study (BASELINE.md) measured that a sinking FRONT crossing
the bottom log layer peaks near 2-3% window misses and overflowed the
then-default n/64 patch capacity; oob_frac 16-32 completed the whole
transit with zero errors.  Round 5 encodes that rule in
step.resolve_oob_frac (Behavior 6 with sink*dt >= 1 m/ext -> n/16) —
this script validates the AUTO sizing end-to-end with DEFAULT config:
4M particles, sink = 1e-3 m/s (3.6 m/ext-step), 8 external steps: the
release (z in [-25, -5] m over h = 50 m) sinks ~29 m, so the front
CROSSES the bottom log layer within the horizon while the bulk is
still in open water.  Success = zero ERROR statuses (measured: err=0
through ext 8 at the auto n/16 capacity).

Beyond this regime (round-5 measurement, superseding the round-4
zero-error-through-pileup claim): once the BULK of the population
parks on the bottom (ext steps 9-12 of this config), the mixed
stopped/sinking transition peaks above 12.5% window misses — n/16
leaves ~12.7% of particles ERRORed, even n/8 leaves ~1.4%.  A
full-population bottom pile-up is beyond practical static capacity BY
DESIGN: the overflow halts loudly (ErrorFlag=0) and the user raises
oob_frac, shortens the horizon, or reduces idt.  Run with
``python benchmarks/transit_stress.py 4000000 12 [oob_frac]`` to
reproduce the pile-up overflow.

Run: ``python benchmarks/transit_stress.py [N] [n_ext]``
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ltjax import state as st
from ltjax import synth
from ltjax.config import Config
from ltjax.fields import FieldSet
from ltjax.physics import boundary as bd
from ltjax.step import (StepContext, make_fused_external_steps,
                        resolve_oob_frac, summary_counts)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_EXT = int(sys.argv[2]) if len(sys.argv) > 2 else 8
FRAC = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 = auto

cfg = Config(numpar=N, dt=3600, idt=120, us=20, ws=21,
             OpenOceanBoundary=True, dtype_pos="float32",
             reflect_iters=2, Behavior=6, sink=1e-3, oob_frac=FRAC)
case = synth.make_solid_body_case(nx=200, ny=200, us=20, lx=200e3,
                                  ly=200e3, h0=50.0, omega=5e-5,
                                  dtype=jnp.float32)
grid = case.grid
bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                             np.asarray(grid.x_rho),
                             np.asarray(grid.y_rho))
ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
cfg.oob_frac = resolve_oob_frac(cfg, ctx)
print(f"N={N} n_ext={N_EXT} sink*dt={cfg.sink * cfg.dt:.1f} m/ext "
      f"auto oob_frac={cfg.oob_frac} "
      f"(capacity {100.0 / cfg.oob_frac:.2f}%)")

rng = np.random.default_rng(0)
p = st.init_particles(rng.uniform(40e3, 160e3, N),
                      rng.uniform(40e3, 160e3, N),
                      rng.uniform(-25.0, -5.0, N), dtype=jnp.float32)
p = p._replace(status=jnp.full(N, st.ACTIVE, jnp.int32))

E = 4
fused = make_fused_external_steps(ctx, cfg, jr.key(0), E)
t0 = time.perf_counter()
for c in range(N_EXT // E):
    fsW = synth.fieldset_window(case, c * E * 3600.0 - 1800.0, 3600.0,
                                E + 2, dtype=jnp.float32)
    p = jax.block_until_ready(fused(p, fsW, float(c * E * 3600.0),
                                    c * E))
    counts = summary_counts(p)
    zmin = float(p.z.min())
    print(f"ext {c * E + E:3d}: err={counts['error']} "
          f"active={counts['active']} z_min={zmin:.1f}")
wall = time.perf_counter() - t0
errs = summary_counts(p)["error"]
rate = N * N_EXT * cfg.internal_steps / wall
print(f"wall {wall:.1f}s  rate {rate:.3e} p-steps/s  errors {errs}")
assert errs == 0, f"{errs} ERROR particles — auto capacity insufficient"
print("TRANSIT OK: auto-sized capacity absorbed the full front transit")
