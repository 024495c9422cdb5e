"""Dev sweep: megakernel config search on the real chip.

Times ext_step_fused (kernel only, pre-sorted particles) across
(window, p_block, precision, fast_math) combos and reports per-config
ms/ext-step, particle-steps/s, and the oob fraction (window-miss rate —
the exact-patch population).  Decides the production defaults in
ltjax.config.

Run: ``python benchmarks/mega_sweep.py [N]``
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build
from ltjax import packed as pk
from ltjax import spatial as sp
from ltjax import state as st
from ltjax.grid import locate
from ltjax.kernels import ext_step as es
from ltjax.step import boundary_s_max, _precision

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

cfg, ctx, fs, p = build(numpar=N)
grid = ctx.grid
n_int = cfg.internal_steps
idt = float(cfg.idt)

prec = jax.block_until_ready(jax.jit(
    lambda: pk.build_packed_records(grid, fs))())
rtab = jax.block_until_ready(jax.jit(
    lambda: pk.build_record_tables(grid, prec))())
rtab_p = jax.block_until_ready(jax.jit(
    lambda: pk.build_record_tables(grid, prec, paired=True))())
brows = jnp.asarray(es.boundary_rows_table(ctx.bounds, grid.ny, grid.nx))
s_max = boundary_s_max(ctx.bounds)
params = es.params_array_ext(grid, ctx.bounds, cfg.z0, 0.0, fs.times,
                             idt, n_int)
ci, _ = locate(grid.x_rho, p.x, grid.uniform)
cj, _ = locate(grid.y_rho, p.y, grid.uniform)
_sorted = {}


def sorted_for(aspect):
    if aspect not in _sorted:
        ps, _ = sp.sort_by_cell(p, ci, cj, aspect_y=aspect)
        _sorted[aspect] = jax.block_until_ready(ps)
    return _sorted[aspect]


def run_combo(wy, wx, pb, precision, fast_math, sfast=True, reps=5):
    ps = sorted_for(max(1, wy // wx))
    pad = (-N) % pb

    def padded(a, fill=None):
        if pad == 0:
            return a
        tailv = a[-1:] if fill is None else jnp.full((1,), fill, a.dtype)
        return jnp.concatenate([a, jnp.broadcast_to(tailv, (pad,))])

    paired = precision == "pair2"
    rt = rtab_p if paired else rtab

    @jax.jit
    def f(xx, yy, zz, dob, status, pid):
        return es.ext_step_fused(
            grid, rt, brows, params, xx, yy, zz, dob, status,
            cfg.tension_sigma, n_int, idt, n_iter=cfg.reflect_iters,
            p_block=pb, s_max=s_max, precision=precision,
            open_exits=cfg.OpenOceanBoundary, pids=pid, rngk=None,
            hturb_on=False, vturb_on=False, with_aks=False,
            window=(wy, wx), fast_math=fast_math, sfast=sfast)

    args = (padded(ps.x), padded(ps.y), padded(ps.z),
            padded(ps.dob, jnp.inf), padded(ps.status, st.NOT_RELEASED),
            padded(ps.pid, -1))
    out = jax.block_until_ready(f(*args))
    oob_frac = float(np.asarray(out[9][:N]).mean())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt_s = (time.perf_counter() - t0) / reps
    return dt_s, oob_frac


COMBOS = [
    # (wy, wx, p_block, precision_name, fast_math, sfast)
    # aspect-matched Hilbert sort engages automatically for wy > wx
    (16, 8, 1024, "pair2", True, True),
    (16, 8, 2048, "pair2", True, True),
    (16, 16, 1024, "pair2", True, True),
]

print(f"N={N} n_int={n_int} (one ext step, kernel only)")
for wy, wx, pb, pname, fm, sf in COMBOS:
    from ltjax.config import Config
    pr = {"hilo3": "hilo3", "pair2": "pair2",
          "default": jax.lax.Precision.DEFAULT,
          "highest": jax.lax.Precision.HIGHEST}[pname]
    try:
        dt_s, oob = run_combo(wy, wx, pb, pr, fm, sf)
        rate = N * n_int / dt_s
        print(f"w={wy}x{wx} pb={pb:5d} {pname:7s} fm={int(fm)} "
              f"sf={int(sf)}: {dt_s*1e3:7.2f} ms  "
              f"{rate/1e6:7.1f} M steps/s  oob={oob*100:.3f}%")
    except Exception as e:  # noqa: BLE001 — sweep survives bad combos
        print(f"w={wy}x{wx} pb={pb:5d} {pname:7s} fm={int(fm)} "
              f"sf={int(sf)}: FAILED {type(e).__name__}: {str(e)[:200]}")
    sys.stdout.flush()
