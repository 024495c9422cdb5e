"""Dev profile: per-phase cost breakdown of the megakernel external step.

Times each component of ltjax.step._mega_external_step separately
(packed-record build, Hilbert sort, megakernel, oob patch, unsort) to
show where the end-to-end vs kernel-only throughput gap lives.

Run: ``python benchmarks/phase_profile.py [N]``
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

from bench import build
from ltjax import packed as pk
from ltjax import spatial as sp
from ltjax import state as st
from ltjax.grid import locate
from ltjax.kernels import ext_step as es
from ltjax.step import boundary_s_max, make_external_step, _precision

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

cfg, ctx, fs, p = build(numpar=N)
grid = ctx.grid
n_int = cfg.internal_steps
idt = float(cfg.idt)


def timeit(f, *args, n=5):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# full external step (reference point)
step = make_external_step(ctx, cfg, jr.key(0))
t_full = timeit(step, p, fs, 0.0, 0)
print(f"full ext step      : {t_full*1e3:8.2f} ms   "
      f"{N*n_int/t_full/1e6:7.1f} M steps/s")

# phase 1: packed record build
f_rec = jax.jit(lambda: pk.build_packed_records(grid, fs))
t_rec = timeit(f_rec)
print(f"packed records     : {t_rec*1e3:8.2f} ms")

# phase 2: locate + Hilbert sort + unsort
def f_sort(pp):
    ci, _ = locate(grid.x_rho, pp.x, grid.uniform)
    cj, _ = locate(grid.y_rho, pp.y, grid.uniform)
    ps, perm = sp.sort_by_cell(pp, ci, cj)
    return sp.unsort(ps, perm)
t_sort = timeit(jax.jit(f_sort), p)
print(f"sort+unsort        : {t_sort*1e3:8.2f} ms")

# phase 3: the megakernel alone on pre-sorted particles
prec = jax.block_until_ready(jax.jit(
    lambda: pk.build_packed_records(grid, fs))())
rtab = jax.block_until_ready(jax.jit(
    lambda: pk.build_record_tables(grid, prec))())
brows = jnp.asarray(es.boundary_rows_table(ctx.bounds, grid.ny, grid.nx))
s_max = boundary_s_max(ctx.bounds)
params = es.params_array_ext(grid, ctx.bounds, cfg.z0, 0.0, fs.times,
                             idt, n_int)
ci, _ = locate(grid.x_rho, p.x, grid.uniform)
cj, _ = locate(grid.y_rho, p.y, grid.uniform)
ps, perm = sp.sort_by_cell(p, ci, cj)
ps = jax.block_until_ready(ps)
pb = cfg.kernel_block
pad = (-N) % pb

def padded(a, fill=None):
    if pad == 0:
        return a
    tailv = a[-1:] if fill is None else jnp.full((1,), fill, a.dtype)
    return jnp.concatenate([a, jnp.broadcast_to(tailv, (pad,))])

@jax.jit
def f_kernel(xx, yy, zz, dob, status, pid):
    return es.ext_step_fused(
        grid, rtab, brows, params, xx, yy, zz, dob, status,
        cfg.tension_sigma, n_int, idt, n_iter=cfg.reflect_iters,
        p_block=cfg.kernel_block, s_max=s_max,
        precision=_precision(cfg), open_exits=cfg.OpenOceanBoundary,
        pids=pid, rngk=None, hturb_on=False, vturb_on=False,
        with_aks=False)

t_kern = timeit(f_kernel, padded(ps.x), padded(ps.y), padded(ps.z),
                padded(ps.dob, jnp.inf), padded(ps.status, st.NOT_RELEASED),
                padded(ps.pid, -1))
print(f"megakernel only    : {t_kern*1e3:8.2f} ms   "
      f"{N*n_int/t_kern/1e6:7.1f} M steps/s")

# phase 4: oob patch — records-mode scan over the static cap subset,
# timed directly (the production patch path in ltjax.step)
from ltjax.step import internal_step
cap = min(N, max(256, N // cfg.oob_frac))
rft = jax.block_until_ready(jax.jit(
    lambda: pk.build_records_flat(grid, prec))())
sub = jax.tree.map(lambda a: a[:cap], ps)

@jax.jit
def f_patch(pp):
    def body(carry, i):
        return internal_step(ctx, cfg, None, carry, fs, i * idt, i, rft,
                             mode="records"), None
    return jax.lax.scan(body, pp, jnp.arange(n_int))[0]

t_patch = timeit(f_patch, sub)
print(f"oob patch ({cap} cap): {t_patch*1e3:8.2f} ms")
resid = t_full - t_rec - t_sort - t_kern - t_patch
print(f"unattributed resid : {resid*1e3:8.2f} ms   (padding/concat,"
      f" dispatch, scatter — not separately timed)")
