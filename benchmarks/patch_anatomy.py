"""Dev microbench: production oob-patch cost attribution (pure XLA).

Times the pieces of ltjax.step._mega_external_step's exact-recompute
patch standalone — (a) the per-ext-step stage_value_tables_all build,
(b) the cap-sized collapsed_tabs internal-step scan, (c) the
rank/nonzero/scatter bookkeeping — plus the Hilbert sort, so the
end-to-end residual after the megernel can be attributed without
recompiling any Mosaic kernel.

Run: ``python benchmarks/patch_anatomy.py [N]``
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
from ltjax.step import StepContext, internal_step

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

cfg, ctx, fs, p = build(numpar=N)
grid = ctx.grid
n_int = cfg.internal_steps
idt = float(cfg.idt)
cap = min(N, max(256, N // cfg.oob_frac))
print(f"N={N} cap={cap} n_int={n_int}")


def timeit(f, *args, n=10):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


prec = jax.block_until_ready(jax.jit(
    lambda: pk.build_packed_records(grid, fs))())

# (a) the pre-built stage-table stack (patch_pre path in ltjax.step)
f_all = jax.jit(lambda: pk.stage_value_tables_all(grid, prec, 0.0, idt,
                                                  n_int))
t_all = timeit(f_all)
vt_all = jax.block_until_ready(f_all())
nbytes = sum(np.prod(a.shape) * 4 for a in jax.tree.leaves(vt_all))
print(f"stage_value_tables_all : {t_all*1e3:8.2f} ms   "
      f"({nbytes/1e9:.2f} GB written)")

# (b) the cap-sized collapsed_tabs scan (the patch's compute)
sub = jax.tree.map(lambda a: a[:cap], p)


@jax.jit
def f_scan(pp, vt, fsv):
    def body(carry, i):
        tabs = pk.slice_stage_tables(vt, i)
        return internal_step(ctx, cfg, None, carry, fsv, i * idt, i,
                             tabs, mode="collapsed_tabs"), None
    return jax.lax.scan(body, pp, jnp.arange(n_int))[0]


t_scan = timeit(f_scan, sub, vt_all, fs)
print(f"patch scan ({cap:6d})   : {t_scan*1e3:8.2f} ms")

# (c) oob bookkeeping: rank/nonzero/gather/scatter on the full batch
oob = jnp.zeros(N, bool).at[::111].set(True)


@jax.jit
def f_book(oobv, pp):
    rank = jnp.cumsum(oobv.astype(jnp.int32)) - 1
    overflow = oobv & (rank >= cap)
    idxs = jnp.nonzero(oobv, size=cap, fill_value=N)[0]
    sub0 = jax.tree.map(lambda a: jnp.concatenate([a, a[-1:]])[idxs], pp)

    def scat(dst, src):
        return jnp.concatenate([dst, dst[-1:]]).at[idxs].set(src)[:N]

    out = jax.tree.map(scat, pp, jax.tree.map(lambda a: a[:cap]
                                              if False else a, sub0))
    return out, overflow


t_book = timeit(f_book, oob, p)
print(f"oob bookkeeping        : {t_book*1e3:8.2f} ms")

# Hilbert sort (production cadence halves this)
def f_sort(pp):
    ci, _ = locate(grid.x_rho, pp.x, grid.uniform)
    cj, _ = locate(grid.y_rho, pp.y, grid.uniform)
    ps, perm = sp.sort_by_cell(pp, ci, cj, aspect_y=2)
    return ps, perm


t_sort = timeit(jax.jit(f_sort), p)
print(f"hilbert sort           : {t_sort*1e3:8.2f} ms")

# record + pair table builds (paid once per fused call)
f_rt = jax.jit(lambda: pk.build_record_tables(grid, prec, paired=True))
t_rt = timeit(f_rt)
print(f"record tables (paired) : {t_rt*1e3:8.2f} ms")

tot = t_all + t_scan + t_book
print(f"patch total            : {tot*1e3:8.2f} ms per ext step")
