import time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bench import build
from ltjax import packed as pk
from ltjax import spatial
from ltjax.grid import locate
import ltjax.kernels.gather_interp as gi

N = 262144
cfg, ctx, fs, p = build(numpar=N)
grid = ctx.grid
rec = pk.build_packed_records(grid, fs)
vtabs = jax.block_until_ready(pk.stage_value_tables(grid, rec, 0.0, 120.0))
i, _ = locate(grid.x_rho, p.x, grid.uniform)
j, _ = locate(grid.y_rho, p.y, grid.uniform)
ps, perm = spatial.sort_by_cell(p, i, j)
x, y, z = ps.x, ps.y, ps.z

P, PS, WY, WX, WC = gi.P, gi.PS, gi.WY, gi.WX, gi.WC

def make_variant(grid, sigma, idt, nv, HL, mode):
    base = gi._make_kernel(grid, sigma, idt, nv, HL)
    # reconstruct a kernel with modified DMA behavior
    import math
    gs, c_off, c_diag = gi._gs_fns(sigma)

    def kernel(org_ref, par_ref, x_ref, y_ref, z_ref,
               t1_hbm, t2_hbm, t4_hbm,
               dx_ref, dy_ref, dz_ref, oob_ref,
               w1s, w2s, w4s, sems):
        b = pl.program_id(0)
        oy = org_ref[b, 0]
        ox = org_ref[b, 1]
        if mode in ("one_dma", "full"):
            d1 = pltpu.make_async_copy(
                t1_hbm.at[pl.ds(oy, WY), pl.ds(ox, WX), :], w1s, sems.at[0])
            d1.start()
        if mode == "full":
            d2 = pltpu.make_async_copy(
                t2_hbm.at[pl.ds(oy, WY), pl.ds(ox, WX), :], w2s, sems.at[1])
            d4 = pltpu.make_async_copy(
                t4_hbm.at[pl.ds(oy, WY), pl.ds(ox, WX), :], w4s, sems.at[2])
            d2.start(); d4.start()
        oy_f = oy.astype(jnp.float32); ox_f = ox.astype(jnp.float32)
        xv = x_ref[0]; yv = y_ref[0]; zv = z_ref[0]
        oob = jnp.zeros((PS, 128), jnp.bool_)
        half = 0.5 * idt
        se = functools.partial(gi._make_kernel.__wrapped__ if hasattr(gi._make_kernel,'__wrapped__') else None)
        # inline stage_eval via the module's builder is hard; rebuild here:
        stage_eval = _build_stage_eval(grid, sigma, nv, HL, gs, c_off, c_diag)
        if mode in ("one_dma", "full"):
            d1.wait()
        if mode == "full":
            d2.wait(); d4.wait()
        w2 = w2s if mode == "full" else w1s
        w4 = w4s if mode == "full" else w1s
        u1, v1, w1_, oob = stage_eval(par_ref, oy_f, ox_f, w1s, xv, yv, zv, oob)
        u2, v2, w2_, oob = stage_eval(par_ref, oy_f, ox_f, w2,
                                      xv + u1*half, yv + v1*half, zv + w1_*half, oob)
        u3, v3, w3_, oob = stage_eval(par_ref, oy_f, ox_f, w2,
                                      xv + u2*half, yv + v2*half, zv + w2_*half, oob)
        u4, v4, w4_, oob = stage_eval(par_ref, oy_f, ox_f, w4,
                                      xv + u3*idt, yv + v3*idt, zv + w3_*idt, oob)
        sixth = idt / 6.0
        dx_ref[0] = sixth * (u1 + 2*u2 + 2*u3 + u4)
        dy_ref[0] = sixth * (v1 + 2*v2 + 2*v3 + v4)
        dz_ref[0] = sixth * (w1_ + 2*w2_ + 2*w3_ + w4_)
        oob_ref[0] = oob.astype(jnp.int32)
    return kernel

def _build_stage_eval(grid, sigma, nv, HL, gs, c_off, c_diag):
    # steal the closure from gi._make_kernel by calling it and grabbing cells
    k = gi._make_kernel(grid, sigma, 120.0, nv, HL)
    for cell in k.__closure__:
        v = cell.cell_contents
        if callable(v) and getattr(v, "__name__", "") == "stage_eval":
            return v
    raise RuntimeError("stage_eval not found")

def run_variant(mode):
    nv = pk.n_value_lanes(grid.us, grid.ws)
    HL = vtabs[0].full.shape[-1]
    org = gi.block_origins(grid, x, y)
    params = gi._params_array(grid, cfg.z0)
    kern = make_variant(grid, float(cfg.tension_sigma), 120.0, nv, HL, mode)
    n = x.shape[0]; B = n // P
    out_shape = [jax.ShapeDtypeStruct((B, PS, 128), jnp.float32)]*3 + [
        jax.ShapeDtypeStruct((B, PS, 128), jnp.int32)]
    def blk(b, org_ref): return (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM)]*4,
        scratch_shapes=[pltpu.VMEM((WY, WX, HL), jnp.float32)]*3 + [
            pltpu.SemaphoreType.DMA((3,))],
    )
    xb = x.reshape(B, PS, 128); yb = y.reshape(B, PS, 128); zb = z.reshape(B, PS, 128)
    f = jax.jit(lambda: pl.pallas_call(kern, out_shape=out_shape,
                                       grid_spec=grid_spec)(
        org, params, xb, yb, zb, vtabs[0].full, vtabs[1].full, vtabs[2].full))
    out = jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(10):
        out = f()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"{mode}: {dt*1e3:.2f} ms -> {N/dt:.3e}/s", flush=True)

for mode in ("no_dma", "one_dma", "full"):
    run_variant(mode)
