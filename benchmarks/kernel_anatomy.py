"""Dev microbench: per-component cost anatomy of the fused RK4 kernel.

Builds stripped-down variants of the gather_interp stage evaluation
(same window DMA + block structure as rk4_displacement_fused, one
internal step, 4 stage evals) and times them on the real chip:

  dma    : window DMAs only (compute = copy lane 0)
  build  : + the 4 bilinear one-hot weight builds (no matmul)
  blend  : + the MXU blend matmuls (no vertical spline)
  fit    : + knots + tension-spline Thomas fit (no eval)
  full   : + spline eval + log layer (== production stage_eval)

Run: ``python benchmarks/kernel_anatomy.py [N] [p_block] [passes]
[wy] [wx] [sfast]`` (passes: 1|2|3|6 MXU passes for the blend; wy/wx:
window cells; sfast: 1 = constant-ladder s-space vertical scheme).
"""
import functools
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build
from ltjax import packed as pk
from ltjax import spatial as sp
from ltjax.grid import locate
from ltjax.kernels import gather_interp as gi

PB = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 3
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N = (N // PB) * PB  # whole blocks
W_Y = int(sys.argv[4]) if len(sys.argv) > 4 else 16
W_X = int(sys.argv[5]) if len(sys.argv) > 5 else 16
SFAST = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False

cfg, ctx, fs, p = build(numpar=N)
grid = ctx.grid
idt = float(cfg.idt)
prec = jax.block_until_ready(
    jax.jit(lambda: pk.build_packed_records(grid, fs))())
vtabs = jax.block_until_ready(
    jax.jit(lambda: pk.stage_value_tables(grid, prec, 0.0, idt))())
ci, _ = locate(grid.x_rho, p.x, grid.uniform)
cj, _ = locate(grid.y_rho, p.y, grid.uniform)
ps, _ = sp.sort_by_cell(p, ci, cj, aspect_y=max(1, W_Y // W_X))
ps = jax.block_until_ready(ps)

WY, WX = W_Y, W_X
WC = WY * WX
nv = pk.n_value_lanes(grid.us, grid.ws)
HL = vtabs[0].full.shape[-1]
HLc = min(HL, ((nv + 63) // 64) * 64)
P_ = PB
PS = P_ // 128
assert N % P_ == 0
B = N // P_
precision = {1: jax.lax.Precision.DEFAULT, 3: "hilo3",
             6: jax.lax.Precision.HIGHEST}[PASSES]


from ltjax.grid import affine_ladders
LADDER = affine_ladders(grid) if SFAST else None


def make_variant_kernel(level: str):
    stage_eval = gi.make_stage_eval(grid, 0.0, nv, HL, P_, precision,
                                    window=(WY, WX), fast_math=True,
                                    ladder=LADDER)
    gs, c_off, c_diag = gi._gs_fns(0.0)
    blend_dot = gi.blend_dot_fn(precision)
    us, ws = grid.us, grid.ws
    nx, ny = grid.nx, grid.ny

    def partial_eval(par_ref, oy_f, ox_f, win, xv, yv, zv, oob):
        """Stripped stage eval at the requested level."""
        tx = (xv - par_ref[gi._IDX_X0]) * par_ref[gi._IDX_INVDX]
        ty = (yv - par_ref[gi._IDX_Y0]) * par_ref[gi._IDX_INVDY]
        i = jnp.clip(jnp.floor(tx), 0.0, float(nx - 2))
        j = jnp.clip(jnp.floor(ty), 0.0, float(ny - 2))
        fx = jnp.clip(tx - i, 0.0, 1.0)
        fy = jnp.clip(ty - j, 0.0, 1.0)
        li = jnp.clip(i - ox_f, 0.0, float(WX - 2))
        lj = jnp.clip(j - oy_f, 0.0, float(WY - 2))
        wt = gi.make_bilinear_onehot(li, lj, fx, fy, P_, WY, WX)
        if level == "build":
            # consume wt without a matmul
            s = jnp.sum(wt.reshape(WC, PS, 128), axis=0)
            return s * 1e-6, s * 1e-6, s * 1e-6, oob
        blended = blend_dot(win, wt)
        bl = blended.reshape(HLc, PS, 128)
        zeta = bl[nv - 2]
        h = bl[nv - 1]
        if level == "blend":
            return bl[0] * 1e-6 + zeta * 0, bl[us] * 1e-6, bl[2 * us] * 1e-6, oob
        hc = par_ref[gi._IDX_HC]

        def knots(pair0, K):
            out = []
            for k in range(K):
                s = par_ref[gi._IDX_SC0 + 2 * (pair0 + k)]
                cs = par_ref[gi._IDX_SC0 + 2 * (pair0 + k) + 1]
                zz0 = hc * s + (h - hc) * cs
                out.append(zz0 + zeta * (1.0 + zz0 / h))
            return out
        def knots_fast(pair0, K, hinv):
            out = []
            for k in range(K):
                s = par_ref[gi._IDX_SC0 + 2 * (pair0 + k)]
                cs = par_ref[gi._IDX_SC0 + 2 * (pair0 + k) + 1]
                zz0 = hc * s + (h - hc) * cs
                out.append(zz0 + zeta * (1.0 + zz0 * hinv))
            return out

        def recip(x):
            r = pl.reciprocal(x, approx=True)
            return r * (2.0 - x * r)          # one Newton step

        def fit_fast(zk, yks):
            K = len(zk)
            hh = [zk[k + 1] - zk[k] for k in range(K - 1)]
            inv_h = [recip(v) for v in hh]
            off = [v * c_off for v in hh]
            dia = [v * c_diag for v in hh]
            zero = jnp.zeros_like(zk[0])
            cp = [zero] * K
            invs = [zero] * K
            for i2 in range(1, K - 1):
                invs[i2] = recip((dia[i2 - 1] + dia[i2])
                                 - off[i2 - 1] * cp[i2 - 1])
                cp[i2] = off[i2] * invs[i2]
            outs = []
            for yk in yks:
                dy = [(yk[k + 1] - yk[k]) * inv_h[k] for k in range(K - 1)]
                dp = [zero] * K
                for i2 in range(1, K - 1):
                    dp[i2] = ((dy[i2] - dy[i2 - 1])
                              - off[i2 - 1] * dp[i2 - 1]) * invs[i2]
                z2 = [zero] * K
                acc = zero
                for i2 in range(K - 2, 0, -1):
                    acc = dp[i2] - cp[i2] * acc
                    z2[i2] = acc
                outs.append(z2)
            return outs

        prof_u = [bl[k] for k in range(us)]
        prof_v = [bl[us + k] for k in range(us)]
        prof_w = [bl[2 * us + k] for k in range(ws)]
        if level == "fit":
            z_r = knots(0, us)
            z_w = knots(us, ws)
            z2u, z2v = gi._fit_thomas_multi(z_r, [prof_u, prof_v],
                                            c_off, c_diag)
            z2w = gi._fit_thomas(z_w, prof_w, c_off, c_diag)
            return (z2u[1] * 1e-6 + bl[0], z2v[1] * 1e-6 + bl[us],
                    z2w[1] * 1e-6 + bl[2 * us], oob)
        if level == "fitfast":
            hinv = recip(h)
            z_r = knots_fast(0, us, hinv)
            z_w = knots_fast(us, ws, hinv)
            z2u, z2v = fit_fast(z_r, [prof_u, prof_v])
            (z2w,) = fit_fast(z_w, [prof_w])
            return (z2u[1] * 1e-6 + bl[0], z2v[1] * 1e-6 + bl[us],
                    z2w[1] * 1e-6 + bl[2 * us], oob)
        raise AssertionError(level)

    def kernel(org_ref, par_ref, x_ref, y_ref, z_ref,
               t1_hbm, t2_hbm, t4_hbm,
               dx_ref, dy_ref, dz_ref, oob_ref,
               w1s, w2s, w4s, sems):
        b = pl.program_id(0)
        oy = org_ref[2 * b]
        ox = org_ref[2 * b + 1]
        cps = [pltpu.make_async_copy(
            hbm.at[pl.ds(oy, WY), pl.ds(ox, WX), :], w, sems.at[k])
            for k, (hbm, w) in enumerate(
                [(t1_hbm, w1s), (t2_hbm, w2s), (t4_hbm, w4s)])]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        oy_f = oy.astype(jnp.float32)
        ox_f = ox.astype(jnp.float32)
        xv = x_ref[0]
        yv = y_ref[0]
        zv = z_ref[0]
        oob = jnp.zeros((PS, 128), jnp.bool_)
        if level == "dma":
            dx_ref[0] = w1s[0, 0, 0] + xv * 0
            dy_ref[0] = w2s[0, 0, 0] + yv * 0
            dz_ref[0] = w4s[0, 0, 0] + zv * 0
            oob_ref[0] = oob.astype(jnp.int32)
            return
        ev = (stage_eval if level == "full" else partial_eval)
        half = 0.5 * idt
        win1 = w1s[:].reshape(WC, HL)[:, :HLc]
        win2 = w2s[:].reshape(WC, HL)[:, :HLc]
        win4 = w4s[:].reshape(WC, HL)[:, :HLc]
        u1, v1, w1, oob = ev(par_ref, oy_f, ox_f, win1, xv, yv, zv, oob)
        u2, v2, w2, oob = ev(par_ref, oy_f, ox_f, win2,
                             xv + u1 * half, yv + v1 * half,
                             zv + w1 * half, oob)
        u3, v3, w3, oob = ev(par_ref, oy_f, ox_f, win2,
                             xv + u2 * half, yv + v2 * half,
                             zv + w2 * half, oob)
        u4, v4, w4, oob = ev(par_ref, oy_f, ox_f, win4,
                             xv + u3 * idt, yv + v3 * idt,
                             zv + w3 * idt, oob)
        sixth = idt / 6.0
        dx_ref[0] = sixth * (u1 + 2 * u2 + 2 * u3 + u4)
        dy_ref[0] = sixth * (v1 + 2 * v2 + 2 * v3 + v4)
        dz_ref[0] = sixth * (w1 + 2 * w2 + 2 * w3 + w4)
        oob_ref[0] = oob.astype(jnp.int32)

    return kernel


def run_variant(level: str):
    kern = make_variant_kernel(level)
    out_shape = [jax.ShapeDtypeStruct((B, PS, 128), jnp.float32)] * 3 + [
        jax.ShapeDtypeStruct((B, PS, 128), jnp.int32)]

    def blk(b, org_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PS, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((1, PS, 128), blk,
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((WY, WX, HL), jnp.float32),
            pltpu.VMEM((WY, WX, HL), jnp.float32),
            pltpu.VMEM((WY, WX, HL), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    t1, t2, t4 = vtabs
    org = gi.block_origins(grid, ps.x, ps.y, P_, window=(WY, WX))
    params = gi._params_array(grid, cfg.z0)

    @jax.jit
    def f(x, y, z):
        xb = x.reshape(B, PS, 128)
        yb = y.reshape(B, PS, 128)
        zb = z.reshape(B, PS, 128)
        return pl.pallas_call(kern, out_shape=out_shape,
                              grid_spec=grid_spec)(
            org, params, xb, yb, zb, t1.full, t2.full, t4.full)

    out = jax.block_until_ready(f(ps.x, ps.y, ps.z))
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(ps.x, ps.y, ps.z)
    jax.block_until_ready(out)
    dt_s = (time.perf_counter() - t0) / reps
    return dt_s


print(f"N={N} p_block={PB} passes={PASSES} window={WY}x{WX} "
      f"HLc={HLc} sfast={int(SFAST)}")
prev = 0.0
for level in ["dma", "build", "blend", "fit", "fitfast", "full"]:
    t = run_variant(level)
    print(f"{level:6s}: {t*1e3:7.3f} ms/int-step   "
          f"delta {((t - prev))*1e3:7.3f} ms   "
          f"{N/t/1e6:7.1f} M stage-sets/s")
    prev = t
