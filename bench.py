"""Throughput benchmark: particle-steps/s/chip on the advection hot path.

Protocol (BASELINE.md): advection-only config (BASELINE.json config 1
scaled to 1M particles), >=100 internal steps after JIT warm-up,
block_until_ready timing, median of 5 repeats.  Prints ONE JSON line:

  {"metric": "particle-steps/s/chip@1M", "value": N, "unit": "steps/s",
   "vs_baseline": N}

The reference publishes no machine-performance numbers (SURVEY.md SS6),
so ``vs_baseline`` reports the achieved fraction of the conservative
gather-bandwidth roofline (2e8 particle-steps/s/chip on TPU v5e,
BASELINE.md roofline model).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

# the fused kernels compile slowly (minutes: ~30 MB of unrolled Mosaic
# IR); cache compilations across invocations
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ltjax import synth
from ltjax import state as st
from ltjax.config import Config
from ltjax.physics import boundary as bd
from ltjax.step import (StepContext, make_external_step,
                        make_fused_external_steps)

ROOFLINE = 2.0e8  # conservative particle-steps/s/chip bound (BASELINE.md)
N_FUSE = 16       # external steps per compiled call (production default:
                  # Config.ext_fuse; amortizes dispatch + Hilbert sort)


def build(numpar=1_000_000, nx=200, ny=200, us=20, dt=3600, idt=120,
          n_records=3, variant="advect"):
    """variant: "advect" (BASELINE config 1), "turb" (config 2/3:
    HTurb + Visser VTurb on Aks), "behavior" (config-4 style: type-6
    sinking + mortality), "dvm" (type-3 diel vertical migration),
    "settle" (config 4: behavior + settlement polygons — full-cell
    fast path + exact-patch deferral)."""
    dtype = jnp.float32
    kw = {}
    if variant == "turb":
        kw = dict(HTurbOn=True, ConstantHTurb=1.0, VTurbOn=True,
                  readAks=True)
    elif variant == "behavior":
        # sink rate chosen so the sinking front stays clear of the
        # bottom boundary layer within the measured window: particles
        # entering the log-layer decelerate from full speed to ~0,
        # which disperses Hilbert blocks (fast/stopped particles mix)
        # and overflows the static exact-patch capacity — measured
        # 0.85% -> 45% window misses over 8 external steps at
        # sink=1e-3 in the host-side window simulation.  Transit-heavy
        # runs size the patch capacity to the front (oob_frac 16-32
        # completes the 4M SPARSE-front transit with zero errors —
        # BASELINE.md), but a FULL-population transit (45% misses) is
        # beyond any patch capacity by design; overflow stays LOUD
        # (ERROR counts / ErrorFlag), never silent.  sink=5e-5 keeps
        # the front clear of the layer over the 96-ext-step fuse-16
        # measurement chain (the lanes' cost is magnitude-independent).
        kw = dict(Behavior=6, sink=5e-5, mortality=True, deadage=5e6)
    elif variant == "dvm":
        kw = dict(Behavior=3, swimslow=1e-3, swimfast=3e-3,
                  pediage=5e6)
    elif variant == "settle":
        # sink rate: see the behavior variant.  Patch capacity:
        # settlement defers every eligible particle that touches a
        # partial (polygon-rim) cell to the exact-PIP patch; the
        # rim-cell dwell+flux population (~10k/ext step here) shares
        # the patch capacity with window misses.  Capacity is AUTO
        # (oob_frac=0 -> step.resolve_oob_frac sizes it from the rim
        # occupancy of the release positions; overflow stays loud)
        kw = dict(Behavior=6, sink=5e-5, settlementon=True,
                  pediage=0.0)
    elif variant == "salt":
        # salinity-cued ontogenetic migration + SaltTempOn sampling —
        # runs IN the megakernel since round 4 (salt/temp record lanes,
        # in-kernel dS/dz cue + post-step sampling); measures the cost
        # of the 256-lane tables (16x16 window, 8-aligned DMA origins)
        # plus the per-step sampling fit/eval
        kw = dict(Behavior=4, readSalt=True, SaltTempOn=True,
                  swimslow=1e-3, swimfast=3e-3, pediage=5e6,
                  Sgradient=0.5)
    cfg = Config(numpar=numpar, dt=dt, idt=idt, us=us, ws=us + 1,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, **kw)
    if variant == "curv":
        # BASELINE.json config 3's realistic estuary grids are
        # CURVILINEAR (like the reference's bundled Chesapeake case).
        # On TPU this takes the curvilinear MEGAKERNEL (logical-state
        # particles + in-window Newton, kernels.ext_step curv_mode);
        # off-TPU it measures the packed-XLA fallback (seed-raster +
        # Newton inverse bilinear locate, grid.curv_logical)
        case = synth.make_curv_case(nx=nx, ny=ny, us=us, lx=200e3,
                                    ly=200e3, h0=50.0, omega=5e-5,
                                    amp=0.03, dtype=dtype)
        grid = case.grid
        bounds = bd.build_boundaries_curv(np.asarray(grid.mask_rho),
                                          case.x2d, case.y2d, grid.curv)
    else:
        case = synth.make_solid_body_case(nx=nx, ny=ny, us=us, lx=200e3,
                                          ly=200e3, h0=50.0, omega=5e-5,
                                          dtype=dtype)
        grid = case.grid
        bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                     np.asarray(grid.x_rho),
                                     np.asarray(grid.y_rho))
    polys = holes = None
    if variant == "settle":
        from ltjax.physics import settlement as stl
        # a 12x12 km habitat square in the rotation path (config 4
        # spirit: sparse habitat; most cells untouched, rim deferred)
        poly = [(101, np.asarray([[120e3, 120e3], [132e3, 120e3],
                                  [132e3, 132e3], [120e3, 132e3]]))]
        polys = stl.build_polygons(poly, np.asarray(bounds.x_edges),
                                   np.asarray(bounds.y_edges))
    ctx = StepContext(grid=grid, bounds=bounds, polys=polys, holes=holes)
    from ltjax.step import resolve_oob_frac
    fs = synth.fieldset_window(case, -float(dt) / 2, float(dt), n_records,
                               dtype=jnp.float32)
    if variant == "turb":
        # parabolic Aks(z) profile so the Visser RDM terms are real
        # (the synthetic case ships zero diffusivity)
        z_w = float(50.0) * np.asarray(case.grid.s_w)
        K = 1e-4 + 4e-3 * (1.0 - (2.0 * z_w / 50.0 + 1.0) ** 2)
        fs = fs._replace(aks=jnp.broadcast_to(
            jnp.asarray(K, jnp.float32)[None, None, None, :],
            fs.aks.shape))
    rng = np.random.default_rng(0)
    # sinking variants start shallower so the front stays clear of the
    # bottom log layer over the whole chained measurement window (the
    # bottom transition disperses blocks — see the behavior variant)
    z_lo = -25.0 if variant in ("behavior", "settle") else -40.0
    p = st.init_particles(rng.uniform(40e3, 160e3, numpar),
                          rng.uniform(40e3, 160e3, numpar),
                          rng.uniform(z_lo, -5.0, numpar), dtype=dtype)
    status = jnp.full(numpar, st.ACTIVE, jnp.int32)
    p = p._replace(status=status)
    cfg.oob_frac = resolve_oob_frac(cfg, ctx, np.asarray(p.x),
                                    np.asarray(p.y))
    return cfg, ctx, fs, p


def main():
    import sys
    variant = sys.argv[1] if len(sys.argv) > 1 else "advect"
    numpar = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    # argv[3]: external steps per compiled call; 1 = the iprint=dt
    # regime (output every external step forfeits call fusion —
    # run.py clamps ext_fuse to the output cadence)
    n_fuse = int(sys.argv[3]) if len(sys.argv) > 3 else N_FUSE
    # production path: N_FUSE external steps per compiled call over an
    # (N_FUSE+2)-record field window (ltjax.step.make_fused_external_steps
    # — the same call run.py makes when prefetch keeps records resident)
    cfg, ctx, fsR, p = build(numpar=numpar, n_records=N_FUSE + 2,
                             variant=variant)
    n_int = cfg.internal_steps  # 30 internal steps per external step
    from ltjax.fields import FieldSet
    from ltjax.step import make_external_step, mode_flags
    if mode_flags(ctx, cfg)[2] and n_fuse > 1:
        fused = make_fused_external_steps(ctx, cfg, jr.key(0), n_fuse)
        calls = N_FUSE // n_fuse

        def step(pp):
            for c in range(calls):
                e0 = c * n_fuse
                fsW = FieldSet(*(a[e0:e0 + n_fuse + 2] for a in fsR[:-1]),
                               times=fsR.times[e0:e0 + n_fuse + 2])
                pp = fused(pp, fsW, float(e0 * cfg.dt), e0)
            return pp
    elif mode_flags(ctx, cfg)[2]:
        fused1 = make_fused_external_steps(ctx, cfg, jr.key(0), 1)

        def step(pp):
            for e in range(N_FUSE):
                fs3 = FieldSet(*(a[e:e + 3] for a in fsR[:-1]),
                               times=fsR.times[e:e + 3])
                pp = fused1(pp, fs3, float(e * cfg.dt), e)
            return pp
    else:
        # configs outside megakernel coverage (the curv variant — the
        # fused kernels' arithmetic locate needs a uniform grid; all
        # the uniform-grid variants are in-kernel) run per-external-
        # step compiled calls on the packed-XLA path.  That path is
        # 1-2 orders slower, so measure fewer external steps per rep.
        one = make_external_step(ctx, cfg, jr.key(0))
        E_REP = 2

        def step(pp, e0=0):
            for e in range(E_REP):
                fs3 = FieldSet(*(a[e:e + 3] for a in fsR[:-1]),
                               times=fsR.times[e:e + 3])
                pp = one(pp, fs3, float(e * cfg.dt), e0 + e)
            return pp

    mega = mode_flags(ctx, cfg)[2]
    # warm-up / compile
    p = jax.block_until_ready(step(p))

    reps = 5 if mega else 3
    steps_per_rep = n_int * (N_FUSE if mega else 2)
    rates = []
    pp = p
    for r in range(reps):
        t0 = time.perf_counter()
        # chain the state so every rep is a distinct computation (a
        # repeated identical call was observed returning ~instantly
        # through the remote-TPU tunnel, poisoning the timing)
        pp = step(pp)
        jax.block_until_ready(pp)
        dt_s = time.perf_counter() - t0
        rates.append(cfg.numpar * steps_per_rep / dt_s)
    value = float(np.median(rates))
    from ltjax.step import summary_counts
    errs = summary_counts(pp)["error"]
    assert errs == 0, (
        f"{errs} particles hit the oob-patch overflow/ERROR path — "
        f"raise Config.oob_frac capacity")
    tag = "" if variant == "advect" else f"[{variant}]"
    if n_fuse != N_FUSE:
        tag += f"[fuse{n_fuse}]"
    scale = f"@{numpar // 1_000_000}M" if numpar >= 1_000_000 else f"@{numpar}"
    print(json.dumps({
        "metric": f"particle-steps/s/chip{scale}{tag}",
        "value": value,
        "unit": "particle-steps/s",
        "vs_baseline": value / ROOFLINE,
        "roofline": ROOFLINE,
    }))


if __name__ == "__main__":
    main()
