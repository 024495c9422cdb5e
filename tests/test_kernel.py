"""Fused Pallas RK4 kernel (interpret mode) vs its XLA mirror.

The kernel (ltjax.kernels.gather_interp) must reproduce the
blend-then-fit collapsed scheme (ltjax.packed.rk4_displacement_collapsed)
for every particle: in-window particles via the in-VMEM math, Hilbert
discontinuity stragglers via the exact oob patch.  Interpret mode
executes the same program on CPU, so this pins the kernel logic without
TPU hardware (the TPU numeric check runs in benchmarks/kernel_check.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ltjax import packed as pk
from ltjax import spatial
from ltjax import synth
from ltjax.grid import locate
from ltjax.kernels import gather_interp as gi


@pytest.fixture(scope="module", params=[0.0, 4.0],
                ids=["affine-ladder", "stretched"])
def case(request):
    # theta_s=0 -> Cs==s -> grid.affine_ladders set -> the kernels take
    # the sfast constant-ladder vertical scheme; theta_s=4 -> genuinely
    # stretched Cs (with hc=h0) -> per-particle z-space scheme.  Both
    # must match the collapsed XLA mirror.
    dtype = jnp.float32
    c = synth.make_solid_body_case(nx=41, ny=41, us=10, lx=100e3, ly=100e3,
                                   h0=50.0, omega=1e-4, shear_a=0.004,
                                   theta_s=request.param, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=1800.0, dt=3600.0, dtype=dtype)
    rec = pk.build_packed_records(c.grid, fs)
    vtabs = pk.stage_value_tables(c.grid, rec, 100.0, 120.0)
    rng = np.random.default_rng(11)
    n = 512
    # clustered so a Hilbert-sorted 256-block fits one 16x16 window
    # (the overflow path beyond the patch cap flags ERROR by design and
    # is exercised separately at step level)
    x = jnp.asarray(rng.uniform(35e3, 55e3, n), dtype)
    y = jnp.asarray(rng.uniform(35e3, 55e3, n), dtype)
    z = jnp.asarray(rng.uniform(-40.0, -5.0, n), dtype)
    # Hilbert-sort (kernel precondition)
    i, _ = locate(c.grid.x_rho, x, c.grid.uniform)
    j, _ = locate(c.grid.y_rho, y, c.grid.uniform)
    key = spatial.hilbert_key(i, j)
    perm = jnp.argsort(key)
    return c.grid, vtabs, x[perm], y[perm], z[perm]


@pytest.mark.parametrize("sfast", [True, False])
def test_fused_interpret_matches_mirror(case, sfast):
    grid, vtabs, x, y, z = case
    dx0, dy0, dz0 = pk.rk4_displacement_collapsed(grid, vtabs, x, y, z,
                                                  0.0, 5e-4, 120.0)
    dx1, dy1, dz1, ovf = gi.rk4_displacement_fused(
        grid, vtabs, x, y, z, 0.0, 5e-4, 120.0, p_block=256,
        sfast=sfast, interpret=True)
    assert not bool(ovf.any())
    # interpret-mode dots run in f64-ish numpy; mirror is f32 XLA —
    # agreement is to f32 round-off, not bitwise
    np.testing.assert_allclose(dx1, dx0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dy1, dy0, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dz1, dz0, rtol=2e-4, atol=2e-4)


def test_ext_step_fused_interpret_matches_collapsed_scan():
    """Whole-external-step megakernel (interpret) vs the collapsed-mode
    XLA scan of internal_step: positions + status must agree for every
    in-window particle (oob particles are the step-level patch's job)."""
    import jax.random as jr
    from ltjax import state as st
    from ltjax import spatial
    from ltjax.config import Config
    from ltjax.kernels import ext_step as es
    from ltjax.physics import boundary as bd
    from ltjax.step import StepContext, internal_step

    dtype = jnp.float32
    c = synth.make_solid_body_case(nx=41, ny=41, us=6, lx=100e3, ly=100e3,
                                   h0=50.0, omega=1e-4, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=256, dt=1800, idt=450, us=6, ws=7,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2)
    n_int = cfg.internal_steps

    rng = np.random.default_rng(5)
    n = 256
    # cluster the batch so a single 16x16 window covers everyone,
    # including a few particles near the open rim (exit path)
    x = jnp.asarray(rng.uniform(38e3, 52e3, n), dtype)
    y = jnp.asarray(rng.uniform(38e3, 52e3, n), dtype)
    z = jnp.asarray(rng.uniform(-40.0, -5.0, n), dtype)
    p = st.init_particles(np.asarray(x), np.asarray(y), np.asarray(z),
                          dtype=dtype)
    # stagger releases to exercise the in-kernel DOB gate
    dob = jnp.asarray(rng.choice([0.0, 900.0], n), dtype)
    p = p._replace(dob=dob)
    i, _ = locate(grid.x_rho, p.x, grid.uniform)
    j, _ = locate(grid.y_rho, p.y, grid.uniform)
    p, _ = spatial.sort_by_cell(p, i, j)

    prec = pk.build_packed_records(grid, fs)
    rtab = pk.build_record_tables(grid, prec)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    s_max = (int(bounds.cell_rows.shape[1]) - 8) // 8
    params = es.params_array_ext(grid, bounds, cfg.z0, 0.0, fs.times,
                                 float(cfg.idt), n_int)
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb,
     oob) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        cfg.tension_sigma, n_int, float(cfg.idt),
        n_iter=cfg.reflect_iters, p_block=256, s_max=s_max,
        open_exits=True, interpret=True)

    pp = p
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs, ii * float(cfg.idt),
                           ii, prec, mode="collapsed")

    ok = ~np.asarray(oob)
    assert ok.sum() > 0.9 * n
    np.testing.assert_allclose(np.asarray(xo)[ok], np.asarray(pp.x)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(yo)[ok], np.asarray(pp.y)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(zo)[ok], np.asarray(pp.z)[ok],
                               rtol=0, atol=1e-3)
    assert np.array_equal(np.asarray(sto)[ok], np.asarray(pp.status)[ok])


def test_ext_step_fused_turbulence_matches_xla():
    """Megakernel in-kernel HTurb + Visser VTurb (interpret) vs the XLA
    records-mode scan: identical Threefry streams + commuting profile
    interpolation => per-particle agreement to f32 round-off."""
    import jax.random as jr
    from ltjax import state as st
    from ltjax import spatial
    from ltjax.config import Config
    from ltjax.kernels import ext_step as es
    from ltjax.physics import boundary as bd
    from ltjax.step import StepContext, internal_step

    dtype = jnp.float32
    us = 6
    c = synth.make_solid_body_case(nx=41, ny=41, us=us, lx=100e3, ly=100e3,
                                   h0=50.0, omega=5e-5, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    # nonzero parabolic Aks(z) so the Visser terms are exercised
    ws = us + 1
    z_w = 50.0 * np.asarray(c.grid.s_w)
    K = 1e-4 + 4e-3 * (1.0 - (2.0 * z_w / 50.0 + 1.0) ** 2)
    aks = np.broadcast_to(K[None, :, None, None],
                          (3, ws, 41, 41)).astype(np.float32)
    # FieldSet stores K-last layout (3, Ny, Nx, ws)
    fs = fs._replace(aks=jnp.asarray(np.moveaxis(aks, 1, -1)))
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=256, dt=1800, idt=450, us=us, ws=ws,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, HTurbOn=True, ConstantHTurb=0.5,
                 VTurbOn=True, readAks=True)
    n_int = cfg.internal_steps
    base_key = jr.key(7)

    rng_ = np.random.default_rng(9)
    n = 256
    x = jnp.asarray(rng_.uniform(40e3, 52e3, n), dtype)
    y = jnp.asarray(rng_.uniform(40e3, 52e3, n), dtype)
    z = jnp.asarray(rng_.uniform(-40.0, -5.0, n), dtype)
    p = st.init_particles(np.asarray(x), np.asarray(y), np.asarray(z),
                          dtype=dtype)
    p = p._replace(status=jnp.full(n, st.ACTIVE, jnp.int32))
    i, _ = locate(grid.x_rho, p.x, grid.uniform)
    j, _ = locate(grid.y_rho, p.y, grid.uniform)
    p, _ = spatial.sort_by_cell(p, i, j)

    prec = pk.build_packed_records(grid, fs, with_aks=True)
    rtab = pk.build_record_tables(grid, prec)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    s_max = (int(bounds.cell_rows.shape[1]) - 8) // 8
    params = es.params_array_ext(grid, bounds, cfg.z0, 0.0, fs.times,
                                 float(cfg.idt), n_int,
                                 const_hturb=cfg.ConstantHTurb)
    rngk = es.rng_keys_array(base_key, 0, n_int)
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb,
     oob) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        cfg.tension_sigma, n_int, float(cfg.idt),
        n_iter=cfg.reflect_iters, p_block=256, s_max=s_max,
        pids=p.pid, rngk=rngk, hturb_on=True, vturb_on=True,
        with_aks=True, open_exits=True, interpret=True)

    rft = pk.build_records_flat(grid, prec)
    pp = p
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, base_key, pp, fs, ii * float(cfg.idt),
                           ii, rft, mode="records")

    ok = ~np.asarray(oob)
    assert ok.sum() > 0.9 * n
    np.testing.assert_allclose(np.asarray(xo)[ok], np.asarray(pp.x)[ok],
                               rtol=0, atol=1.0)
    np.testing.assert_allclose(np.asarray(yo)[ok], np.asarray(pp.y)[ok],
                               rtol=0, atol=1.0)
    np.testing.assert_allclose(np.asarray(zo)[ok], np.asarray(pp.z)[ok],
                               rtol=0, atol=0.05)
    assert np.array_equal(np.asarray(sto)[ok], np.asarray(pp.status)[ok])


def test_ext_step_pair2_matches_collapsed_scan():
    """pair2 blend scheme (pair-packed windows, bf16-exact row weights,
    2 MXU passes, post-matmul f32 fx blend) vs the collapsed XLA scan.

    Agreement bound: the row weight quantizes fy to the 1/256 lattice,
    so velocities differ by at most (per-cell Δv)/512 — on this case
    ~5e-4 m/s, i.e. ~1 m over 4 x 450 s internal steps.  Structural
    bugs (lane mix-ups, pair offsets) produce 100s of meters.
    """
    import jax.random as jr
    from ltjax import state as st
    from ltjax import spatial
    from ltjax.config import Config
    from ltjax.kernels import ext_step as es
    from ltjax.physics import boundary as bd
    from ltjax.step import StepContext, boundary_s_max, internal_step

    dtype = jnp.float32
    us = 6
    c = synth.make_solid_body_case(nx=41, ny=41, us=us, lx=100e3, ly=100e3,
                                   h0=50.0, omega=1e-4, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=256, dt=1800, idt=450, us=us, ws=us + 1,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2)
    n_int = cfg.internal_steps
    rng_ = np.random.default_rng(5)
    n = 256
    p = st.init_particles(rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(-40.0, -5.0, n), dtype=dtype)
    p = p._replace(status=jnp.full(n, st.ACTIVE, jnp.int32))
    i, _ = locate(grid.x_rho, p.x, grid.uniform)
    j, _ = locate(grid.y_rho, p.y, grid.uniform)
    p, _ = spatial.sort_by_cell(p, i, j)

    prec = pk.build_packed_records(grid, fs)
    rtab = pk.build_record_tables(grid, prec, paired=True)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    params = es.params_array_ext(grid, bounds, cfg.z0, 0.0, fs.times,
                                 float(cfg.idt), n_int)
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb,
     oob) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        0.0, n_int, float(cfg.idt), n_iter=2, p_block=256,
        s_max=boundary_s_max(bounds), precision="pair2",
        open_exits=True, interpret=True)

    pp = p
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs,
                           ii * float(cfg.idt), ii, prec, mode="collapsed")
    ok = ~np.asarray(oob)
    assert ok.sum() > 0.9 * n
    np.testing.assert_allclose(np.asarray(xo)[ok], np.asarray(pp.x)[ok],
                               rtol=0, atol=2.0)
    np.testing.assert_allclose(np.asarray(yo)[ok], np.asarray(pp.y)[ok],
                               rtol=0, atol=2.0)
    np.testing.assert_allclose(np.asarray(zo)[ok], np.asarray(pp.z)[ok],
                               rtol=0, atol=0.05)
    assert np.array_equal(np.asarray(sto)[ok], np.asarray(pp.status)[ok])


def test_fused_multi_step_matches_sequential():
    """make_fused_external_steps(n_fuse=2) over a 4-record window must
    equal two sequential 1-step fused calls on the rotating 3-record
    buffer (reference updateHydro semantics) — the only difference is
    WHEN the Hilbert sort happens, which cannot change values for
    in-window particles."""
    import jax.random as jr
    from ltjax import state as st
    from ltjax.config import Config
    from ltjax.fields import FieldSet
    from ltjax.physics import boundary as bd
    from ltjax.step import StepContext, make_fused_external_steps

    dtype = jnp.float32
    us = 6
    c = synth.make_solid_body_case(nx=41, ny=41, us=us, lx=100e3, ly=100e3,
                                   h0=50.0, omega=5e-5, dtype=dtype)
    grid = c.grid
    dt = 1800.0
    # 4-record window: records at t = 0, dt, 2dt, 3dt
    fs0 = synth.fieldset_for(c, t_center=0.5 * dt, dt=dt, dtype=dtype)
    fs1 = synth.fieldset_for(c, t_center=1.5 * dt, dt=dt, dtype=dtype)
    # stack records 0..3 (fs0 holds [−? ...]: fieldset_for centers the
    # triple buffer on t_center, giving times [t_c-dt, t_c, t_c+dt]?
    # synth uses [0, dt, 2dt]-style times; concatenate unique records
    fsR = FieldSet(*(jnp.concatenate([a, b[2:3]], axis=0)
                     for a, b in zip(fs0[:-1], fs1[:-1])),
                   times=jnp.concatenate([fs0.times,
                                          fs1.times[2:3]]))
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=256, dt=int(dt), idt=450, us=us, ws=us + 1,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, kernel_block=256)

    rng_ = np.random.default_rng(3)
    n = 256
    p = st.init_particles(rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(-40.0, -5.0, n), dtype=dtype)
    p = p._replace(status=jnp.full(n, st.ACTIVE, jnp.int32))

    key = jr.key(0)
    f1 = make_fused_external_steps(ctx, cfg, key, 1, interpret=True)
    f2 = make_fused_external_steps(ctx, cfg, key, 2, interpret=True)

    def window(e):
        return FieldSet(*(a[e:e + 3] for a in fsR[:-1]),
                        times=fsR.times[e:e + 3])

    pa = f1(p, window(0), 0.0, 0)
    pa = f1(pa, window(1), dt, 1)
    pb = f2(p, fsR, 0.0, 0)

    ok = (np.asarray(pa.status) == st.ACTIVE) & (
        np.asarray(pb.status) == st.ACTIVE)
    assert ok.sum() > 0.9 * n
    np.testing.assert_allclose(np.asarray(pb.x)[ok], np.asarray(pa.x)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(pb.y)[ok], np.asarray(pa.y)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(pb.z)[ok], np.asarray(pa.z)[ok],
                               rtol=0, atol=1e-2)
    assert np.array_equal(np.asarray(pb.status), np.asarray(pa.status))


def test_block_origins_centered(case):
    grid, vtabs, x, y, z = case
    org = gi.block_origins(grid, x, y, p_block=256)
    # flat (2B,) [oy, ox] pairs (2D SMEM operands pad to 128 lanes)
    assert org.shape == (2 * (x.shape[0] // 256),)
    org2 = np.asarray(org).reshape(-1, 2)
    # windows must lie inside the table
    assert org2.min() >= 0
    assert org2[:, 0].max() <= grid.ny - gi.WY
    assert org2[:, 1].max() <= grid.nx - gi.WX


def test_ext_step_mega_sink_mortality():
    """Megakernel behavior type 6 (constant sinking) + mortality vs the
    records-mode XLA scan (VERDICT r2 #6: extend megakernel coverage)."""
    import jax.random as jr
    from ltjax import state as st
    from ltjax import spatial
    from ltjax.config import Config
    from ltjax.kernels import ext_step as es
    from ltjax.physics import boundary as bd
    from ltjax.step import StepContext, boundary_s_max, internal_step

    dtype = jnp.float32
    us = 6
    c = synth.make_solid_body_case(nx=41, ny=41, us=us, lx=100e3, ly=100e3,
                                   h0=50.0, omega=1e-4, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=256, dt=1800, idt=450, us=us, ws=us + 1,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, Behavior=6, sink=5e-3,
                 mortality=True, deadage=1200.0)
    n_int = cfg.internal_steps
    rng_ = np.random.default_rng(7)
    n = 256
    p = st.init_particles(rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(-40.0, -5.0, n), dtype=dtype)
    # stagger dobs so some particles cross deadage mid-window
    dob = jnp.asarray(rng_.choice([0.0, 450.0, 900.0], n), dtype)
    p = p._replace(dob=dob)
    i, _ = locate(grid.x_rho, p.x, grid.uniform)
    j, _ = locate(grid.y_rho, p.y, grid.uniform)
    p, _ = spatial.sort_by_cell(p, i, j)

    prec = pk.build_packed_records(grid, fs)
    rtab = pk.build_record_tables(grid, prec)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    params = es.params_array_ext(grid, bounds, cfg.z0, 0.0, fs.times,
                                 float(cfg.idt), n_int,
                                 sink=cfg.sink, deadage=cfg.deadage)
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb,
     oob) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        0.0, n_int, float(cfg.idt), n_iter=2, p_block=256,
        s_max=boundary_s_max(bounds), open_exits=True,
        sink_on=True, mortality=True, interpret=True)

    rft = pk.build_records_flat(grid, prec)
    pp = p
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs,
                           ii * float(cfg.idt), ii, rft, mode="records")
    ok = ~np.asarray(oob)
    assert ok.sum() > 0.9 * n
    # some particles must actually have died (test is vacuous otherwise)
    assert int(np.sum(np.asarray(sto) == st.DEAD)) > 10
    assert np.array_equal(np.asarray(sto)[ok], np.asarray(pp.status)[ok])
    np.testing.assert_allclose(np.asarray(zo)[ok], np.asarray(pp.z)[ok],
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(xo)[ok], np.asarray(pp.x)[ok],
                               rtol=0, atol=0.5)


def test_ext_step_mega_frozen_block_skipped():
    """An all-frozen block (every particle settled/dead/exited/errored)
    must pass through the megakernel untouched — positions bit-equal,
    no oob flags, no collision counters — while live blocks still
    compute (the frozen-skip cond in ltjax.kernels.ext_step)."""
    from ltjax import state as st
    from ltjax.kernels import ext_step as es
    from ltjax.physics import boundary as bd
    from ltjax.step import boundary_s_max

    dtype = jnp.float32
    us = 6
    c = synth.make_solid_body_case(nx=41, ny=41, us=us, lx=100e3, ly=100e3,
                                   h0=50.0, omega=1e-4, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    n_int = 4
    rng_ = np.random.default_rng(3)
    n = 512                                # 2 blocks of 256
    p = st.init_particles(rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(-40.0, -5.0, n), dtype=dtype)
    status = np.full(n, st.ACTIVE, np.int32)
    status[256:] = np.asarray(rng_.choice(
        [st.SETTLED, st.DEAD, st.OUT_OF_DOMAIN, st.ERROR], 256))
    p = p._replace(status=jnp.asarray(status))

    prec = pk.build_packed_records(grid, fs)
    rtab = pk.build_record_tables(grid, prec)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    params = es.params_array_ext(grid, bounds, 5e-4, 0.0, fs.times,
                                 450.0, n_int)
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb,
     oob) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        0.0, n_int, 450.0, n_iter=2, p_block=256,
        s_max=boundary_s_max(bounds), open_exits=True, interpret=True)

    # frozen block: bit-equal pass-through
    np.testing.assert_array_equal(np.asarray(xo)[256:], np.asarray(p.x)[256:])
    np.testing.assert_array_equal(np.asarray(yo)[256:], np.asarray(p.y)[256:])
    np.testing.assert_array_equal(np.asarray(zo)[256:], np.asarray(p.z)[256:])
    np.testing.assert_array_equal(np.asarray(sto)[256:], status[256:])
    assert not np.asarray(oob)[256:].any()
    assert (np.asarray(hitl)[256:] == 0).all()
    # live block: particles actually moved
    assert np.abs(np.asarray(xo)[:256] - np.asarray(p.x)[:256]).max() > 1.0


def test_const_ladder_spline_matches_z_space():
    """The sfast scheme's claim (grid.affine_ladders): a tension spline
    fit at knots z_k = a + b*L_k evaluated at z equals the spline fit
    at the FIXED ladder L evaluated at s = (z-a)/b, for any per-sample
    (a, b) — including the derivative up to the 1/b chain factor."""
    rng = np.random.default_rng(0)
    K = 21
    L = np.sort(rng.uniform(-1, 0, K))
    L[0], L[-1] = -1.0, 0.0
    for sigma in (0.0, 3.0):
        gs, c_off, c_diag = gi._gs_fns(sigma)
        ds = gi._ds_fn(sigma)
        C = gi.const_ladder(L, sigma)
        n = 64
        a = rng.uniform(-0.5, 0.5, n)
        b = rng.uniform(20.0, 80.0, n)
        zk = [jnp.asarray(a + b * L[k]) for k in range(K)]
        y = rng.standard_normal((K, n))
        yk = [jnp.asarray(y[k]) for k in range(K)]
        zq = jnp.asarray(a + b * rng.uniform(-1, 0, n))
        sq = (zq - a) / b
        z2 = gi._fit_thomas(zk, yk, c_off, c_diag)
        vz = gi._eval_spline(zq, zk, yk, z2, gs)
        dz_ = gi._eval_spline_deriv(zq, zk, yk, z2, ds)
        z2s = gi._fit_thomas_const_multi([yk], C)[0]
        vs = gi._eval_spline_const_multi(sq, C, [yk], [z2s], gs)[0]
        ds_ = gi._eval_spline_deriv_const(sq, C, yk, z2s, ds) / b
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vz),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ds_), np.asarray(dz_),
                                   rtol=1e-9, atol=1e-9)

def test_depth_banded_sort_invariance():
    """config.sort_depth_bands changes only the block ORDER the
    megakernel processes, never the physics: band-major sorted runs
    must match the unbanded run (exact oob patch covers any particle
    whose block membership changed)."""
    import dataclasses
    import jax.random as jr
    from ltjax import state as st
    from ltjax.config import Config
    from ltjax.fields import FieldSet
    from ltjax.physics import boundary as bd
    from ltjax.step import StepContext, make_fused_external_steps

    dtype = jnp.float32
    us = 6
    c = synth.make_solid_body_case(nx=41, ny=41, us=us, lx=100e3, ly=100e3,
                                   h0=50.0, omega=5e-5, dtype=dtype)
    grid = c.grid
    dt = 1800.0
    fs0 = synth.fieldset_for(c, t_center=0.5 * dt, dt=dt, dtype=dtype)
    fs1 = synth.fieldset_for(c, t_center=1.5 * dt, dt=dt, dtype=dtype)
    fsR = FieldSet(*(jnp.concatenate([a, b[2:3]], axis=0)
                     for a, b in zip(fs0[:-1], fs1[:-1])),
                   times=jnp.concatenate([fs0.times, fs1.times[2:3]]))
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=256, dt=int(dt), idt=450, us=us, ws=us + 1,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, kernel_block=256, ext_sort_every=1)
    cfgb = dataclasses.replace(cfg, sort_depth_bands=3, sort_band_height=8.0)

    rng_ = np.random.default_rng(11)
    n = 256
    p = st.init_particles(rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(38e3, 52e3, n),
                          rng_.uniform(-45.0, -2.0, n), dtype=dtype)
    p = p._replace(status=jnp.full(n, st.ACTIVE, jnp.int32))

    key = jr.key(0)
    fa = make_fused_external_steps(ctx, cfg, key, 2, interpret=True)
    fb = make_fused_external_steps(ctx, cfgb, key, 2, interpret=True)
    pa = fa(p, fsR, 0.0, 0)
    pb = fb(p, fsR, 0.0, 0)

    assert np.array_equal(np.asarray(pb.status), np.asarray(pa.status))
    ok = np.asarray(pa.status) == st.ACTIVE
    assert ok.sum() > 0.9 * n
    np.testing.assert_allclose(np.asarray(pb.x)[ok], np.asarray(pa.x)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(pb.y)[ok], np.asarray(pa.y)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(pb.z)[ok], np.asarray(pa.z)[ok],
                               rtol=0, atol=1e-2)


def test_ext_step_curv_megakernel_matches_collapsed_scan():
    """CURVILINEAR megakernel (logical-state + in-window Newton,
    interpret mode) vs the collapsed-mode XLA scan on the gently-curved
    analytic mesh: positions + status must agree for every particle the
    kernel handled itself (deferred/oob particles — near-boundary cells
    and window misses — are the step-level patch's job and are excluded
    here exactly like the uniform-grid test above)."""
    import jax.random as jr
    from ltjax import state as st
    from ltjax import spatial
    from ltjax.config import Config
    from ltjax.grid import logical_coords
    from ltjax.kernels import ext_step as es
    from ltjax.physics import boundary as bd
    from ltjax.step import StepContext, internal_step, _sort_cells

    dtype = jnp.float32
    c = synth.make_curv_case(nx=41, ny=41, us=6, lx=100e3, ly=100e3,
                             h0=50.0, omega=1e-4, amp=0.03, dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    grid = c.grid
    bounds = bd.build_boundaries_curv(np.asarray(grid.mask_rho),
                                      c.x2d, c.y2d, grid.curv)
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=256, dt=1800, idt=450, us=6, ws=7,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, kernel_precision="pair2")
    n_int = cfg.internal_steps

    rng = np.random.default_rng(5)
    n = 256
    x = jnp.asarray(rng.uniform(38e3, 52e3, n), dtype)
    y = jnp.asarray(rng.uniform(38e3, 52e3, n), dtype)
    z = jnp.asarray(rng.uniform(-40.0, -5.0, n), dtype)
    p = st.init_particles(np.asarray(x), np.asarray(y), np.asarray(z),
                          dtype=dtype)
    dob = jnp.asarray(rng.choice([0.0, 900.0], n), dtype)
    p = p._replace(dob=dob)
    ci, cj = _sort_cells(grid, p)
    p, _ = spatial.sort_by_cell(p, ci, cj)

    prec = pk.build_packed_records(grid, fs)
    rtab = pk.build_record_tables(grid, prec, paired=True)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    wxy = jnp.asarray(es.curv_xy_table(grid, bounds))
    s_max = (int(bounds.cell_rows.shape[1]) - 8) // 8
    params = es.params_array_ext(grid, bounds, cfg.z0, 0.0, fs.times,
                                 float(cfg.idt), n_int, curv=True)
    tis, tjs = logical_coords(grid, p.x, p.y)
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb, oob,
     tio, tjo) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        cfg.tension_sigma, n_int, float(cfg.idt),
        n_iter=cfg.reflect_iters, p_block=256, s_max=s_max,
        precision="pair2", open_exits=True,
        wxy=wxy, tis=tis.astype(jnp.float32),
        tjs=tjs.astype(jnp.float32), interpret=True)

    pp = p
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs, ii * float(cfg.idt),
                           ii, prec, mode="collapsed")

    ok = ~np.asarray(oob)
    # interior release far from the rim: most particles stay in-kernel
    assert ok.sum() > 0.8 * n
    np.testing.assert_allclose(np.asarray(xo)[ok], np.asarray(pp.x)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(yo)[ok], np.asarray(pp.y)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(zo)[ok], np.asarray(pp.z)[ok],
                               rtol=0, atol=1e-3)
    assert np.array_equal(np.asarray(sto)[ok], np.asarray(pp.status)[ok])
    # the carried logical coordinates track the physical positions
    tchk_i, tchk_j = logical_coords(grid, xo, yo)
    np.testing.assert_allclose(np.asarray(tio)[ok],
                               np.asarray(tchk_i)[ok], rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(tjo)[ok],
                               np.asarray(tchk_j)[ok], rtol=0, atol=2e-3)
