"""Megakernel behaviors 1-3 + settlement (interpret mode) vs the XLA
paths (VERDICT r3 next #5: extend the megakernel to behaviors 1-3 and
the settlement freeze).

Reference: behavior_module.f90 types 1/2 (near-surface / near-bottom
zone orientation), type 3 (DVM), settlement_module.f90 testSettlement
(SURVEY.md SS2.1 #8/#9).
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from ltjax import packed as pk
from ltjax import spatial
from ltjax import state as st
from ltjax import synth
from ltjax.config import Config
from ltjax.grid import locate
from ltjax.kernels import ext_step as es
from ltjax.physics import boundary as bd
from ltjax.physics import settlement as stl
from ltjax.step import StepContext, boundary_s_max, internal_step


def _setup(cfg_kw, us=6, t0_day=None):
    dtype = jnp.float32
    c = synth.make_solid_body_case(nx=41, ny=41, us=us, lx=100e3,
                                   ly=100e3, h0=50.0, omega=1e-4,
                                   dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    cfg = Config(numpar=256, dt=1800, idt=450, us=us, ws=us + 1,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, **cfg_kw)
    rng_ = np.random.default_rng(11)
    n = 256
    p = st.init_particles(rng_.uniform(36e3, 62e3, n),
                          rng_.uniform(36e3, 62e3, n),
                          rng_.uniform(-45.0, -2.0, n), dtype=dtype)
    i, _ = locate(grid.x_rho, p.x, grid.uniform)
    j, _ = locate(grid.y_rho, p.y, grid.uniform)
    p, _ = spatial.sort_by_cell(p, i, j)
    p = p._replace(status=jnp.full(n, st.ACTIVE, jnp.int32))
    return c, cfg, grid, bounds, fs, p


@pytest.mark.parametrize("behavior", [1, 2, 3])
def test_mega_behavior_swim_parity(behavior):
    """Megakernel behaviors 1-3 (interpret) vs the records-mode XLA
    scan: identical BEHAVE/MORTALITY Threefry streams + the same zone
    logic => per-particle agreement to f32 round-off."""
    kw = dict(Behavior=behavior, swimstart=0.0, swimslow=1e-3,
              swimfast=4e-3, pediage=86400.0)
    c, cfg, grid, bounds, fs, p = _setup(kw)
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    n_int = cfg.internal_steps
    n = cfg.numpar
    # t0 chosen mid-morning so the DVM light branch is exercised;
    # particles released AT t0 (the kernel derives age as t - dob, so a
    # consistent initial state needs dob == t0 when age starts at 0)
    t0 = 9.0 * 3600.0
    p = p._replace(dob=jnp.full(n, t0, jnp.float32),
                   status=jnp.full(n, st.NOT_RELEASED, jnp.int32))

    prec = pk.build_packed_records(grid, fs)
    rtab = pk.build_record_tables(grid, prec)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    dvm = ((float(cfg.twistart), float(cfg.twiend), float(cfg.Em))
           if behavior == 3 else None)
    params = es.params_array_ext(grid, bounds, cfg.z0, t0, fs.times,
                                 float(cfg.idt), n_int, dvm=dvm)
    beh = dict(pediage=float(cfg.pediage), swimstart=float(cfg.swimstart),
               swimslow=float(cfg.swimslow), swimfast=float(cfg.swimfast),
               Kp=float(cfg.Kp), thresh=float(cfg.thresh))
    rngk = es.rng_keys_array(jr.key(0), 0, n_int, behave=True)
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb,
     oob) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        0.0, n_int, float(cfg.idt), n_iter=2, p_block=256,
        s_max=boundary_s_max(bounds), open_exits=True,
        pids=p.pid, rngk=rngk, behavior=behavior, beh=beh,
        interpret=True)

    rft = pk.build_records_flat(grid, prec)
    pp = p
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs,
                           t0 + ii * float(cfg.idt), ii, rft,
                           mode="records")
    ok = ~np.asarray(oob)
    assert ok.sum() > 0.9 * n
    # the behavior must actually displace particles vertically
    assert float(np.abs(np.asarray(zo) - np.asarray(p.z)).max()) > 0.01
    np.testing.assert_allclose(np.asarray(zo)[ok], np.asarray(pp.z)[ok],
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(xo)[ok], np.asarray(pp.x)[ok],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(yo)[ok], np.asarray(pp.y)[ok],
                               rtol=0, atol=0.5)
    assert np.array_equal(np.asarray(sto)[ok], np.asarray(pp.status)[ok])


def test_mega_settlement_matches_xla():
    """Megakernel settlement (full-cell fast path + partial-cell defer
    through the exact patch) vs the XLA scan: statuses and polygon ids
    must agree for EVERY particle (the step-level driver resolves the
    deferred ones exactly)."""
    from ltjax.step import make_fused_external_steps

    kw = dict(settlementon=True, pediage=0.0)
    c, cfg, grid, bounds, fs, p = _setup(kw)
    # habitat: a 10x10 km square (16 cells, interior fully-inside
    # cells + rim partial cells) + a hole in its middle
    poly = [(101, np.asarray([[45e3, 45e3], [55e3, 45e3],
                              [55e3, 55e3], [45e3, 55e3]]))]
    hole = [(1, np.asarray([[49e3, 49e3], [51e3, 49e3],
                            [51e3, 51e3], [49e3, 51e3]]))]
    polys = stl.build_polygons(poly, np.asarray(bounds.x_edges),
                               np.asarray(bounds.y_edges))
    holes = stl.build_polygons(hole, np.asarray(bounds.x_edges),
                               np.asarray(bounds.y_edges))
    ctx = StepContext(grid=grid, bounds=bounds, polys=polys, holes=holes)

    fused = make_fused_external_steps(ctx, cfg, jr.key(0), 1,
                                      interpret=True)
    fsR = synth.fieldset_window(c, -900.0, 1800.0, 3, dtype=jnp.float32)
    out = fused(p, fsR, 0.0, 0)

    pp = p
    prec = pk.build_packed_records(grid, fs)
    for ii in range(cfg.internal_steps):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs,
                           ii * float(cfg.idt), ii, prec,
                           mode="collapsed")

    n_settled = int(np.sum(np.asarray(out.status) == st.SETTLED))
    assert n_settled > 5, n_settled          # test must not be vacuous
    assert np.array_equal(np.asarray(out.status), np.asarray(pp.status))
    assert np.array_equal(np.asarray(out.settle_poly),
                          np.asarray(pp.settle_poly))
    ok = np.asarray(pp.status) == st.ACTIVE
    np.testing.assert_allclose(np.asarray(out.x)[ok],
                               np.asarray(pp.x)[ok], rtol=0, atol=0.5)


def test_turbulent_oob_rate_under_patch_capacity():
    """VERDICT r3 weak #3: pin the megakernel window-miss (oob) rate
    for a TURBULENT config in the CPU suite — random kicks widen block
    spread, and the exact-patch capacity (numpar // oob_frac) must sit
    clearly above the steady rate or overflow freezes particles as
    ERROR (the round-3 feedback incident)."""
    dtype = jnp.float32
    us = 4
    c = synth.make_solid_body_case(nx=64, ny=64, us=us, lx=160e3,
                                   ly=160e3, h0=50.0, omega=5e-5,
                                   dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    # parabolic Aks so the Visser kicks are real
    z_w = 50.0 * np.asarray(c.grid.s_w)
    K = 1e-4 + 4e-3 * (1.0 - (2.0 * z_w / 50.0 + 1.0) ** 2)
    aks = np.broadcast_to(K[None, None, None, :],
                          (3, 64, 64, us + 1)).astype(np.float32)
    fs = fs._replace(aks=jnp.asarray(aks))
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    cfg = Config(numpar=8192, dt=1800, idt=450, us=us, ws=us + 1,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, HTurbOn=True, ConstantHTurb=1.0,
                 VTurbOn=True, readAks=True)
    n = cfg.numpar
    n_int = cfg.internal_steps
    rng_ = np.random.default_rng(3)
    # ~14 particles/cell with p_block 256 -> ~18 cells per block; the
    # window-miss rate rises steeply when blocks span many cells
    # (ragged Hilbert runs), so the test pins the production density
    # regime (the 1M bench runs 25/cell at p_block 1024-2048)
    p = st.init_particles(rng_.uniform(50e3, 110e3, n),
                          rng_.uniform(50e3, 110e3, n),
                          rng_.uniform(-45.0, -5.0, n), dtype=dtype)
    p = p._replace(status=jnp.full(n, st.ACTIVE, jnp.int32))
    i, _ = locate(grid.x_rho, p.x, grid.uniform)
    j, _ = locate(grid.y_rho, p.y, grid.uniform)
    p, _ = spatial.sort_by_cell(p, i, j)

    prec = pk.build_packed_records(grid, fs, with_aks=True)
    rtab = pk.build_record_tables(grid, prec)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    params = es.params_array_ext(grid, bounds, cfg.z0, 0.0, fs.times,
                                 float(cfg.idt), n_int,
                                 const_hturb=cfg.ConstantHTurb)
    rngk = es.rng_keys_array(jr.key(0), 0, n_int)
    out = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        0.0, n_int, float(cfg.idt), n_iter=2, p_block=256,
        s_max=boundary_s_max(bounds), open_exits=True,
        pids=p.pid, rngk=rngk, hturb_on=True, vturb_on=True,
        with_aks=True, interpret=True)
    oob_frac = float(np.asarray(out[9]).mean())
    # the AUTO capacity for this config is the base n/64 = 1.56%
    # (step.resolve_oob_frac); the turbulent rate here measures ~1.0%
    # (the 1M-chip bench: 0.8-0.9%) — the assert pins it below capacity
    # with margin so a regression that widens block spread (sort,
    # window-origin, or feedback changes) fails loudly before it can
    # hit the round-3 overflow->ERROR incident
    from ltjax.step import StepContext, resolve_oob_frac
    frac = resolve_oob_frac(cfg, StepContext(grid=grid, bounds=bounds,
                                             polys=None, holes=None))
    # auto sizing: turbulent configs take the n/32 vertical-spread
    # tier, and this test's SPARSE density (2/cell) trips the
    # low-density bump to n/16
    assert cfg.numpar // frac == max(256, cfg.numpar // 16)
    # pin the miss rate below the PRODUCTION 1/64 capacity fraction
    assert oob_frac < 0.85 / 64, oob_frac


@pytest.mark.parametrize("behavior", [4, 5])
def test_mega_salt_behavior_and_sampling_parity(behavior):
    """Megakernel behaviors 4/5 (salinity-cued ontogeny) + SaltTempOn
    sampling (interpret) vs the records-mode XLA scan.

    The synthetic salt/temp fields are LINEAR in z, which both the
    kernel's constant-ladder collapsed scheme and the XLA native
    sampler reproduce exactly — parity is then rounding-level, and the
    dS/dz cue is spatially uniform (deterministically above the
    Sgradient threshold)."""
    us = 6
    kw = dict(Behavior=behavior, swimstart=0.0, swimslow=1e-3,
              swimfast=4e-3, pediage=900.0, Sgradient=0.03,
              readSalt=True, SaltTempOn=True)
    c, cfg, grid, bounds, fs, p = _setup(kw, us=us)
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    n_int = cfg.internal_steps
    n = cfg.numpar
    t0 = 0.0
    p = p._replace(dob=jnp.zeros(n, jnp.float32))

    # salt/temp linear in z: S = 30 + 0.05 z ; T = 12 + 0.1 z
    # (fields are K-last (3, Ny, Nx, us); zeta=0, h=50, Cs=s)
    z_r = 50.0 * np.asarray(c.grid.s_rho)
    S = (30.0 + 0.05 * z_r).astype(np.float32)
    T = (12.0 + 0.1 * z_r).astype(np.float32)
    fs = fs._replace(
        salt=jnp.broadcast_to(jnp.asarray(S)[None, None, None, :],
                              fs.salt.shape),
        temp=jnp.broadcast_to(jnp.asarray(T)[None, None, None, :],
                              fs.temp.shape))

    prec = pk.build_packed_records(grid, fs, with_scalars=True)
    rtab = pk.build_record_tables(grid, prec, paired=True)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    params = es.params_array_ext(grid, bounds, cfg.z0, t0, fs.times,
                                 float(cfg.idt), n_int)
    beh = dict(pediage=float(cfg.pediage), swimstart=float(cfg.swimstart),
               swimslow=float(cfg.swimslow), swimfast=float(cfg.swimfast),
               Kp=float(cfg.Kp), thresh=float(cfg.thresh),
               Sgradient=float(cfg.Sgradient))
    rngk = es.rng_keys_array(jr.key(0), 0, n_int, behave=True)
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb,
     oob) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        cfg.tension_sigma, n_int, float(cfg.idt), n_iter=2, p_block=256,
        s_max=boundary_s_max(bounds), open_exits=True, precision="pair2",
        pids=p.pid, rngk=rngk, behavior=behavior, beh=beh,
        salt_on=True, with_scalars=True, salts=p.salt, temps=p.temp,
        interpret=True)

    rft = pk.build_records_flat(grid, prec)
    pp = p
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs,
                           t0 + ii * float(cfg.idt), ii, rft,
                           mode="records")
    ok = ~np.asarray(oob)
    assert ok.sum() > 0.9 * n
    # swimming must actually happen, and pediveliger down-swim engages
    # mid-window (pediage = 900 s of the 1800 s step)
    assert float(np.abs(np.asarray(zo) - np.asarray(p.z)).max()) > 0.01
    np.testing.assert_allclose(np.asarray(zo)[ok], np.asarray(pp.z)[ok],
                               rtol=0, atol=2e-3)
    # ~1e-5 relative = pair2 blend rounding at these velocities
    np.testing.assert_allclose(np.asarray(xo)[ok], np.asarray(pp.x)[ok],
                               rtol=0, atol=1.0)
    # sampled salinity/temperature track the XLA sampler (linear fields
    # -> scheme-exact; tolerance covers pair2 blend rounding)
    np.testing.assert_allclose(np.asarray(salo)[ok],
                               np.asarray(pp.salt)[ok], rtol=0,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(temo)[ok],
                               np.asarray(pp.temp)[ok], rtol=0,
                               atol=2e-3)
    assert np.array_equal(np.asarray(sto)[ok], np.asarray(pp.status)[ok])


def test_mega_tst_parity():
    """Megakernel behavior 7 (tidal-stream transport, interpret) vs the
    records-mode XLA scan: ride at Swimdepth with Hswimspeed along the
    current when it runs, hold near bottom otherwise."""
    kw = dict(Behavior=7, swimstart=0.0, swimslow=1e-3, swimfast=4e-3,
              pediage=86400.0, Hswimspeed=0.05, Swimdepth=3.0)
    c, cfg, grid, bounds, fs, p = _setup(kw)
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    n_int = cfg.internal_steps
    n = cfg.numpar
    t0 = 0.0
    p = p._replace(dob=jnp.zeros(n, jnp.float32))

    prec = pk.build_packed_records(grid, fs)
    rtab = pk.build_record_tables(grid, prec, paired=True)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    params = es.params_array_ext(grid, bounds, cfg.z0, t0, fs.times,
                                 float(cfg.idt), n_int)
    beh = dict(pediage=float(cfg.pediage), swimstart=float(cfg.swimstart),
               swimslow=float(cfg.swimslow), swimfast=float(cfg.swimfast),
               Kp=float(cfg.Kp), thresh=float(cfg.thresh),
               Sgradient=float(cfg.Sgradient),
               Hswimspeed=float(cfg.Hswimspeed),
               Swimdepth=float(cfg.Swimdepth))
    (xo, yo, zo, sto, spolo, salo, temo, hitl, hitb,
     oob) = es.ext_step_fused(
        grid, rtab, brows, params, p.x, p.y, p.z, p.dob, p.status,
        cfg.tension_sigma, n_int, float(cfg.idt), n_iter=2, p_block=256,
        s_max=boundary_s_max(bounds), open_exits=True, precision="pair2",
        pids=p.pid, behavior=7, beh=beh, interpret=True)

    rft = pk.build_records_flat(grid, prec)
    pp = p
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs,
                           t0 + ii * float(cfg.idt), ii, rft,
                           mode="records")
    ok = ~np.asarray(oob)
    assert ok.sum() > 0.9 * n
    # the solid-body current is ~0.5-2 m/s here: everyone rides, so
    # vertical positions must pull toward Swimdepth below the surface
    assert float(np.abs(np.asarray(zo) - np.asarray(p.z)).max()) > 1.0
    np.testing.assert_allclose(np.asarray(zo)[ok], np.asarray(pp.z)[ok],
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(xo)[ok], np.asarray(pp.x)[ok],
                               rtol=0, atol=1.0)
    np.testing.assert_allclose(np.asarray(yo)[ok], np.asarray(pp.y)[ok],
                               rtol=0, atol=1.0)
    assert np.array_equal(np.asarray(sto)[ok], np.asarray(pp.status)[ok])


def test_mega_aks_split_matches_combined_and_xla():
    """Round-5 Aks-split kernel mode (packed.build_record_tables_split):
    the Visser profile gathered from the separate paired Aks window must
    reproduce (a) the combined-table kernel and (b) the records-mode
    XLA scan, for every in-window particle.  Interpret mode."""
    dtype = jnp.float32
    us = 4
    c = synth.make_solid_body_case(nx=64, ny=64, us=us, lx=160e3,
                                   ly=160e3, h0=50.0, omega=5e-5,
                                   dtype=dtype)
    fs = synth.fieldset_for(c, t_center=900.0, dt=1800.0, dtype=dtype)
    z_w = 50.0 * np.asarray(c.grid.s_w)
    K = 1e-4 + 4e-3 * (1.0 - (2.0 * z_w / 50.0 + 1.0) ** 2)
    fs = fs._replace(aks=jnp.broadcast_to(
        jnp.asarray(K, np.float32)[None, None, None, :],
        fs.aks.shape))
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=2048, dt=1800, idt=450, us=us, ws=us + 1,
                 OpenOceanBoundary=True, dtype_pos="float32",
                 reflect_iters=2, HTurbOn=True, ConstantHTurb=1.0,
                 VTurbOn=True, readAks=True, kernel_block=256,
                 kernel_precision="pair2")
    n = cfg.numpar
    n_int = cfg.internal_steps
    rng_ = np.random.default_rng(3)
    p = st.init_particles(rng_.uniform(60e3, 100e3, n),
                          rng_.uniform(60e3, 100e3, n),
                          rng_.uniform(-45.0, -5.0, n), dtype=dtype)
    p = p._replace(status=jnp.full(n, st.ACTIVE, jnp.int32))
    i, _ = locate(grid.x_rho, p.x, grid.uniform)
    j, _ = locate(grid.y_rho, p.y, grid.uniform)
    p, _ = spatial.sort_by_cell(p, i, j)

    prec = pk.build_packed_records(grid, fs, with_aks=True)
    brows = jnp.asarray(es.boundary_rows_table(bounds, grid.ny, grid.nx))
    s_max = boundary_s_max(bounds)
    params = es.params_array_ext(grid, bounds, cfg.z0, 0.0, fs.times,
                                 float(cfg.idt), n_int,
                                 const_hturb=cfg.ConstantHTurb)
    rngk = es.rng_keys_array(jr.key(0), 0, n_int)
    common = dict(
        sigma=0.0, n_int=n_int, idt=float(cfg.idt), n_iter=2,
        p_block=256, s_max=s_max, precision="pair2", open_exits=True,
        pids=p.pid, rngk=rngk, hturb_on=True, vturb_on=True,
        with_aks=True, interpret=True)

    rt_main, rt_aks = pk.build_record_tables_split(grid, prec)
    out_s = es.ext_step_fused(grid, rt_main, brows, params,
                              p.x, p.y, p.z, p.dob, p.status,
                              rtab_aks=rt_aks, **common)
    rt_comb = pk.build_record_tables(grid, prec, paired=True)
    out_c = es.ext_step_fused(grid, rt_comb, brows, params,
                              p.x, p.y, p.z, p.dob, p.status, **common)

    ok = ~(np.asarray(out_s[9]) | np.asarray(out_c[9]))
    assert ok.sum() > 0.9 * n
    # same RNG streams, same profile math -> near-identical trajectories
    np.testing.assert_allclose(np.asarray(out_s[0])[ok],
                               np.asarray(out_c[0])[ok], rtol=0,
                               atol=0.2)
    np.testing.assert_allclose(np.asarray(out_s[2])[ok],
                               np.asarray(out_c[2])[ok], rtol=0,
                               atol=2e-2)
    assert np.array_equal(np.asarray(out_s[3])[ok],
                          np.asarray(out_c[3])[ok])

    # and vs the records-mode XLA scan on a subset
    rft = pk.build_records_flat(grid, prec)
    sub = jax.tree.map(lambda a: a[:512], p)
    pp = sub
    for ii in range(n_int):
        pp = internal_step(ctx, cfg, jr.key(0), pp, fs,
                           ii * float(cfg.idt), ii, rft, mode="records")
    okr = ok[:512] & (np.asarray(pp.status) == st.ACTIVE)
    np.testing.assert_allclose(np.asarray(out_s[0])[:512][okr],
                               np.asarray(pp.x)[okr], rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(out_s[2])[:512][okr],
                               np.asarray(pp.z)[okr], rtol=0, atol=0.05)


def test_behavior4_without_salttempon_runs_mega():
    """Round-4 latent bug: Behavior 4/5 with SaltTempOn OFF crashed the
    megakernel at trace time (salt lanes were keyed on SaltTempOn
    alone; cfg.needs_salt_fields() now packs them for the cue
    regardless of output sampling)."""
    c = synth.make_solid_body_case(nx=33, ny=33, us=4, lx=80e3, ly=80e3,
                                   h0=50.0, omega=5e-5, dtype=jnp.float32)
    fsR = synth.fieldset_window(c, -900.0, 1800.0, 3, dtype=jnp.float32)
    grid = c.grid
    bounds = bd.build_boundaries(np.asarray(grid.mask_rho),
                                 np.asarray(grid.x_rho),
                                 np.asarray(grid.y_rho))
    ctx = StepContext(grid=grid, bounds=bounds, polys=None, holes=None)
    cfg = Config(numpar=512, dt=1800, idt=450, us=4, ws=5, readSalt=True,
                 Behavior=4, SaltTempOn=False, swimslow=1e-3,
                 swimfast=3e-3, pediage=5e6, Sgradient=0.5,
                 dtype_pos="float32", kernel_block=256,
                 kernel_precision="pair2", oob_frac=1)
    cfg.validate()
    from ltjax.step import make_fused_external_steps
    rng_ = np.random.default_rng(0)
    p = st.init_particles(rng_.uniform(20e3, 60e3, 512),
                          rng_.uniform(20e3, 60e3, 512),
                          rng_.uniform(-40, -5, 512), dtype=jnp.float32)
    p = p._replace(status=jnp.full(512, st.ACTIVE, jnp.int32))
    f = make_fused_external_steps(ctx, cfg, jr.key(0), 1, interpret=True)
    out = f(p, fsR, 0.0, 0)
    assert int(jnp.sum(out.status == st.ACTIVE)) == 512
    # salt must NOT be sampled into the output (SaltTempOn off)
    assert float(jnp.abs(out.salt).max()) == 0.0
