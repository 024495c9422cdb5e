"""Larval behavior types 0-7 as branchless masked updates.

Reference: behavior_module.f90 (SURVEY.md SS2.1 #8 [conf: H that 8
types exist; M on per-type details]).  The reference dispatches per
particle inside the hot loop; here every type's displacement is
computed for the whole batch and selected by ``jnp.where`` on the
configured type (the type is a run constant, so XLA folds the dead
branches away).

Types (LTRANS v2b User's Guide naming):
  0 passive
  1 near-surface orientation
  2 near-bottom orientation
  3 diel vertical migration (DVM) driven by modeled surface irradiance
  4 Crassostrea virginica oyster-larva ontogenetic migration
    (salinity-gradient cue)
  5 C. ariakensis variant
  6 constant sinking velocity
  7 tidal-stream transport (TST)

Common machinery: ontogenetic swim-speed ramp swimslow->swimfast over
[swimstart, pediage]; deterministic death at deadage when mortality is
on [conf: M — the reference's mortality trigger details are not
verifiable with the mount empty; age>=deadage is the documented
competency window end].

Directional swimming uses the reference's biased-random-walk idiom
[conf: M]: each internal step the larva swims at w_swim vertically,
with direction toward its preferred zone with probability P_BIAS, away
otherwise — a bounded random walk that concentrates larvae in the zone
without hard clamping.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import rng, tension
from ..fields import FieldSet
from ..grid import Grid
from ..interp import interp2d, interp_columns, locate_rho, polintd
from ..scoord import s_depths

P_BIAS = 0.8          # probability of swimming toward the preferred zone
SURFACE_ZONE = 2.0    # [m] preferred band below surface for type 1
BOTTOM_ZONE = 2.0     # [m] preferred band above bottom for type 2
TST_MIN_SPEED = 0.05  # [m/s] current speed that triggers tide-riding


class BehaveParams(NamedTuple):
    behavior: int = 0
    mortality: bool = False
    deadage: float = 1e30
    pediage: float = 0.0
    swimstart: float = 0.0
    swimslow: float = 0.0
    swimfast: float = 0.0
    Sgradient: float = 1.0
    sink: float = 0.0
    Hswimspeed: float = 0.0
    Swimdepth: float = 2.0
    # dvmparam group
    twistart: float = 4.801821
    twiend: float = 19.19956
    Em: float = 1935.077
    Kp: float = 0.4
    thresh: float = 0.0166
    idt: float = 120.0
    sigma: float = 0.0
    stochastic: bool = False


def swim_speed(age, p: BehaveParams, dtype):
    """Ontogenetic ramp swimslow -> swimfast over [swimstart, pediage]."""
    denom = max(p.pediage - p.swimstart, 1e-30)
    frac = jnp.clip((age - p.swimstart) / denom, 0.0, 1.0).astype(dtype)
    w = p.swimslow + (p.swimfast - p.swimslow) * frac
    return jnp.where(age >= p.swimstart, w, 0.0).astype(dtype)


def surface_irradiance(t, p: BehaveParams, dtype):
    """Modeled surface light: sine arc between twistart and twiend
    hours of the day, peak Em [conf: M on exact functional form]."""
    hours = (jnp.asarray(t, dtype) / 3600.0) % 24.0
    span = p.twiend - p.twistart
    tau = (hours - p.twistart) / span
    day = (tau > 0.0) & (tau < 1.0)
    return jnp.where(day, p.Em * jnp.sin(jnp.pi * tau), 0.0)


def _salt_gradient(grid: Grid, fields: FieldSet, x, y, z, t, sigma):
    """dS/dz at particles via the tension-spline derivative."""
    dtype = x.dtype
    ir, jr_, fxr, fyr = locate_rho(grid, x, y)
    fd = fields.salt.dtype
    prof = interp_columns(fields.salt, ir, jr_, fxr.astype(fd),
                          fyr.astype(fd)).astype(dtype)       # (3,N,us)
    zeta_l = interp2d(fields.zeta, ir, jr_, fxr.astype(fd),
                      fyr.astype(fd)).astype(dtype)
    h_p = interp2d(grid.h, ir, jr_, fxr.astype(grid.h.dtype),
                   fyr.astype(grid.h.dtype)).astype(dtype)
    times = fields.times.astype(dtype)
    tt = jnp.asarray(t, dtype)
    prof_t = polintd(prof, times, tt)
    zeta_t = polintd(zeta_l, times, tt)
    z_r = s_depths(zeta_t, h_p, grid.s_rho.astype(dtype),
                   grid.Cs_r.astype(dtype), grid.hc, grid.vtransform)
    sig = jnp.asarray(sigma, dtype)
    z2 = tension.fit(z_r, prof_t, sig)
    sigb = jnp.broadcast_to(sig, z_r[..., :-1].shape)
    dsdz = tension.evaluate_deriv(z_r, prof_t, z2, sigb, z)
    salt_at = tension.evaluate(z_r, prof_t, z2, sigb, z)
    return dsdz, salt_at


def behave(grid: Grid, fields: FieldSet, base_key, step, pids,
           x, y, z, t, age, zeta_p, h_p, currents,
           p: BehaveParams):
    """Behavioral displacement (dx, dy, dz) + death mask for this step.

    zeta_p/h_p: free surface and depth at each particle (already
    interpolated by the caller); currents: (u, v) at the particle for
    TST.  All types are evaluated branchlessly; ``p.behavior`` is a
    Python int so XLA sees only the selected branch after constant
    folding via jnp.where on a concrete condition.
    """
    dtype = x.dtype
    n = x.shape[0]
    idt = jnp.asarray(p.idt, dtype)
    zero = jnp.zeros(n, dtype)
    dx = zero
    dy = zero
    dz = zero

    w_swim = swim_speed(age, p, dtype)
    r_dir = rng.uniform(base_key, step, rng.BEHAVE, pids, (), 0.0, 1.0, dtype)
    r_mix = rng.uniform(base_key, step, rng.MORTALITY, pids, (), -1.0, 1.0,
                        dtype)

    def biased_dz(target_above):
        """Swim toward the preferred zone with probability P_BIAS."""
        toward = jnp.where(target_above, 1.0, -1.0).astype(dtype)
        sgn = jnp.where(r_dir < P_BIAS, toward, -toward)
        return sgn * w_swim * idt

    b = p.behavior
    if b == 1:
        # near-surface: preferred zone within SURFACE_ZONE of the surface
        below_zone = z < (zeta_p - SURFACE_ZONE)
        dz = jnp.where(below_zone, biased_dz(True), r_mix * w_swim * idt)
    elif b == 2:
        above_zone = z > (-h_p + BOTTOM_ZONE)
        dz = jnp.where(above_zone, biased_dz(False), r_mix * w_swim * idt)
    elif b == 3:
        e0 = surface_irradiance(t, p, dtype)
        light = e0 * jnp.exp(-p.Kp * jnp.maximum(zeta_p - z, 0.0))
        # swim down out of light above threshold; otherwise swim up
        dz = jnp.where(light > p.thresh, -w_swim * idt,
                       jnp.where(e0 > 0.0, w_swim * idt,
                                 r_mix * w_swim * idt))
    elif b in (4, 5):
        dsdz, _ = _salt_gradient(grid, fields, x, y, z, t, p.sigma)
        cue = jnp.abs(dsdz) >= p.Sgradient
        # veliger: swim up (type 4) / hold higher (type 5) on halocline
        # cue, random walk otherwise; pediveliger (age>=pediage): seek
        # bottom [conf: M].
        up = biased_dz(True)
        rnd = r_mix * w_swim * idt
        veliger = jnp.where(cue, up, rnd)
        pediveliger = biased_dz(False)
        dz = jnp.where(age >= p.pediage, pediveliger, veliger)
        if b == 5:
            # ariakensis: keeps swimming up even without the cue while
            # young [conf: L]
            dz = jnp.where(age < p.pediage, jnp.where(cue, up, up * 0.5 + rnd * 0.5), dz)
    elif b == 6:
        dz = -jnp.asarray(p.sink, dtype) * idt * jnp.ones(n, dtype)
    elif b == 7:
        u_c, v_c = currents
        speed = jnp.sqrt(u_c * u_c + v_c * v_c)
        riding = speed > TST_MIN_SPEED
        # ride: hold at Swimdepth below surface, add Hswimspeed along
        # the current; else: sit near bottom
        target_z = jnp.where(riding, zeta_p - p.Swimdepth, -h_p + 0.5)
        dz = jnp.clip(target_z - z, -w_swim * idt - 1.0, w_swim * idt + 1.0)
        spd_safe = jnp.maximum(speed, 1e-12)
        dx = jnp.where(riding, p.Hswimspeed * u_c / spd_safe * idt, 0.0)
        dy = jnp.where(riding, p.Hswimspeed * v_c / spd_safe * idt, 0.0)

    dies = jnp.zeros(n, bool)
    if p.mortality:
        if p.stochastic:
            # stochastic mortality (SURVEY.md SS2.1 #8 [conf: M] reads
            # the reference as RANDOM death around the competency
            # window): constant hazard 1/deadage, so the per-step
            # death probability is 1 - exp(-idt/deadage) and the
            # EXPECTED lifetime equals the deterministic mode's exact
            # lifetime.  Counter-based DEATH substream: bit-repeatable
            # across runs/shardings, independent of the walk draws.
            u = rng.uniform(base_key, step, rng.DEATH, pids, (),
                            0.0, 1.0, dtype)
            p_die = -jnp.expm1(-idt / jnp.asarray(p.deadage, dtype))
            dies = (age >= 0.0) & (u < p_die)
        else:
            # deterministic death exactly at deadage (the default;
            # [conf: M] — see module docstring)
            dies = age >= p.deadage
    return dx, dy, dz, dies
