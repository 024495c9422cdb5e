"""Counter-based per-particle RNG streams.

Reference: random_module.f90 (a Fortran mt19937 port) + norm_module.f90
(Box-Muller) draw from ONE sequential global stream (SURVEY.md SS2.1
#12/#13 [conf: H]) — order-dependent and unshardable.  The TPU-native
replacement derives a threefry key per (seed, step, substream,
particle-id): order- and sharding-invariant and restart-stable
(SURVEY.md SS4 determinism tests).  Exact stochastic-path equality with
the Fortran is impossible by construction; statistical equivalence is
what the well-mixed-condition tests assert.

Substream ids keep draws within one internal step independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr

# substream ids
HTURB = 0
VTURB = 1
BEHAVE = 2
MORTALITY = 3


def particle_keys(base_key, step, substream: int, pids):
    """One key per particle for (step, substream)."""
    k = jr.fold_in(jr.fold_in(base_key, step), substream)
    return jax.vmap(lambda p: jr.fold_in(k, p))(pids)


def normal(base_key, step, substream, pids, shape_per=(), dtype=jnp.float32):
    keys = particle_keys(base_key, step, substream, pids)
    return jax.vmap(lambda k: jr.normal(k, shape_per, dtype))(keys)


def uniform(base_key, step, substream, pids, shape_per=(),
            minval=0.0, maxval=1.0, dtype=jnp.float32):
    keys = particle_keys(base_key, step, substream, pids)
    return jax.vmap(
        lambda k: jr.uniform(k, shape_per, dtype, minval, maxval))(keys)
