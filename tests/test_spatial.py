"""Morton-order particle sorting (ltjax.spatial).

The sort must be a bitwise-exact permutation of every state column
(the kernel path reorders state once per external step and restores
storage order at output time).
"""

import numpy as np
import jax.numpy as jnp

from ltjax import spatial
from ltjax import state as st


def _random_particles(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    p = st.init_particles(rng.uniform(0, 1e5, n), rng.uniform(0, 1e5, n),
                          rng.uniform(-50, 0, n), dtype=jnp.float32)
    return p._replace(
        status=jnp.asarray(rng.integers(0, 6, n), jnp.int32),
        age=jnp.asarray(rng.uniform(0, 1e6, n), jnp.float32),
        hit_land=jnp.asarray(rng.integers(0, 100, n), jnp.int32),
        settle_poly=jnp.asarray(rng.integers(-1, 50, n), jnp.int32))


def test_morton_key_orders_locally():
    # points in the same cell share a key; neighbors differ by low bits
    i = jnp.asarray([3, 3, 4], jnp.int32)
    j = jnp.asarray([5, 5, 5], jnp.int32)
    k = spatial.morton_key(i, j)
    assert k[0] == k[1]
    assert k[2] != k[0]


def test_sort_roundtrip_bitwise():
    p = _random_particles()
    i = jnp.asarray((np.asarray(p.x) // 2500).astype(np.int32))
    j = jnp.asarray((np.asarray(p.y) // 2500).astype(np.int32))
    ps, perm = spatial.sort_by_cell(p, i, j)
    # permutation is a bijection
    assert len(np.unique(np.asarray(perm))) == p.n
    # live particles first (Hilbert-ordered), frozen ones after
    # (Hilbert-ordered among themselves) — see sort_by_cell docstring
    key = np.asarray(spatial.hilbert_key(i, j))
    frozen = np.asarray(p.status) >= st.SETTLED
    kp = key[np.asarray(perm)]
    fp = frozen[np.asarray(perm)]
    n_live = int((~frozen).sum())
    assert not fp[:n_live].any() and fp[n_live:].all()
    assert np.all(np.diff(kp[:n_live]) >= 0)
    assert np.all(np.diff(kp[n_live:]) >= 0)
    pr = spatial.unsort(ps, perm)
    for name in p._fields:
        a = np.asarray(getattr(p, name))
        b = np.asarray(getattr(pr, name))
        assert a.dtype == b.dtype, name
        np.testing.assert_array_equal(
            a.view(np.uint8), b.view(np.uint8), err_msg=name)


def test_sorted_state_columns_permuted_exactly():
    p = _random_particles(seed=3)
    i = jnp.asarray((np.asarray(p.x) // 2500).astype(np.int32))
    j = jnp.asarray((np.asarray(p.y) // 2500).astype(np.int32))
    ps, perm = spatial.sort_by_cell(p, i, j)
    pi = np.asarray(perm)
    for name in p._fields:
        np.testing.assert_array_equal(np.asarray(getattr(ps, name)),
                                      np.asarray(getattr(p, name))[pi],
                                      err_msg=name)
