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


def test_banded_sort_band_major_frozen_last():
    # Depth-banded sort (config.sort_depth_bands): band is the MAJOR
    # key, Hilbert order within each band, frozen particles after all
    # live ones regardless of band.
    p = _random_particles(seed=7)
    i = jnp.asarray((np.asarray(p.x) // 2500).astype(np.int32))
    j = jnp.asarray((np.asarray(p.y) // 2500).astype(np.int32))
    # 3 bands from height above a flat 50 m bottom, 4 m slabs
    band = jnp.clip(((p.z + 50.0) // 4.0).astype(jnp.int32), 0, 2)
    ps, perm = spatial.sort_by_cell(p, i, j, depth_band=band, n_bands=3)
    pi = np.asarray(perm)
    frozen = np.asarray(p.status)[pi] >= st.SETTLED
    bp = np.asarray(band)[pi]
    kp = np.asarray(spatial.hilbert_key(i, j, bits=14))[pi]
    n_live = int((~frozen).sum())
    # frozen strictly last
    assert not frozen[:n_live].any() and frozen[n_live:].all()
    # live: non-decreasing band, Hilbert-ordered within each band
    live_b, live_k = bp[:n_live], kp[:n_live]
    assert np.all(np.diff(live_b) >= 0)
    same = np.diff(live_b) == 0
    assert np.all(np.diff(live_k)[same] >= 0)
    # bitwise-exact roundtrip still holds with banding
    pr = spatial.unsort(ps, perm)
    for name in p._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(p, name)).view(np.uint8),
            np.asarray(getattr(pr, name)).view(np.uint8), err_msg=name)


def test_banded_sort_key_no_overflow():
    # max band (clipped) + frozen marker must stay positive in int32:
    # frozen band 7 at the max 14-bit Hilbert key is the worst case.
    i = jnp.asarray([(1 << 14) - 1], jnp.int32)
    j = jnp.asarray([(1 << 14) - 1], jnp.int32)
    k = int(spatial.hilbert_key(i, j, bits=14)[0])
    assert 0 <= k < (1 << 28)
    assert k + (7 << 28) < 2**31


def test_banded_sort_tames_depth_shear_dispersion():
    """Host proxy of the kernel's window scheme under PERSISTENT
    depth-stratified shear (a standing population in the bottom log
    layer while mid-column neighbours drift on).  Here band membership
    is stable, and at production-like density band-major sorting must
    cut the steady window-miss rate by >2x vs depth-mixed blocks
    (measured here ~4.7% -> ~1.0% mean).  Banding does NOT help the
    TRANSIT case (a sinking front crossing the layer): there band
    populations are transient and thin, and on-chip tests showed the
    density splitting moves the first patch overflow EARLIER — see
    config.sort_depth_bands for the full tradeoff.
    """
    BLOCK, WX, WY = 256, 8, 16
    NC, DENS, H0, DRIFT = 40, 120, 50.0, 6.0
    N = DENS * NC * NC

    def run(banded, steps=8, sort_every=2):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, NC, N)
        y = rng.uniform(0, NC, N)
        hab = rng.uniform(0.0, H0, N)           # height above bottom
        fast = hab >= 4.0                       # log layer: stopped
        miss_hist = []
        for e in range(steps):
            if e % sort_every == 0:
                i = x.astype(np.int32)
                j = y.astype(np.int32)
                key = np.asarray(spatial.hilbert_key(
                    jnp.asarray(i), jnp.asarray(j) >> 1, bits=14))
                if banded:
                    band = (hab >= 4.0).astype(np.int32)
                    key = key + (band << 28)
                order = np.argsort(key, kind="stable")
                x_, y_, hab_, fast_ = (a[order] for a in (x, y, hab, fast))
                x, y, hab, fast = x_, y_, hab_, fast_
            i = x.astype(np.int32)
            j = y.astype(np.int32)
            nb = N // BLOCK
            ib = i[: nb * BLOCK].reshape(nb, BLOCK)
            jb = j[: nb * BLOCK].reshape(nb, BLOCK)
            oi = np.round(ib.mean(1))[:, None] - WX // 2
            oj = np.round(jb.mean(1))[:, None] - WY // 2
            miss = ((ib < oi) | (ib >= oi + WX)
                    | (jb < oj) | (jb >= oj + WY))
            miss_hist.append(miss.mean())
            x = np.where(fast, x + DRIFT, x)
            x = np.where(x >= NC, x - NC, x)    # wrap: keep density
        return float(np.mean(miss_hist))

    mixed = run(False)
    banded = run(True)
    assert banded < 0.5 * mixed, (mixed, banded)
    assert banded < 0.02, banded
