"""Boundary extraction + vectorized reflection tests (SURVEY.md SS4)."""

import numpy as np
import jax.numpy as jnp

from ltjax.physics import boundary as bd


def _square_domain(n=10, land_col=None, closed=True):
    """n x n water cells on a unit-spaced grid; optional land column."""
    mask = np.ones((n, n), np.int32)
    if land_col is not None:
        mask[:, land_col] = 0
    x = np.arange(n, dtype=np.float64)  # rho points at integers
    y = np.arange(n, dtype=np.float64)
    return bd.build_boundaries(mask, x, y, closed_edges=closed)


def test_segment_extraction_counts():
    b = _square_domain(4, closed=True)
    # pure water 4x4: only the rim emits: 4 sides x 4 cells = 16 segments
    assert b.n_segments == 16
    assert int(np.sum(np.asarray(b.seg_kind) == bd.LAND)) == 16

    b2 = _square_domain(4, closed=False)
    assert int(np.sum(np.asarray(b2.seg_kind) == bd.OPEN)) == 16


def test_land_column_emits_wall():
    b = _square_domain(6, land_col=3, closed=False)
    kinds = np.asarray(b.seg_kind)
    # cells in col 2 and 4 each emit a land segment facing col 3
    assert int(np.sum(kinds == bd.LAND)) == 12


def test_in_water():
    b = _square_domain(6, land_col=3, closed=True)
    assert bool(bd.in_water(b, jnp.asarray([1.0]), jnp.asarray([1.0]))[0])
    assert not bool(bd.in_water(b, jnp.asarray([3.0]), jnp.asarray([1.0]))[0])
    assert not bool(bd.in_water(b, jnp.asarray([-5.0]), jnp.asarray([1.0]))[0])


def test_specular_reflection_off_vertical_wall():
    b = _square_domain(6, land_col=3, closed=True)
    # wall face at x = 2.5; start at (2.0, 1.0) aiming to (2.8, 1.2)
    x0 = jnp.asarray([2.0])
    y0 = jnp.asarray([1.0])
    x1 = jnp.asarray([2.8])
    y1 = jnp.asarray([1.2])
    xr, yr, hits, exited, stuck = bd.reflect(b, x0, y0, x1, y1,
                                             open_exits=False)
    # specular: x reflects about 2.5 -> 2.2; y unchanged
    np.testing.assert_allclose(float(xr[0]), 2.2, atol=1e-5)
    np.testing.assert_allclose(float(yr[0]), 1.2, atol=1e-5)
    assert int(hits[0]) == 1
    assert not bool(stuck[0])
    assert not bool(exited[0])


def test_corner_double_reflection():
    b = _square_domain(6, closed=True)
    # bottom-left water corner is (-0.5, -0.5); aim diagonally out
    # (displacement 1.35 cells: below the 1.5-cell max-step guard)
    x0 = jnp.asarray([0.0])
    y0 = jnp.asarray([0.0])
    x1 = jnp.asarray([-0.9])
    y1 = jnp.asarray([-1.0])
    xr, yr, hits, exited, stuck = bd.reflect(b, x0, y0, x1, y1,
                                             open_exits=False)
    # two specular bounces: back inside at (-0.1, 0.0)
    np.testing.assert_allclose(float(xr[0]), -0.1, atol=1e-4)
    np.testing.assert_allclose(float(yr[0]), 0.0, atol=1e-4)
    assert int(hits[0]) == 2
    assert not bool(stuck[0])


def test_open_boundary_exit():
    b = _square_domain(6, closed=False)
    x0 = jnp.asarray([5.0])
    y0 = jnp.asarray([3.0])
    x1 = jnp.asarray([6.3])
    y1 = jnp.asarray([3.0])
    xr, yr, hits, exited, stuck = bd.reflect(b, x0, y0, x1, y1,
                                             open_exits=True)
    assert bool(exited[0])
    # stops at the rim (x = 5.5)
    np.testing.assert_allclose(float(xr[0]), 5.5, atol=1e-6)
    assert int(hits[0]) == 0


def test_open_boundary_reflects_when_disabled():
    b = _square_domain(6, closed=False)
    x0 = jnp.asarray([5.0])
    y0 = jnp.asarray([3.0])
    x1 = jnp.asarray([6.3])
    y1 = jnp.asarray([3.0])
    xr, yr, hits, exited, stuck = bd.reflect(b, x0, y0, x1, y1,
                                             open_exits=False)
    assert not bool(exited[0])
    np.testing.assert_allclose(float(xr[0]), 4.7, atol=1e-4)


def test_no_crossing_is_identity():
    b = _square_domain(8, land_col=4, closed=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0.6, 2.4, 50))
    y0 = jnp.asarray(rng.uniform(0.6, 6.4, 50))
    x1 = x0 + 0.05
    y1 = y0 - 0.05
    xr, yr, hits, exited, stuck = bd.reflect(b, x0, y0, x1, y1,
                                             open_exits=True)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(y1), atol=1e-12)
    assert int(jnp.sum(hits)) == 0


def test_vertical_reflection():
    z = jnp.asarray([0.5, -55.0, -10.0])
    zeta = jnp.asarray([0.2, 0.0, 0.0])
    h = jnp.asarray([50.0, 50.0, 50.0])
    zr, hs, hb = bd.reflect_vertical(z, zeta, h)
    np.testing.assert_allclose(np.asarray(zr), [-0.1, -45.0, -10.0],
                               atol=1e-12)
    assert bool(hs[0]) and not bool(hs[2])
    assert bool(hb[1]) and not bool(hb[2])


def test_tunnel_guard_catches_overstep():
    """A displacement far beyond the 3x3 bucket coverage that steps
    clean over a 1-cell land spit must be flagged stuck (ERROR
    upstream), never silently tunneled (VERDICT r2 weak #2)."""
    b = _square_domain(12, land_col=6, closed=True)
    # start at x=3.2, jump to x=9.2: crosses the col-6 wall, but the
    # pre-move cell (3) bucket only holds segments of cols 2-4
    x0 = jnp.asarray([3.2])
    y0 = jnp.asarray([5.0])
    x1 = jnp.asarray([9.2])
    y1 = jnp.asarray([5.0])
    xr, yr, hits, exited, stuck = bd.reflect(b, x0, y0, x1, y1,
                                             open_exits=False, n_iter=4)
    assert bool(stuck[0])
    assert not bool(exited[0])

    # ANY displacement beyond the 1.5-cell bucket radius is now flagged
    # regardless of what lies on the path (max-displacement guard,
    # VERDICT r3 weak #2: midpoint luck must never decide tunneling)
    x0b = jnp.asarray([1.2])
    x1b = jnp.asarray([4.8])
    _, _, _, _, stuck_b = bd.reflect(b, x0b, y0, x1b, y1,
                                     open_exits=False, n_iter=4)
    assert bool(stuck_b[0])

    # a sub-radius jump with no land on the path stays clean
    x1c = jnp.asarray([2.6])
    _, _, _, _, stuck_c = bd.reflect(b, x0b, y0, x1c, y1,
                                     open_exits=False, n_iter=4)
    assert not bool(stuck_c[0])


def test_tunnel_guard_no_false_positive_on_reflection():
    """Particles that DID interact with a wall are exempt from the
    midpoint test (their net chord may legitimately cross land)."""
    b = _square_domain(12, land_col=6, closed=True)
    # approach the wall from x=5.2 and bounce off it
    x0 = jnp.asarray([5.2])
    y0 = jnp.asarray([5.0])
    x1 = jnp.asarray([6.3])
    y1 = jnp.asarray([5.0])
    xr, yr, hits, exited, stuck = bd.reflect(b, x0, y0, x1, y1,
                                             open_exits=False, n_iter=4)
    assert int(hits[0]) >= 1
    assert not bool(stuck[0])
    assert float(xr[0]) < 5.5   # reflected back into water


def test_displacement_guard_is_local_on_variable_grids():
    """Advisor r4-high: the max-displacement guard must use the
    PRE-MOVE CELL's local detection radius, not the global minimum.
    On a variable-resolution grid (fine cells on one side, 10x coarser
    on the other) an ordinary displacement in a coarse cell exceeds
    the finest cell's radius and must NOT be flagged stuck."""
    n = 12
    mask = np.ones((n, n), np.int32)
    # x axis: 6 fine (dx=1) then 6 coarse (dx=10) cells
    x = np.concatenate([np.arange(6.0), 6.0 + 10.0 * np.arange(1, 7)])
    y = np.arange(n, dtype=np.float64)
    b = bd.build_boundaries(mask, x, y, closed_edges=True)

    # coarse-side displacement of 4 m: >> 1.5 * min edge (1.5 m) but
    # << 1.5 * local edge (15 m) -> must stay clean
    x0 = jnp.asarray([40.0])
    y0 = jnp.asarray([5.0])
    x1 = jnp.asarray([44.0])
    y1 = jnp.asarray([5.0])
    _, _, _, _, stuck = bd.reflect(b, x0, y0, x1, y1,
                                   open_exits=False, n_iter=4)
    assert not bool(stuck[0])

    # fine-side displacement of 4 m: beyond the local 1.5-cell radius
    # -> flagged (bucket can no longer guarantee crossing detection)
    x0f = jnp.asarray([1.0])
    x1f = jnp.asarray([5.0])
    _, _, _, _, stuck_f = bd.reflect(b, x0f, y0, x1f, y1,
                                     open_exits=False, n_iter=4)
    assert bool(stuck_f[0])

    # rows lane 3 really is per-cell: coarse-cell radius^2 = (15)^2,
    # fine-cell radius^2 = (1.5)^2
    rows = np.asarray(b.cell_rows).reshape(n, n, -1)
    np.testing.assert_allclose(rows[5, 1, 3], 1.5 ** 2)
    np.testing.assert_allclose(rows[5, 9, 3], 15.0 ** 2)
