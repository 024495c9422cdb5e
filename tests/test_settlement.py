"""Settlement: polygon prep, point-in-polygon vs matplotlib, holes."""

import numpy as np
import jax.numpy as jnp

from ltjax.physics import settlement as stl


def _edges(n, lo=0.0, hi=10.0):
    e = np.linspace(lo, hi, n + 1)
    return e


def test_point_in_polygon_vs_matplotlib():
    from matplotlib.path import Path

    rng = np.random.default_rng(0)
    # random star-shaped polygon
    th = np.sort(rng.uniform(0, 2 * np.pi, 12))
    r = rng.uniform(1.0, 4.0, 12)
    vx = 5.0 + r * np.cos(th)
    vy = 5.0 + r * np.sin(th)
    pts = rng.uniform(0, 10, (500, 2))
    want = Path(np.stack([vx, vy], -1)).contains_points(pts)
    got = stl.point_in_polygon(jnp.asarray(vx)[None, :].repeat(500, 0),
                               jnp.asarray(vy)[None, :].repeat(500, 0),
                               jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]))
    # boundary-grazing points may differ; exclude near-boundary
    d = np.abs(Path(np.stack([vx, vy], -1)).contains_points(
        pts, radius=1e-9) != Path(np.stack([vx, vy], -1)).contains_points(
        pts, radius=-1e-9))
    agree = np.asarray(got) == want
    assert np.all(agree | d)


def test_padding_is_safe():
    # triangle padded to 6 vertices by repeating the last one
    vx = np.array([1.0, 3.0, 2.0, 2.0, 2.0, 2.0])
    vy = np.array([1.0, 1.0, 3.0, 3.0, 3.0, 3.0])
    inside = stl.point_in_polygon(jnp.asarray(vx)[None],
                                  jnp.asarray(vy)[None],
                                  jnp.asarray([2.0]), jnp.asarray([1.5]))
    outside = stl.point_in_polygon(jnp.asarray(vx)[None],
                                   jnp.asarray(vy)[None],
                                   jnp.asarray([0.5]), jnp.asarray([1.5]))
    assert bool(inside[0]) and not bool(outside[0])


def test_settlement_with_holes_and_eligibility():
    # habitat square [2,6]^2 with hole [3,4]^2
    hab = [(101, np.array([[2.0, 2], [6, 2], [6, 6], [2, 6.0]]))]
    hol = [(1, np.array([[3.0, 3], [4, 3], [4, 4], [3, 4.0]]))]
    xe = _edges(10)
    ye = _edges(10)
    polys = stl.build_polygons(hab, xe, ye)
    holes = stl.build_polygons(hol, xe, ye)

    x = jnp.asarray([4.5, 3.5, 8.0, 4.5])
    y = jnp.asarray([4.5, 3.5, 8.0, 4.5])
    eligible = jnp.asarray([True, True, True, False])
    settles, pid = stl.test_settlement(polys, holes, jnp.asarray(xe),
                                       jnp.asarray(ye), x, y, eligible)
    np.testing.assert_array_equal(np.asarray(settles),
                                  [True, False, False, False])
    assert int(pid[0]) == 101
    assert int(pid[1]) == -1


def test_candidate_raster_prunes():
    hab = [(7, np.array([[1.0, 1], [2, 1], [2, 2], [1, 2.0]]))]
    xe = _edges(10)
    ye = _edges(10)
    polys = stl.build_polygons(hab, xe, ye)
    cands = np.asarray(polys.cell_cands)
    # cells far from the polygon have no candidates
    assert (cands[8, 8] == -1).all()
    assert (cands[1, 1] >= 0).any()


def test_polygon_csv_roundtrip(tmp_path):
    p = tmp_path / "hab.csv"
    p.write_text("1.0,2.0,101\n3.0,2.0,101\n2.0,4.0,101\n"
                 "7.0,7.0,102\n9.0,7.0,102\n8.0,9.0,102\n")
    polys = stl.read_polygon_csv(str(p))
    assert len(polys) == 2
    assert polys[0][0] == 101 and polys[1][0] == 102
    assert polys[0][1].shape == (3, 2)
