"""Input pipeline tests: NetCDF round-trip, multi-file series, prefetch."""

import numpy as np
import jax.numpy as jnp
import pytest

from ltjax import synth
from ltjax.config import Config
from ltjax.io.nc import NCFile, write_netcdf
from ltjax.io.prefetch import Prefetcher
from ltjax.io.roms import RomsSeries, read_grid, rho_axes_from_grid


@pytest.fixture(scope="module")
def roms_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("roms")
    case = synth.make_solid_body_case(nx=11, ny=9, us=4, lx=10e3, ly=8e3,
                                      h0=20.0, omega=1e-4, ramp_b=1e-5)
    gp, hp = synth.write_roms_files(case, str(d), n_records=10, dt=3600.0,
                                    records_per_file=4)
    return d, case, gp, hp


def test_netcdf_roundtrip(tmp_path):
    path = str(tmp_path / "t.nc")
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    write_netcdf(path, {"t": 2, "y": 3, "x": 4},
                 {"v": (("t", "y", "x"), a)})
    with NCFile(path) as nc:
        assert nc.has("v")
        np.testing.assert_array_equal(nc.read("v"), a)
        np.testing.assert_array_equal(nc.read("v", 1), a[1])
        assert nc.num_records("v") == 2


def test_read_grid(roms_dir):
    d, case, gp, hp = roms_dir
    cfg = Config(us=4, ws=5)
    gd = read_grid(gp, cfg)
    assert gd.h.shape == (9, 11)
    assert gd.vtransform == 1
    assert len(gd.s_rho) == 4 and len(gd.s_w) == 5
    x_ax, y_ax = rho_axes_from_grid(gd, cfg)
    np.testing.assert_allclose(x_ax, np.asarray(case.grid.x_rho), atol=1e-6)
    np.testing.assert_allclose(y_ax, np.asarray(case.grid.y_rho), atol=1e-6)


def test_series_streams_across_files(roms_dir):
    d, case, gp, hp = roms_dir
    cfg = Config(us=4, ws=5, tdim=4)
    series = RomsSeries(cfg, paths=hp)
    times = []
    for _ in range(10):
        rec = series.next_record()
        times.append(rec["time"])
        assert rec["u"].shape == (4, 9, 10)
        assert rec["v"].shape == (4, 8, 11)
        assert rec["w"].shape == (5, 9, 11)
        assert rec["aks"].shape == (5, 9, 11)
        assert rec["zeta"].shape == (9, 11)
    np.testing.assert_allclose(times, 3600.0 * np.arange(10))
    # reading past the end raises (no more files)
    with pytest.raises(Exception):
        series.next_record()
    series.close()


def test_series_seek(roms_dir):
    d, case, gp, hp = roms_dir
    cfg = Config(us=4, ws=5, tdim=4)
    series = RomsSeries(cfg, paths=hp)
    series.seek(6)
    rec = series.next_record()
    np.testing.assert_allclose(rec["time"], 6 * 3600.0)
    series.close()


def test_field_values_roundtrip(roms_dir):
    d, case, gp, hp = roms_dir
    cfg = Config(us=4, ws=5, tdim=4)
    series = RomsSeries(cfg, paths=hp)
    rec = series.next_record()
    want = case.slabs(0.0)
    np.testing.assert_allclose(rec["u"], want["u"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(rec["v"], want["v"], rtol=1e-6, atol=1e-7)
    series.close()


def test_prefetcher(roms_dir):
    d, case, gp, hp = roms_dir
    cfg = Config(us=4, ws=5, tdim=4)
    series = RomsSeries(cfg, paths=hp)
    reads = []

    def read_fn():
        try:
            return series.next_record()
        except Exception:
            return None

    pf = Prefetcher(read_fn, depth=2, device_put=False)
    for k in range(10):
        rec = pf.next()
        assert rec is not None
        reads.append(rec["time"])
    assert pf.next() is None  # exhausted
    pf.close()
    series.close()
    np.testing.assert_allclose(reads, 3600.0 * np.arange(10))


def test_prefetcher_propagates_errors():
    def bad_read():
        raise RuntimeError("boom")

    pf = Prefetcher(bad_read, device_put=False)
    with pytest.raises(RuntimeError, match="boom"):
        pf.next()
    pf.close()


def test_eta_hyperslab_reads_match_full(tmp_path):
    """RomsSeries(eta_slice=...) must return exactly the row range of
    the full read for every field (per-host hyperslab input pipeline,
    SURVEY.md SS5.8), with v clamped to its shorter eta axis."""
    import jax.numpy as jnp
    from ltjax import synth
    from ltjax.config import Config
    from ltjax.io.roms import RomsSeries

    case = synth.make_solid_body_case(nx=17, ny=24, us=6, lx=50e3,
                                      ly=70e3, h0=50.0, omega=1e-4,
                                      dtype=jnp.float64)
    synth.write_roms_files(case, str(tmp_path), n_records=3, dt=1800.0,
                           records_per_file=3)
    cfg = Config(us=6, ws=7, dirin=str(tmp_path) + "/",
                 prefix="ocean_his_", suffix=".nc", numdigits=4)
    full = RomsSeries(cfg)
    lo, hi = 8, 16
    slab = RomsSeries(cfg, eta_slice=(lo, hi))
    for _ in range(3):
        rf = full.next_record()
        rs = slab.next_record()
        assert rs["time"] == rf["time"]
        np.testing.assert_array_equal(rs["zeta"], rf["zeta"][lo:hi, :])
        np.testing.assert_array_equal(rs["u"], rf["u"][:, lo:hi, :])
        np.testing.assert_array_equal(rs["v"], rf["v"][:, lo:hi, :])
        np.testing.assert_array_equal(rs["w"], rf["w"][:, lo:hi, :])
        np.testing.assert_array_equal(rs["aks"], rf["aks"][:, lo:hi, :])
    # v clamps at its Ny-1 rows when the range touches the top
    full2 = RomsSeries(cfg)
    slab2 = RomsSeries(cfg, eta_slice=(16, 24))
    rf = full2.next_record()
    rs = slab2.next_record()
    np.testing.assert_array_equal(rs["zeta"], rf["zeta"][16:24, :])
    np.testing.assert_array_equal(rs["v"], rf["v"][:, 16:23, :])
    full.close(); slab.close(); full2.close(); slab2.close()
