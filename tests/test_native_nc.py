"""Native (C++) NetCDF3 reader vs scipy oracle.

The C++ reader is the GIL-free bulk-read path of the streaming input
pipeline (ltjax/native, SURVEY.md SS7.3 item 5); it must agree with
scipy's netcdf_file bit-for-bit on classic files.
"""

import numpy as np
import pytest
from scipy.io import netcdf_file

from ltjax import synth
from ltjax.io.nc import NCFile
from ltjax.native import NativeCDF, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native reader not built")


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("natnc")
    case = synth.make_solid_body_case(nx=13, ny=11, us=5, lx=10e3, ly=8e3,
                                      h0=20.0, omega=1e-4, ramp_b=1e-5)
    gp, hp = synth.write_roms_files(case, str(d), n_records=6, dt=1800.0,
                                    records_per_file=3)
    return gp, hp


def test_matches_scipy_records(files):
    gp, hp = files
    n = NativeCDF(hp[0])
    with netcdf_file(hp[0], "r", mmap=False) as f:
        for name in ("zeta", "u", "v", "w", "AKs"):
            for rec in range(3):
                got = n.read(name, rec, dtype="float32")
                np.testing.assert_array_equal(
                    got, np.asarray(f.variables[name][rec], np.float32))
        np.testing.assert_allclose(n.read("ocean_time"),
                                   f.variables["ocean_time"][:])
    n.close()


def test_matches_scipy_grid_and_scalars(files):
    gp, _ = files
    n = NativeCDF(gp)
    with netcdf_file(gp, "r", mmap=False) as f:
        for name in ("h", "mask_rho", "s_rho", "Cs_w"):
            np.testing.assert_allclose(n.read(name),
                                       np.asarray(f.variables[name][:]))
        assert float(n.read("hc")) == float(f.variables["hc"].getValue())
    n.close()


def test_ncfile_prefers_native(files):
    _, hp = files
    nc = NCFile(hp[0])
    assert nc._kind == "native"
    u = nc.read("u", 1, dtype="float32")
    assert u.dtype == np.float32
    assert u.shape == (5, 11, 12)
    nc.close()
