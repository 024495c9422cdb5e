"""Real 2-process jax.distributed run on localhost CPUs.

VERDICT r3 missing #3: everything multi-host-shaped existed but had
never run with process_count > 1 (and the old output/checkpoint paths
np.asarray'd non-addressable global arrays).  This test launches TWO
actual processes (4 virtual CPU devices each -> a 2x4 (dp, tile) mesh
over 8 global devices) through the production CLI driver, exercising
jax.distributed.initialize, per-host hyperslab reads + globalize_fields,
the shard_map tiled step, per-host shard-file output, and per-host
checkpointing — then merges the shard files and compares against the
same mesh run in ONE process (spec: BASELINE.json config 5,
SURVEY.md SS4 multi-host tests).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _gen_case(root):
    from ltjax import convert, synth

    case = synth.make_solid_body_case(nx=33, ny=41, us=6, lx=80e3,
                                      ly=100e3, h0=50.0, omega=1.2e-4)
    gp, hp = synth.write_roms_files(case, os.path.join(root, "roms"),
                                    n_records=6, dt=1800.0,
                                    geographic=True, lonmin=-76.0,
                                    latmin=37.0)
    rng = np.random.default_rng(7)
    n = 96
    x0 = rng.uniform(15e3, 65e3, n)
    y0 = rng.uniform(15e3, 85e3, n)
    z0 = rng.uniform(-40.0, -5.0, n)
    lat = np.asarray(convert.y2lat(y0, 37.0))
    lon = np.asarray(convert.x2lon(x0, y0, -76.0, 37.0))
    with open(os.path.join(root, "parfile.csv"), "w") as f:
        for k in range(n):
            f.write(f"{lon[k]:.10f},{lat[k]:.10f},{-z0[k]:.4f},0.0\n")
    return n


def _write_namelist(root, outdir, ckptdir):
    nl = f"""
$numparticles
  numpar = 96
$end
$timeparam
  days = 0.0625
  iprint = 1800
  dt = 1800
  idt = 450
$end
$hydroparam
  us = 6
  ws = 7
  tdim = 4
  hc = 50.0
  Vtransform = 1
$end
$turbparam
  HTurbOn = .TRUE.
  ConstantHTurb = 2.0
$end
$behavparam
  Behavior = 0
  OpenOceanBoundary = .TRUE.
$end
$romsgrid
  NCgridfile = '{root}/roms/grid.nc'
$end
$romsoutput
  dirin = '{root}/roms/'
  prefix = 'ocean_his_'
  suffix = '.nc'
  filenum = 1
  numdigits = 4
$end
$parloc
  parfile = '{root}/parfile.csv'
$end
$convparam
  lonmin = -76.0
  latmin = 37.0
$end
$output
  outpath = '{outdir}'
  NCOutFile = 'mh'
  writeNC = .TRUE.
$end
$other
  seed = 5
  ErrorFlag = 1
  mesh_particles = 2
  mesh_tiles = 4
  dtype_pos = 'float64'
  checkpoint_every = 2
  checkpoint_dir = '{ckptdir}'
  migrate_capacity = 4.0
$end
"""
    path = os.path.join(root, "mh.data")
    with open(path, "w") as f:
        f.write(nl)
    return path


def _child_env(n_devices, coord=None, nproc=None, pid=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}")
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    if coord is not None:
        env["JAX_COORDINATOR_ADDRESS"] = coord
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(pid)
    return env


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    root = str(tmp_path)
    _gen_case(root)

    # --- reference: same 2x4 mesh, ONE process, 8 devices -------------
    out1 = os.path.join(root, "out1")
    nl1 = _write_namelist(root, out1, os.path.join(root, "ck1"))
    r = subprocess.run(
        [sys.executable, "-m", "ltjax.run", nl1],
        env=_child_env(8), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    # --- 2 processes x 4 devices over the same global mesh -------------
    out2 = os.path.join(root, "out2")
    nl2 = _write_namelist(root, out2, os.path.join(root, "ck2"))
    coord = f"127.0.0.1:{_free_port()}"
    procs = [subprocess.Popen(
        [sys.executable, "-m", "ltjax.run", nl2],
        env=_child_env(4, coord, 2, k), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for k in range(2)]
    outs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, so, se))
    for rc, so, se in outs:
        assert rc == 0, so[-2000:] + se[-2000:]

    # every process wrote its own shard file + checkpoints
    shard_files = [os.path.join(out2, f"mh_h{k:03d}.nc") for k in range(2)]
    for f in shard_files:
        assert os.path.exists(f), f
    cks = os.listdir(os.path.join(root, "ck2"))
    assert any("_h000" in c for c in cks) and any("_h001" in c
                                                 for c in cks), cks

    # --- merge shards and compare with the single-process file ---------
    import h5py
    from ltjax.out.writer import merge_shards

    merged = os.path.join(root, "merged.nc")
    merge_shards(shard_files, merged)
    with h5py.File(os.path.join(out1, "mh.nc"), "r") as a, \
            h5py.File(merged, "r") as b:
        np.testing.assert_allclose(np.asarray(b["model_time"]),
                                   np.asarray(a["model_time"]))
        pa = np.asarray(a["pid"])
        pb = np.asarray(b["pid"])
        np.testing.assert_array_equal(np.sort(pa), pb)
        oa = np.argsort(pa)
        for name in ("lon", "lat", "depth", "color", "age"):
            va = np.asarray(a[name])[:, oa]
            vb = np.asarray(b[name])
            if name == "color":
                np.testing.assert_array_equal(vb, va)
            else:
                # same global mesh + counter-based RNG -> identical math;
                # tolerance only for float64 write rounding
                np.testing.assert_allclose(vb, va, rtol=0, atol=1e-9)
