"""Trajectory output: CSV and NetCDF snapshots.

Reference: ``printOutput``/``writeOutput`` in LTRANS.f90 (SURVEY.md
SS3.4 [conf: M]): every ``iprint`` seconds append particle snapshots —
CSV rows and/or a NetCDF file with dims (time, particle) and variables
model_time, lon, lat, depth, color (status code), optional salt/temp/
age/settle-polygon, plus hitLand/hitBottom when TrackCollisions is on.

Scale design (the reference's writeOutput appends incrementally; so do
we): the NetCDF path streams each snapshot into an HDF5 file
(NetCDF4's container format) through resizable datasets — O(1) host
memory regardless of run length, chunked (1, particle) so a snapshot
append is one contiguous write.  The CSV path formats whole columns
via numpy (``np.savetxt``), not a per-particle Python loop; at 1M
particles a snapshot formats in ~1 s instead of ~30 s.  Readers:
ltjax.io.nc.NCFile reads both this HDF5 layout and classic NetCDF3.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .. import convert
from ..config import Config
from ..state import Particles


class TrajectoryWriter:
    def __init__(self, cfg: Config, shard_tag: str = ""):
        """``shard_tag``: optional suffix (e.g. "_h03") so multi-host
        runs write per-host shard files without coordination."""
        self.cfg = cfg
        self.tag = shard_tag
        os.makedirs(cfg.outpath, exist_ok=True)
        self._csv = None
        self._nc = None           # h5py.File, created on first snapshot
        self._nt = 0
        if cfg.writeCSV:
            self._csv = open(os.path.join(
                cfg.outpath, cfg.NCOutFile + shard_tag + ".csv"), "w")
            if cfg.WriteHeaders:
                self._csv.write(",".join(self._csv_cols()) + "\n")

    # ------------------------------------------------------------------
    def _csv_cols(self):
        cols = ["time", "id", "lon", "lat", "depth", "status"]
        if self.cfg.SaltTempOn:
            cols += ["salt", "temp"]
        cols += ["age", "poly"]
        if self.cfg.TrackCollisions:
            cols += ["hitLand", "hitBottom"]
        return cols

    def _to_lonlat(self, p: Particles):
        cfg = self.cfg
        x = np.asarray(p.x, np.float64)
        y = np.asarray(p.y, np.float64)
        lat = convert.y2lat(y, cfg.latmin, cfg.Earth_Radius,
                            cfg.SphericalProjection)
        lon = convert.x2lon(x, y, cfg.lonmin, cfg.latmin, cfg.Earth_Radius,
                            cfg.SphericalProjection)
        return np.asarray(lon), np.asarray(lat)

    # ------------------------------------------------------------------
    def _nc_open(self, n_particles: int, pid: np.ndarray):
        import h5py
        cfg = self.cfg
        path = os.path.join(cfg.outpath, cfg.NCOutFile + self.tag + ".nc")
        f = h5py.File(path, "w")
        f.attrs["title"] = cfg.RunName
        f.attrs["run_by"] = cfg.RunBy
        f.attrs["institution"] = cfg.Institution
        f.attrs["source"] = "ltjax (TPU-native LTRANS v2b rebuild)"
        chunk = (1, n_particles)

        def mk(name, dtype):
            f.create_dataset(name, shape=(0, n_particles),
                             maxshape=(None, n_particles), dtype=dtype,
                             chunks=chunk)
        f.create_dataset("model_time", shape=(0,), maxshape=(None,),
                         dtype=np.float64, chunks=(1024,))
        f.create_dataset("pid", data=pid)
        if self.tag:
            # per-host shard files: slot occupancy changes as particles
            # migrate between hosts, so pid is a per-snapshot dataset
            # (EMPTY slots carry color < 0; merge_shards filters them)
            mk("pid_t", np.int32)
        mk("lon", np.float64)
        mk("lat", np.float64)
        mk("depth", np.float64)
        mk("color", np.int32)
        mk("age", np.float64)
        mk("settle_poly", np.int32)
        if cfg.SaltTempOn:
            mk("salt", np.float64)
            mk("temp", np.float64)
        if cfg.TrackCollisions:
            mk("hitLand", np.int32)
            mk("hitBottom", np.int32)
        self._nc = f

    def _nc_append(self, t: float, fields: dict):
        f = self._nc
        k = self._nt
        f["model_time"].resize((k + 1,))
        f["model_time"][k] = t
        for name, arr in fields.items():
            ds = f[name]
            ds.resize((k + 1, ds.shape[1]))
            ds[k, :] = arr
        self._nt += 1

    # ------------------------------------------------------------------
    def snapshot(self, t: float, p: Particles):
        cfg = self.cfg
        lon, lat = self._to_lonlat(p)
        pid = np.asarray(p.pid, np.int32)
        depth = np.asarray(p.z, np.float64)
        status = np.asarray(p.status, np.int32)
        age = np.asarray(p.age, np.float64)
        poly = np.asarray(p.settle_poly, np.int32)
        extra = {}
        if cfg.SaltTempOn:
            extra["salt"] = np.asarray(p.salt, np.float64)
            extra["temp"] = np.asarray(p.temp, np.float64)
        if cfg.TrackCollisions:
            extra["hitLand"] = np.asarray(p.hit_land, np.int32)
            extra["hitBottom"] = np.asarray(p.hit_bottom, np.int32)

        if cfg.writeNC:
            if self._nc is None:
                self._nc_open(len(lon), pid)
            fields = {"lon": lon, "lat": lat, "depth": depth,
                      "color": status, "age": age, "settle_poly": poly}
            if self.tag:
                fields["pid_t"] = pid
            fields.update(extra)
            self._nc_append(float(t), fields)

        if self._csv is not None:
            cols = [np.full(len(lon), float(t)), pid, lon, lat, depth,
                    status]
            fmt = ["%.1f", "%d", "%.8f", "%.8f", "%.4f", "%d"]
            if cfg.SaltTempOn:
                cols += [extra["salt"], extra["temp"]]
                fmt += ["%.4f", "%.4f"]
            cols += [age, poly]
            fmt += ["%.1f", "%d"]
            if cfg.TrackCollisions:
                cols += [extra["hitLand"], extra["hitBottom"]]
                fmt += ["%d", "%d"]
            np.savetxt(self._csv, np.column_stack(cols),
                       fmt=",".join(fmt))

    def close(self):
        if self._csv is not None:
            self._csv.close()
            self._csv = None
        if self._nc is not None:
            self._nc.close()
            self._nc = None


def merge_shards(shard_paths, out_path):
    """Merge per-host trajectory shard files into one global NC file.

    Shard files (TrajectoryWriter(shard_tag=...)) hold fixed-length
    per-host slot rows with per-snapshot ``pid_t`` and EMPTY slots as
    ``color < 0``.  The merged file has the single-process layout:
    fixed ``pid`` (sorted union) + (time, particle) datasets.
    """
    import h5py

    fs = [h5py.File(p, "r") for p in shard_paths]
    try:
        times = np.asarray(fs[0]["model_time"])
        for f in fs[1:]:
            np.testing.assert_allclose(np.asarray(f["model_time"]), times)
        names = [n for n in fs[0].keys()
                 if n not in ("model_time", "pid", "pid_t")]
        # global pid set: union over ALL snapshots (a pid may be absent
        # at snapshot 0 — late release into a migrated-away slot — or
        # vanish later via a migration drop; the old snapshot-0-only
        # union crashed on an all-empty first snapshot and silently
        # aliased unseen pids onto row 0 — advisor finding r4-low)
        pid_parts = []
        for f in fs:
            pt = np.asarray(f["pid_t"])
            col = np.asarray(f["color"])
            pid_parts.append(pt[col >= 0])
        pids = (np.unique(np.concatenate(pid_parts))
                if pid_parts and sum(a.size for a in pid_parts)
                else np.zeros(0, np.int64))
        npar = int(pids.shape[0])
        with h5py.File(out_path, "w") as out:
            out.create_dataset("model_time", data=times)
            out.create_dataset("pid", data=pids.astype(np.int32))
            dsets = {n: out.create_dataset(
                n, shape=(len(times), npar), dtype=fs[0][n].dtype)
                for n in names}
            if npar == 0:
                return
            lookup = np.full(int(pids.max()) + 2, -1, np.int64)
            lookup[pids] = np.arange(npar)
            for k in range(len(times)):
                pid_k = np.concatenate([np.asarray(f["pid_t"][k])
                                        for f in fs])
                keep = np.concatenate([np.asarray(f["color"][k])
                                       for f in fs]) >= 0
                rows = lookup[pid_k[keep]]
                assert (rows >= 0).all(), "shard pid outside the union"
                for n in names:
                    col = np.concatenate([np.asarray(f[n][k]) for f in fs])
                    # pids absent at snapshot k (not yet in any shard /
                    # dropped) keep the dataset's zero fill
                    buf = np.zeros(npar, fs[0][n].dtype)
                    buf[rows] = col[keep]
                    dsets[n][k, :] = buf
    finally:
        for f in fs:
            f.close()
