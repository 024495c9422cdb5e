"""Trajectory output: CSV and NetCDF snapshots.

Reference: ``printOutput``/``writeOutput`` in LTRANS.f90 (SURVEY.md
SS3.4 [conf: M]): every ``iprint`` seconds append particle snapshots —
CSV rows and/or a NetCDF file with dims (time, particle) and variables
model_time, lon, lat, depth, color (status code), optional salt/temp/
age/settle-polygon, plus hitLand/hitBottom when TrackCollisions is on.

The NetCDF writer buffers snapshots host-side and writes a classic
NetCDF3 file via scipy at ``close()`` (scipy's netcdf_file handles the
record dimension but rewriting per step would be O(T^2); runs are
modest in snapshot count by construction of iprint).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .. import convert
from ..config import Config
from ..state import Particles


class TrajectoryWriter:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        os.makedirs(cfg.outpath, exist_ok=True)
        self._csv = None
        self._snaps: List[dict] = []
        if cfg.writeCSV:
            self._csv = open(os.path.join(cfg.outpath,
                                          cfg.NCOutFile + ".csv"), "w")
            if cfg.WriteHeaders:
                cols = "time,id,lon,lat,depth,status"
                if cfg.SaltTempOn:
                    cols += ",salt,temp"
                cols += ",age,poly"
                if cfg.TrackCollisions:
                    cols += ",hitLand,hitBottom"
                self._csv.write(cols + "\n")

    def _to_lonlat(self, p: Particles):
        cfg = self.cfg
        x = np.asarray(p.x, np.float64)
        y = np.asarray(p.y, np.float64)
        lat = convert.y2lat(y, cfg.latmin, cfg.Earth_Radius,
                            cfg.SphericalProjection)
        lon = convert.x2lon(x, y, cfg.lonmin, cfg.latmin, cfg.Earth_Radius,
                            cfg.SphericalProjection)
        return lon, lat

    def snapshot(self, t: float, p: Particles):
        lon, lat = self._to_lonlat(p)
        snap = dict(
            t=float(t), lon=lon, lat=lat,
            pid=np.asarray(p.pid, np.int32),
            depth=np.asarray(p.z, np.float64),
            status=np.asarray(p.status, np.int32),
            age=np.asarray(p.age, np.float64),
            poly=np.asarray(p.settle_poly, np.int32),
        )
        if self.cfg.SaltTempOn:
            snap["salt"] = np.asarray(p.salt, np.float64)
            snap["temp"] = np.asarray(p.temp, np.float64)
        if self.cfg.TrackCollisions:
            snap["hitLand"] = np.asarray(p.hit_land, np.int32)
            snap["hitBottom"] = np.asarray(p.hit_bottom, np.int32)
        if self.cfg.writeNC:
            self._snaps.append(snap)
        if self._csv is not None:
            n = len(lon)
            for i in range(n):
                row = (f"{snap['t']:.1f},{snap['pid'][i]},"
                       f"{lon[i]:.8f},{lat[i]:.8f},"
                       f"{snap['depth'][i]:.4f},{snap['status'][i]}")
                if self.cfg.SaltTempOn:
                    row += f",{snap['salt'][i]:.4f},{snap['temp'][i]:.4f}"
                row += f",{snap['age'][i]:.1f},{snap['poly'][i]}"
                if self.cfg.TrackCollisions:
                    row += f",{snap['hitLand'][i]},{snap['hitBottom'][i]}"
                self._csv.write(row + "\n")

    def close(self):
        if self._csv is not None:
            self._csv.close()
            self._csv = None
        if self.cfg.writeNC and self._snaps:
            from ..io.nc import write_netcdf
            cfg = self.cfg
            T = len(self._snaps)
            N = len(self._snaps[0]["lon"])
            stack = lambda k: np.stack([s[k] for s in self._snaps])
            dims = {"time": T, "particle": N}
            variables = {
                "model_time": (("time",),
                               np.asarray([s["t"] for s in self._snaps])),
                "pid": (("particle",), self._snaps[0]["pid"]),
                "lon": (("time", "particle"), stack("lon")),
                "lat": (("time", "particle"), stack("lat")),
                "depth": (("time", "particle"), stack("depth")),
                "color": (("time", "particle"), stack("status")),
                "age": (("time", "particle"), stack("age")),
                "settle_poly": (("time", "particle"), stack("poly")),
            }
            if cfg.SaltTempOn:
                variables["salt"] = (("time", "particle"), stack("salt"))
                variables["temp"] = (("time", "particle"), stack("temp"))
            if cfg.TrackCollisions:
                variables["hitLand"] = (("time", "particle"),
                                        stack("hitLand"))
                variables["hitBottom"] = (("time", "particle"),
                                          stack("hitBottom"))
            write_netcdf(
                os.path.join(cfg.outpath, cfg.NCOutFile + ".nc"),
                dims, variables,
                attrs={"title": cfg.RunName, "run_by": cfg.RunBy,
                       "institution": cfg.Institution,
                       "source": "ltjax (TPU-native LTRANS v2b rebuild)"})
            self._snaps = []
