"""Checkpoint / resume.

Reference: none — LTRANS v2b always restarts from the parfile
(SURVEY.md SS5.4 [conf: H]).  Required here for long multi-host runs:
dump the full particle state + input-pipeline cursor + step counter;
resume = reload + re-prime the 3-record field buffer.  Deterministic by
construction: the RNG is counter-based on (seed, step, substream, pid),
so a resumed run reproduces the uninterrupted one bit-for-bit.

Format: one ``npz`` per checkpoint (atomic rename), per host when
sharded (each host saves its addressable shard).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional, Tuple

import numpy as np

from . import state as st


def save(path: str, particles: st.Particles, ext_step: int,
         global_record: int, extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {f"p_{k}": np.asarray(v) for k, v in particles._asdict().items()}
    payload["meta"] = np.frombuffer(json.dumps({
        "ext_step": int(ext_step),
        "global_record": int(global_record),
        "extra": extra or {},
    }).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str) -> Tuple[st.Particles, int, int, dict]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        fields = {k[2:]: z[k] for k in z.files if k.startswith("p_")}
    import jax.numpy as jnp
    p = st.Particles(**{k: jnp.asarray(v) for k, v in fields.items()})
    return p, meta["ext_step"], meta["global_record"], meta.get("extra", {})


def latest(ckpt_dir: str, tag: str = "") -> Optional[str]:
    """Newest checkpoint path, filtered to ``tag`` (per-host suffix for
    sharded multi-host runs, e.g. "_h003"; "" matches untagged files)."""
    if not os.path.isdir(ckpt_dir):
        return None
    suffix = tag + ".npz"
    cands = []
    for f in os.listdir(ckpt_dir):
        if not (f.startswith("ckpt_") and f.endswith(suffix)):
            continue
        stem = f[5:-len(suffix)]
        if stem.isdigit():
            cands.append((int(stem), f))
    if not cands:
        return None
    cands.sort()
    return os.path.join(ckpt_dir, cands[-1][1])
