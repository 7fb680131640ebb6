"""Structured per-step metrics + host-side JSONL sink (SURVEY.md §5).

The reference exposes only `info={'is_success', 'target_poses'}`
(environments.py:214). Here each element of the play success test gets its
own bit (mirroring playRewardFunc.py:66-77) plus solver/tracking scalars,
assembled on-device as a flat dict of scalars and drained to JSONL on host.
"""
from __future__ import annotations

import json
import math
import time
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..envs.config import EnvConfig
from ..ops import spatial as sp


def play_element_bits(cfg: EnvConfig, ag: jnp.ndarray,
                      g: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-element success bits of the 11-D play layout
    (thresholds from playRewardFunc.py:16-55)."""
    out = {}
    idx = 0
    for o in range(cfg.num_objects):
        dxyz = jnp.abs(g[..., idx:idx + 3] - ag[..., idx:idx + 3])
        out[f"block{o}_pos_ok"] = jnp.all(dxyz <= 0.05, axis=-1)
        g_rpy = sp.quat_to_euler(sp.quat_normalize(g[..., idx + 3:idx + 7]))
        a_rpy = sp.quat_to_euler(sp.quat_normalize(ag[..., idx + 3:idx + 7]))
        out[f"block{o}_rot_ok"] = jnp.all(
            jnp.abs(g_rpy - a_rpy) <= math.pi / 4, axis=-1)
        idx += 7
    names = ["drawer_ok", "door_ok", "button_ok", "dial_ok"]
    thr = [0.025, 0.04, 0.01, 0.3]
    for j, (nm, t) in enumerate(zip(names, thr)):
        out[nm] = jnp.abs(g[..., idx + j] - ag[..., idx + j]) <= t
    return out


class JsonlSink:
    """Append-only JSONL metrics writer. `log(step, **scalars)` converts
    device scalars to Python floats (one host sync per call — call at
    episode boundaries, not inside hot loops)."""

    def __init__(self, path: str):
        self._f = open(path, "a", buffering=1)

    def log(self, step: int, metrics: Optional[Dict] = None, **kw):
        rec = {"step": int(step), "ts": time.time()}
        for k, v in {**(metrics or {}), **kw}.items():
            a = np.asarray(v)
            rec[k] = a.item() if a.ndim == 0 else a.tolist()
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
