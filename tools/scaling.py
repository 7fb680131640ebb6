"""Throughput-scaling harness: sharded rollouts vs mesh size.

The north-star scaling axis (BASELINE.md): 1 chip → 1 host → ≥2 hosts.
Real multi-chip hardware isn't reachable from this box, so the harness
runs the REAL sharded program (shard_map over a ("dcn", "env") mesh —
the same path the driver dry-runs) on a virtual CPU device mesh and
reports weak-scaling throughput per mesh size. On a TPU pod the same
script runs unmodified with JAX_PLATFORMS unset and
`jax.distributed.initialize()` at the top.

  python tools/scaling.py [--env pandaPick-v0] [--horizon 10]
      [--per-device 64] [--devices 1 2 4 8] [--hosts 2]

Prints one JSON line per mesh size:
  {"devices": N, "mesh": [dcn, env], "rollouts_per_s": X, "efficiency": f}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # XLA:CPU CHECK-aborts if all device threads don't reach a collective
    # within 40 s — on a 1-core host heavy shard_map programs trip it
    # (CLAUDE.md; same flags as tests/conftest.py / launch_distributed.py)
    + " --xla_cpu_collective_timeout_seconds=3600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=3600")

import jax

if os.environ.get("SCALING_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pandaPick-v0")
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--per-device", type=int, default=64,
                    help="envs per device (weak scaling)")
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--hosts", type=int, default=2,
                    help="emulated host count (dcn axis) when divisible")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None,
                    help="also write the rows as JSON here (SCALING.json)")
    args = ap.parse_args()

    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu import parallel as par
    from roboticsplayroompybullet_tpu.parallel import rollout as R

    m = core.build_model(CATALOG[args.env])
    H, A = args.horizon, m.cfg.action_dim
    base_rate = None
    rows = []

    for nd in args.devices:
        if nd > len(jax.devices()):
            print(json.dumps({"devices": nd, "skipped": "not enough devices"}))
            continue
        n_hosts = args.hosts if (nd % args.hosts == 0 and nd > 1) else 1
        mesh = par.make_mesh(n_devices=nd, n_hosts=n_hosts,
                             devices=jax.devices()[:nd])
        B = args.per_device * nd
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        states, _ = jax.jit(lambda k: R.batched_reset(m, k))(keys)
        states = par.shard_batch(states, mesh)
        roll = jax.jit(par.make_sharded_rollout(m, mesh))
        acts = [par.shard_batch(
            jax.random.uniform(jax.random.PRNGKey(1 + i), (B, H, A),
                               jnp.float32, -0.25, 0.25), mesh)
            for i in range(args.reps + 1)]

        out = roll(states, acts[-1])
        jax.block_until_ready(out)
        best = float("inf")
        for i in range(args.reps):
            t0 = time.perf_counter()
            out = roll(states, acts[i])
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        rate = B / best
        if base_rate is None:
            base_rate = rate / nd
        row = {
            "devices": nd,
            "mesh": {k: v for k, v in zip(mesh.axis_names,
                                          mesh.devices.shape)},
            "batch": B,
            "rollouts_per_s": round(rate, 1),
            "efficiency": round(rate / (base_rate * nd), 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "meta": {"env": args.env, "horizon": args.horizon,
                         "per_device": args.per_device, "reps": args.reps,
                         "platform": jax.default_backend(),
                         "weak_scaling": True},
                "rows": rows,
            }, f, indent=1)
        print(f"wrote {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
