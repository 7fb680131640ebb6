"""Headline benchmark: batched H=40 play-env rollouts per second per chip.

Target metric from BASELINE.json north star: ≥10,000 40-step rollouts/s/chip
on the flagship UR5PlayAbsRPY1Obj-v0 equivalent (full playroom: UR5 +
Robotiq gripper, block, door, drawer, button, dial; 12 physics substeps per
control step → 480 ABA+contact substeps per rollout).

Prints ONE JSON line:
  {"metric": "rollouts_per_s_per_chip_H40", "value": N, "unit": "rollouts/s",
   "vs_baseline": N/10000}

The reference publishes no numbers (its single CPU PyBullet env steps one
instance at a time); vs_baseline is measured against the 10k/s/chip
north-star target.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.parallel import rollout as R

    H = 40
    B = int(__import__("os").environ.get("BENCH_BATCH", "1024"))
    m = core.build_model(CATALOG["UR5PlayAbsRPY1Obj-v0"])

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.jit(lambda k: R.batched_reset(m, k))(keys)
    jax.block_until_ready(states.q)

    acts = jax.random.uniform(jax.random.PRNGKey(1),
                              (B, H, m.cfg.action_dim),
                              jnp.float32, -0.25, 0.25)

    rollout = jax.jit(lambda s, a: R.batched_rollout(m, s, a))
    # warmup / compile
    fin, rs, ags = rollout(states, acts)
    jax.block_until_ready(rs)

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fin, rs, ags = rollout(states, acts)
        jax.block_until_ready(rs)
        best = min(best, time.perf_counter() - t0)

    value = B / best
    print(json.dumps({
        "metric": "rollouts_per_s_per_chip_H40",
        "value": round(value, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(value / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
