"""Headline benchmark: batched H=40 play-env rollouts per second per chip.

Target metric from BASELINE.json north star: ≥10,000 40-step rollouts/s/chip
on the flagship UR5PlayAbsRPY1Obj-v0 equivalent (full playroom: UR5 +
Robotiq gripper, block, door, drawer, button, dial; action decode + DLS IK
+ 12 ABA/contact substeps per control step → 480 physics substeps per
rollout, achieved-goal + reward every control step).

Default path: the fused Pallas control-step kernel (ops/fused_step.py) —
the whole step stays in VMEM. Set BENCH_PATH=vmap for the XLA vmap
baseline, BENCH_PATH=fused_step for the per-control-step kernel.
BENCH_BATCH overrides the batch (default 4096; must be a multiple of
1024 on the fused path; >4096 exceeds the tunneled dev chip's
per-executable time budget and faults — use 4096 there).

Prints ONE JSON line:
  {"metric": "rollouts_per_s_per_chip_H40", "value": N, "unit": "rollouts/s",
   "vs_baseline": N/10000, "mpc_ms_per_solve": M, "mpc_vs_target_20ms": 20/M}
The mpc fields time one fused-MPPI replan (pop=1024, H=10, 2 iters, full
playroom) against the ≤20 ms BASELINE.md target; BENCH_MPC=0 skips them.

The reference publishes no numbers (its single CPU PyBullet env steps one
instance at a time); vs_baseline is measured against the 10k/s/chip
north-star target.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench runs skip the ~10 min XLA
# compile on this 1-core host (works for both the cpu and tpu backends).
# Host-fingerprinted — foreign-machine AOT entries SIGILL/abort
# (utils/jaxcache.py).
from roboticsplayroompybullet_tpu.utils import jaxcache

jaxcache.setup(jax)


def main():
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.parallel import rollout as R
    from roboticsplayroompybullet_tpu.parallel import fused

    H = 40
    path = os.environ.get("BENCH_PATH", "fused")
    B = int(os.environ.get("BENCH_BATCH", "4096"))
    m = core.build_model(CATALOG["UR5PlayAbsRPY1Obj-v0"])

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.jit(lambda k: R.batched_reset(m, k))(keys)
    jax.block_until_ready(states.q)

    # DISTINCT inputs per rep: the runtime memoizes identical executions
    # (same executable + same buffers), which fakes ~0 ms timings
    reps = 3
    acts_list = [jax.random.uniform(jax.random.PRNGKey(1 + i),
                                    (B, H, m.cfg.action_dim),
                                    jnp.float32, -0.25, 0.25)
                 for i in range(reps + 1)]
    jax.block_until_ready(acts_list)

    if path == "fused":
        rollout = jax.jit(fused.make_fused_rollout_whole(m, H))
    elif path == "fused_step":
        rollout = jax.jit(fused.make_fused_rollout(m))
    else:
        rollout = jax.jit(lambda s, a: R.batched_rollout(m, s, a))

    fin, rs, ags = rollout(states, acts_list[-1])
    float(rs.sum())   # block_until_ready is an async no-op on the axon
                      # runtime; a scalar readback is the only real sync

    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        fin, rs, ags = rollout(states, acts_list[i])
        float(rs.sum())
        best = min(best, time.perf_counter() - t0)

    value = B / best

    # --- MPC solve latency (BASELINE.md: ≤20 ms/solve real-time loop) ----
    # The fused MPPI planner: pop=1024 candidates, H=10, 2 refinement
    # iterations, full playroom preview model. Timed as a CHAIN of K
    # sequential replans (each consuming the previous plan state, so no
    # two solves can overlap on-device) with ONE scalar readback at the
    # end: the receding-horizon deployment pattern, where dispatch
    # pipelines and the tunnel's ~25-30 ms host↔device round-trip is paid
    # once per readback, not per solve. Skippable via BENCH_MPC=0.
    mpc_ms = None
    if os.environ.get("BENCH_MPC", "1") != "0" and path == "fused":
        from roboticsplayroompybullet_tpu import solver as sol

        mcfg = sol.MPCConfig(horizon=10, pop=1024, iters=2,
                             algorithm="mppi")
        planner = jax.jit(sol.make_fused_planner(m, mcfg))
        st0 = jax.tree.map(lambda x: x[0], states)
        pl0 = sol.init_plan(m, mcfg)
        K = int(os.environ.get("BENCH_MPC_CHAIN", "10"))
        kkeys = jax.random.split(jax.random.PRNGKey(100), reps * K + 1)
        pl, _ = planner(st0, pl0, kkeys[-1])       # warm the executable
        float(pl.mean.sum())                       # sync (see above)
        best_mpc = float("inf")
        for i in range(reps):
            pl = pl0
            t0 = time.perf_counter()
            for j in range(K):
                pl, _ = planner(st0, pl, kkeys[i * K + j])
            float(pl.mean.sum())
            best_mpc = min(best_mpc, (time.perf_counter() - t0) / K)
        mpc_ms = best_mpc * 1e3

    out = {
        "metric": "rollouts_per_s_per_chip_H40",
        "value": round(value, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(value / 10000.0, 3),
    }
    if mpc_ms is not None:
        out["mpc_ms_per_solve"] = round(mpc_ms, 2)
        out["mpc_vs_target_20ms"] = round(20.0 / mpc_ms, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
