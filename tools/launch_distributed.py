"""Multi-host launcher: jax.distributed init → mesh → checkpointed MPC loop.

The reference is strictly single-process (SURVEY.md §2.3; reference
environments.py:54-57 "currently only supports one instance"); this is the
framework's abort-and-restart harness (SURVEY.md §5 failure-detection row):

  1. `jax.distributed.initialize(coordinator, num_processes, process_id)`
     when launched with >1 process — after it, `jax.devices()` is global
     and the ("dcn", "env") mesh maps processes × local chips.
  2. Solver/env state restores from the newest checkpoint if one exists,
     so a failed host set can simply be relaunched with the same command
     line and the run continues from the last completed stride.
  3. The receding-horizon loop replans with the population-sharded fused
     planner (solver/mpc.py make_sharded_fused_planner: local fused
     rollouts, psum/pmin elite reductions over ICI within a host slice and
     DCN across), steps the env, and checkpoints every `--ckpt-every`
     control steps (process 0 writes; atomic rename — no torn files).

Single-process dryrun (CPU or 1 chip):
    python tools/launch_distributed.py --steps 2 --dryrun
Multi-host (one command per host):
    python tools/launch_distributed.py \
        --coordinator host0:8476 --num-processes 2 --process-id $RANK ...
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU dryruns with virtual devices time-share one core: raise XLA:CPU's
# 40 s collective-rendezvous terminate timeout (it CHECK-aborts the whole
# process). Must be set before jax initializes; no-op on real TPUs.
if "collective" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_collective_timeout_seconds=3600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600")


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multi-process only)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--env", default="UR5PlayAbsRPY1Obj-v0")
    ap.add_argument("--steps", type=int, default=25,
                    help="control steps to run (total, incl. restored)")
    ap.add_argument("--pop", type=int, default=1024,
                    help="global MPC population (multiple of devices*block)")
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--block-envs", type=int, default=1024,
                    help="fused kernel block (128 for CPU dryruns)")
    ap.add_argument("--devices", type=int, default=None,
                    help="cap local devices in the mesh (CI: small CPU "
                         "meshes keep virtual-device skew down)")
    ap.add_argument("--ckpt", default="/tmp/playroom_mpc_ckpt.npz")
    ap.add_argument("--ckpt-every", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dryrun", action="store_true",
                    help="tiny shapes + reduced physics (CI / smoke)")
    return ap.parse_args(argv)


def initialize(args) -> None:
    """Bring up the multi-process runtime (no-op for one process)."""
    import jax
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)


def build_mesh(args):
    """("dcn", "env") mesh from the process topology: outer axis = hosts
    (DCN), inner = each host's local chips (ICI). 1-D ("env",) mesh when
    single-process."""
    import jax
    from roboticsplayroompybullet_tpu import parallel as par
    n_hosts = max(args.num_processes, 1)
    if n_hosts > 1:
        return par.make_mesh(n_hosts=n_hosts)
    return par.make_mesh(n_devices=args.devices)


def run_loop(args, mesh=None) -> dict:
    """The checkpointed control loop. Returns a summary dict (for tests)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.envs.obs import achieved_goal
    from roboticsplayroompybullet_tpu.envs.rewards import compute_reward
    from roboticsplayroompybullet_tpu import parallel as par
    from roboticsplayroompybullet_tpu import solver as sol
    from roboticsplayroompybullet_tpu.utils import checkpoint as ckpt

    if mesh is None:
        mesh = build_mesh(args)
    n_dev = par.mesh_size(mesh)
    on_tpu = jax.default_backend() == "tpu"

    m = core.build_model(CATALOG[args.env])
    dry = dict(n_substeps=2) if args.dryrun else {}
    cfg = sol.MPCConfig(
        horizon=args.horizon, pop=args.pop, iters=args.iters,
        algorithm="mppi",
        **({"preview_ik_iters": 2, "preview_solve_iters": 4}
           if args.dryrun else {}))
    assert cfg.pop % (n_dev * args.block_envs) == 0, (
        f"pop {cfg.pop} must be a multiple of devices*block "
        f"({n_dev}*{args.block_envs})")
    planner = sol.make_sharded_fused_planner(
        m, cfg, mesh, block_envs=args.block_envs,
        backend="pallas" if on_tpu else "reference", **dry)
    step1 = jax.jit(lambda s, a: core.step_physics_only(m, s, a))

    # ---- restore-or-init --------------------------------------------
    key = jax.random.PRNGKey(args.seed)
    state0, _ = jax.jit(lambda k: core.reset(m, k))(key)
    plan0 = sol.init_plan(m, cfg)
    template = {"state": state0, "plan": plan0,
                "step": jnp.zeros((), jnp.int32)}
    if os.path.exists(args.ckpt):
        snap = ckpt.load_pytree(args.ckpt, template)
        state, plan_state = snap["state"], snap["plan"]
        start = int(snap["step"])
        print(f"[launch] restored {args.ckpt} at step {start}")
    else:
        state, plan_state, start = state0, plan0, 0

    # ---- receding-horizon loop with periodic checkpoints ------------
    rewards = []
    for t in range(start, args.steps):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), t)
        plan_state, best = planner(state, plan_state, key)
        state = step1(state, plan_state.mean[0])
        ag = achieved_goal(m.cfg, m.tree, m.arm, state)
        r = float(compute_reward(m.cfg, ag, state.goal))
        rewards.append(r)
        plan_state = sol.shift_plan(plan_state, cfg)
        if args.process_id == 0 and (t + 1) % args.ckpt_every == 0:
            ckpt.save_pytree(args.ckpt, {
                "state": state, "plan": plan_state,
                "step": jnp.asarray(t + 1, jnp.int32)})
            print(f"[launch] step {t + 1}/{args.steps} "
                  f"best_cost={float(best):.3f} r={r:.2f} → {args.ckpt}")

    return {"steps_run": args.steps - start, "start": start,
            "final_reward": rewards[-1] if rewards else None,
            "mesh": dict(mesh.shape)}


def main(argv=None):
    args = parse_args(argv)
    initialize(args)
    out = run_loop(args)
    print(f"[launch] done: {out}")


if __name__ == "__main__":
    main()
