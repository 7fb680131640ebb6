"""Task-competence eval CLI: fused MPC planner vs the playroom goal families.

Runs solver/eval.py's sweep (reach / block / drawer / door / button / dial,
success semantics per playRewardFunc.py:16-77) on the real TPU chip and
writes EVAL.json (machine-readable, consumed by tests/test_eval_artifact.py)
plus a human-readable table to stdout.

    python tools/eval_mpc.py                    # full sweep on TPU
    python tools/eval_mpc.py --families button drawer --episodes 8
    python tools/eval_mpc.py --backend reference --substeps 2  # CPU smoke

Population 1024/env x 4 envs = 4096 kernel lanes per replan iteration —
the tunneled dev chip's max batch (CLAUDE.md BENCH_BATCH note).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roboticsplayroompybullet_tpu.utils import jaxcache  # noqa: E402

import jax  # noqa: E402

jaxcache.setup(jax)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--families", nargs="+",
                    default=["reach", "block", "drawer", "door", "button",
                             "dial", "pick"])
    ap.add_argument("--env", default="UR5PlayAbsRPY1Obj-v0")
    ap.add_argument("--panda-env", default="pandaPlayAbsRPY1Obj-v0",
                    help="second play sweep on the Panda arm; results are "
                         "prefixed panda_ (pass --panda-families '' to skip)")
    ap.add_argument("--panda-families", nargs="*",
                    default=["block", "drawer", "door", "button", "dial"])
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--n-envs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--pop", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--sigma", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "reference", "auto"])
    ap.add_argument("--substeps", type=int, default=None,
                    help="reduced-substep physics (CPU smoke only)")
    ap.add_argument("--out", default=None,
                    help="write JSON results here (default: repo EVAL.json)")
    args = ap.parse_args(argv)

    if args.backend == "reference":
        jax.config.update("jax_platforms", "cpu")

    from roboticsplayroompybullet_tpu import solver as sol

    mpc = sol.MPCConfig(horizon=args.horizon, pop=args.pop, iters=args.iters,
                        algorithm="mppi", sigma_init=args.sigma)
    results = sol.run_eval(
        tuple(args.families), env_id=args.env, mpc=mpc,
        n_episodes=args.episodes, n_envs=args.n_envs, n_steps=args.steps,
        seed=args.seed, backend=args.backend, n_substeps=args.substeps,
        verbose=True)
    # Panda-arm closed-loop sweep (VERDICT r4 item 1): same goal families
    # against the Panda playroom; keys prefixed panda_ in EVAL.json.
    if args.panda_env and args.panda_families:
        panda = sol.run_eval(
            tuple(args.panda_families), env_id=args.panda_env, mpc=mpc,
            n_episodes=args.episodes, n_envs=args.n_envs,
            n_steps=args.steps, seed=args.seed, backend=args.backend,
            n_substeps=args.substeps, verbose=True)
        results.update({f"panda_{k}": v for k, v in panda.items()})

    meta = {
        "env": args.env,
        "panda_env": args.panda_env if args.panda_families else None,
        "pick_env": "pandaPick-v0" if "pick" in args.families else None,
        "mpc": {"horizon": args.horizon, "pop": args.pop,
                "iters": args.iters, "sigma": args.sigma,
                "algorithm": "mppi",
                "preview_ik_iters": mpc.preview_ik_iters,
                "preview_solve_iters": mpc.preview_solve_iters},
        "n_episodes": args.episodes, "n_steps": args.steps,
        "seed": args.seed, "backend": args.backend,
        "platform": jax.default_backend(),
    }
    out = {"meta": meta, "families": results}
    path = args.out or os.path.join(os.path.dirname(__file__), "..",
                                    "EVAL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{'family':8s} {'success':>8s}  episodes")
    for fam, r in results.items():
        print(f"{fam:8s} {r['success_rate']:8.2f}  "
              f"{r['n_success']}/{r['n_episodes']}")
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
