"""Train a goal-conditioned BC policy from a collected play log.

End-to-end LfP data path (the reference's downstream use, reference
README.md:2-10): tools/collect_play.py writes the native episode log;
this script replays relabelled windows and trains π(a | obs, goal).

  python tools/collect_play.py --env UR5PlayAbsRPY1Obj-v0 \
      --batch 1024 --steps 200 --out /tmp/play.elog
  python tools/train_lfp.py --log /tmp/play.elog --steps 2000
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/play.elog")
    ap.add_argument("--env", default="UR5PlayAbsRPY1Obj-v0",
                    help="catalog id whose action box squashes the policy "
                         "output (must match the collected data)")
    ap.add_argument("--fields", nargs=3,
                    default=["obs_quat", "action", "achieved_goal"],
                    metavar=("OBS", "ACT", "AG"))
    ap.add_argument("--schema", nargs="+",
                    default=["obs_quat", "achieved_goal", "desired_goal",
                             "full_positional_state", "action"],
                    help="ALL field names in file order (the native log "
                         "stores dims, not names); default = "
                         "tools/collect_play.py's schema")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--hidden", type=int, nargs="+", default=[256, 256])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/lfp_policy.npz")
    args = ap.parse_args()

    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.utils.episodelog import EpisodeReader
    from roboticsplayroompybullet_tpu.utils.checkpoint import save_pytree
    from roboticsplayroompybullet_tpu.learn import lfp

    schema = args.schema
    sidecar = args.log + ".fields.json"
    if os.path.exists(sidecar):            # written by tools/collect_play.py
        import json
        with open(sidecar) as f:
            schema = json.load(f)
        print(f"schema from {sidecar}: {schema}")
    reader = EpisodeReader(args.log, fields=schema)
    assert len(reader.names) == len(reader.dims), \
        f"--schema names {len(reader.names)} != file fields {len(reader.dims)}"
    f_obs, f_act, f_ag = args.fields
    d = {k: reader.dims[reader.names.index(k)] for k in args.fields}
    print(f"log: {reader.n_episodes} episodes, dims {d}")

    # squash to the env's true action box (e.g. abs-RPY pose dims are ±6,
    # environments.py:88-117) — a unit box cannot express the data
    high = list(CATALOG[args.env].action_high) if args.env in CATALOG \
        else [1.0] * d[f_act]
    assert len(high) == d[f_act], (args.env, high, d)
    policy, params, tx, opt_state = lfp.init_training(
        jax.random.PRNGKey(args.seed), obs_dim=d[f_obs], goal_dim=d[f_ag],
        action_dim=d[f_act], action_high=high,
        lr=args.lr, hidden=tuple(args.hidden))
    step = jax.jit(lfp.make_train_step(policy, tx))

    rng = np.random.default_rng(args.seed)
    sampler = lfp.make_memory_sampler(reader, fields=tuple(args.fields))
    t0 = time.time()
    for i in range(args.steps):
        batch = sampler(rng, args.batch, args.window)
        params, opt_state, loss = step(params, opt_state, batch)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i:5d}  loss {float(loss):.5f}  "
                  f"{(i + 1) / (time.time() - t0):.1f} steps/s", flush=True)

    save_pytree(args.out, params)
    print("saved policy params →", args.out)


if __name__ == "__main__":
    main()
