"""Closed-loop evaluation of a trained LfP policy vs a random baseline.

Completes the learning-from-play capability chain (the reference's whole
purpose, reference README.md:2-10): collect play (tools/collect_play.py)
→ train goal-conditioned BC (tools/train_lfp.py) → THIS: hindsight window
goals replayed closed-loop in the simulator.

Protocol (pure hindsight, no state injection): reset N fresh envs; from
each start state roll the SAME structured play process the data was
collected with (learn/play_policy.py) for W steps and take the final
`full_positional_state` as the goal — reachable from the start by
construction, exactly the window-relabel target the policy was trained
on. Then, from the SAME start states (the immutable EnvState pytree IS
the checkpoint — utils/checkpoint.py would round-trip it exactly, unlike
the reference's obs-vector injection whose index-11 object quirk and
missing articulation state cannot restore a play scene,
environments.py:519-556), roll (a) the policy conditioned on those goals
and (b) an INDEPENDENT play-process rollout, and compare.

Headline metric (VERDICT r4 item 5): window-goal SUCCESS RATE — an
episode succeeds if at any step the EE is within 5 cm of the goal's arm
position AND the 11-D play achieved goal passes the reference's
all-or-nothing threshold test against the goal's scene part
(playRewardFunc.py:16-77 via envs/rewards.compute_reward). Distance
ratios are kept as secondary diagnostics.

Goal space: `full_positional_state` (arm pos+orn+grip ⊕ 11-D play
achieved goal) — the same vector kind the reference's sub-goal machinery
consumes (environments.py:606-703 'full_positional_state'), and a space
in which goal-reaching is densely learnable from play (the arm-pose block
gives BC a signal on every window, not only contact-event windows).

    python tools/eval_lfp.py --params /tmp/lfp_policy.npz --episodes 128

Writes LFP_EVAL.json (consumed by tests/test_lfp_artifact.py).
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default="UR5PlayAbsRPY1Obj-v0")
    ap.add_argument("--params", default="/tmp/lfp_policy.npz")
    ap.add_argument("--episodes", type=int, default=128)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--hidden", type=int, nargs="+", default=[256, 256],
                    help="must match the trained policy's architecture")
    ap.add_argument("--obs-field", default="obs_quat")
    ap.add_argument("--goal-field", default="full_positional_state")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.envs.rewards import compute_reward
    from roboticsplayroompybullet_tpu.learn import lfp, play_policy
    from roboticsplayroompybullet_tpu.parallel.rollout import batched_reset
    from roboticsplayroompybullet_tpu.utils.checkpoint import load_pytree

    m = core.build_model(CATALOG[args.env])
    N, W = args.episodes, args.window
    A = m.cfg.action_dim
    nag = m.cfg.ag_dim

    keys = jax.random.split(jax.random.PRNGKey(args.seed), N)
    states0, obs0 = jax.jit(lambda k: batched_reset(m, k))(keys)
    obs_dim = obs0[args.obs_field].shape[-1]
    goal_dim = obs0[args.goal_field].shape[-1]

    policy, params0, _, _ = lfp.init_training(
        jax.random.PRNGKey(0), obs_dim=obs_dim, goal_dim=goal_dim,
        action_dim=A, action_high=list(m.cfg.action_high),
        hidden=tuple(args.hidden))   # must match tools/train_lfp.py
    params = load_pytree(args.params, params0)

    a_init, a_step = play_policy.make_play_actor(m)

    def run(policy_mode: bool, goals, seed: int):
        """Roll W steps from states0; returns per-step
        (goal-field (W, N, goal_dim), achieved_goal (W, N, nag)).
        policy_mode=False: the collector's play process
        (learn/play_policy.py, same distribution as the training data)."""
        def body(carry, k):
            st, obs, ast = carry
            if policy_mode:
                acts = policy.apply(params, obs[args.obs_field], goals)
            else:
                ast, acts = a_step(ast, k)
            st, obs, _, _ = jax.vmap(lambda s, a: core.step(m, s, a))(st,
                                                                      acts)
            return (st, obs, ast), (obs[args.goal_field],
                                    obs["achieved_goal"])

        ks = jax.random.split(jax.random.PRNGKey(seed), W)
        _, (gs, ags) = jax.lax.scan(
            body, (states0, obs0, a_init(jax.random.PRNGKey(seed + 77), N)),
            ks)
        return gs, ags

    run_j = jax.jit(run, static_argnums=(0, 2))

    # hindsight goals: final full_positional_state of a play window
    goals = run_j(False, jnp.zeros((N, goal_dim)), args.seed + 1)[0][-1]
    goal_ag = np.asarray(goals)[:, goal_dim - nag:]      # 11-D scene part
    goal_ee = np.asarray(goals)[:, 0:3]

    # per-step play-threshold pass on the scene part (the reference's
    # all-or-nothing success test, playRewardFunc.py:16-77)
    play_ok_fn = jax.jit(jax.vmap(jax.vmap(
        lambda a, g: compute_reward(m.cfg, a, g) >= 0.0,
        in_axes=(0, 0)), in_axes=(0, None)))

    def score(outs):
        gs, ags = outs
        gs, ags = np.asarray(gs), np.asarray(ags)
        d = np.linalg.norm(gs - np.asarray(goals)[None], axis=-1)  # (W, N)
        ee = np.linalg.norm(gs[..., 0:3] - goal_ee[None], axis=-1)
        play_ok = np.asarray(play_ok_fn(jnp.asarray(ags),
                                        jnp.asarray(goal_ag)))    # (W, N)
        succ = (ee < 0.05) & play_ok                              # (W, N)
        return {
            "success_rate_any": float(succ.any(axis=0).mean()),
            "success_rate_final": float(succ[-1].mean()),
            "ee_within_5cm_any": float((ee < 0.05).any(axis=0).mean()),
            "play_ok_final": float(play_ok[-1].mean()),
            "final_dist_mean": float(d[-1].mean()),
            "final_dist_median": float(np.median(d[-1])),
            "best_dist_mean": float(d.min(axis=0).mean()),
            "final_ee_dist_mean_m": float(ee[-1].mean()),
        }

    res_pol = score(run_j(True, jnp.asarray(goals), args.seed + 2))
    # independent play-process rollout (NOT the goal-generating one)
    res_rnd = score(run_j(False, jnp.zeros((N, goal_dim)), args.seed + 3))
    ratio = res_pol["final_dist_mean"] / max(res_rnd["final_dist_mean"],
                                             1e-9)
    out = {
        "meta": {"env": args.env, "episodes": N, "window": W,
                 "hidden": args.hidden, "seed": args.seed,
                 "obs_field": args.obs_field, "goal_field": args.goal_field,
                 "actor": "play_policy.make_play_actor",
                 "platform": jax.default_backend()},
        "policy": res_pol,
        "random": res_rnd,
        "final_dist_ratio_policy_over_random": round(ratio, 4),
        "success_ratio_policy_over_random": round(
            res_pol["success_rate_any"]
            / max(res_rnd["success_rate_any"], 1e-9), 2),
    }
    path = args.out or os.path.join(os.path.dirname(__file__), "..",
                                    "LFP_EVAL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
