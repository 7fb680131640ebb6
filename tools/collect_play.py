"""Collect play episodes into the native episode log.

The reference's workflow: a human teleoperates the playroom via VR and
episodes are written for learning_from_play (reference README.md:2-10).
The TPU-native analogue collects BATCHED play data — thousands of envs in
lockstep on-device — from either a smooth random play policy or a
receding-horizon MPPI controller.

  python tools/collect_play.py --env UR5PlayAbsRPY1Obj-v0 \
      --policy random --batch 1024 --steps 200 --out /tmp/play.elog

Fields per step: obs_quat, achieved_goal, desired_goal, action,
full_positional_state — the LfP replay schema (environments.py:849-861).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def _write_fields_sidecar(out_path: str, fields):
    """<out>.fields.json: the field-name order of the log (the native
    format stores dims only); tools/train_lfp.py and tools/eval_lfp.py
    load it instead of trusting a hand-typed --schema."""
    import json
    with open(out_path + ".fields.json", "w") as f:
        json.dump(list(fields), f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="UR5PlayAbsRPY1Obj-v0")
    ap.add_argument("--policy", choices=["play", "random", "mppi"],
                    default="play",
                    help="play = structured EE-wander teleop analogue "
                         "(learn/play_policy.py, the LfP data source); "
                         "random = legacy raw-box AR(1); mppi = planner")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/play.elog")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.envs.obs import calc_obs
    from roboticsplayroompybullet_tpu.parallel import rollout as R
    from roboticsplayroompybullet_tpu.parallel import fused
    from roboticsplayroompybullet_tpu.utils.episodelog import EpisodeWriter
    from roboticsplayroompybullet_tpu import solver as sol

    m = core.build_model(CATALOG[args.env])
    B, T, A = args.batch, args.steps, m.cfg.action_dim
    rng = jax.random.PRNGKey(args.seed)

    PUBLIC = ("obs_quat", "achieved_goal", "desired_goal",
              "full_positional_state")

    if args.policy in ("play", "random"):
        from roboticsplayroompybullet_tpu.learn import play_policy

        use_fused = m.cfg.num_objects > 0 and B % 1024 == 0
        stepB = fused.make_fused_batched_step(m) if use_fused \
            else (lambda s, a: R.batched_step(m, s, a)[0])

        high = jnp.asarray(m.cfg.action_high)
        if args.policy == "play":
            a_init, a_step = play_policy.make_play_actor(m)
        else:
            # legacy raw-box AR(1) (kept for comparison runs)
            def a_init(key, n):
                return jnp.zeros((n, A))

            def a_step(tail, k):
                eps = jax.random.normal(k, (B, A))
                tail = 0.85 * tail + 0.35 * eps
                return tail, jnp.clip(tail, -high, high)

        def collect(states, key):
            """scan T steps: play actions + per-step obs capture."""

            def body(carry, k):
                st, ast = carry
                ast, acts = a_step(ast, k)
                st = stepB(st, acts)
                obs = jax.vmap(
                    lambda s: calc_obs(m.cfg, m.tree, m.arm, m.scene, s))(st)
                # thread the continuity buffers back into the carried state
                # so the quaternion sign filter compares each step against
                # the PREVIOUS step (environments.py:868-894), not the
                # frozen reset-time observation
                st = st.replace(prev_obs=obs["_prev_obs"],
                                prev_ag=obs["_prev_ag"],
                                has_prev=jnp.ones_like(st.has_prev))
                pub = {key: obs[key] for key in PUBLIC}
                return (st, ast), (pub, acts)

            key, ka = jax.random.split(key)
            keys = jax.random.split(key, T)
            (st, _), (obs, acts) = jax.lax.scan(
                body, (states, a_init(ka, B)), keys)
            return st, obs, acts

        rng, k0, k1 = jax.random.split(rng, 3)
        states, _ = jax.jit(lambda k: R.batched_reset(m, k))(
            jax.random.split(k0, B))
        t0 = time.time()
        st, obs, acts = jax.jit(collect)(states, k1)
        obs = {k: np.asarray(v) for k, v in obs.items()}   # (T, B, d)
        acts = np.asarray(acts)
        dt = time.time() - t0
        print(f"collected {B} x {T} steps in {dt:.1f}s "
              f"= {B * T / dt:.0f} env-steps/s", flush=True)

        # EXPLICIT canonical order: jax returns pytree dicts with SORTED
        # keys, so iterating `obs` here would silently write fields in
        # alphabetical order and break every reader that assumes the
        # documented schema (the native log stores dims, not names)
        fields = {k: int(obs[k].shape[-1]) for k in PUBLIC}
        fields["action"] = A
        _write_fields_sidecar(args.out, fields)
        with EpisodeWriter(args.out, fields) as w:
            for b in range(B):
                w.begin_episode()
                data = {k: obs[k][:, b] for k in obs}
                data["action"] = acts[:, b]
                w.append_batch(data)
                w.end_episode()
        print(f"wrote {B} episodes of {T} steps to {args.out}")
    else:
        cfg = sol.MPCConfig(horizon=10, pop=1024, iters=2,
                            algorithm="mppi", sigma_init=0.3)
        plan_fn = jax.jit(sol.make_fused_planner(m, cfg))
        step1 = jax.jit(lambda s, a: core.step(m, s, a))
        rng, sub = jax.random.split(rng)
        state, obs = jax.jit(lambda k: core.reset(m, k))(sub)
        fields = {k: np.asarray(obs[k]).shape[-1]
                  for k in ("obs_quat", "achieved_goal", "desired_goal",
                            "full_positional_state")}
        fields["action"] = A
        _write_fields_sidecar(args.out, fields)
        pl = sol.init_plan(m, cfg)
        with EpisodeWriter(args.out, fields) as w:
            w.begin_episode()
            for t in range(T):
                rng, sub = jax.random.split(rng)
                pl, best = plan_fn(state, pl, sub)
                a = pl.mean[0]
                state, obs, r, info = step1(state, a)
                pl = sol.shift_plan(pl, cfg)
                w.append_batch({
                    "obs_quat": np.asarray(obs["obs_quat"])[None],
                    "achieved_goal": np.asarray(obs["achieved_goal"])[None],
                    "desired_goal": np.asarray(obs["desired_goal"])[None],
                    "full_positional_state":
                        np.asarray(obs["full_positional_state"])[None],
                    "action": np.asarray(a)[None],
                })
                if t % 25 == 0:
                    print(f"t={t} r={float(r):.3f} best={float(best):.3f}",
                          flush=True)
            w.end_episode()
        print(f"wrote 1 episode to {args.out}")


if __name__ == "__main__":
    main()
