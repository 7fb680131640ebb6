"""PyBullet cross-check harness (SURVEY.md §7.8 `validate`).

Replays IDENTICAL control sequences through the reference PyBullet env
and this framework's TPU-native env from the SAME injected start state,
and reports per-step end-effector error against the BASELINE.md fidelity
criterion (<= 1 cm EE error on UR5PlayAbsRPY1Obj-v0, same executed
control sequence).

Protocol per env id (mirrors the learning_from_play deploy rig's
state-injection pattern, reference environments.py:173-187):
  1. reference env: gym.make(id); reset(); grab obs['obs_quat'] -- the
     raw quaternion state vector `instance.reset(o)` consumes
     (environments.py:519-556 object slices, 575-596 arm slices).
  2. re-inject that SAME vector into BOTH envs via reset(o=...), so both
     start from one state.
  3. step both with one fixed action sequence  a_t ~ U(-scale, scale),
     clipped to the action space; record the EE position
     (obs['controllable_achieved_goal'][:3]) and, when objects exist,
     the first object position (achieved_goal[:3]) each control step.
  4. report mean/max EE error and object error over the horizon.

This tool needs `pybullet` + `gym` + the reference package -- none of
which exist in the build sandbox (no network). It import-guards and
exits 2 with a clear message there; run it on any machine with
`pip install pybullet gym` and the reference repo checked out
(REFERENCE_DIR env var or --reference).

Usage:
    python tools/validate_pybullet.py [--steps 50] [--scale 0.25]
        [--reference /path/to/RoboticsPlayroomPybullet]
        [env_id ...]          # default: the three BASELINE.md envs

Output: one JSON line per env id, e.g.
    {"env": "UR5PlayAbsRPY1Obj-v0", "steps": 50,
     "ee_err_mean_m": ..., "ee_err_max_m": ...,
     "obj_err_max_m": ..., "pass_1cm": true}
and a final {"metric": "pybullet_ee_err_max_m", ...} summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_ENVS = ["UR5Reach-v0", "pandaPick-v0", "UR5PlayAbsRPY1Obj-v0"]


def _load_reference(ref_dir: str):
    """Import the reference package + gym; None if unavailable."""
    try:
        import gym  # noqa: F401
        import pybullet  # noqa: F401
    except ImportError as e:
        print(f"# unavailable: {e}", file=sys.stderr)
        return None
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    try:
        import roboticsPlayroomPybullet  # noqa: F401  (registers env ids)
    except ImportError as e:
        print(f"# reference package not importable from {ref_dir}: {e}",
              file=sys.stderr)
        return None
    import gym as _gym
    return _gym


def _run_reference(gym_mod, env_id: str, o0, actions):
    """Reference rollout from injected state o0; EE + object trails."""
    import numpy as np

    env = gym_mod.make(env_id)
    env.reset()                      # activates the DIRECT physics client
    if o0 is None:                   # first call: sample, then re-inject
        o0 = np.asarray(env.reset()["obs_quat"], np.float64)
    obs = env.reset(o=o0)
    ee, obj = [], []
    for a in actions:
        a = np.clip(a, env.action_space.low, env.action_space.high)
        obs, _, _, _ = env.step(a)
        ee.append(np.asarray(obs["controllable_achieved_goal"][:3]))
        if obs["achieved_goal"].shape[0] > 3:      # has objects
            obj.append(np.asarray(obs["achieved_goal"][:3]))
    env.close()
    return o0, np.asarray(ee), (np.asarray(obj) if obj else None)


def _run_ours(env_id: str, o0, actions):
    """Same protocol through roboticsplayroompybullet_tpu."""
    import numpy as np
    from roboticsplayroompybullet_tpu.envs import wrapper

    env = wrapper.make(env_id)
    env.reset(o=o0)
    ee, obj = [], []
    for a in actions:
        a = np.clip(a, env.action_space.low, env.action_space.high)
        obs, _, _, _ = env.step(a)
        ee.append(np.asarray(obs["controllable_achieved_goal"][:3]))
        if obs["achieved_goal"].shape[0] > 3:
            obj.append(np.asarray(obs["achieved_goal"][:3]))
    return np.asarray(ee), (np.asarray(obj) if obj else None)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("envs", nargs="*", default=DEFAULT_ENVS)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reference",
                    default=os.environ.get("REFERENCE_DIR",
                                           "/root/reference"))
    args = ap.parse_args(argv)

    gym_mod = _load_reference(args.reference)
    if gym_mod is None:
        print(json.dumps({
            "metric": "pybullet_ee_err_max_m", "value": None,
            "unit": "m", "skipped": "pybullet/gym/reference unavailable "
            "in this sandbox; run on a machine with pybullet installed"}))
        return 2

    import numpy as np

    worst = 0.0
    ok = True
    for env_id in (args.envs or DEFAULT_ENVS):
        rng = np.random.default_rng(args.seed)
        from roboticsplayroompybullet_tpu.envs.config import CATALOG
        adim = CATALOG[env_id].action_dim
        actions = rng.uniform(-args.scale, args.scale,
                              (args.steps, adim)).astype(np.float32)
        o0, ee_ref, obj_ref = _run_reference(gym_mod, env_id, None, actions)
        ee_tpu, obj_tpu = _run_ours(env_id, o0, actions)
        ee_err = np.linalg.norm(ee_ref - ee_tpu, axis=-1)
        row = {
            "env": env_id, "steps": args.steps,
            "ee_err_mean_m": round(float(ee_err.mean()), 5),
            "ee_err_max_m": round(float(ee_err.max()), 5),
            "pass_1cm": bool(ee_err.max() <= 0.01),
        }
        if obj_ref is not None and obj_tpu is not None:
            obj_err = np.linalg.norm(obj_ref - obj_tpu, axis=-1)
            row["obj_err_max_m"] = round(float(obj_err.max()), 5)
        worst = max(worst, float(ee_err.max()))
        ok = ok and row["pass_1cm"]
        print(json.dumps(row))

    print(json.dumps({"metric": "pybullet_ee_err_max_m",
                      "value": round(worst, 5), "unit": "m",
                      "vs_baseline": round(0.01 / max(worst, 1e-9), 3)}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
