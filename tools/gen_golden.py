"""(Re)generate golden trajectory files for tests/test_golden.py.

Runs a fixed-seed, fixed-action rollout on the CPU backend for each
pinned env and stores the injected start state, action sequence, and the
resulting EE / achieved-goal / joint trajectories. These are regression
anchors: any physics, IK, or observation change that moves a trajectory
by more than the test tolerance must be deliberate — regenerate with

    python tools/gen_golden.py

and commit the diff together with the change that caused it (mirrors the
role golden replay data plays in the reference's learning_from_play
deploy rig, reference environments.py:173-187 state injection).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests",
                          "golden")
ENVS = {
    # env id -> (steps, action scale)
    "UR5Reach-v0": (25, 0.25),
    "pandaPick-v0": (25, 0.25),
    "UR5PlayAbsRPY1Obj-v0": (25, 0.25),
    # one panda + one UR5 golden per remaining action mode, so every
    # decode path (envs/core.py:84-122 mirroring environments.py:936-1007)
    # is pinned: absolute_quat, relative_quat (componentwise quat-add
    # quirk, environments.py:951), relative_rpy, relative_joints,
    # absolute_joints.
    "pandaPlay1Obj-v0": (25, 0.25),          # absolute_quat
    "UR5Play1Obj-v0": (25, 0.25),            # absolute_quat
    "pandaPlayRel1Obj-v0": (25, 0.25),       # relative_quat
    "UR5PlayRel1Obj-v0": (25, 0.25),         # relative_quat
    "pandaPlayRelRPY1Obj-v0": (25, 0.25),    # relative_rpy
    "UR5PlayRelRPY1Obj-v0": (25, 0.25),      # relative_rpy
    "pandaPlayRelJoints1Obj-v0": (25, 0.25), # relative_joints
    "UR5PlayRelJoints1Obj-v0": (25, 0.25),   # relative_joints
    "pandaPlayAbsJoints1Obj-v0": (25, 0.25), # absolute_joints
    "UR5PlayAbsJoints1Obj-v0": (25, 0.25),   # absolute_joints
    # remaining catalog ids so all 19 registrations are golden-pinned
    # (VERDICT r4 item 6): the non-play panda tasks (envList.py:8-26) and
    # both 2-object play scenes (envList.py:28-40, block-block contact).
    "pandaReach-v0": (25, 0.25),
    "pandaReach2D-v0": (25, 0.25),
    "pandaPush-v0": (25, 0.25),
    "pandaPlayAbsRPY1Obj-v0": (25, 0.25),
    "pandaPlay-v0": (25, 0.25),              # 2 objects, absolute_quat
    "pandaPlayJoints-v0": (25, 0.25),        # 2 objects, relative_joints
}


def rollout(env_id: str, steps: int, scale: float):
    from roboticsplayroompybullet_tpu.envs import wrapper

    env = wrapper.make(env_id, seed=7)
    obs = env.reset()
    o0 = np.asarray(obs["obs_quat"], np.float32)
    cfg = env.cfg
    if cfg.play and cfg.num_objects >= 2:
        # The state-injection reader uses the reference's fixed
        # (index=11, increment=10) velocity-included strides
        # (environments.py:542-556). A raw 2-object play obs (no
        # velocity, 26-D) is too short for the second object's
        # quaternion slice — injecting it crashes in the reference
        # too. Build a vector in the injection layout instead:
        # [pos3, quat4, pad4, (obj_pos3, obj_quat4, pad3) * n].
        parts = [o0[0:3], o0[3:7], np.zeros(4, np.float32)]
        idx = 8
        for _ in range(cfg.num_objects):
            parts += [o0[idx:idx + 3], o0[idx + 3:idx + 7],
                      np.zeros(3, np.float32)]
            idx += 7
        o0 = np.concatenate(parts).astype(np.float32)
    obs = env.reset(o=o0)
    rng = np.random.default_rng(0)
    acts = rng.uniform(-scale, scale,
                       (steps, env.cfg.action_dim)).astype(np.float32)
    ee, ag, q = [], [], []
    for a in acts:
        obs, _, _, _ = env.step(a)
        ee.append(obs["controllable_achieved_goal"][:3])
        ag.append(obs["achieved_goal"])
        q.append(np.asarray(env.state.q))
    return dict(o0=o0, actions=acts, ee=np.asarray(ee),
                ag=np.asarray(ag), q=np.asarray(q))


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    only = set(sys.argv[1:])            # no args = regenerate everything
    for env_id, (steps, scale) in ENVS.items():
        if only and env_id not in only:
            continue
        data = rollout(env_id, steps, scale)
        path = os.path.join(GOLDEN_DIR, env_id.replace("-", "_") + ".npz")
        with open(path, "wb") as f:
            np.savez(f, **data)
        print(f"{env_id}: wrote {path}  ee_final={data['ee'][-1]}")


if __name__ == "__main__":
    main()
