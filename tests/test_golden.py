"""Golden-file trajectory regression tests (SURVEY.md §4 implication).

Fixed-seed, fixed-action rollouts from an injected start state must
reproduce the committed trajectories in tests/golden/. This is the
regression net under every physics / IK / observation change: the
behavioral manipulation tests say the physics is *plausible*; these say
it is *unchanged*. Deliberate physics changes regenerate the files with
`python tools/gen_golden.py` and commit the diff alongside the change.

Tolerances are loose enough to absorb XLA fusion-order float noise
(different fusion decisions across jaxlib versions perturb ~1e-7/step,
amplified through 12x25 contact substeps) and tight enough to catch any
real modeling change: 2 mm on EE, 5 mm on object/articulation state,
2e-2 rad on joints.
"""
import os

import numpy as np
import pytest

from roboticsplayroompybullet_tpu.envs import wrapper

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
# smoke tier: one env per arm family + the flagship play env. The full
# tier adds one panda + one UR5 golden per remaining action decode mode
# (environments.py:936-1007), incl. the componentwise quat-add quirk of
# relative_quat (environments.py:951 ↔ envs/core.py:101).
ENVS = [
    pytest.param("UR5Reach-v0", marks=pytest.mark.smoke),
    pytest.param("pandaPick-v0", marks=pytest.mark.smoke),
    pytest.param("UR5PlayAbsRPY1Obj-v0", marks=pytest.mark.smoke),
    "pandaPlay1Obj-v0",          # absolute_quat
    "UR5Play1Obj-v0",
    "pandaPlayRel1Obj-v0",       # relative_quat
    "UR5PlayRel1Obj-v0",
    "pandaPlayRelRPY1Obj-v0",    # relative_rpy
    "UR5PlayRelRPY1Obj-v0",
    "pandaPlayRelJoints1Obj-v0", # relative_joints
    "UR5PlayRelJoints1Obj-v0",
    "pandaPlayAbsJoints1Obj-v0", # absolute_joints
    "UR5PlayAbsJoints1Obj-v0",
    # full catalog closure (VERDICT r4 item 6): every registered id is
    # golden-pinned, incl. both 2-object scenes (block-block contact rows)
    "pandaReach-v0",
    "pandaReach2D-v0",
    "pandaPush-v0",
    "pandaPlayAbsRPY1Obj-v0",
    "pandaPlay-v0",              # 2 objects, absolute_quat
    "pandaPlayJoints-v0",        # 2 objects, relative_joints
]


def _golden(env_id):
    path = os.path.join(GOLDEN_DIR, env_id.replace("-", "_") + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file missing: run tools/gen_golden.py")
    return np.load(path)


@pytest.mark.parametrize("env_id", ENVS)
def test_golden_trajectory(env_id):
    g = _golden(env_id)
    env = wrapper.make(env_id, seed=7)
    env.reset(o=g["o0"])
    ee, ag, q = [], [], []
    for a in g["actions"]:
        obs, _, _, _ = env.step(a)
        ee.append(obs["controllable_achieved_goal"][:3])
        ag.append(obs["achieved_goal"])
        q.append(np.asarray(env.state.q))
    ee, ag, q = np.asarray(ee), np.asarray(ag), np.asarray(q)
    ee_err = np.linalg.norm(ee - g["ee"], axis=-1)
    assert ee_err.max() < 2e-3, f"EE drifted {ee_err.max():.4f} m from golden"
    assert np.abs(ag - g["ag"]).max() < 5e-3, \
        f"achieved_goal drifted {np.abs(ag - g['ag']).max():.4f}"
    assert np.abs(q - g["q"]).max() < 2e-2, \
        f"joints drifted {np.abs(q - g['q']).max():.4f} rad"
