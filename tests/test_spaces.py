"""Observation-space bound parity vs the reference tables.

The reference publishes REAL (finite) Box bounds built from env/obj ranges
(environments.py:120-166). These tests hand-compute those tables from the
reference's construction rules — including its env_upper-in-the-lower-lim
bug (environments.py:135,144) — and assert the wrapper publishes exactly
them for the reach / push / pick ids (VERDICT r4 item 9).

No jit compilation happens here: spaces are host-side numpy.
"""
import numpy as np
import pytest

import roboticsplayroompybullet_tpu as rp


def _ref_tables(env_lo, env_hi, obj_lo, obj_hi, num_objects, use_orientation):
    """environments.py:120-166, transcribed rule-for-rule."""
    env_lo, env_hi = np.asarray(env_lo, np.float32), np.asarray(env_hi, np.float32)
    obj_lo, obj_hi = np.asarray(obj_lo, np.float32), np.asarray(obj_hi, np.float32)
    if use_orientation:
        arm_hi = np.concatenate([env_hi, [1, 1, 1, 1, 0.04]])
        arm_lo = np.concatenate([env_lo, -np.array([1, 1, 1, 1, 0.0])])
        arm_obs_hi = np.concatenate([env_hi, [1, 1, 1, 1, 1, 1, 1, 0.04]])
        arm_obs_lo = np.concatenate(
            [env_hi, -np.array([1, 1, 1, 1, 1, 1, 1, 0.0])])  # ref bug :135
        obj_obs_hi = np.concatenate([obj_hi, np.ones(7)])
        obj_obs_lo = np.concatenate([obj_lo, -np.ones(7)])
        obj_pos_hi = np.concatenate([env_hi, np.ones(4)])
        obj_pos_lo = np.concatenate([env_lo, -np.ones(4)])
    else:
        arm_hi = np.concatenate([env_hi, [0.04]])
        arm_lo = np.concatenate([env_lo, -np.array([0.0])])
        arm_obs_hi = np.concatenate([env_hi, [1, 1, 1, 0.04]])
        arm_obs_lo = np.concatenate(
            [env_hi, -np.array([1, 1, 1, 0.0])])             # ref bug :144
        obj_obs_hi = np.concatenate([obj_hi, np.ones(3)])
        obj_obs_lo = np.concatenate([obj_lo, -np.ones(3)])
        obj_pos_hi, obj_pos_lo = env_hi, env_lo
    num_goals = max(num_objects, 1)
    return {
        "observation": (
            np.concatenate([arm_obs_lo] + [obj_obs_lo] * num_objects),
            np.concatenate([arm_obs_hi] + [obj_obs_hi] * num_objects)),
        "desired_goal": (np.concatenate([env_lo] * num_goals),
                         np.concatenate([env_hi] * num_goals)),
        "achieved_goal": (np.concatenate([env_lo] * num_goals),
                          np.concatenate([env_hi] * num_goals)),
        "controllable_achieved_goal": (arm_lo, arm_hi),
        "full_positional_state": (
            np.concatenate([arm_lo] + [obj_pos_lo] * num_objects),
            np.concatenate([arm_hi] + [obj_pos_hi] * num_objects)),
    }


CASES = {
    # env id -> reference ctor ranges (envList.py:8-26)
    "pandaReach-v0": dict(
        env_lo=(-0.18, -0.18, -0.05), env_hi=(0.18, 0.18, 0.15),
        obj_lo=(-0.18, -0.18, -0.05), obj_hi=(-0.18, -0.18, -0.05),
        num_objects=0, use_orientation=False),
    "pandaPush-v0": dict(
        env_lo=(-0.18, -0.18, -0.055), env_hi=(0.18, 0.18, -0.04),
        obj_lo=(-0.1, -0.1, -0.06), obj_hi=(0.1, 0.1, -0.05),
        num_objects=1, use_orientation=False),
    "pandaPick-v0": dict(
        env_lo=(-0.18, -0.18, -0.055), env_hi=(0.18, 0.18, 0.2),
        obj_lo=(-0.18, -0.18, 0.0), obj_hi=(0.18, 0.18, 0.1),
        num_objects=1, use_orientation=False),
}


@pytest.mark.parametrize("env_id", sorted(CASES))
def test_observation_space_parity(env_id):
    env = rp.make(env_id, seed=0)
    ref = _ref_tables(**CASES[env_id])
    for key, (lo, hi) in ref.items():
        box = env.observation_space[key]
        np.testing.assert_array_equal(box.low, lo.astype(np.float32), err_msg=key)
        np.testing.assert_array_equal(box.high, hi.astype(np.float32), err_msg=key)
        assert np.isfinite(box.low).all() and np.isfinite(box.high).all(), key


def test_bounds_are_finite_everywhere():
    """Every catalog id publishes finite Box bounds (the r4 weak item:
    ±inf placeholders made sampling/normalizing consumers break)."""
    for env_id in rp.ENV_IDS:
        env = rp.make(env_id, seed=0)
        for key, box in env.observation_space.spaces.items():
            assert np.isfinite(box.low).all(), (env_id, key)
            assert np.isfinite(box.high).all(), (env_id, key)
