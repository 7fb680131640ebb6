"""Reward/success function parity tests (playRewardFunc.py, environments.py)."""
import numpy as np
import jax.numpy as jnp

from roboticsplayroompybullet_tpu.envs.config import EnvConfig, CATALOG
from roboticsplayroompybullet_tpu.envs import rewards
from roboticsplayroompybullet_tpu.models.playroom import dial_to_0_1_range
import pytest

pytestmark = pytest.mark.smoke

PLAY = CATALOG["UR5PlayAbsRPY1Obj-v0"]
REACH = CATALOG["UR5Reach-v0"]
PICK = CATALOG["pandaPick-v0"]


def _ag(block=(0, 0, 0), quat=(0, 0, 0, 1), drawer=0.0, door=0.0,
        button=0.0, dial=0.0):
    return jnp.asarray(np.concatenate([block, quat, [drawer, door, button,
                                                     dial]]).astype(np.float32))


def test_play_success_exact_match():
    g = _ag()
    assert float(rewards.play_success(PLAY, g, g)) == 0.0


def test_play_success_thresholds():
    g = _ag()
    # block xyz threshold 0.05 (playRewardFunc.py:16)
    assert float(rewards.play_success(PLAY, _ag(block=(0.04, 0, 0)), g)) == 0.0
    assert float(rewards.play_success(PLAY, _ag(block=(0.06, 0, 0)), g)) == -1.0
    # drawer 0.025 (playRewardFunc.py:33)
    assert float(rewards.play_success(PLAY, _ag(drawer=0.02), g)) == 0.0
    assert float(rewards.play_success(PLAY, _ag(drawer=0.03), g)) == -1.0
    # door 0.04 (playRewardFunc.py:40-41: the limit kwarg is ignored)
    assert float(rewards.play_success(PLAY, _ag(door=0.035), g)) == 0.0
    assert float(rewards.play_success(PLAY, _ag(door=0.045), g)) == -1.0
    # button 0.01 (playRewardFunc.py:48)
    assert float(rewards.play_success(PLAY, _ag(button=0.005), g)) == 0.0
    assert float(rewards.play_success(PLAY, _ag(button=0.015), g)) == -1.0
    # dial 0.3 (playRewardFunc.py:55)
    assert float(rewards.play_success(PLAY, _ag(dial=0.25), g)) == 0.0
    assert float(rewards.play_success(PLAY, _ag(dial=0.35), g)) == -1.0


def test_play_success_rpy_threshold():
    g = _ag()
    # rotation about z by < pi/4 passes, > pi/4 fails (playRewardFunc.py:24)
    small = np.array([0, 0, np.sin(0.3 / 2), np.cos(0.3 / 2)])
    big = np.array([0, 0, np.sin(1.2 / 2), np.cos(1.2 / 2)])
    assert float(rewards.play_success(PLAY, _ag(quat=small), g)) == 0.0
    assert float(rewards.play_success(PLAY, _ag(quat=big), g)) == -1.0


def test_sparse_reach_reward():
    ag = jnp.asarray(np.array([0.0, 0.0, 0.0], np.float32))
    # beyond threshold → −1 per goal
    g = jnp.asarray(np.array([0.2, 0.0, 0.0], np.float32))
    assert float(rewards.sparse_reward(REACH, ag, g)) == -1.0
    # within threshold → −distance
    g2 = jnp.asarray(np.array([0.03, 0.0, 0.0], np.float32))
    np.testing.assert_allclose(float(rewards.sparse_reward(REACH, ag, g2)),
                               -0.03, atol=1e-5)


def test_sparse_reward_vectorized():
    ag = jnp.zeros((5, 3), jnp.float32)
    g = jnp.tile(jnp.array([0.2, 0.0, 0.0]), (5, 1))
    r = rewards.sparse_reward(REACH, ag, g)
    assert r.shape == (5,)
    np.testing.assert_allclose(np.asarray(r), -1.0)


def test_pick_uses_pos_only_with_ori_stride():
    """compute_reward_sparse strides ag by 3+4 per goal (environments.py:298)."""
    cfg = PICK
    ag = jnp.asarray(np.zeros(7, np.float32))   # pos+quat layout
    g = jnp.asarray(np.array([0.0, 0.0, 0.04], np.float32))
    np.testing.assert_allclose(float(rewards.sparse_reward(cfg, ag, g)),
                               -0.04, atol=1e-5)


def test_dial_range_precedence_bug():
    """scenes.py:342-343: (data % 2*pi)/(2.2*pi) == ((data%2)·π)/(2.2π)."""
    for x in (0.3, 1.7, 2.5, -0.4):
        expected = ((x % 2.0) * np.pi) / (2.2 * np.pi)
        np.testing.assert_allclose(float(dial_to_0_1_range(jnp.float32(x))),
                                   expected, rtol=1e-5)


def test_dense_reward():
    ag = jnp.array([1.0, 0.0, 0.0])
    g = jnp.array([0.0, 0.0, 0.0])
    assert float(rewards.dense_reward(ag, g)) == -1.0
