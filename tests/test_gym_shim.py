"""gym/gymnasium interop shim (reference __init__.py:3-99 register-at-
import surface). Tested against the real gymnasium when available and a
fake registry module otherwise-compatible code paths."""
import numpy as np
import pytest

from roboticsplayroompybullet_tpu.envs.config import CATALOG
from roboticsplayroompybullet_tpu import gym_registry

pytestmark = pytest.mark.smoke


class _FakeReg:
    """Minimal gym-like registration surface."""

    def __init__(self):
        self.specs = {}

        class _Envs:
            pass

        self.envs = _Envs()
        self.envs.registry = self.specs

    def register(self, id, entry_point, **kw):
        self.specs[id] = {"entry_point": entry_point, **kw}


def test_register_against_fake_registry():
    fake = _FakeReg()
    assert gym_registry.register_gym_envs(module=fake)
    assert set(fake.specs) == set(CATALOG)          # all 19 live ids
    assert "pointMass3D-v0" not in fake.specs       # dead upstream reg
    # play envs registered with the reference's max_episode_steps=None
    assert fake.specs["UR5PlayAbsRPY1Obj-v0"]["max_episode_steps"] is None
    assert fake.specs["pandaReach-v0"]["max_episode_steps"] == 250
    # entry point builds a working PlayEnv
    env = fake.specs["UR5Reach-v0"]["entry_point"]()
    obs = env.reset()
    assert "obs_quat" in obs
    # idempotent
    assert gym_registry.register_gym_envs(module=fake)


def test_register_with_real_gymnasium():
    gymnasium = pytest.importorskip("gymnasium")
    assert gym_registry.register_gym_envs()
    # package import also auto-registers; either way the ids are present
    ids = set(gymnasium.envs.registry.keys())
    missing = set(CATALOG) - ids
    assert not missing, missing
