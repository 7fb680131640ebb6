"""Stateful gym-style wrapper + batched TPU-native env.

`PlayEnv` mirrors the reference `playEnv` surface (environments.py:58-314):
reset/step/render/compute_reward/reset_goal_pos/visualise_sub_goal, with
lazy jit compilation taking the role of lazy physics-client activation
(environments.py:218-249). The TPU-native offering is `BatchedEnv`: the same
step over (B,) env instances via vmap — the role "multiple offset instances"
plays in the reference's design notes (environments.py:52-57).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import spaces
from .config import EnvConfig, CATALOG
from . import core
from .rewards import compute_reward as _compute_reward
from .state import EnvState


def _observation_spaces(cfg: EnvConfig):
    """Dict obs space mirroring environments.py:120-166 bounds."""
    lo, hi = np.array(cfg.env_range_low), np.array(cfg.env_range_high)
    glo = np.concatenate([np.array(cfg.goal_range_low)] * cfg.num_goals) \
        if not cfg.play else np.full(cfg.goal_dim, -np.inf)
    ghi = np.concatenate([np.array(cfg.goal_range_high)] * cfg.num_goals) \
        if not cfg.play else np.full(cfg.goal_dim, np.inf)
    arm_low = np.concatenate([lo, [0.0]]) if not cfg.use_orientation \
        else np.concatenate([lo, -np.ones(4), [0.0]])
    arm_high = np.concatenate([hi, [0.04]]) if not cfg.use_orientation \
        else np.concatenate([hi, np.ones(4), [0.04]])
    return spaces.Dict(
        desired_goal=spaces.Box(glo, ghi),
        achieved_goal=spaces.Box(np.full(cfg.ag_dim, -np.inf),
                                 np.full(cfg.ag_dim, np.inf)),
        observation=spaces.Box(np.full(cfg.obs_dim - 1, -np.inf),
                               np.full(cfg.obs_dim - 1, np.inf)),
        controllable_achieved_goal=spaces.Box(arm_low[:4] * 0 - np.inf,
                                              arm_high[:4] * 0 + np.inf),
        full_positional_state=spaces.Box(
            np.full(len(arm_low) + cfg.ag_dim if cfg.num_objects else
                    len(arm_low), -np.inf),
            np.full(len(arm_low) + cfg.ag_dim if cfg.num_objects else
                    len(arm_low), np.inf)),
    )


class PlayEnv:
    """Single-instance, host-friendly wrapper (numpy in / numpy out)."""

    metadata = {"render.modes": ["human", "rgb_array"],
                "video.frames_per_second": 60}

    def __init__(self, cfg: EnvConfig, seed: int = 0):
        self.cfg = cfg
        self.model = core.build_model(cfg)
        high = np.asarray(cfg.action_high, np.float32)
        self.action_space = spaces.Box(-high, high)
        self.observation_space = _observation_spaces(cfg)
        self._max_episode_steps = cfg.max_episode_steps
        self._rng = jax.random.PRNGKey(seed)
        self._state: Optional[EnvState] = None
        self.render_scene = False
        self._record_images = False
        self._sub_goal = None
        # lazy jit (the "physics client activation" analogue)
        self._jit_step = jax.jit(lambda s, a: core.step(self.model, s, a))
        self._jit_reset = jax.jit(lambda r: core.reset(self.model, r))
        self._jit_reset_o = jax.jit(lambda r, o: core.reset(self.model, r, o))
        self._jit_render = None    # built on first rgb_array request

    # -- gym surface ------------------------------------------------------
    def seed(self, seed=None):
        if seed is not None:
            self._rng = jax.random.PRNGKey(seed)
        return [seed]

    def reset(self, o=None, vr=None):
        self._rng, sub = jax.random.split(self._rng)
        if o is None:
            self._state, obs = self._jit_reset(sub)
        else:
            self._state, obs = self._jit_reset_o(
                sub, jnp.asarray(o, jnp.float32))
        return {k: np.asarray(v) for k, v in obs.items()}

    def step(self, action):
        state, obs, r, info = self._jit_step(
            self._state, jnp.asarray(action, jnp.float32))
        self._state = state
        obs = {k: np.asarray(v) for k, v in obs.items()}
        # 200x200 RGB when recording (environments.py:841-843)
        obs["img"] = self._render_frame() if self._record_images else None
        return obs, float(r), False, {
            "is_success": float(info["is_success"]),
            "target_poses": np.asarray(info["target_poses"]),
        }

    def _sub_goal_ghosts(self):
        """Translucent marker spheres from the stored sub-goal vector:
        ee target (full_positional_state kinds), per-block goal positions,
        and the 4 articulated elements posed at their goal values — the
        flat-array analogue of the reference's ghost bodies
        (environments.py:606-703)."""
        cfg = self.cfg
        K = cfg.num_objects + 5          # ee + blocks + drawer/door/button/dial
        pos = np.zeros((K, 3), np.float32)
        rad = np.zeros((K,), np.float32)
        col = np.zeros((K, 3), np.float32)
        alp = np.zeros((K,), np.float32)
        if self._sub_goal is None:
            return pos, rad, col, alp
        from ..utils import render as rnd
        vec, kind = self._sub_goal
        vec = np.asarray(vec, np.float32)
        ag = None
        if kind == "full_positional_state":
            pos[0], rad[0], col[0], alp[0] = vec[:3], 0.05, rnd._ARM_COLOR, 0.4
            off = 8 if cfg.use_orientation else 4
            if vec.shape[0] > off:
                ag = vec[off:]
        else:                            # achieved_goal-layout sub-goal
            ag = vec
        if ag is not None and cfg.num_objects > 0:
            per = 7 if (cfg.play or cfg.use_orientation) else 3
            for o in range(cfg.num_objects):
                pos[1 + o] = ag[per * o: per * o + 3]
                rad[1 + o] = float(np.max(self.model.scene.block_half)) * 1.6
                col[1 + o] = rnd._BLOCK_COLORS[o % 2]
                alp[1 + o] = 0.4
            if cfg.play and ag.shape[0] >= per * cfg.num_objects + 4:
                from . import physics
                art = ag[per * cfg.num_objects:][:4].copy()
                art[3] = art[3] * 2.2    # undo dial_to_0_1_range (viz only)
                art_q = jnp.asarray(art)
                for k in range(4):
                    p, _ = physics.art_box_pose(self.model.scene, k, art_q)
                    j = 1 + cfg.num_objects + k
                    pos[j] = np.asarray(p)
                    rad[j] = 0.035
                    col[j] = rnd._ART_COLORS[k]
                    alp[j] = 0.4
        return pos, rad, col, alp

    def _render_frame(self):
        from ..utils import render as rnd
        if self._jit_render is None:
            m = self.model
            self._jit_render = jax.jit(
                lambda s, gp, gr, gc, ga: rnd.render_state(
                    m.cfg, m.tree, m.arm, m.scene, s,
                    ghosts=(gp, gr, gc, ga)))
        img = self._jit_render(self._state, *self._sub_goal_ghosts())
        return (np.asarray(img) * 255).astype(np.uint8)

    def render(self, mode="human"):
        if mode == "human":
            self.render_scene = True
            return np.array([])
        if mode in ("rgb_array", "playback"):
            self._record_images = True
            if self._state is not None:
                return self._render_frame()

    def compute_reward(self, achieved_goal, desired_goal, info=None):
        r = _compute_reward(self.cfg, jnp.asarray(achieved_goal),
                            jnp.asarray(desired_goal))
        return np.asarray(r)

    def reset_goal_pos(self, goal=None):
        """goal=None resamples (environments.py:190-191, 492-516)."""
        g = None if goal is None else jnp.asarray(goal, jnp.float32)
        self._state = core.reset_goal(self.model, self._state,
                                      self._state.rng, g)

    def visualise_sub_goal(self, sub_goal, sub_goal_state="full_positional_state"):
        """Stores the sub-goal for the host-side renderer (the reference's
        ghost-body visualization, environments.py:606-703, is a GUI affair;
        TPU core keeps only the state)."""
        self._sub_goal = (np.asarray(sub_goal), sub_goal_state)

    def delete_sub_goal(self):
        self._sub_goal = None

    def vr_activation(self, vr=None):
        raise NotImplementedError(
            "VR teleop requires the CPU mirror process; see README")

    @property
    def instance(self):
        return self

    @property
    def state(self) -> EnvState:
        return self._state


class BatchedEnv:
    """B env instances stepped in lockstep on device — the TPU-native API.

    obs/reward come back with a leading (B,) dim. Auto-reset is NOT applied;
    `done` is always False, matching the reference (environments.py:212-213).
    """

    def __init__(self, cfg: EnvConfig, batch_size: int, seed: int = 0):
        self.cfg = cfg
        self.batch = batch_size
        self.model = core.build_model(cfg)
        self._rng = jax.random.PRNGKey(seed)
        self._state = None
        m = self.model
        self._jit_reset = jax.jit(
            jax.vmap(lambda r: core.reset(m, r)))
        self._jit_step = jax.jit(
            jax.vmap(lambda s, a: core.step(m, s, a)))

    def reset(self):
        self._rng, sub = jax.random.split(self._rng)
        keys = jax.random.split(sub, self.batch)
        self._state, obs = self._jit_reset(keys)
        return obs

    def step(self, actions):
        self._state, obs, r, info = self._jit_step(self._state, actions)
        return obs, r, jnp.zeros_like(r, bool), info

    @property
    def state(self):
        return self._state


def make(env_id: str, batch_size: Optional[int] = None, seed: int = 0):
    """gym.make equivalent over the 20-env catalog
    (roboticsPlayroomPybullet/__init__.py:3-99)."""
    if env_id not in CATALOG:
        raise KeyError(f"unknown env id {env_id!r}; known: {sorted(CATALOG)}")
    cfg = CATALOG[env_id]
    if batch_size is None:
        return PlayEnv(cfg, seed=seed)
    return BatchedEnv(cfg, batch_size, seed=seed)
