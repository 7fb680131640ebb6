"""Stateful gym-style wrapper + batched TPU-native env.

`PlayEnv` mirrors the reference `playEnv` surface (environments.py:58-314):
reset/step/render/compute_reward/reset_goal_pos/visualise_sub_goal, with
lazy jit compilation taking the role of lazy physics-client activation
(environments.py:218-249). The TPU-native offering is `BatchedEnv`: the same
step over (B,) env instances via vmap — the role "multiple offset instances"
plays in the reference's design notes (environments.py:52-57).
"""
from __future__ import annotations

import os
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
    """Dict obs space mirroring environments.py:120-166 bound tables
    EXACTLY, quirks included:

      * `arm_lower_obs_lim` concatenates **env_upper_bound** (not lower)
        with the negated tail in BOTH orientation branches
        (environments.py:135,144) — a reference bug replicated for parity:
        the published lower observation bound on the ee position equals
        the upper one.
      * goal boxes are `env_range` bounds tiled num_goals times
        (environments.py:152-153) even for play envs, whose actual
        desired/achieved goals are 7·n_obj+4-D — the reference publishes
        the same mismatched 3·num_goals box; consumers that sample play
        goal spaces get the same (wrong-shape) answer they would upstream.
      * `observation` bounds include the quaternion slot the actual
        observation re-encodes to Euler (environments.py:859), so the
        published box is one element wider than the returned vector —
        also faithful to the reference.
    """
    env_lo = np.asarray(cfg.env_range_low, np.float32)
    env_hi = np.asarray(cfg.env_range_high, np.float32)
    obj_lo = np.asarray(cfg.obj_lower_bound, np.float32)
    obj_hi = np.asarray(cfg.obj_upper_bound, np.float32)
    if cfg.use_orientation:
        arm_hi = np.concatenate([env_hi, [1, 1, 1, 1, 0.04]])
        arm_lo = np.concatenate([env_lo, [-1, -1, -1, -1, -0.0]])
        arm_obs_hi = np.concatenate([env_hi, [1, 1, 1, 1, 1, 1, 1, 0.04]])
        # reference bug: env_UPPER bound in the lower obs lim (:135)
        arm_obs_lo = np.concatenate([env_hi,
                                     [-1, -1, -1, -1, -1, -1, -1, -0.0]])
        obj_obs_hi = np.concatenate([obj_hi, np.ones(7)])
        obj_obs_lo = np.concatenate([obj_lo, -np.ones(7)])
        obj_pos_hi = np.concatenate([env_hi, np.ones(4)])
        obj_pos_lo = np.concatenate([env_lo, -np.ones(4)])
    else:
        arm_hi = np.concatenate([env_hi, [0.04]])
        arm_lo = np.concatenate([env_lo, [-0.0]])
        arm_obs_hi = np.concatenate([env_hi, [1, 1, 1, 0.04]])
        # reference bug: env_UPPER bound in the lower obs lim (:144)
        arm_obs_lo = np.concatenate([env_hi, [-1, -1, -1, -0.0]])
        obj_obs_hi = np.concatenate([obj_hi, np.ones(3)])
        obj_obs_lo = np.concatenate([obj_lo, -np.ones(3)])
        obj_pos_hi, obj_pos_lo = env_hi, env_lo
    obs_hi = np.concatenate([arm_obs_hi] + [obj_obs_hi] * cfg.num_objects)
    obs_lo = np.concatenate([arm_obs_lo] + [obj_obs_lo] * cfg.num_objects)
    goal_hi = np.concatenate([env_hi] * cfg.num_goals)
    goal_lo = np.concatenate([env_lo] * cfg.num_goals)
    full_hi = np.concatenate([arm_hi] + [obj_pos_hi] * cfg.num_objects)
    full_lo = np.concatenate([arm_lo] + [obj_pos_lo] * cfg.num_objects)
    return spaces.Dict(
        desired_goal=spaces.Box(goal_lo, goal_hi),
        achieved_goal=spaces.Box(goal_lo, goal_hi),
        observation=spaces.Box(obs_lo, obs_hi),
        controllable_achieved_goal=spaces.Box(arm_lo, arm_hi),
        full_positional_state=spaces.Box(full_lo, full_hi),
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
        # render('human') headless analogue of the reference's live GUI
        # (environments.py:220-224): while render_scene is set, step()
        # streams a PNG frame to this path every `human_render_every`
        # steps for an external viewer to watch.
        self.human_render_path = os.environ.get(
            "PLAYROOM_HUMAN_RENDER", "/tmp/playroom_human.png")
        self.human_render_every = int(os.environ.get(
            "PLAYROOM_HUMAN_RENDER_EVERY", "5"))
        self._human_step_count = 0
        self._record_images = False
        self._sub_goal = None
        self._jit_ghost_arm = None
        self._ghost_rest_quat = None
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
        if self.render_scene:
            self._human_step_count += 1
            if self._human_step_count % max(self.human_render_every, 1) == 0:
                from ..utils.render import write_png
                write_png(self.human_render_path, self._render_frame())
        return obs, float(r), False, {
            "is_success": float(info["is_success"]),
            "target_poses": np.asarray(info["target_poses"]),
        }

    def _ghost_arm_links(self, ee_pos, ee_quat):
        """(n_dof, 3) link positions of a ghost arm IK'd to the sub-goal
        ee pose — the skeleton analogue of the reference's ghost_panda
        (environments.py:619-631, reset_arm at the sub-goal :699-703)."""
        from ..ops import kinematics as Kin
        m = self.model
        if self._jit_ghost_arm is None:
            tree, arm = m.tree, m.arm
            rest = jnp.zeros(tree.n_dof, jnp.float32).at[:arm.n_arm].set(
                jnp.asarray(arm.rest_pose, jnp.float32))
            _, rq = Kin.fk_site(tree, rest, arm.ee_site)
            self._ghost_rest_quat = np.asarray(rq)

            def _ik_links(p, q):
                sol = Kin.ik_dls(tree, rest, p, q, rest, site=arm.ee_site,
                                 iters=16, n_active=arm.n_arm)
                lp, _ = Kin.fk_links(tree, sol)
                return lp

            self._jit_ghost_arm = jax.jit(_ik_links)
        quat = self._ghost_rest_quat if ee_quat is None else ee_quat
        return np.asarray(self._jit_ghost_arm(
            jnp.asarray(ee_pos, jnp.float32), jnp.asarray(quat, jnp.float32)))

    def _sub_goal_ghosts(self):
        """Ghost-body arrays from the stored sub-goal vector, mirroring
        the reference's ghost set (environments.py:606-717):
          * ghost ARM skeleton IK'd to the ee sub-goal (ghost_panda.urdf
            analogue) for full_positional/controllable kinds,
          * per-block translucent BOXES at the block sub-goal poses
            (rgba-0.5 GEOM_BOX ghosts, :668-679),
          * the door/drawer/button/dial collider boxes posed at the
            sub-goal joint values (ghost scene elements, :684-717).
        Returns (spheres, boxes) tuples with static shapes for jit."""
        cfg = self.cfg
        from ..utils import render as rnd
        tree, scene = self.model.tree, self.model.scene
        n_dof = tree.n_dof
        nKb = scene.art_boxes_pos.shape[1]
        S = 3 * n_dof + 1
        NB = cfg.num_objects + 4 * nKb
        pos = np.zeros((S, 3), np.float32)
        rad = np.zeros((S,), np.float32)
        col = np.zeros((S, 3), np.float32)
        alp = np.zeros((S,), np.float32)
        bpos = np.zeros((NB, 3), np.float32)
        bquat = np.zeros((NB, 4), np.float32)
        bquat[:, 3] = 1.0
        bhalf = np.zeros((NB, 3), np.float32)
        bcol = np.zeros((NB, 3), np.float32)
        balp = np.zeros((NB,), np.float32)
        spheres = (pos, rad, col, alp)
        boxes = (bpos, bquat, bhalf, bcol, balp)
        if self._sub_goal is None:
            return spheres, boxes
        vec, kind = self._sub_goal
        vec = np.asarray(vec, np.float32)
        ag = None
        if kind in ("full_positional_state", "controllable_achieved_goal"):
            ee = vec[:3]
            eq = (vec[3:7] if (cfg.use_orientation
                               and kind == "full_positional_state"
                               and vec.shape[0] >= 7) else None)
            links = self._ghost_arm_links(ee, eq)
            i = 0
            for l in range(n_dof):
                p = int(tree.parent[l])
                a = links[p] if p >= 0 else np.asarray(tree.base_pos)
                b = links[l]
                for s in range(3):
                    f = (s + 1) / 3.0
                    pos[i] = a + f * (b - a)
                    rad[i], col[i], alp[i] = 0.045, rnd._ARM_COLOR, 0.35
                    i += 1
            pos[S - 1], rad[S - 1] = ee, 0.05
            col[S - 1], alp[S - 1] = rnd._ARM_COLOR, 0.4
            if kind == "full_positional_state":
                off = 8 if cfg.use_orientation else 4
                if vec.shape[0] > off:
                    ag = vec[off:]
        else:                            # achieved_goal-layout sub-goal
            ag = vec
        if ag is not None and cfg.num_objects > 0:
            per = 7 if (cfg.play or cfg.use_orientation) else 3
            ghost_half = np.asarray(scene.block_half) if cfg.play \
                else np.full(3, 0.03, np.float32)    # environments.py:670-673
            for o in range(cfg.num_objects):
                bpos[o] = ag[per * o: per * o + 3]
                if per == 7:
                    q = ag[per * o + 3: per * o + 7]
                    nq = np.linalg.norm(q)
                    bquat[o] = q / nq if nq > 1e-6 else (0, 0, 0, 1)
                bhalf[o] = ghost_half
                bcol[o] = rnd._BLOCK_COLORS[o % 2]
                balp[o] = 0.5                        # rgba alpha 0.5, :672
            if cfg.play and ag.shape[0] >= per * cfg.num_objects + 4:
                from . import physics
                from ..ops import spatial as sp
                art = ag[per * cfg.num_objects:][:4].copy()
                art[3] = art[3] * 2.2    # undo dial_to_0_1_range (viz only)
                art_q = jnp.asarray(art)
                for k in range(4):
                    apos, aquat = physics.art_box_pose(scene, k, art_q)
                    apos, aquat = np.asarray(apos), np.asarray(aquat)
                    for j in range(nKb):
                        slot = cfg.num_objects + k * nKb + j
                        half = np.asarray(scene.art_boxes_half[k, j])
                        if float(half.sum()) <= 0.0:
                            continue                 # padding slot
                        off3 = np.asarray(sp.quat_rotate(
                            jnp.asarray(aquat),
                            jnp.asarray(scene.art_boxes_pos[k, j])))
                        bpos[slot] = apos + off3
                        bquat[slot] = aquat
                        bhalf[slot] = half
                        bcol[slot] = rnd._ART_COLORS[k]
                        balp[slot] = 0.4
        return spheres, boxes

    def _render_frame(self):
        from ..utils import render as rnd
        if self._jit_render is None:
            m = self.model
            self._jit_render = jax.jit(
                lambda s, g, gb: rnd.render_state(
                    m.cfg, m.tree, m.arm, m.scene, s,
                    ghosts=g, ghost_boxes=gb))
        g, gb = self._sub_goal_ghosts()
        img = self._jit_render(self._state, g, gb)
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
        """Stores the sub-goal for the host-side renderer, which draws the
        reference's full ghost set (environments.py:606-717): ghost arm
        skeleton (full_positional/controllable kinds), translucent block
        boxes, and the scene elements posed at the sub-goal joint values
        (see _sub_goal_ghosts)."""
        self._sub_goal = (np.asarray(sub_goal), sub_goal_state)

    def delete_sub_goal(self):
        self._sub_goal = None

    def reset_arm_joints(self, poses):
        """Hard-teleport the arm joints, bypassing dynamics — parity with
        the reference's debug path (environments.py:558-563, used by
        interactive.py:41-46 joint_control): writes q directly, zeroes
        velocities, and re-seeds the servo targets so the next step holds
        the teleported pose."""
        poses = np.asarray(poses, np.float32)
        n_arm = self.model.arm.n_arm
        assert poses.shape[0] >= n_arm, (poses.shape, n_arm)
        q = np.asarray(self._state.q).copy()
        q[:n_arm] = poses[:n_arm]
        self._state = self._state.replace(
            q=jnp.asarray(q),
            qd=jnp.zeros_like(self._state.qd),
            ctrl_q=jnp.asarray(q[:n_arm]))

    def vr_activation(self, vr=None):
        raise NotImplementedError(
            "VR teleop's SHARED_MEMORY attach (environments.py:252-267) "
            "has no TPU analogue; drive this env from an external teleop "
            "process via tools/teleop_bridge.py (JSON over stdio/TCP, "
            "state injection + step)")

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
