"""Smooth scripted play-action process for LfP data collection and eval.

The reference's play data comes from human VR teleoperation (reference
README.md:2-10): smooth, workspace-bounded end-effector wandering with
occasional grasps. Round 4's collector instead drew AR(1) noise over the
RAW action box — for absolute pose modes that box is ±6
(environments.py:88-117) while the reachable workspace is ±~0.3 m, so
commanded targets saturated far outside the workspace, the rate-limited
arm pinned at its boundary, and actions carried almost no information
about the resulting motion (the r4 BC policy's 0.39 m EE error traces
straight to this). This actor reproduces the STRUCTURE of teleoperated
play instead:

  * an AR(1) random walk of the commanded EE target INSIDE a workspace
    box derived from the env's goal range, with occasional jumps to a
    fresh uniform target (attention shifts),
  * orientation wandering around the arm's natural downward rest pose
    (the same pose the scripted manipulation tests drive from,
    tests/test_env.py:230-233),
  * a slow, saturating grip open/close cycle (grasp attempts).

One process serves both the collector (tools/collect_play.py) and the
eval protocol (tools/eval_lfp.py): window goals must come from the same
distribution the policy was trained on.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..envs.core import EnvModel
from ..ops import spatial as sp


class PlayActorConfig(NamedTuple):
    box_lo: Tuple[float, float, float]
    box_hi: Tuple[float, float, float]
    rpy0: Tuple[float, float, float]    # orientation anchor (rest-pose rpy)
    pos_sigma: float = 0.035            # EE-target step scale, m
    pos_smooth: float = 0.85
    rpy_sigma: float = 0.06             # rad per step around rpy0
    rpy_clip: float = 0.5               # max wander from rpy0 (roll/pitch)
    yaw_clip: float = 1.2               # yaw wanders wider
    jump_prob: float = 0.03             # per-step target-resample chance
    grip_smooth: float = 0.97
    grip_sigma: float = 0.25


class PlayActorState(NamedTuple):
    pos: jnp.ndarray       # (B, 3) commanded EE target
    vel: jnp.ndarray       # (B, A) AR(1) latent (cols 0:3 = target vel in
                           # structured mode; full row in fallback mode)
    rpy: jnp.ndarray       # (B, 3) wander offsets from rpy0
    grip: jnp.ndarray      # (B,) grip AR(1) latent


def default_actor_config(m: EnvModel) -> PlayActorConfig:
    """Workspace box from the env's goal range (envList.py bounds), padded
    sideways and upward so the actor sweeps past the scene elements;
    orientation anchored at the rest pose's EE rpy."""
    from ..ops import kinematics as K

    gl = np.asarray(m.cfg.goal_range_low, np.float32)
    gh = np.asarray(m.cfg.goal_range_high, np.float32)
    lo = (float(gl[0] - 0.06), float(gl[1] - 0.04), float(gl[2] - 0.03))
    hi = (float(gh[0] + 0.06), float(gh[1] + 0.06), float(gh[2] + 0.15))
    rest = jnp.zeros(m.tree.n_dof, jnp.float32).at[:m.arm.n_arm].set(
        jnp.asarray(m.arm.rest_pose, jnp.float32))
    _, q0 = K.fk_site(m.tree, rest, m.arm.ee_site)
    rpy0 = tuple(float(x) for x in np.asarray(sp.quat_to_euler(q0)))
    return PlayActorConfig(box_lo=lo, box_hi=hi, rpy0=rpy0)


def make_play_actor(m: EnvModel, cfg: Optional[PlayActorConfig] = None):
    """Returns (init(key, B) -> state, step(state, key) -> (state, actions)).

    Actions are assembled for the env's action mode; absolute pose modes
    (absolute_rpy / absolute_quat) get the structured EE wander, all other
    modes fall back to workspace-scaled AR(1) noise on the raw action box
    (relative modes already mean small motions at zero)."""
    if cfg is None:
        cfg = default_actor_config(m)
    at = m.cfg.action_type
    A = m.cfg.action_dim
    high = jnp.asarray(m.cfg.action_high, jnp.float32)
    lo = jnp.asarray(cfg.box_lo, jnp.float32)
    hi = jnp.asarray(cfg.box_hi, jnp.float32)
    rpy0 = jnp.asarray(cfg.rpy0, jnp.float32)
    structured = at in ("absolute_rpy", "absolute_quat")

    def init(key, B: int) -> PlayActorState:
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (B, 3), jnp.float32, lo, hi)
        return PlayActorState(
            pos=pos, vel=jnp.zeros((B, A), jnp.float32),
            rpy=jnp.zeros((B, 3), jnp.float32),
            grip=jax.random.uniform(k2, (B,), jnp.float32, -1.0, 1.0))

    def step(st: PlayActorState, key):
        B = st.pos.shape[0]
        kv, kj, kp, kr, kg = jax.random.split(key, 5)
        if not structured:
            # legacy fallback: AR(1) on the raw box (collector r4 behavior)
            eps = jax.random.normal(kv, (B, A))
            tail = 0.85 * st.vel + 0.35 * eps
            acts = jnp.clip(tail, -high, high)
            return st._replace(vel=tail), acts
        # EE-target random walk, reflected into the box
        eps = jax.random.normal(kv, (B, 3)) * cfg.pos_sigma
        vel = cfg.pos_smooth * st.vel[:, :3] + eps
        pos = jnp.clip(st.pos + vel, lo, hi)
        jump = jax.random.bernoulli(kj, cfg.jump_prob, (B, 1))
        fresh = jax.random.uniform(kp, (B, 3), jnp.float32, lo, hi)
        pos = jnp.where(jump, fresh, pos)
        vel = jnp.where(jump, jnp.zeros_like(vel), vel)
        vel_full = jnp.concatenate(
            [vel, jnp.zeros((B, A - 3), jnp.float32)], axis=-1)
        # orientation wander around the rest rpy
        rpy = 0.95 * st.rpy + jax.random.normal(kr, (B, 3)) * cfg.rpy_sigma
        clip = jnp.asarray([cfg.rpy_clip, cfg.rpy_clip, cfg.yaw_clip])
        rpy = jnp.clip(rpy, -clip, clip)
        # slow saturating grasp cycle
        grip = cfg.grip_smooth * st.grip \
            + jax.random.normal(kg, (B,)) * cfg.grip_sigma
        grip = jnp.clip(grip, -1.5, 1.5)
        g_cmd = jnp.tanh(2.0 * grip)

        ang = rpy0 + rpy
        if at == "absolute_rpy":
            acts = jnp.concatenate([pos, ang, g_cmd[:, None]], axis=-1)
        else:                                   # absolute_quat
            quat = jax.vmap(sp.quat_from_euler)(ang)
            if m.cfg.use_orientation:
                acts = jnp.concatenate([pos, quat, g_cmd[:, None]], axis=-1)
            else:
                acts = jnp.concatenate([pos, g_cmd[:, None]], axis=-1)
        acts = jnp.clip(acts, -high, high)
        return st._replace(pos=pos, vel=vel_full, rpy=rpy, grip=grip), acts

    return init, step
