"""Env core: functional reset/step + action-mode control dispatch.

The reference's `playEnv.step` pipeline (environments.py:206-214):
  clip action → perform_action (mode dispatch → IK → rate-limited joint
  targets + gripper motors) → 12 physics substeps → calc_state → reward.
Here each piece is a pure function; `step()` is fully jittable and `vmap`s
over env batches. Action-mode dispatch is static config (environments.py:
915-934); IK replaces Bullet's solver with rest-pose-regularized DLS
(ops/kinematics.py) seeded from the current configuration — functionally
reproducing both reference stabilizers (environments.py:995-1001,
inverseKinematics.py:44-50).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import playroom
from ..models.arms import get_arm, ArmConfig
from ..models.kinetree import KineTree
from ..models.playroom import Scene
from ..ops import spatial as sp
from ..ops import kinematics as K
from ..ops import dynamics as dyn
from .config import EnvConfig, CATALOG
from .state import EnvState
from .obs import calc_obs, ee_state
from .rewards import compute_reward
from . import physics


class EnvModel(NamedTuple):
    """Static bundle the jitted functions close over."""
    cfg: EnvConfig
    tree: KineTree
    arm: ArmConfig
    scene: Scene


def _host_constants(tree):
    """Convert every device-array leaf to numpy.

    Model constants are CLOSED OVER by the jitted step/reset functions; a
    closed-over jax.Array constant permanently drops the whole process onto
    a ~25 ms-per-dispatch slow path under the axon TPU runtime (measured:
    one such executable poisons all subsequent calls). numpy leaves trace
    to embedded literals and stay on the fast path — and constant
    subexpressions fold at trace time for free."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def build_model(cfg: EnvConfig) -> EnvModel:
    tree, arm = get_arm(cfg.arm)
    kind = cfg.scene_kind
    if kind == "complex":
        scene = playroom.complex_scene(cfg.num_objects)
    elif kind == "push":
        scene = playroom.push_scene(cfg.num_objects)
    else:
        scene = playroom.default_scene(cfg.num_objects)
    return EnvModel(cfg, _host_constants(tree), _host_constants(arm),
                    _host_constants(scene))


# ---------------------------------------------------------------------------
# control: action → servo targets (perform_action, environments.py:915-1034)
# ---------------------------------------------------------------------------

def _ik_to_targets(m: EnvModel, state: EnvState, pos, quat):
    """Cartesian → joint targets via DLS IK (goto, environments.py:984-1007)."""
    rest = jnp.zeros(m.tree.n_dof, jnp.float32).at[:m.arm.n_arm].set(
        jnp.asarray(m.arm.rest_pose, jnp.float32))
    iters = 16 if m.arm.name == "Panda" else 24
    sol = K.ik_dls(m.tree, state.q, pos, quat, rest, site=m.arm.ee_site,
                   iters=iters, n_active=m.arm.n_arm)
    return sol[:m.arm.n_arm]


def control(m: EnvModel, state: EnvState, action: jnp.ndarray):
    """Returns (new ctrl targets, grip command, target_poses info)."""
    cfg, arm = m.cfg, m.arm
    at = cfg.action_type
    n_arm = arm.n_arm
    kin = dyn.fk_vel(m.tree, state.q, state.qd)
    ee_pos, ee_quat, _, _ = ee_state(m.tree, arm, kin)
    grip = action[-1]

    if at == "absolute_quat":
        pos = action[0:3]
        quat = (sp.quat_normalize(action[3:7]) if cfg.use_orientation
                else jnp.array([0.0, 0.0, 0.0, 1.0]))
        targets = _ik_to_targets(m, state, pos, quat)
    elif at == "relative_quat":
        pos = action[0:3] + ee_pos
        # reference adds quaternions componentwise (environments.py:951)
        quat = sp.quat_normalize(action[3:7] + ee_quat)
        targets = _ik_to_targets(m, state, pos, quat)
    elif at == "absolute_rpy":
        pos = action[0:3]
        quat = sp.quat_from_euler(action[3:6])
        targets = _ik_to_targets(m, state, pos, quat)
    elif at == "relative_rpy":
        pos = action[0:3] + ee_pos
        rpy = sp.quat_to_euler(ee_quat) + action[3:6]
        targets = _ik_to_targets(m, state, pos, sp.quat_from_euler(rpy))
    elif at == "relative_joints":
        targets = state.q[:n_arm] + action[:n_arm]
    elif at == "absolute_joints":
        targets = action[:n_arm]
    else:  # default relative cartesian mode (environments.py:112-116)
        pos = action[0:3] + ee_pos
        if cfg.use_orientation:
            rpy = sp.quat_to_euler(ee_quat) + action[3:6]
            quat = sp.quat_from_euler(rpy)
        else:
            quat = jnp.array([0.0, 0.0, 0.0, 1.0])
        targets = _ik_to_targets(m, state, pos, quat)

    # goto_joint_poses clamps (environments.py:1013-1026)
    ll = jnp.asarray(arm.ctrl_lower, jnp.float32)
    ul = jnp.asarray(arm.ctrl_upper, jnp.float32)
    inc = jnp.asarray(arm.rate_limit, jnp.float32)
    targets = jnp.clip(targets, ll, ul)
    cur = state.q[:n_arm]
    targets = jnp.clip(targets, cur - inc, cur + inc)
    return targets, grip, targets


# ---------------------------------------------------------------------------
# reset (environments.py:173-187, 492-603)
# ---------------------------------------------------------------------------

def _default_state(m: EnvModel, rng) -> EnvState:
    cfg = m.cfg
    n_obj = max(cfg.num_objects, 1)
    rest = jnp.zeros(m.tree.n_dof, jnp.float32).at[:m.arm.n_arm].set(
        jnp.asarray(m.arm.rest_pose, jnp.float32))
    return EnvState(
        q=rest, qd=jnp.zeros(m.tree.n_dof, jnp.float32),
        ctrl_q=rest[:m.arm.n_arm], grip=jnp.zeros((), jnp.float32),
        obj_pos=jnp.zeros((n_obj, 3), jnp.float32),
        obj_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
                          (n_obj, 1)),
        obj_vel=jnp.zeros((n_obj, 3), jnp.float32),
        obj_angvel=jnp.zeros((n_obj, 3), jnp.float32),
        art_q=jnp.zeros(4, jnp.float32), art_qd=jnp.zeros(4, jnp.float32),
        goal=jnp.zeros(cfg.goal_dim, jnp.float32),
        prev_obs=jnp.zeros(cfg.obs_dim, jnp.float32),
        prev_ag=jnp.zeros(cfg.ag_dim, jnp.float32),
        has_prev=jnp.zeros((), bool),
        rng=rng, t=jnp.zeros((), jnp.int32),
    )


def _reset_arm(m: EnvModel, state: EnvState, rng,
               o: Optional[jnp.ndarray]) -> EnvState:
    """reset_arm (environments.py:575-596): rest seed → IK → write q[:6].

    The reference takes only the first SIX IK outputs regardless of arm
    (environments.py:593) — so the Panda's joint 7 stays at its rest value.
    """
    cfg, arm = m.cfg, m.arm
    rest = jnp.zeros(m.tree.n_dof, jnp.float32).at[:arm.n_arm].set(
        jnp.asarray(arm.rest_pose, jnp.float32))
    if o is None:
        k1, _ = jax.random.split(rng)
        pos = jax.random.uniform(
            k1, (3,), jnp.float32,
            jnp.asarray(cfg.goal_range_low), jnp.asarray(cfg.goal_range_high))
        if arm.name == "UR5":
            pos = pos.at[2].add(0.2)   # environments.py:580-581
        quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    else:
        pos = o[0:3]
        if cfg.use_orientation:
            quat = o[6:10] if cfg.return_velocity else o[3:7]
            quat = sp.quat_normalize(quat)
        else:
            quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    sol = K.ik_dls(m.tree, rest, pos, quat, rest, site=arm.ee_site,
                   iters=24, n_active=arm.n_arm)
    q = rest.at[:6].set(sol[:6])
    return state.replace(q=q, qd=jnp.zeros_like(state.qd),
                         ctrl_q=q[:arm.n_arm])


def _objects_oob(cfg: EnvConfig, state: EnvState) -> jnp.ndarray:
    """Any real object coordinate past env_upper_bound
    (environments.py:536-538 — the reference checks only the UPPER bound)."""
    hi = jnp.asarray(cfg.env_range_high, jnp.float32)
    return jnp.any(state.obj_pos[:cfg.num_objects] > hi)


def _place_and_settle(m: EnvModel, state: EnvState, rng) -> EnvState:
    """One random placement + 100-substep settle
    (environments.py:528-535)."""
    cfg = m.cfg
    keys = jax.random.split(rng, cfg.num_objects)
    poses = []
    for i in range(cfg.num_objects):
        p = jax.random.uniform(keys[i], (3,), jnp.float32,
                               jnp.asarray(cfg.obj_lower_bound),
                               jnp.asarray(cfg.obj_upper_bound))
        p = p.at[2].add(0.03 * (i + 1))   # stagger heights
        poses.append(p)
    obj_pos = jnp.stack(poses)
    n_obj = state.obj_pos.shape[0]
    obj_pos = jnp.concatenate(
        [obj_pos, state.obj_pos[cfg.num_objects:]], axis=0) \
        if n_obj > cfg.num_objects else obj_pos
    quat = jnp.tile(jnp.array([0.0, 0.0, 0.7071, 0.7071], jnp.float32),
                    (state.obj_quat.shape[0], 1))
    state = state.replace(obj_pos=obj_pos, obj_quat=quat,
                          obj_vel=jnp.zeros_like(state.obj_vel),
                          obj_angvel=jnp.zeros_like(state.obj_angvel))
    # settle: 100 substeps (environments.py:534-535)
    return physics.run_simulation(cfg, m.tree, m.arm, m.scene, state,
                                  n_substeps=100)


def _reset_objects(m: EnvModel, state: EnvState, rng,
                   o: Optional[jnp.ndarray]) -> EnvState:
    """reset_object_pos (environments.py:519-556), including the
    out-of-bounds RE-PLACE loop (environments.py:536-539): after the
    settle, any object coordinate past env_upper_bound triggers a full
    re-place of every object. The reference recurses unboundedly; under
    jit this is a lax.while_loop capped at 20 attempts (the last draw is
    kept after that — with catalog obj bounds inside env bounds, 20
    consecutive settle-out-of-bounds events is negligible)."""
    cfg = m.cfg
    # play: articulated objects to defaults (environments.py:521-525)
    state = state.replace(art_q=jnp.zeros(4, jnp.float32),
                          art_qd=jnp.zeros(4, jnp.float32))
    if cfg.num_objects == 0:
        return state
    if o is None:
        # attempt 0 consumes `rng` exactly as a single placement would, so
        # trajectories from resets that never trigger the loop are
        # unchanged; retries fold the attempt index into `rng`.
        state = _place_and_settle(m, state, rng)

        def cond(carry):
            st, i = carry
            return _objects_oob(cfg, st) & (i < 20)

        def body(carry):
            st, i = carry
            st = _place_and_settle(m, st, jax.random.fold_in(rng, i))
            return st, i + 1

        state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(1)))
        return state
    # state injection: layout quirk preserved (environments.py:542-556)
    if cfg.use_orientation:
        index, inc = 11, 10
    else:
        index, inc = 7, 6
    obj_pos = state.obj_pos
    obj_quat = state.obj_quat
    for i in range(cfg.num_objects):
        obj_pos = obj_pos.at[i].set(o[index:index + 3])
        if cfg.use_orientation:
            obj_quat = obj_quat.at[i].set(
                sp.quat_normalize(o[index + 3:index + 7]))
        index += inc
    return state.replace(obj_pos=obj_pos, obj_quat=obj_quat,
                         obj_vel=jnp.zeros_like(state.obj_vel),
                         obj_angvel=jnp.zeros_like(state.obj_angvel))


def reset_goal(m: EnvModel, state: EnvState, rng,
               goal: Optional[jnp.ndarray] = None) -> EnvState:
    """reset_goal_pos (environments.py:492-516)."""
    cfg = m.cfg
    if goal is not None:
        return state.replace(goal=jnp.asarray(goal, jnp.float32))
    if cfg.play:
        # perturb one random dim of the current achieved goal
        obs = calc_obs(cfg, m.tree, m.arm, m.scene, state)
        ag = obs["achieved_goal"]
        k1, k2 = jax.random.split(rng)
        idx = jax.random.randint(k1, (), 0, cfg.goal_dim)
        delta = jax.random.uniform(k2, (), jnp.float32)
        goal = ag.at[idx].add(delta)
        return state.replace(goal=goal)
    keys = jax.random.split(rng, cfg.num_goals)
    gs = [jax.random.uniform(keys[g], (3,), jnp.float32,
                             jnp.asarray(cfg.goal_range_low),
                             jnp.asarray(cfg.goal_range_high))
          for g in range(cfg.num_goals)]
    return state.replace(goal=jnp.concatenate(gs))


def reset(m: EnvModel, rng, o: Optional[jnp.ndarray] = None
          ) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
    """Full reset incl. the resample-until-unsolved loop
    (environments.py:179-186). The reference loops unboundedly; under jit
    a lax.while_loop needs a finite bound — 100 attempts, after which the
    last draw is kept (P(100 consecutive solved-at-reset draws) is
    negligible for every catalog goal range, so this is behaviorally
    unbounded)."""
    def one_attempt(rng):
        k0, k1, k2, k3 = jax.random.split(rng, 4)
        state = _default_state(m, k0)
        state = _reset_objects(m, state, k1, o)
        state = _reset_arm(m, state, k2, o)
        state = reset_goal(m, state, k3)
        obs = calc_obs(m.cfg, m.tree, m.arm, m.scene, state)
        r = compute_reward(m.cfg, obs["achieved_goal"], obs["desired_goal"])
        return state, r

    if o is not None:
        # deterministic state injection: no resample loop
        state, _ = one_attempt(rng)
    else:
        def cond(carry):
            _, r, i, _ = carry
            return (r > -1.0) & (i < 100)

        def body(carry):
            _, _, i, rng = carry
            rng, sub = jax.random.split(rng)
            state, r = one_attempt(sub)
            return state, r, i + 1, rng

        rng, sub = jax.random.split(rng)
        state0, r0 = one_attempt(sub)
        state, _, _, _ = jax.lax.while_loop(cond, body,
                                            (state0, r0, jnp.int32(0), rng))

    obs = calc_obs(m.cfg, m.tree, m.arm, m.scene, state)
    state = state.replace(prev_obs=obs["_prev_obs"], prev_ag=obs["_prev_ag"],
                          has_prev=jnp.ones((), bool), rng=rng)
    obs.pop("_prev_obs")
    obs.pop("_prev_ag")
    return state, obs


# ---------------------------------------------------------------------------
# step
# ---------------------------------------------------------------------------

def step_physics_only(m: EnvModel, state: EnvState,
                      action: jnp.ndarray) -> EnvState:
    """Light control step: clip → control → 12 substeps. Skips observation
    assembly and the continuity buffers — the MPC rollout hot path
    (scoring needs only achieved_goal/reward, computed by the caller)."""
    cfg = m.cfg
    high = jnp.asarray(cfg.action_high, jnp.float32)
    action = jnp.clip(action, -high, high)
    targets, grip, _ = control(m, state, action)
    state = state.replace(ctrl_q=targets, grip=grip)
    state = physics.run_simulation(cfg, m.tree, m.arm, m.scene, state)
    return state.replace(t=state.t + 1)


def step(m: EnvModel, state: EnvState, action: jnp.ndarray):
    """One 25 Hz control step. Returns (state', obs, reward, info)."""
    cfg = m.cfg
    high = jnp.asarray(cfg.action_high, jnp.float32)
    action = jnp.clip(action, -high, high)   # environments.py:207
    targets, grip, target_poses = control(m, state, action)
    state = state.replace(ctrl_q=targets, grip=grip)
    state = physics.run_simulation(cfg, m.tree, m.arm, m.scene, state)
    obs = calc_obs(cfg, m.tree, m.arm, m.scene, state)
    state = state.replace(prev_obs=obs["_prev_obs"], prev_ag=obs["_prev_ag"],
                          has_prev=jnp.ones((), bool),
                          t=state.t + 1)
    obs.pop("_prev_obs")
    obs.pop("_prev_ag")
    r = compute_reward(cfg, obs["achieved_goal"], obs["desired_goal"])
    success = jnp.where(r < 0, 0.0, 1.0)
    info = {"is_success": success, "target_poses": target_poses}
    return state, obs, r, info
