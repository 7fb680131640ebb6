"""Observation assembly — mirrors `instance.calc_state` layouts exactly.

Reference layout (environments.py:799-864):
  obs_quat  = [arm(pos [,pos_vel] [,orn] gripper)] + per-object
              [pos [,orn] [,vel]] + play scalars [drawer, door, button,
              dial∈0-1]
  achieved_goal: play → 11-D (+7/obj) playRewardFunc layout; objects →
              pos(+orn); none → ee pos
  observation = [obs_quat[0:3], Euler(obs_quat[3:7]), obs_quat[7:]] — the
              reference applies the quat→Euler re-encode unconditionally
              (environments.py:859), which only decodes a real quaternion in
              the play layouts; we replicate that faithfully (normalizing
              before conversion for numerical sanity).
  quaternion sign-continuity flips with the reference's hard-coded index
              pairs (environments.py:868-894), play mode only.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..models.kinetree import KineTree
from ..models.arms import ArmConfig
from ..models.playroom import Scene, dial_to_0_1_range
from ..ops import spatial as sp
from ..ops import dynamics as dyn
from .config import EnvConfig
from .state import EnvState


class ArmObs(NamedTuple):
    pos: jnp.ndarray        # (3,) ee world position
    orn: jnp.ndarray        # (4,)
    pos_vel: jnp.ndarray    # (3,)
    orn_vel: jnp.ndarray    # (3,)
    gripper: jnp.ndarray    # (1,)
    joints: jnp.ndarray     # (8,) first 8 bullet-joint positions
    proprioception: jnp.ndarray  # ()


def ee_state(tree: KineTree, arm: ArmConfig, kin: dyn.LinkKin):
    """EE site world pose + velocities (getLinkState equivalent)."""
    site = arm.ee_site
    par = tree.site_parent[site]
    pos, quat = sp.transform_compose(kin.pos[par], kin.quat[par],
                                     tree.site_pos[site], tree.site_quat[site])
    vel = kin.lin_vel[par] + jnp.cross(kin.ang_vel[par], pos - kin.pos[par])
    return pos, quat, vel, kin.ang_vel[par]


def _bullet_joint_vector(tree: KineTree, arm: ArmConfig, q):
    """First 8 bullet-joint positions (environments.py:758): fixed joints
    read 0; movable ones map to reduced dofs."""
    vals = []
    if arm.name == "Panda":
        dof_of_bullet = {i: i for i in range(7)}  # joints 0-6 = dofs 0-6
    else:
        dof_of_bullet = {i: i for i in range(6)}  # joints 0-5 = dofs 0-5
    for j in range(8):
        vals.append(q[dof_of_bullet[j]] if j in dof_of_bullet
                    else jnp.zeros((), q.dtype))
    return jnp.stack(vals)


def _proprioception(cfg: EnvConfig, arm: ArmConfig, tree: KineTree,
                    kin: dyn.LinkKin, state: EnvState, scene: Scene):
    """Binary 'something between the prongs' (environments.py:720-743).

    UR5 only (Panda returns −1). True ray-cast mirror of the reference's
    `rayTest`: the segment runs from the ee/wrist midpoint ("far up",
    environments.py:726) to just past the inter-pad midpoint ("between the
    prongs", :727), and is tested against every non-gripper collider —
    block boxes, articulated-element collider boxes, static boxes, and the
    ground plane. A hit with fraction < 1 reads 1, else 0; the pads
    themselves are never tested (the reference's link-18/20 exclusion,
    :736).
    """
    if arm.name != "UR5":
        return jnp.full((), -1.0, jnp.float32)
    from ..utils.render import _ray_box, _ray_plane_z, _BIG
    from .physics import art_box_pose

    # pad-sphere centers → avg_gripper (gripper_one/two analogues, :721-722)
    centers = []
    for site, off, _r in arm.pad_spheres:
        par = tree.site_parent[site]
        spos, squat = sp.transform_compose(
            kin.pos[par], kin.quat[par],
            tree.site_pos[site], tree.site_quat[site])
        centers.append(spos + sp.quat_rotate(squat,
                                             jnp.asarray(off, jnp.float32)))
    avg_pad = jnp.mean(jnp.stack(centers), axis=0)

    ee_pos, _, _, _ = ee_state(tree, arm, kin)
    wrist = int(tree.parent[tree.site_parent[arm.ee_site]])
    wrist_pos = kin.pos[wrist]
    p1 = ee_pos - (ee_pos - wrist_pos) * 0.5            # :726
    d = (avg_pad + (ee_pos - wrist_pos) * 0.2) - p1     # :727 (t=1 at end)

    ident = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    tmin = jnp.full((), _BIG, jnp.float32)
    for o in range(cfg.num_objects):
        t, _ = _ray_box(p1, d, state.obj_pos[o], state.obj_quat[o],
                        scene.block_half)
        tmin = jnp.minimum(tmin, t)
    if scene.has_articulated:
        K = scene.art_boxes_pos.shape[1]
        for k in range(4):
            apos, aquat = art_box_pose(scene, k, state.art_q)
            for j in range(K):
                c = apos + sp.quat_rotate(aquat, scene.art_boxes_pos[k, j])
                t, _ = _ray_box(p1, d, c, aquat, scene.art_boxes_half[k, j])
                # zero-size padding boxes can degenerate to t_near==t_far
                t = jnp.where(jnp.all(scene.art_boxes_half[k, j] > 0.0),
                              t, _BIG)
                tmin = jnp.minimum(tmin, t)
    for s in range(scene.static_pos.shape[0]):
        t, _ = _ray_box(p1, d, scene.static_pos[s], ident,
                        scene.static_half[s])
        tmin = jnp.minimum(tmin, t)
    tmin = jnp.minimum(tmin, _ray_plane_z(p1, d, scene.plane_z))
    return (tmin <= 1.0).astype(jnp.float32)


def arm_obs(cfg: EnvConfig, tree: KineTree, arm: ArmConfig, scene: Scene,
            state: EnvState, kin: dyn.LinkKin) -> ArmObs:
    pos, quat, vel, ang_vel = ee_state(tree, arm, kin)
    grip = (state.q[arm.gripper_state_dof]
            * arm.gripper_state_scale)[None]
    return ArmObs(pos=pos, orn=quat, pos_vel=vel, orn_vel=ang_vel,
                  gripper=grip,
                  joints=_bullet_joint_vector(tree, arm, state.q),
                  proprioception=_proprioception(cfg, arm, tree, kin, state,
                                                 scene))


def environment_scalars(state: EnvState):
    """[drawer_y, door, button, dial∈0-1] (environments.py:781-791)."""
    return jnp.stack([
        state.art_q[0], state.art_q[1], state.art_q[2],
        dial_to_0_1_range(state.art_q[3]),
    ])


def _flip_quats(vec, last, pairs):
    """Sign-continuity filter (environments.py:868-894), one index pair at a
    time; `pairs` uses the reference's hard-coded indices."""
    for lo, hi in pairs:
        q = vec[lo:hi]
        lq = last[lo:hi]
        flip = jnp.all(jnp.sign(q) == -jnp.sign(lq))
        vec = vec.at[lo:hi].set(jnp.where(flip, -q, q))
    return vec


def achieved_goal(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                  state: EnvState) -> jnp.ndarray:
    """Achieved goal only — the light path for MPC rollout scoring.

    Identical layouts to `calc_obs`'s 'achieved_goal' (environments.py:
    816-835) minus the sign-continuity filter (irrelevant for distance
    costs, which normalize quats before comparing)."""
    if cfg.play:
        ag_parts = []
        for o in range(cfg.num_objects):
            ag_parts += [state.obj_pos[o], state.obj_quat[o]]
        ag_parts.append(environment_scalars(state))
        return jnp.concatenate(ag_parts)
    if cfg.num_objects > 0:
        ag_parts = []
        for o in range(cfg.num_objects):
            ag_parts.append(state.obj_pos[o])
            if cfg.use_orientation:
                ag_parts.append(state.obj_quat[o])
        return jnp.concatenate(ag_parts)
    kin = dyn.fk_vel(tree, state.q, state.qd)
    pos, _, _, _ = ee_state(tree, arm, kin)
    return pos


def calc_obs(cfg: EnvConfig, tree: KineTree, arm: ArmConfig, scene: Scene,
             state: EnvState) -> Dict[str, jnp.ndarray]:
    """Full observation dict; also returns the updated continuity buffers
    under '_prev_obs'/'_prev_ag' for the caller to thread into EnvState."""
    kin = dyn.fk_vel(tree, state.q, state.qd)
    a = arm_obs(cfg, tree, arm, scene, state, kin)

    parts = [a.pos]
    if cfg.return_velocity:
        parts.append(a.pos_vel)
    if cfg.use_orientation:
        parts.append(a.orn)
    parts.append(a.gripper)

    if cfg.num_objects > 0:
        for o in range(cfg.num_objects):
            parts.append(state.obj_pos[o])
            if cfg.use_orientation:
                parts.append(state.obj_quat[o])
            if cfg.return_velocity:
                parts.append(state.obj_vel[o])
    if cfg.play:
        parts.append(environment_scalars(state))
    state_vec = jnp.concatenate(parts)

    # achieved goal
    if cfg.play:
        ag_parts = []
        for o in range(cfg.num_objects):
            ag_parts += [state.obj_pos[o], state.obj_quat[o]]
        ag_parts.append(environment_scalars(state))
        ag = jnp.concatenate(ag_parts)
    elif cfg.num_objects > 0:
        ag_parts = []
        for o in range(cfg.num_objects):
            ag_parts.append(state.obj_pos[o])
            if cfg.use_orientation:
                ag_parts.append(state.obj_quat[o])
        ag = jnp.concatenate(ag_parts)
    else:
        ag = a.pos

    # quaternion sign continuity — play only, reference index pairs
    if cfg.play:
        obs_pairs = [(3, 7), (11, 15)]
        ag_pairs = [(3, 7)]
        if cfg.num_objects == 2:
            obs_pairs.append((19, 23))
            ag_pairs.append((10, 14))
        state_vec_f = _flip_quats(state_vec, state.prev_obs, obs_pairs)
        ag_f = _flip_quats(ag, state.prev_ag, ag_pairs)
        state_vec = jnp.where(state.has_prev, state_vec_f, state_vec)
        ag = jnp.where(state.has_prev, ag_f, ag)

    if cfg.use_orientation:
        fps = jnp.concatenate([a.pos, a.orn, a.gripper, ag]) \
            if cfg.num_objects > 0 else jnp.concatenate([a.pos, a.gripper])
    else:
        fps = jnp.concatenate([a.pos, a.gripper, ag]) \
            if cfg.num_objects > 0 else jnp.concatenate([a.pos, a.gripper])

    # 'observation': unconditional quat→Euler re-encode of dims 3:7
    euler = sp.quat_to_euler(sp.quat_normalize(state_vec[3:7]))
    observation = jnp.concatenate([state_vec[0:3], euler, state_vec[7:]])

    return {
        "obs_quat": state_vec,
        "achieved_goal": ag,
        "desired_goal": state.goal,
        "controllable_achieved_goal": jnp.concatenate([a.pos, a.gripper]),
        "full_positional_state": fps,
        "joints": a.joints,
        "velocity": jnp.concatenate([a.pos_vel, a.orn_vel]),
        "observation": observation,
        "gripper_proprioception": a.proprioception,
        "_prev_obs": state_vec,
        "_prev_ag": ag,
    }
