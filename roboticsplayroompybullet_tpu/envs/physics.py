"""The 300 Hz physics substep: geometry → impulse solve → ABA → integrate.

Replaces the reference hot loop (12 × `stepSimulation`, environments.py:
485-490). One substep is a pure function over EnvState; the 12-substep
control interval is a `lax.scan`. Everything is branch-free and `vmap`s over
the env batch dimension.

Pipeline per substep:
  1. arm FK + velocities; gripper pad-sphere kinematics
  2. free-update the dynamic scene bodies (gravity, scene motors, damping)
  3. dense contact geometry (blocks/art vs pads/statics/floor/each other)
  4. velocity-level Jacobi impulse solve (envs/contact_solver.py) — the
     Bullet-PGS analogue, parallel over contacts
  5. integrate block/articulated states; clamp articulation limits
  6. arm: Featherstone ABA with contact-reaction wrenches + bullet-style
     position-servo impulses (environments.py:1027-1029), semi-implicit
     Euler, joint-limit projection

Contact graph (play scene):
  gripper pad spheres × {blocks, articulated boxes, statics, floor}
  block corners × {floor, statics, articulated boxes, other block}
Articulated objects (drawer/door/button/dial) are 1-DoF effective-mass
bodies (scenes.py:117-426); the button's restoring motor reproduces
scenes.py:238.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.kinetree import KineTree
from ..models.arms import ArmConfig
from ..models.playroom import Scene
from ..ops import spatial as sp
from ..ops import dynamics as dyn
from ..ops import contact as ct
from .state import EnvState
from .config import EnvConfig
from . import contact_solver as solver

# pads-vs-world penalty (arm side only; the arm is servo-dominated)
PAD_WORLD_PARAMS = ct.ContactParams(kn=4000.0, cn=10.0, mu=0.6, eps_v=0.01)


def pad_sphere_kinematics(tree: KineTree, arm: ArmConfig, kin: dyn.LinkKin):
    """World centers/velocities/radii of the gripper contact spheres.

    Spheres are attached to SITES (finger/pad frames); the owning reduced
    link is the site's parent, which also supplies rigid-body velocity.
    """
    centers, vels, radii, dofs = [], [], [], []
    for site, off, r in arm.pad_spheres:
        par = tree.site_parent[site]
        spos, squat = sp.transform_compose(
            kin.pos[par], kin.quat[par],
            tree.site_pos[site], tree.site_quat[site])
        c = spos + sp.quat_rotate(squat, jnp.asarray(off, jnp.float32))
        v = kin.lin_vel[par] + jnp.cross(kin.ang_vel[par], c - kin.pos[par])
        centers.append(c)
        vels.append(v)
        radii.append(r)
        dofs.append(par)
    return (jnp.stack(centers), jnp.stack(vels),
            jnp.asarray(radii, dtype=jnp.float32), tuple(dofs))


def art_box_pose(scene: Scene, k: int, art_q):
    """World (pos, quat) of articulated object k's frame at joint value q_k."""
    anchor = scene.art_anchor[k]
    axis = scene.art_axis[k]
    if scene.art_is_revolute[k]:
        quat = sp.quat_from_axis_angle(axis, art_q[k])
        pos = anchor
    else:
        quat = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)
        pos = anchor + axis * art_q[k]
    return pos, quat


def pad_point_jacobians(tree: KineTree, arm: ArmConfig, kin: dyn.LinkKin,
                        pads_c) -> jnp.ndarray:
    """(P, 3, n_arm) world point Jacobians of the pad centers w.r.t. the
    ARM joints (gripper drivers excluded — they stay separate solver
    participants via grip_u). Ancestor masks are host-static."""
    n_arm = arm.n_arm
    cols_all = []
    for p, (site, _, _) in enumerate(arm.pad_spheres):
        par = tree.site_parent[site]
        anc = set()
        i = par
        while i >= 0:
            anc.add(i)
            i = tree.parent[i]
        cols = []
        for j in range(n_arm):
            if j not in anc:
                cols.append(jnp.zeros(3, jnp.float32))
                continue
            a_w = sp.quat_rotate(kin.quat[j],
                                 jnp.asarray(tree.axis[j], jnp.float32))
            if tree.jtype[j] == 0:          # revolute
                cols.append(jnp.cross(a_w, pads_c[p] - kin.pos[j]))
            else:                           # prismatic
                cols.append(a_w)
        cols_all.append(jnp.stack(cols, axis=-1))      # (3, n_arm)
    return jnp.stack(cols_all)                         # (P, 3, n_arm)


class Geometry(NamedTuple):
    rows: solver.ContactRows
    pads_c: jnp.ndarray
    pads_v: jnp.ndarray
    pad_dofs: tuple
    grip_slots: tuple       # gripper slot per pad
    grip_dofs: tuple        # reduced dof per gripper slot
    kin: dyn.LinkKin
    pad_J: jnp.ndarray      # (P,3,n_arm) pad point Jacobians (arm joints)


def gather_contacts(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                    scene: Scene, state: EnvState,
                    kin: dyn.LinkKin, qd_arm) -> Geometry:
    """Assemble the dense, statically-shaped contact row set.

    `kin` must carry POST-SERVO velocities (fk_vel(q, qd_arm)) so the solver
    sees the pads' commanded closing motion. Pad rows exclude the gripper-
    driver DoF velocity from v_kin — that DoF is a dynamic participant in
    the impulse solve (see contact_solver.py).
    """
    n_obj = cfg.num_objects
    pads_c, pads_v, pads_r, pad_dofs = pad_sphere_kinematics(tree, arm, kin)
    n_pads = pads_c.shape[0]
    # gripper slots: one per distinct pad-owner (prismatic driver) dof
    grip_dofs = tuple(dict.fromkeys(pad_dofs))
    grip_slots = tuple(grip_dofs.index(d) for d in pad_dofs)
    # prismatic driver world axes and pad v_kin minus driver contribution
    u_g = [sp.quat_rotate(kin.quat[d], tree.axis[d]) for d in grip_dofs]
    pads_v_nog = jnp.stack([
        pads_v[p] - u_g[grip_slots[p]] * qd_arm[pad_dofs[p]]
        for p in range(n_pads)])
    n_static = scene.static_pos.shape[0]
    nK = scene.art_boxes_pos.shape[1] if scene.has_articulated else 0

    pts, nrm, dep, vkin, mus = [], [], [], [], []
    blk_a, blk_b, art_i, pad_i, padj_i = [], [], [], [], []

    def add(cs, v_kin, mu, a=-1, b=-1, k=-1, pad=-1, padj=-1, valid=None):
        # `pad` here carries the GRIPPER SLOT for pad rows; `padj` the pad
        # INDEX for arm-coupled pad-vs-world rows (contact_solver rows.pad)
        n = cs.depth.reshape(-1).shape[0]
        pts.append(cs.point.reshape(-1, 3))
        nrm.append(cs.normal.reshape(-1, 3))
        d = cs.depth.reshape(-1)
        if valid is not None:
            d = jnp.where(valid, d, -1.0)
        dep.append(d)
        vkin.append(jnp.broadcast_to(v_kin, cs.point.shape).reshape(-1, 3))
        mus.append(jnp.broadcast_to(jnp.asarray(mu, jnp.float32),
                                    d.shape).reshape(-1))
        blk_a.append(np.full(n, a, np.int32))
        blk_b.append(np.full(n, b, np.int32))
        art_i.append(np.full(n, k, np.int32))
        pad_i.append(np.full(n, pad, np.int32))
        padj_i.append(np.full(n, padj, np.int32))

    mu_world = scene.block_fric * 0.5   # bullet combines μ multiplicatively
    mu_pad = scene.block_fric           # pads μ≈1 (panda.urdf:259-287)

    # padded (zero-half) art-box slots are skipped STATICALLY — scene
    # constants are host numpy, so this prunes rows at trace time
    def real_boxes(k):
        return [b for b in range(nK)
                if float(np.sum(scene.art_boxes_half[k, b])) > 0.0]

    def deepest(cs: ct.ContactSet, axis: int) -> ct.ContactSet:
        """Manifold reduction: keep only the deepest candidate along `axis`
        (per corner / per pad). A point rarely penetrates two boxes of one
        family at once; dropping the shallower rows cuts the row count ~7x
        with matching trajectories (test_physics_reduction) and is what
        Bullet's persistent-manifold capping does, structurally."""
        j = jnp.argmax(cs.depth, axis=axis, keepdims=True)
        take = lambda a: jnp.take_along_axis(a, j[..., None], axis=axis
                                             ).squeeze(axis)
        return ct.ContactSet(take(cs.point), take(cs.normal),
                             jnp.take_along_axis(cs.depth, j, axis=axis
                                                 ).squeeze(axis))

    for o in range(n_obj):
        corners = ct.box_corners(state.obj_pos[o], state.obj_quat[o],
                                 scene.block_half)
        # floor
        add(ct.points_halfspace(corners, scene.plane_z),
            jnp.zeros(3), mu_world, a=o)
        # statics: deepest static per corner (face chosen from block center)
        if n_static > 0:
            cs = ct.points_aabox_ref(corners[:, None, :], state.obj_pos[o],
                                     scene.static_pos[None],
                                     scene.static_half[None])
            add(deepest(cs, 1), jnp.zeros(3), mu_world, a=o)
        # articulated boxes: deepest box per corner per articulated object
        if scene.has_articulated:
            for k in range(4):
                bs = real_boxes(k)
                if not bs:
                    continue
                bpos, bquat = art_box_pose(scene, k, state.art_q)
                sets = []
                for b in bs:
                    center = bpos + sp.quat_rotate(bquat,
                                                   scene.art_boxes_pos[k, b])
                    sets.append(ct.points_obox_ref(
                        corners, state.obj_pos[o], center, bquat,
                        scene.art_boxes_half[k, b]))
                cs = ct.ContactSet(
                    jnp.stack([s.point for s in sets], 1),
                    jnp.stack([s.normal for s in sets], 1),
                    jnp.stack([s.depth for s in sets], 1))
                add(deepest(cs, 1), jnp.zeros(3), 0.5 * scene.block_fric,
                    a=o, k=k)
        # pads (normal flipped: sphere_obox points INTO the pad; rows want
        # it INTO the block = side A)
        for p in range(n_pads):
            cs = ct.sphere_obox(pads_c[p], pads_r[p], state.obj_pos[o],
                                state.obj_quat[o], scene.block_half)
            cs = ct.ContactSet(cs.point[None], -cs.normal[None],
                               cs.depth[None])
            add(cs, pads_v_nog[p], mu_pad, a=o, pad=grip_slots[p])

    # block-block (2-object play)
    if n_obj == 2:
        corners = ct.box_corners(state.obj_pos[0], state.obj_quat[0],
                                 scene.block_half)
        add(ct.points_obox_ref(corners, state.obj_pos[0], state.obj_pos[1],
                               state.obj_quat[1], scene.block_half),
            jnp.zeros(3), scene.block_fric, a=0, b=1)

    # pads vs articulated boxes: deepest box per pad per articulated object
    if scene.has_articulated:
        for k in range(4):
            bs = real_boxes(k)
            if not bs:
                continue
            bpos, bquat = art_box_pose(scene, k, state.art_q)
            for p in range(n_pads):
                sets = []
                for b in bs:
                    center = bpos + sp.quat_rotate(bquat,
                                                   scene.art_boxes_pos[k, b])
                    cs = ct.sphere_obox(pads_c[p], pads_r[p], center, bquat,
                                        scene.art_boxes_half[k, b])
                    sets.append(ct.ContactSet(cs.point[None], -cs.normal[None],
                                              cs.depth[None]))
                cs = ct.ContactSet(
                    jnp.stack([s.point for s in sets], 1),
                    jnp.stack([s.normal for s in sets], 1),
                    jnp.stack([s.depth for s in sets], 1))
                # padj: arm-coupled, so a finger on a LIMIT-BLOCKED element
                # (fully pressed button) is resisted through the arm chain
                add(deepest(cs, 1), pads_v_nog[p], 0.6, k=k,
                    pad=grip_slots[p], padj=p)

    # pads vs WORLD (floor + deepest static), arm-coupled: these rows let
    # contact stop the servo-driven arm (fingers rest ON the table/cabinet
    # instead of penalty-springing through; Bullet solves arm+world jointly)
    for p in range(n_pads):
        cs = ct.sphere_halfspace(pads_c[p][None], pads_r[p], scene.plane_z)
        cs = ct.ContactSet(cs.point, -cs.normal, cs.depth)
        add(cs, pads_v_nog[p], 0.6, pad=grip_slots[p], padj=p)
        if n_static > 0:
            cs = ct.sphere_aabox(pads_c[p][None], pads_r[p],
                                 scene.static_pos, scene.static_half)
            cs = ct.ContactSet(cs.point[None], -cs.normal[None],
                               cs.depth[None])
            add(deepest(cs, 1), pads_v_nog[p], 0.6,
                pad=grip_slots[p], padj=p)

    if not pts:
        # reach envs with no statics: one inert row
        add(ct.ContactSet(jnp.zeros((1, 3)),
                          jnp.zeros((1, 3)).at[:, 2].set(1.0),
                          -jnp.ones(1)),
            jnp.zeros(3), 0.5)

    pad_J = pad_point_jacobians(tree, arm, kin, pads_c)
    rows = solver.ContactRows(
        point=jnp.concatenate(pts), normal=jnp.concatenate(nrm),
        depth=jnp.concatenate(dep), v_kin=jnp.concatenate(vkin),
        mu=jnp.concatenate(mus),
        blk_a=jnp.asarray(np.concatenate(blk_a)),
        blk_b=jnp.asarray(np.concatenate(blk_b)),
        art=jnp.asarray(np.concatenate(art_i)),
        grip=jnp.asarray(np.concatenate(pad_i)),
        pad=jnp.asarray(np.concatenate(padj_i)),
    )
    return Geometry(rows, pads_c, pads_v, pad_dofs, grip_slots, grip_dofs,
                    kin, pad_J)


def gripper_targets(arm: ArmConfig, tree: KineTree, q, grip_cmd, dt):
    """Per-gripper-dof (target, force) rows from the 0-1 grip command.

    Mirrors close_gripper (environments.py:1037-1073). Returns full-dof
    target/force arrays (zero force on non-gripper dofs).
    """
    n = tree.n_dof
    target = jnp.zeros(n, jnp.float32)
    force = jnp.zeros(n, jnp.float32)
    if arm.name == "Panda":
        amount = grip_cmd
    else:
        amount = grip_cmd - 0.2   # environments.py:1050
    for dof, scale, offset, fmax in arm.gripper_dofs:
        target = target.at[dof].set(scale * amount + offset)
        force = force.at[dof].set(fmax)
    fdof, ldof, ffollow = arm.grip_follower
    if fdof >= 0:
        target = target.at[fdof].set(q[ldof])
        force = force.at[fdof].set(ffollow)
    return target, force


def physics_substep(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                    scene: Scene, state: EnvState, lam0=None,
                    solve_iters: int = None):
    """One 300 Hz substep. Returns (state', lam): `lam` is the solver's
    final contact impulses — pass back as `lam0` next substep to warm-start
    (run_simulation does; see contact_solver.solve). With warm starting,
    8 Jacobi iterations match the old cold 16 on persistent contacts."""
    dt = cfg.dt
    n_arm = arm.n_arm
    n_obj = cfg.num_objects
    g = jnp.array([0.0, 0.0, -9.8], jnp.float32)

    # ---- arm first: ABA + servos ----------------------------------------
    # pads-vs-world contact lives in arm-coupled IMPULSE rows in the solve
    # below (gather_contacts pad-vs-world block) — penalty forces could not
    # resist the 240 N servo (fingers pushed through the table); impulses
    # with the arm chain as a solver participant can.
    kin = dyn.fk_vel(tree, state.q, state.qd)

    aba = dyn.aba(tree, state.q, state.qd, jnp.zeros(tree.n_dof))
    qd_free = state.qd + dt * aba.qdd
    g_target, g_force = gripper_targets(arm, tree, state.q, state.grip, dt)
    target = g_target.at[:n_arm].set(state.ctrl_q)
    force = g_force.at[:n_arm].set(arm.servo_force)
    if cfg.fixed_gripper:
        force = force.at[n_arm:].set(0.0)
    qd_arm = dyn.servo_velocity_impulse(state.q, qd_free, aba.D, target,
                                        force, dt)

    # ---- free-update the dynamic scene bodies ---------------------------
    obj_vel = state.obj_vel + dt * g
    obj_angvel = state.obj_angvel

    m_eff = scene.art_mass
    g_axis = scene.art_axis @ g
    rev_mask = jnp.asarray(scene.art_is_revolute)
    art_qd = state.art_qd + dt * jnp.where(rev_mask, 0.0, g_axis)
    # joint damping (implicit, unconditionally stable)
    art_qd = art_qd / (1.0 + dt * scene.art_damping / m_eff)
    # restoring motors (button, scenes.py:238): bullet velocity-level row
    v_star = 0.1 * (scene.art_motor_target - state.art_q) / dt
    imp = jnp.clip(m_eff * (v_star - art_qd),
                   -scene.art_motor_force * dt, scene.art_motor_force * dt)
    art_qd = art_qd + jnp.where(scene.art_motor_force > 0,
                                imp / m_eff, 0.0)

    # ---- impulse solve (post-servo arm velocities; gripper DoFs dynamic) -
    kin2 = dyn.fk_vel(tree, state.q, qd_arm)
    geo = gather_contacts(cfg, tree, arm, scene, state, kin2, qd_arm)

    h = scene.block_half
    block_I = scene.block_mass / 3.0 * jnp.array(
        [h[1] ** 2 + h[2] ** 2, h[0] ** 2 + h[2] ** 2, h[0] ** 2 + h[1] ** 2])
    n_slots = state.obj_pos.shape[0]
    R = sp.quat_to_matrix(state.obj_quat)                   # (n,3,3)
    inv_I_world = jnp.einsum("nij,j,nkj->nik", R, 1.0 / block_I, R)
    inv_m = jnp.full((n_slots,), 1.0 / scene.block_mass, jnp.float32)

    grip_u = jnp.stack([sp.quat_rotate(kin2.quat[d], tree.axis[d])
                        for d in geo.grip_dofs])
    inv_m_grip = jnp.stack([1.0 / jnp.maximum(aba.D[d], 1e-4)
                            for d in geo.grip_dofs])
    grip_qd = jnp.stack([qd_arm[d] for d in geo.grip_dofs])

    inv_D_arm = 1.0 / jnp.maximum(aba.D[:n_arm], 1e-4)
    eps_lim = 1e-4
    res = solver.solve(
        geo.rows, state.obj_pos, obj_vel, obj_angvel,
        inv_m, inv_I_world,
        scene.art_anchor, scene.art_axis, rev_mask, 1.0 / m_eff, art_qd,
        grip_u, inv_m_grip, grip_qd, dt,
        pad_J=geo.pad_J, inv_D_arm=inv_D_arm,
        art_at_lower=state.art_q <= jnp.asarray(scene.art_lower) + eps_lim,
        art_at_upper=state.art_q >= jnp.asarray(scene.art_upper) - eps_lim,
        lam0=lam0,
        **({} if solve_iters is None else {"iters": solve_iters}))
    art_qd = res.art_qd

    # write solved gripper-driver velocities back into the arm, and apply
    # the arm-coupled contact correction (pad-vs-world rows)
    for slot, d in enumerate(geo.grip_dofs):
        qd_arm = qd_arm.at[d].set(res.grip_qd[slot])
    qd_arm = qd_arm.at[:n_arm].add(res.arm_dqd)

    # ---- integrate -------------------------------------------------------
    q_new = state.q + dt * qd_arm
    q_new, qd_new = dyn.joint_limit_clamp(tree, q_new, qd_arm)

    if n_obj > 0:
        obj_vel, obj_angvel = res.obj_vel, res.obj_angvel
        obj_pos = state.obj_pos + dt * obj_vel
        obj_quat = sp.quat_integrate(state.obj_quat, obj_angvel, dt)
    else:
        obj_pos, obj_quat = state.obj_pos, state.obj_quat
        obj_vel, obj_angvel = state.obj_vel, state.obj_angvel

    art_q = state.art_q + dt * art_qd
    art_q_c = jnp.clip(art_q, scene.art_lower, scene.art_upper)
    art_qd = jnp.where(art_q != art_q_c, 0.0, art_qd)
    art_q = art_q_c

    state = state.replace(q=q_new, qd=qd_new, obj_pos=obj_pos,
                          obj_quat=obj_quat, obj_vel=obj_vel,
                          obj_angvel=obj_angvel, art_q=art_q, art_qd=art_qd)
    return state, res.lam


def contact_row_count(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                      scene: Scene, state: EnvState) -> int:
    """Static contact row count C for this env (trace-only, no FLOPs)."""
    def rows_of(st):
        kin = dyn.fk_vel(tree, st.q, st.qd)
        return gather_contacts(cfg, tree, arm, scene, st, kin, st.qd
                               ).rows.depth
    return jax.eval_shape(rows_of, state).shape[-1]


def run_simulation(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                   scene: Scene, state: EnvState,
                   n_substeps: int = None,
                   solve_iters: int = None) -> EnvState:
    """12 substeps per control tick (environments.py:485-490).

    Contact impulses warm-start across the substeps (zeros on the first —
    the carry stays uniform so the scan body compiles once); they are NOT
    carried across control steps, keeping EnvState / checkpoints layout-
    stable."""
    n = n_substeps if n_substeps is not None else cfg.substeps
    C = contact_row_count(cfg, tree, arm, scene, state)
    lam = (jnp.zeros(C, jnp.float32),) * 3

    def body(carry, _):
        s, l = carry
        s, l = physics_substep(cfg, tree, arm, scene, s, lam0=l,
                               solve_iters=solve_iters)
        return (s, l), None

    (state, _), _ = jax.lax.scan(body, (state, lam), None, length=n)
    return state
