"""Articulated-body forward dynamics (Featherstone ABA) + servo actuation.

This is the TPU-native replacement for Bullet's C++ multibody stepper
(reference hot loop: environments.py:485-490, 12 × stepSimulation at 300 Hz).
Design notes:

  * The tree structure is static and tiny (9-12 DoFs), so all three ABA
    sweeps are UNROLLED Python loops over 6-vector/6x6 ops — XLA sees pure
    straight-line code. The batch dimension (thousands of env instances)
    comes from `vmap` outside and lands on the vector lanes; per-step math
    is elementwise + (B,6,6)@(B,6) contractions that XLA maps to MXU/VPU.
  * No data-dependent control flow anywhere: joint types are static,
    clamps are `jnp.clip`, contact is penalty-based (ops/contact.py).
  * Actuation mirrors PyBullet's POSITION_CONTROL motor constraint
    (environments.py:1027-1029, force=240): a velocity-level servo solved
    impulsively against the articulated diagonal inertia D_i that the ABA
    backward sweep already produces — the same quantity Bullet's LCP row
    uses — with the impulse clamped to ±force·dt.

Spatial vectors are [angular(3); linear(3)], body coordinates, Featherstone
conventions.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.kinetree import KineTree, REVOLUTE
from . import spatial as sp


class LinkKin(NamedTuple):
    """World-frame link kinematics from the outward sweep."""
    pos: jnp.ndarray      # (n,3) link frame origins
    quat: jnp.ndarray     # (n,4) link frame orientations
    lin_vel: jnp.ndarray  # (n,3) velocity of link origin (world)
    ang_vel: jnp.ndarray  # (n,3) angular velocity (world)


def fk_vel(tree: KineTree, q: jnp.ndarray, qd: jnp.ndarray) -> LinkKin:
    """FK with velocities — feeds the contact module (point velocities)."""
    pos, quat, lv, av = [], [], [], []
    for i in range(tree.n_dof):
        p = tree.parent[i]
        if p < 0:
            pp, pq = tree.base_pos, tree.base_quat
            plv = jnp.zeros(3, q.dtype)
            pav = jnp.zeros(3, q.dtype)
        else:
            pp, pq, plv, pav = pos[p], quat[p], lv[p], av[p]
        jp, jq = sp.transform_compose(pp, pq, tree.pre_pos[i], tree.pre_quat[i])
        if tree.jtype[i] == REVOLUTE:
            dq = sp.quat_from_axis_angle(tree.axis[i], q[i])
            jq = sp.quat_normalize(sp.quat_multiply(jq, dq))
        else:
            jp = jp + sp.quat_rotate(jq, tree.axis[i] * q[i])
        # rigid propagation of parent velocity to this origin
        vlin = plv + jnp.cross(pav, jp - pp)
        vang = pav
        a_w = sp.quat_rotate(jq, tree.axis[i])
        if tree.jtype[i] == REVOLUTE:
            vang = vang + a_w * qd[i]
        else:
            vlin = vlin + a_w * qd[i]
        pos.append(jp); quat.append(jq); lv.append(vlin); av.append(vang)
    return LinkKin(jnp.stack(pos), jnp.stack(quat), jnp.stack(lv), jnp.stack(av))


def _joint_transform(tree: KineTree, i: int, qi):
    """(E, p): child-frame basis E = R_pcᵀ and child origin p in parent frame."""
    if tree.jtype[i] == REVOLUTE:
        jq = sp.quat_multiply(tree.pre_quat[i],
                              sp.quat_from_axis_angle(tree.axis[i], qi))
        p = tree.pre_pos[i]
    else:
        jq = tree.pre_quat[i]
        p = tree.pre_pos[i] + sp.quat_rotate(jq, tree.axis[i] * qi)
    E = sp.quat_to_matrix(sp.quat_conjugate(jq))
    return E, p


def _motion_X(E, p):
    """6x6 spatial motion transform parent→child: [[E,0],[−E p×, E]]."""
    z = jnp.zeros_like(E)
    top = jnp.concatenate([E, z], axis=-1)
    bot = jnp.concatenate([-E @ sp.skew(p), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class ABAResult(NamedTuple):
    qdd: jnp.ndarray     # (n,) joint accelerations
    D: jnp.ndarray       # (n,) articulated diagonal inertia per joint
    kin: LinkKin         # world link kinematics (reused by contact/obs)


def aba(tree: KineTree, q: jnp.ndarray, qd: jnp.ndarray, tau: jnp.ndarray,
        f_ext_world: Optional[jnp.ndarray] = None,
        gravity: float = -9.8) -> ABAResult:
    """Featherstone articulated-body algorithm.

    f_ext_world: (n,6) world-frame wrench [torque, force] applied at each
    link's frame origin (from penalty contacts), or None.
    """
    n = tree.n_dof
    dtype = q.dtype
    kin = fk_vel(tree, q, qd)

    # --- outward: velocities, bias terms (body coordinates) ---
    X = [None] * n          # motion transform parent->i
    S = [None] * n          # joint motion subspace in i coords
    v = [None] * n
    c = [None] * n
    IA = [None] * n
    pA = [None] * n
    for i in range(n):
        E, p = _joint_transform(tree, i, q[i])
        Xi = _motion_X(E, p)
        if tree.jtype[i] == REVOLUTE:
            Si = jnp.concatenate([tree.axis[i], jnp.zeros(3, dtype)])
        else:
            Si = jnp.concatenate([jnp.zeros(3, dtype), tree.axis[i]])
        par = tree.parent[i]
        vp = v[par] if par >= 0 else jnp.zeros(6, dtype)
        vi = Xi @ vp + Si * qd[i]
        ci = sp.spatial_cross_motion(vi, Si * qd[i])
        Ii = sp.spatial_inertia(tree.mass[i], tree.com[i], tree.inertia[i])
        pi = sp.spatial_cross_force(vi, Ii @ vi)
        if f_ext_world is not None:
            # rotate world wrench (about link origin) into body coords
            Rwi = sp.quat_to_matrix(kin.quat[i])   # body->world
            n_b = Rwi.T @ f_ext_world[i, :3]
            f_b = Rwi.T @ f_ext_world[i, 3:]
            pi = pi - jnp.concatenate([n_b, f_b])
        X[i], S[i], v[i], c[i], IA[i], pA[i] = Xi, Si, vi, ci, Ii, pi

    # --- inward: articulated inertia ---
    U = [None] * n
    D = [None] * n
    u = [None] * n
    tau_eff = tau - tree.damping * qd
    for i in range(n - 1, -1, -1):
        Ui = IA[i] @ S[i]
        Di = S[i] @ Ui + 1e-9
        ui = tau_eff[i] - S[i] @ pA[i]
        U[i], D[i], u[i] = Ui, Di, ui
        par = tree.parent[i]
        if par >= 0:
            Ia = IA[i] - jnp.outer(Ui, Ui) / Di
            pa = pA[i] + Ia @ c[i] + Ui * (ui / Di)
            IA[par] = IA[par] + X[i].T @ Ia @ X[i]
            pA[par] = pA[par] + X[i].T @ pa

    # --- outward: accelerations ---
    g_base = sp.quat_rotate_inverse(tree.base_quat,
                                    jnp.array([0.0, 0.0, -gravity], dtype))
    a_base = jnp.concatenate([jnp.zeros(3, dtype), g_base])
    a = [None] * n
    qdd = [None] * n
    for i in range(n):
        par = tree.parent[i]
        ap = a[par] if par >= 0 else a_base
        ai = X[i] @ ap + c[i]
        qdd_i = (u[i] - U[i] @ ai) / D[i]
        a[i] = ai + S[i] * qdd_i
        qdd[i] = qdd_i

    return ABAResult(jnp.stack(qdd), jnp.stack(D), kin)


def servo_velocity_impulse(q, qd_free, D, target_q, max_force, dt,
                           position_gain: float = 0.1,
                           motor_mask=None):
    """PyBullet POSITION_CONTROL motor row, solved per joint.

    Bullet's motor constraint drives the joint velocity toward
    v* = kp·(q* − q)/dt with the impulse clamped to ±maxForce·dt, resisted
    by the articulated inertia D_i. (Default kp = 0.1 → the characteristic
    ~dt/kp first-order tracking lag the reference trajectories exhibit.)
    """
    v_star = position_gain * (target_q - q) / dt
    imp = D * (v_star - qd_free)
    imp = jnp.clip(imp, -max_force * dt, max_force * dt)
    if motor_mask is not None:
        imp = imp * motor_mask
    return qd_free + imp / jnp.maximum(D, 1e-9)


def joint_limit_clamp(tree: KineTree, q, qd):
    """Hard joint-limit projection (position clamp + velocity zeroing).

    Bullet enforces multibody joint limits as unilateral constraints; the
    penalty-free projection is adequate at 300 Hz for servoed joints.
    """
    ql = jnp.clip(q, tree.lower, tree.upper)
    hit_low = q < tree.lower
    hit_high = q > tree.upper
    qd = jnp.where(hit_low, jnp.maximum(qd, 0.0),
                   jnp.where(hit_high, jnp.minimum(qd, 0.0), qd))
    return ql, qd
