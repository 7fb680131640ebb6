"""Penalty (compliant) contact kernels: spheres, boxes, half-spaces.

TPU-native replacement for Bullet's sequential-impulse LCP contact solver
(the reference's entire contact behavior lives inside `stepSimulation`,
environments.py:489-490). Every pair is evaluated DENSELY with smooth masks —
no broadphase, no data-dependent branching — so the whole contact stage
`vmap`s over thousands of env instances and fuses into the surrounding
dynamics computation.

Force law per contact point:
    fn = max(kn·depth − cn·vn, 0) · (depth > 0)
    ft = −μ·fn · vt / (|vt| + ε)          (regularized Coulomb)

The compliant model will not reproduce Bullet's impulses exactly; fidelity is
validated on *executed control sequences + EE/object error* per the
BASELINE.md criterion, with stiffnesses tuned per articulated element.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from . import spatial as sp


class ContactParams(NamedTuple):
    kn: float = 2200.0      # normal stiffness [N/m]
    cn: float = 35.0        # normal damping [N·s/m]
    mu: float = 0.8         # default friction (overridden per pair)
    eps_v: float = 0.01     # friction regularization velocity [m/s]


DEFAULT_PARAMS = ContactParams()


class ContactSet(NamedTuple):
    """Batch of candidate contact points (row-per-candidate, masked).

    point: (C,3) world contact point, normal: (C,3) world unit normal
    pointing from body B into body A (force on A is +normal), depth: (C,)
    penetration (<=0 → inactive).
    """
    point: jnp.ndarray
    normal: jnp.ndarray
    depth: jnp.ndarray


def contact_force(cs: ContactSet, v_rel: jnp.ndarray, mu, params=DEFAULT_PARAMS):
    """Force on body A at each contact point. v_rel = v_A − v_B at point."""
    active = (cs.depth > 0.0).astype(cs.depth.dtype)
    vn = jnp.sum(v_rel * cs.normal, axis=-1)
    fn = jnp.maximum(params.kn * cs.depth - params.cn * vn, 0.0) * active
    vt = v_rel - vn[..., None] * cs.normal
    vt_mag = sp.safe_norm(vt)
    ft = -(mu * fn / (vt_mag + params.eps_v))[..., None] * vt
    return fn[..., None] * cs.normal + ft


def capped_force(cs: ContactSet, v_rel: jnp.ndarray, mu, k_point,
                 dt: float, params=DEFAULT_PARAMS, beta: float = 0.2,
                 slop: float = 5e-4, relax: float = 0.5,
                 f_hold: float = 10.0):
    """Penalty force with an effective-mass impulse cap (the stability fix).

    Pure penalty spring-dampers are explicitly unstable on corner contacts
    of small bodies at 300 Hz (c·dt·K > 2 for the rotational effective mass
    1/K). The normal force is therefore clamped by the impulse that would
    bring the relative normal velocity to the Baumgarte push-out target —
    behaviorally one velocity-level PGS row (what Bullet's solver does), but
    computed densely in parallel, which is what the TPU wants.

    k_point: per-contact inverse effective mass K = Σ 1/m + (r×n)ᵀI⁻¹(r×n)
    over the non-kinematic bodies of the pair. `relax` under-relaxes the cap
    (Jacobi-style) so several simultaneous points on one body don't jointly
    overshoot. `f_hold` is a constant force allowance above the velocity cap
    so static/resting loads (gravity, grasp squeeze) are carried by the
    spring term rather than fighting the cap.
    """
    active = (cs.depth > 0.0).astype(cs.depth.dtype)
    vn = jnp.sum(v_rel * cs.normal, axis=-1)
    fn_pen = jnp.maximum(params.kn * cs.depth - params.cn * vn, 0.0)
    v_target = beta * jnp.maximum(cs.depth - slop, 0.0) / dt
    # the constant holding allowance is RAMPED OFF as the contact recedes
    # faster than the push-out target (v_ramp window) — a receding pair gets
    # no force, so the stiff spring cannot pump energy, while quasi-static
    # squeezes (grasps, resting) can still carry motor-scale loads.
    v_ramp = 0.05
    gate = jnp.clip(1.0 - (vn - v_target) / v_ramp, 0.0, 1.0)
    f_cap = relax * jnp.maximum(v_target - vn, 0.0) \
        / (jnp.maximum(k_point, 1e-6) * dt) + f_hold * gate
    fn = jnp.clip(fn_pen, 0.0, f_cap) * active
    vt = v_rel - vn[..., None] * cs.normal
    vt_mag = sp.safe_norm(vt)
    ft = -(mu * fn / (vt_mag + params.eps_v))[..., None] * vt
    return fn[..., None] * cs.normal + ft


def inv_effective_mass(points, normals, body_pos, body_quat, mass,
                       inertia_diag):
    """K(r,n) = 1/m + (r×n)ᵀ I_world⁻¹ (r×n) for a free rigid body."""
    r = points - body_pos
    u = jnp.cross(r, normals)
    R = sp.quat_to_matrix(body_quat)
    u_body = jnp.einsum("ij,...j->...i", R.T, u)
    return 1.0 / mass + jnp.sum(u_body * u_body / inertia_diag, axis=-1)


def wrench_about(point_force: jnp.ndarray, point: jnp.ndarray,
                 origin: jnp.ndarray):
    """Sum point forces into a world wrench [torque, force] about `origin`."""
    torque = jnp.sum(jnp.cross(point - origin, point_force), axis=-2)
    force = jnp.sum(point_force, axis=-2)
    return jnp.concatenate([torque, force], axis=-1)


# ---------------------------------------------------------------------------
# geometry: penetration queries (all return ContactSet rows)
# ---------------------------------------------------------------------------

def sphere_halfspace(center, radius, plane_z):
    """Sphere vs z=plane_z floor."""
    radius = jnp.asarray(radius, center.dtype)
    depth = radius - (center[..., 2] - plane_z)
    normal = jnp.zeros_like(center).at[..., 2].set(1.0)
    point = center - normal * radius[..., None]
    return ContactSet(point, normal, depth)


def sphere_aabox(center, radius, box_pos, box_half):
    """Sphere vs axis-aligned box (static scene geometry).

    Handles the exterior case (closest-point) and interior case (min-axis
    pushout) branch-free.
    """
    d = center - box_pos
    clamped = jnp.clip(d, -box_half, box_half)
    outside_vec = d - clamped
    dist = sp.safe_norm(outside_vec)
    # exterior normal
    n_out = outside_vec / jnp.maximum(dist, 1e-9)[..., None]
    # interior: push out along the axis with least remaining distance
    gap = box_half - jnp.abs(d)                      # (...,3) >= 0 when inside
    ax = jnp.argmin(gap, axis=-1)
    n_in = jnp.zeros_like(d)
    one_hot = jnp.eye(3, dtype=d.dtype)[ax]
    n_in = one_hot * jnp.sign(jnp.take_along_axis(d, ax[..., None], -1))
    radius = jnp.asarray(radius, center.dtype)
    # safe_norm floors at sqrt(eps)=1e-6, so the inside test must sit
    # ABOVE that floor or fully-interior centers get ZERO normals (and the
    # impulse solver silently no-ops: a pad sunk into the playroom button
    # pressed nothing). 1e-5 m of exterior distance is sub-contact-scale.
    inside = dist < 1e-5
    normal = jnp.where(inside[..., None], n_in, n_out)
    depth = jnp.where(inside, radius + jnp.min(gap, axis=-1), radius - dist)
    point = center - normal * radius[..., None]
    return ContactSet(point, normal, depth)


def sphere_obox(center, radius, box_pos, box_quat, box_half):
    """Sphere vs oriented box (movable blocks, door panel, drawer walls)."""
    local = sp.quat_rotate_inverse(box_quat, center - box_pos)
    cs = sphere_aabox(local, radius, jnp.zeros_like(local), box_half)
    return ContactSet(
        point=box_pos + sp.quat_rotate(box_quat, cs.point),
        normal=sp.quat_rotate(box_quat, cs.normal),
        depth=cs.depth,
    )


# numpy, NOT jnp: closed-over DEVICE constants put the whole process on a
# ~25 ms/call slow dispatch path under the axon TPU runtime (measured; see
# core.build_model's host-constant conversion for the same rule).
_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)], dtype=np.float32)  # (8,3)


def box_corners(pos, quat, half):
    """World positions of the 8 corners of an oriented box. (...,8,3)."""
    local = _CORNERS * half[..., None, :]
    return pos[..., None, :] + sp.quat_rotate(quat[..., None, :], local)


def points_halfspace(points, plane_z):
    """Point set vs floor plane."""
    depth = plane_z - points[..., 2]
    normal = jnp.zeros_like(points).at[..., 2].set(1.0)
    return ContactSet(points, normal, depth)


def points_aabox(points, box_pos, box_half):
    """Point set vs axis-aligned box: depth = interior min-axis pushout.

    Vertex-vs-box approximation of box/box contact: adequate for small
    blocks against large static panels (table, cabinet, cage, tray).
    """
    d = points - box_pos
    gap = box_half - jnp.abs(d)                      # (...,3)
    depth = jnp.min(gap, axis=-1)                    # >0 → inside
    ax = jnp.argmin(gap, axis=-1)
    one_hot = jnp.eye(3, dtype=points.dtype)[ax]
    sgn = jnp.sign(jnp.take_along_axis(d, ax[..., None], -1))
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    normal = one_hot * sgn
    return ContactSet(points, normal, depth)


def points_aabox_ref(points, ref, box_pos, box_half):
    """Point set vs axis-aligned box, contact face chosen from `ref` (the
    owning body's center): pushout is monotone in penetration depth, so a
    body pressed hard into a thin slab can't cross the mid-plane and have
    its normal flip (the tunneling failure of per-point min-axis pushout).
    Falls back to per-point min-axis when the ref itself is inside the box.
    """
    d_ref = ref - box_pos
    ratio = jnp.abs(d_ref) / jnp.maximum(box_half, 1e-6)
    ax = jnp.argmax(ratio, axis=-1)
    one_hot = jnp.eye(3, dtype=points.dtype)[ax]
    sgn = jnp.sign(jnp.sum(one_hot * d_ref, axis=-1, keepdims=True))
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    normal = one_hot * sgn                                  # (...,3)
    # depth along the chosen face for each point
    dp = points - box_pos
    depth_face = jnp.sum(box_half * jnp.abs(normal), axis=-1) \
        - jnp.sum(dp * normal, axis=-1)
    # only while the point is within the box's other extents
    inside_other = jnp.all(
        jnp.abs(dp) * (1.0 - jnp.abs(normal)) <=
        box_half * (1.0 - jnp.abs(normal)) + 1e-6, axis=-1)
    ref_inside = jnp.all(ratio < 1.0, axis=-1)
    fallback = points_aabox(points, box_pos, box_half)
    depth = jnp.where(inside_other, depth_face, -1.0)
    depth = jnp.where(ref_inside, fallback.depth, depth)
    normal = jnp.where(ref_inside[..., None], fallback.normal, normal)
    point_b = jnp.broadcast_to(points, depth.shape + (3,))
    return ContactSet(point_b, jnp.broadcast_to(normal, depth.shape + (3,)),
                      depth)


def points_obox_ref(points, ref, box_pos, box_quat, box_half):
    """Oriented-box version of points_aabox_ref."""
    local_p = sp.quat_rotate_inverse(box_quat, points - box_pos)
    local_r = sp.quat_rotate_inverse(box_quat, ref - box_pos)
    cs = points_aabox_ref(local_p, local_r, jnp.zeros(3, points.dtype),
                          box_half)
    return ContactSet(point=points,
                      normal=sp.quat_rotate(box_quat, cs.normal),
                      depth=cs.depth)


def points_obox(points, box_pos, box_quat, box_half):
    """Point set vs oriented box."""
    local = sp.quat_rotate_inverse(box_quat[..., None, :],
                                   points - box_pos[..., None, :])
    cs = points_aabox(local, jnp.zeros(3, points.dtype), box_half)
    return ContactSet(
        point=points,
        normal=sp.quat_rotate(box_quat[..., None, :], cs.normal),
        depth=cs.depth,
    )


def point_velocity(lin_vel, ang_vel, body_pos, point):
    """Velocity of a material point on a rigid body."""
    return lin_vel + jnp.cross(ang_vel, point - body_pos)
