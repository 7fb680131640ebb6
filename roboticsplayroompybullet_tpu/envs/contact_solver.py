"""Velocity-level Jacobi impulse solver for the dynamic scene bodies.

This is the TPU-native analogue of Bullet's sequential-impulse (PGS) contact
solver (`solverResidualThreshold=0`, environments.py:326): each substep,
normal/friction impulses are solved so post-impulse approach velocities hit
the Baumgarte push-out target. Differences from Bullet, chosen for the TPU:

  * JACOBI iterations with under-relaxation instead of Gauss-Seidel — every
    contact row updates in parallel (dense vector ops + per-body
    segment-sums); sequential depth = n_iter, not n_contacts (~300).
  * Dynamic bodies: blocks (free 6-DoF), the four articulated 1-DoF scene
    objects, and the GRIPPER DRIVER DoFs (prismatic finger/pad joints) —
    the last so a grasp squeeze stalls the closing pads against the block
    instead of sweeping through it (the grasp force-closure Bullet gets by
    solving arm and object jointly). The rest of the arm is kinematic
    within a substep (servo-dominated).
  * Zero restitution (Bullet default), box-clamped Coulomb friction.

Impulses are intrinsically bounded by velocity errors, so — unlike penalty
springs — static squeezes (grasps) transmit motor-scale forces exactly while
impacts stay dissipative.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ContactRows(NamedTuple):
    """C dense candidate contacts. Index -1 = side absent.

    Sign convention: `normal` points INTO body A; impulse +λn applies to A,
    −λn to B. A = block if present else the articulated object. B = the
    other dynamic side (art when A is a block), the gripper pad (with its
    driver DoF dynamic), and/or the kinematic world.
    """
    point: jnp.ndarray     # (C,3)
    normal: jnp.ndarray    # (C,3)
    depth: jnp.ndarray     # (C,)
    v_kin: jnp.ndarray     # (C,3) kinematic-side point velocity (excludes
                           #       the gripper-DoF contribution)
    mu: jnp.ndarray        # (C,)
    blk_a: jnp.ndarray     # (C,) int32 block on side A
    blk_b: jnp.ndarray     # (C,) int32 block on side B (block-block rows)
    art: jnp.ndarray       # (C,) int32 articulated object (side B when a
                           #       block is present, else side A)
    grip: jnp.ndarray      # (C,) int32 gripper slot on side B (pad rows)
    pad: jnp.ndarray       # (C,) int32 pad index for ARM-COUPLED rows
                           #       (pad-vs-world): the row's impulse also
                           #       corrects the arm-joint velocities
                           #       through the pad's point Jacobian, so a
                           #       servo-driven finger STOPS at the table
                           #       instead of penalty-springing through it
                           #       (Bullet gets this by solving arm+world
                           #       jointly; motors cap the push-back)


class SolveResult(NamedTuple):
    obj_vel: jnp.ndarray      # (n_obj,3)
    obj_angvel: jnp.ndarray   # (n_obj,3)
    art_qd: jnp.ndarray       # (4,)
    grip_qd: jnp.ndarray      # (G,) post-impulse gripper-driver velocities
    arm_dqd: jnp.ndarray      # (n_arm,) arm-joint velocity correction from
                              #       arm-coupled rows (zeros when absent)
    lam: tuple                # ((C,),)*3 final (normal, t1, t2) impulses —
                              #       feed back as `lam0` next substep to
                              #       warm-start (Bullet's persistent-
                              #       manifold warm start, which is how its
                              #       PGS converges in few iterations)


def _tangent_basis(n):
    """Two unit tangents orthogonal to n, branch-free."""
    a = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                  jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape))
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, axis=-1, keepdims=True) + 1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


def solve(rows: ContactRows,
          obj_pos, obj_vel, obj_angvel,
          inv_m_blk, inv_I_world,           # (n_obj,), (n_obj,3,3)
          art_anchor, art_axis, art_revolute_mask, inv_m_art, art_qd,
          grip_u, inv_m_grip, grip_qd,      # (G,3), (G,), (G,)
          dt: float,
          pad_J=None, inv_D_arm=None,       # (P,3,n_arm), (n_arm,)
          art_at_lower=None, art_at_upper=None,   # (4,) bool
          iters: int = 8, relax: float = 1.0,
          beta: float = 0.2, slop: float = 5e-4,
          v_push_max: float = 0.05,
          lam0=None):
    """Returns SolveResult. All velocity inputs are post-free-update
    (gravity, scene motors, arm servo already applied). pad_J/inv_D_arm
    enable arm-coupled rows (rows.pad >= 0): the pad's world point
    Jacobian over the arm joints and the ABA diagonal inverse inertia.
    art_at_lower/upper make art contact LIMIT-AWARE: an impulse that
    would push a bottomed-out joint further into its stop sees zero art
    mobility, so the OTHER side (e.g. a finger on the fully-pressed
    button) is resisted instead of sinking through.

    lam0: previous-substep impulses ((C,),)*3 for WARM STARTING: the row
    set is dense and statically ordered, so row r is the same candidate
    pair every substep. Warm rows are re-masked by the current active set,
    friction re-capped to the Coulomb cone, applied to the free
    velocities, and the iteration continues from there — persistent
    contacts then need about half the cold iteration count for the same
    residual (the same trick as Bullet's btPersistentManifold warm start).
    """
    C = rows.depth.shape[0]
    n_obj = obj_pos.shape[0]
    G = grip_u.shape[0]
    f32 = rows.normal.dtype
    n_arm = inv_D_arm.shape[0] if inv_D_arm is not None else 0
    arm_coupled = pad_J is not None
    # host (numpy) constants arrive here but get gathered with traced row
    # indices — lift to traced literals (cheap: embedded in the executable)
    art_anchor = jnp.asarray(art_anchor)
    art_axis = jnp.asarray(art_axis)
    art_revolute_mask = jnp.asarray(art_revolute_mask)
    inv_m_art = jnp.asarray(inv_m_art)

    active = rows.depth > 0.0
    # Baumgarte push-out, CLAMPED: unbounded beta·depth/dt injects momentum
    # at deep penetrations (slamming light gripper joints open → chatter);
    # Bullet sidesteps this with split impulse, we clamp instead.
    v_target = jnp.minimum(
        beta * jnp.maximum(rows.depth - slop, 0.0) / dt, v_push_max)

    has_a = rows.blk_a >= 0
    has_b = rows.blk_b >= 0
    has_art = rows.art >= 0
    has_grip = rows.grip >= 0
    has_pad = (rows.pad >= 0) if arm_coupled else jnp.zeros(C, bool)
    a_idx = jnp.maximum(rows.blk_a, 0)
    b_idx = jnp.maximum(rows.blk_b, 0)
    k_idx = jnp.maximum(rows.art, 0)
    g_idx = jnp.maximum(rows.grip, 0)
    if arm_coupled:
        p_idx = jnp.maximum(rows.pad, 0)
        J_rows = jnp.asarray(pad_J)[p_idx]            # (C,3,n_arm)
        inv_D_arm = jnp.asarray(inv_D_arm)

    r_a = rows.point - obj_pos[a_idx]
    r_b = rows.point - obj_pos[b_idx]

    # articulated unit-velocity at point (per unit qd)
    u_art = jnp.where(
        art_revolute_mask[k_idx][:, None],
        jnp.cross(art_axis[k_idx], rows.point - art_anchor[k_idx]),
        art_axis[k_idx])
    # art is side B when a block is on side A, else side A
    art_sign = jnp.where(has_a, -1.0, 1.0)
    if art_at_lower is None:
        art_at_lower = jnp.zeros(4, bool)
        art_at_upper = jnp.zeros(4, bool)
    at_low_r = jnp.asarray(art_at_lower)[k_idx]
    at_high_r = jnp.asarray(art_at_upper)[k_idx]

    def art_mobile(j_dir):
        """Per-row art mobility along generalized direction j_dir: zero
        when the joint sits at a limit and j_dir pushes further in."""
        blocked = (at_low_r & (j_dir < 0.0)) | (at_high_r & (j_dir > 0.0))
        return jnp.where(blocked, 0.0, 1.0)
    u_g = grip_u[g_idx]                               # (C,3), side B

    # MASS SPLITTING: Jacobi diverges when several rows share a body and
    # each applies its full correction (effective overshoot = row count).
    # Scaling each body's inverse mass by its active-row count makes the
    # parallel iteration contractive (classic projected-Jacobi splitting).
    af = active.astype(f32)
    cnt_blk = (jax.ops.segment_sum(af * has_a, a_idx, n_obj)
               + jax.ops.segment_sum(af * has_b, b_idx, n_obj))
    cnt_art = jax.ops.segment_sum(af * has_art, k_idx, 4)
    cnt_grip = jax.ops.segment_sum(af * has_grip, g_idx, G)
    split_a = jnp.maximum(cnt_blk[a_idx], 1.0)
    split_b = jnp.maximum(cnt_blk[b_idx], 1.0)
    split_k = jnp.maximum(cnt_art[k_idx], 1.0)
    split_g = jnp.maximum(cnt_grip[g_idx], 1.0)
    # all arm-coupled rows share ONE body (the arm chain)
    split_arm = jnp.maximum(jnp.sum(af * has_pad), 1.0)

    def k_dir(d):
        """Split inverse effective mass along direction d (C,3)."""
        k = jnp.zeros(C, f32)
        ua = jnp.cross(r_a, d)
        k += jnp.where(has_a, (inv_m_blk[a_idx]
                               + jnp.einsum("ci,cij,cj->c", ua,
                                            inv_I_world[a_idx], ua))
                       * split_a, 0.0)
        ub = jnp.cross(r_b, d)
        k += jnp.where(has_b, (inv_m_blk[b_idx]
                               + jnp.einsum("ci,cij,cj->c", ub,
                                            inv_I_world[b_idx], ub))
                       * split_b, 0.0)
        ja = jnp.sum(u_art * d, axis=-1)
        mob = art_mobile(ja * art_sign)
        k += jnp.where(has_art,
                       ja * ja * inv_m_art[k_idx] * split_k * mob, 0.0)
        jg = jnp.sum(u_g * d, axis=-1)
        k += jnp.where(has_grip, jg * jg * inv_m_grip[g_idx] * split_g, 0.0)
        if arm_coupled:
            jd = jnp.einsum("ci,cij->cj", d, J_rows)          # (C,n_arm)
            k += jnp.where(has_pad,
                           (jd * jd) @ inv_D_arm * split_arm, 0.0)
        return jnp.maximum(k, 1e-8)

    t1, t2 = _tangent_basis(rows.normal)
    k_n = k_dir(rows.normal)
    k_t1 = k_dir(t1)
    k_t2 = k_dir(t2)

    def rel_vel(ov, ow, aqd, gqd, adqd):
        v_a = jnp.where(has_a[:, None],
                        ov[a_idx] + jnp.cross(ow[a_idx], r_a), 0.0)
        v_b = jnp.where(has_b[:, None],
                        ov[b_idx] + jnp.cross(ow[b_idx], r_b), 0.0)
        v_art = jnp.where(has_art[:, None], u_art * aqd[k_idx][:, None], 0.0)
        v_grip = jnp.where(has_grip[:, None], u_g * gqd[g_idx][:, None], 0.0)
        vB = v_b + jnp.where((has_art & has_a)[:, None], v_art, 0.0) \
            + v_grip + rows.v_kin
        if arm_coupled:
            # dynamic arm correction on the pad side (baseline arm motion
            # is already in v_kin; adqd starts at 0)
            vB = vB + jnp.where(has_pad[:, None],
                                jnp.einsum("cij,j->ci", J_rows, adqd), 0.0)
        vA = jnp.where(has_a[:, None], v_a,
                       jnp.where(has_art[:, None], v_art, 0.0))
        return vA - vB

    def apply_impulses(ov, ow, aqd, gqd, adqd, imp):
        """imp: (C,3) world impulse on side A (−imp on side B)."""
        impA = jnp.where(has_a[:, None], imp, 0.0)
        dv = impA * inv_m_blk[a_idx][:, None]
        dw = jnp.einsum("cij,cj->ci", inv_I_world[a_idx],
                        jnp.cross(r_a, impA))
        ov = ov + jax.ops.segment_sum(dv, a_idx, n_obj)
        ow = ow + jax.ops.segment_sum(dw, a_idx, n_obj)
        impB = -jnp.where(has_b[:, None], imp, 0.0)
        dvb = impB * inv_m_blk[b_idx][:, None]
        dwb = jnp.einsum("cij,cj->ci", inv_I_world[b_idx],
                         jnp.cross(r_b, impB))
        ov = ov + jax.ops.segment_sum(dvb, b_idx, n_obj)
        ow = ow + jax.ops.segment_sum(dwb, b_idx, n_obj)
        # articulated: generalized impulse = sign · (u·imp) / m_eff
        # (zeroed when it would push a bottomed-out joint past its stop)
        j_imp = jnp.sum(u_art * imp, axis=-1) * art_sign
        dqd = jnp.where(has_art,
                        j_imp * inv_m_art[k_idx] * art_mobile(j_imp), 0.0)
        aqd = aqd + jax.ops.segment_sum(dqd, k_idx, 4)
        # gripper driver (always side B)
        jg_imp = -jnp.sum(u_g * imp, axis=-1)
        dgqd = jnp.where(has_grip, jg_imp * inv_m_grip[g_idx], 0.0)
        gqd = gqd + jax.ops.segment_sum(dgqd, g_idx, G)
        if arm_coupled:
            # arm chain (side B): generalized impulse J^T(−imp) · D⁻¹
            # (einsum over rows; single shared body, no segmenting needed)
            j_arm = jnp.einsum("ci,cij->cj", imp, J_rows)      # (C,n_arm)
            adqd = adqd - (jnp.where(has_pad[:, None], j_arm, 0.0)
                           .sum(axis=0)) * inv_D_arm
        return ov, ow, aqd, gqd, adqd

    def gear_project(gqd):
        """Equality coupling qd_0 == qd_1 between the two gripper drivers —
        the role of the Panda finger gear constraint (environments.py:
        400-405) and the Robotiq mimic linkage: keeps the squeeze symmetric
        so a pinched body doesn't drift with motor-force asymmetry."""
        if G != 2:
            return gqd
        w0, w1 = inv_m_grip[0], inv_m_grip[1]
        err = gqd[0] - gqd[1]
        p = err / (w0 + w1)
        return gqd.at[0].add(-p * w0).at[1].add(p * w1)

    def body(carry, _):
        ov, ow, aqd, gqd, adqd, lam_n, lam_t1, lam_t2 = carry
        v_rel = rel_vel(ov, ow, aqd, gqd, adqd)
        vn = jnp.sum(v_rel * rows.normal, axis=-1)
        dln = relax * (v_target - vn) / k_n
        new_ln = jnp.maximum(lam_n + dln, 0.0) * active
        dln = new_ln - lam_n
        vt1 = jnp.sum(v_rel * t1, axis=-1)
        vt2 = jnp.sum(v_rel * t2, axis=-1)
        dlt1 = relax * (-vt1) / k_t1
        dlt2 = relax * (-vt2) / k_t2
        cap = rows.mu * new_ln
        new_lt1 = jnp.clip(lam_t1 + dlt1, -cap, cap) * active
        new_lt2 = jnp.clip(lam_t2 + dlt2, -cap, cap) * active
        imp = (dln[:, None] * rows.normal
               + (new_lt1 - lam_t1)[:, None] * t1
               + (new_lt2 - lam_t2)[:, None] * t2)
        ov, ow, aqd, gqd, adqd = apply_impulses(ov, ow, aqd, gqd, adqd, imp)
        gqd = gear_project(gqd)
        return (ov, ow, aqd, gqd, adqd, new_ln, new_lt1, new_lt2), None

    zeros = jnp.zeros(C, f32)
    adqd0 = jnp.zeros(max(n_arm, 1), f32)
    ov0, ow0, aqd0, gqd0 = obj_vel, obj_angvel, art_qd, grip_qd
    if lam0 is None:
        ln0 = lt10 = lt20 = zeros
    else:
        # warm start: re-mask by the current active set, re-cap friction
        # to the cone, apply the whole warm impulse to the free velocities
        ln0 = jnp.maximum(lam0[0], 0.0) * active
        cap0 = rows.mu * ln0
        lt10 = jnp.clip(lam0[1], -cap0, cap0) * active
        lt20 = jnp.clip(lam0[2], -cap0, cap0) * active
        imp0 = (ln0[:, None] * rows.normal
                + lt10[:, None] * t1 + lt20[:, None] * t2)
        ov0, ow0, aqd0, gqd0, adqd0 = apply_impulses(
            ov0, ow0, aqd0, gqd0, adqd0, imp0)
        gqd0 = gear_project(gqd0)
    (ov, ow, aqd, gqd, adqd, ln_f, lt1_f, lt2_f), _ = jax.lax.scan(
        body, (ov0, ow0, aqd0, gqd0, adqd0, ln0, lt10, lt20),
        None, length=iters)
    return SolveResult(ov, ow, aqd, gqd, adqd, (ln_f, lt1_f, lt2_f))
