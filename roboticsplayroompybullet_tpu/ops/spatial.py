"""Quaternion / SO(3) / SE(3) spatial algebra, pure JAX.

Conventions (matching PyBullet, the behavioral reference):
  * quaternions are xyzw (PyBullet order), unit norm.
  * Euler conversions reproduce `pybullet.getQuaternionFromEuler` /
    `getEulerFromQuaternion`: extrinsic XYZ (roll about x, pitch about y,
    yaw about z), i.e. R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
    (reference usage: environments.py:955-970, playRewardFunc.py:24-26)

All functions are elementwise-broadcastable over leading batch dims and
`vmap`/`jit` clean. float32 throughout — the dynamics doesn't need f64 and
TPU VPU lanes want f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

def safe_norm(x, axis=-1, keepdims=False, eps: float = 1e-12):
    """sqrt(Σx²+eps): gradient-safe at x=0 (jnp.linalg.norm's VJP is NaN
    there, which reverse-mode leaks through jnp.where/maximum masks —
    poisons iLQR linearizations)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


# ---------------------------------------------------------------------------
# quaternions (xyzw)
# ---------------------------------------------------------------------------

def quat_identity():
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_multiply(a, b):
    """Hamilton product a*b in xyzw order."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def quat_conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q, eps=1e-12):
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (frame: v_world = R(q) @ v_local)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inverse(q, v):
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis, angle):
    axis = jnp.asarray(axis, dtype=jnp.float32)
    half = jnp.asarray(angle, dtype=jnp.float32)[..., None] * 0.5
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def quat_to_matrix(q):
    """3x3 rotation matrix from xyzw quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """xyzw quaternion from rotation matrix (robust branch-free Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # four candidate solutions, pick the numerically largest pivot
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0), qw0], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1),
                    (m21 - m12) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2),
                    (m02 - m20) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3,
                    (m10 - m01) / (4 * qz3)], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(cond0[..., None], c0,
                  jnp.where(cond1[..., None], c1,
                            jnp.where(cond2[..., None], c2, c3)))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Euler (PyBullet convention: extrinsic XYZ / intrinsic ZYX, xyzw quats)
# ---------------------------------------------------------------------------

def quat_from_euler(rpy):
    """pybullet.getQuaternionFromEuler equivalent. rpy = (roll, pitch, yaw)."""
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ], axis=-1)


def quat_to_euler(q):
    """pybullet.getEulerFromQuaternion equivalent → (roll, pitch, yaw)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # roll
    sinr = 2.0 * (w * x + y * z)
    cosr = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr, cosr)
    # pitch with gimbal clamp
    # clip strictly inside ±1: arcsin's gradient is infinite at the ends
    # (gimbal lock), and reverse-mode leaks the NaN through downstream masks
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0 + 1e-7, 1.0 - 1e-7)
    pitch = jnp.arcsin(sinp)
    # yaw
    siny = 2.0 * (w * z + x * y)
    cosy = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny, cosy)
    return jnp.stack([roll, pitch, yaw], axis=-1)


# ---------------------------------------------------------------------------
# SE(3) rigid transforms as (pos, quat) pairs
# ---------------------------------------------------------------------------

def transform_compose(pa, qa, pb, qb):
    """T_a ∘ T_b: first apply b in a's frame. Returns (pos, quat)."""
    return pa + quat_rotate(qa, pb), quat_normalize(quat_multiply(qa, qb))


def transform_point(p, q, v):
    return p + quat_rotate(q, v)


def transform_inverse(p, q):
    qi = quat_conjugate(q)
    return -quat_rotate(qi, p), qi


def quat_integrate(q, omega, dt):
    """Integrate body angular velocity (world frame) over dt.

    Exact exponential-map update — stable for large omega*dt, unlike the
    first-order qdot formula.
    """
    angle = safe_norm(omega, keepdims=True)
    axis = omega / jnp.maximum(angle, 1e-9)
    half = angle * dt * 0.5
    dq = jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)
    return quat_normalize(quat_multiply(dq, q))


# ---------------------------------------------------------------------------
# spatial (6D, Featherstone) algebra: motion/force vectors are [ang(3), lin(3)]
# ---------------------------------------------------------------------------

def skew(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def spatial_cross_motion(v, m):
    """v ×  m  (motion cross motion). v, m: [...,6] = [w, vo]."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate([
        jnp.cross(w, mw),
        jnp.cross(vo, mw) + jnp.cross(w, mv),
    ], axis=-1)


def spatial_cross_force(v, f):
    """v ×* f (motion cross force)."""
    w, vo = v[..., :3], v[..., 3:]
    fw, fv = f[..., :3], f[..., 3:]
    return jnp.concatenate([
        jnp.cross(w, fw) + jnp.cross(vo, fv),
        jnp.cross(w, fv),
    ], axis=-1)


def spatial_inertia(mass, com, inertia_com):
    """Build the 6x6 spatial inertia of a body about its link frame origin.

    mass: scalar; com: (3,) center of mass in link frame;
    inertia_com: (3,3) rotational inertia about the COM in link frame axes.
    Layout matches the [ang, lin] motion-vector convention:
        I = [[ I_o ,  m c× ],
             [ m c×ᵀ, m 1  ]]   with I_o = I_com − m c× c×
    """
    c = skew(com)
    i_o = inertia_com - mass * (c @ c)
    top = jnp.concatenate([i_o, mass * c], axis=-1)
    bot = jnp.concatenate([mass * c.T if c.ndim == 2 else jnp.swapaxes(mass * c, -1, -2),
                           mass * jnp.eye(3, dtype=c.dtype)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
