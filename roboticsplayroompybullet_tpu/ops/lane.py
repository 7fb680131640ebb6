"""Lane-layout math: vectors/quaternions with the COMPONENT axis leading
and the environment batch trailing as (..., S, L) vector lanes.

Why this exists: the vmap path puts the batch axis first, so every
3/4/6-wide op leaves XLA materializing tiny-minor-dim intermediates in HBM
— the measured cost of one 12-substep play step is ~20.6 GB of HBM traffic
for 0.28 GFLOP (envs/physics.py path, B=1024). The fused kernel
(ops/fused_step.py) instead keeps ALL intermediates in VMEM with each
per-env scalar shaped (8, 128) — one full VPU tile per elementary op —
and components unrolled as a leading axis.

A "v3" is an array (3, ...lanes...); a "quat" is (4, ...) in xyzw order
(PyBullet convention, matching ops/spatial.py); a "mat33" is (3, 3, ...).
Constants may be numpy arrays/floats — they broadcast and fold at trace.
Everything here is plain jnp, so the same code runs inside a Pallas kernel
or as a regular traced function (the correctness-test path).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def v3(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(x, y, z))


def dot(a, b):
    return jnp.sum(a * b, axis=0)


def cross(a, b):
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


def norm(a, eps=1e-12):
    return jnp.sqrt(dot(a, a) + eps)


def normalize(a, eps=1e-12):
    return a / norm(a, eps)[None]


def quat_multiply(a, b):
    ax, ay, az, aw = a[0], a[1], a[2], a[3]
    bx, by, bz, bw = b[0], b[1], b[2], b[3]
    return jnp.stack([aw * bx + ax * bw + ay * bz - az * by,
                      aw * by - ax * bz + ay * bw + az * bx,
                      aw * bz + ax * by - ay * bx + az * bw,
                      aw * bw - ax * bx - ay * by - az * bz])


def quat_conjugate(q):
    return jnp.stack([-q[0], -q[1], -q[2], q[3]])


def quat_normalize(q, eps=1e-12):
    return q / jnp.sqrt(jnp.sum(q * q, axis=0) + eps)[None]


def quat_rotate(q, v):
    """Rotate v3 by quat: 2(u·v)u + (w²−u·u)v + 2w(u×v)."""
    u = q[:3]
    w = q[3]
    return (2.0 * dot(u, v)[None] * u
            + (w * w - dot(u, u))[None] * v
            + 2.0 * w[None] * cross(u, v))


def quat_rotate_inverse(q, v):
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis, angle):
    """axis: constant numpy (3,) or lane v3; angle: lane scalar."""
    half = 0.5 * angle
    s = jnp.sin(half)
    c = jnp.cos(half)
    ax = np.asarray(axis) if not isinstance(axis, jnp.ndarray) else axis
    return jnp.stack([ax[0] * s, ax[1] * s, ax[2] * s, c])


def quat_to_mat33(q):
    """(3,3,...) rotation matrix (body->world) from xyzw quat."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    return jnp.stack([jnp.stack([r00, r01, r02]),
                      jnp.stack([r10, r11, r12]),
                      jnp.stack([r20, r21, r22])])


def mat33_vec(M, v):
    """(3,3,...) @ v3."""
    return jnp.stack([M[0, 0] * v[0] + M[0, 1] * v[1] + M[0, 2] * v[2],
                      M[1, 0] * v[0] + M[1, 1] * v[1] + M[1, 2] * v[2],
                      M[2, 0] * v[0] + M[2, 1] * v[1] + M[2, 2] * v[2]])


def mat33_T_vec(M, v):
    return jnp.stack([M[0, 0] * v[0] + M[1, 0] * v[1] + M[2, 0] * v[2],
                      M[0, 1] * v[0] + M[1, 1] * v[1] + M[2, 1] * v[2],
                      M[0, 2] * v[0] + M[1, 2] * v[1] + M[2, 2] * v[2]])


def quat_integrate(q, omega, dt):
    """Exponential-map update, mirroring spatial.quat_integrate."""
    angle = norm(omega)
    axis = omega / jnp.maximum(angle, 1e-9)[None]
    half = angle * (dt * 0.5)
    s = jnp.sin(half)
    dq = jnp.stack([axis[0] * s, axis[1] * s, axis[2] * s, jnp.cos(half)])
    return quat_normalize(quat_multiply(dq, q))


def const_v3(x):
    """numpy (3,) constant → broadcastable (3,1,1) float32."""
    a = np.asarray(x, np.float32)
    return a.reshape(3, *([1] * 2))


def where(c, a, b):
    return jnp.where(c, a, b)


# --- 6D spatial vectors as (ang v3, lin v3) pairs --------------------------

def sv_add(a, b):
    return (a[0] + b[0], a[1] + b[1])


def sv_scale(a, s):
    return (a[0] * s[None] if hasattr(s, "shape") and s.ndim == a[0].ndim - 1
            else a[0] * s, a[1] * s[None]
            if hasattr(s, "shape") and s.ndim == a[1].ndim - 1 else a[1] * s)


def sv_dot(a, b):
    return dot(a[0], b[0]) + dot(a[1], b[1])


def sv_cross_motion(v, m):
    """[v ×] m for motion vectors: (w,u)×(a,b) = (w×a, w×b + u×a)."""
    w, u = v
    a, b = m
    return (cross(w, a), cross(w, b) + cross(u, a))


def sv_cross_force(v, f):
    """[v ×*] f for force vectors: (w,u)×*(n,g) = (w×n + u×g, w×g)."""
    w, u = v
    n, g = f
    return (cross(w, n) + cross(u, g), cross(w, g))
