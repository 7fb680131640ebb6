"""Fused lane-layout physics: the whole 300 Hz substep pipeline as one
VMEM-resident program.

WHY: the vmap path materializes every tiny intermediate to HBM — measured
20.6 GB of traffic for one 12-substep play control step at B=1024 (0.28
GFLOP of real work). Here the entire pipeline — FK, pad kinematics,
pad-world penalties, ABA, servos, contact gather (reduced manifolds),
Jacobi impulse solve, integration — is ONE program over lane-shaped
arrays: every per-env scalar is an (8, 128) tile (1024 envs), components
ride leading axes, and contact families keep a leading row axis. Wrapped
in a Pallas kernel (`make_pallas_sim`), all intermediates live in VMEM;
HBM sees state-in + state-out only (~2 KB/env per control step).

The same function body runs un-kerneled as plain jnp — that path is the
correctness oracle (tests compare it to envs/physics.py's vmap pipeline,
which itself is validated against analytic dynamics and the reference's
behavior).

Exact behavioral mirror of envs/physics.py::physics_substep +
envs/contact_solver.py::solve on the reduced contact manifolds, with one
deliberate difference: family 'deepest' selection uses a first-max mask
(Mosaic-friendly) instead of argmax+gather — identical result, different
tie-breaking order (ties are measure-zero).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import lane as ln
from ..models.kinetree import KineTree, REVOLUTE
from ..models.arms import ArmConfig
from ..models.playroom import Scene
from ..envs.config import EnvConfig
from ..envs.state import EnvState

f32 = np.float32

# pads-vs-world penalty constants (envs/physics.py PAD_WORLD_PARAMS)
PAD_KN, PAD_CN, PAD_EPSV = 4000.0, 10.0, 0.01

_CORNER_SIGNS = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)], dtype=f32)                     # (8,3)


def _np_spatial_inertia(mass, com, inertia_com):
    """numpy mirror of spatial.spatial_inertia (constant per link)."""
    c = np.array([[0, -com[2], com[1]],
                  [com[2], 0, -com[0]],
                  [-com[1], com[0], 0]], dtype=np.float64)
    i_o = np.asarray(inertia_com, np.float64) - mass * (c @ c)
    top = np.concatenate([i_o, mass * c], axis=1)
    bot = np.concatenate([mass * c.T, mass * np.eye(3)], axis=1)
    return np.concatenate([top, bot], axis=0).astype(f32)   # (6,6)


# ---------------------------------------------------------------------------
# small 6-D helpers on python lists of lane scalars (zero-skipping)
# ---------------------------------------------------------------------------

def cvec(arr, like):
    """numpy constant → lane-shaped constant built from SCALAR literals.

    Pallas kernels cannot capture array constants (they must be inputs);
    scalar literals are fine. `like` is any traced lane scalar; result has
    shape np.shape(arr) + like.shape. Mosaic folds the splats."""
    a = np.asarray(arr, np.float32)
    z = jnp.zeros_like(like)
    rows = [z + float(v) for v in a.ravel()]
    out = jnp.stack(rows) if len(rows) > 1 else rows[0][None]
    return out.reshape(a.shape + like.shape)


def _is0(x):
    return isinstance(x, float) and x == 0.0


def _mul(a, b):
    if _is0(a) or _is0(b):
        return 0.0
    return a * b


def _acc(a, b):
    if _is0(a):
        return b
    if _is0(b):
        return a
    return a + b


def m6v(M, v):
    """6x6 (list of lists) @ 6-vec (list)."""
    return [sum6(_mul(M[i][j], v[j]) for j in range(6)) for i in range(6)]


def sum6(terms):
    out = 0.0
    for t in terms:
        out = _acc(out, t)
    return out


def m6T_v(M, v):
    return [sum6(_mul(M[j][i], v[j]) for j in range(6)) for i in range(6)]


def m6_m6(A, B):
    return [[sum6(_mul(A[i][k], B[k][j]) for k in range(6))
             for j in range(6)] for i in range(6)]


def m6T_m6(A, B):
    return [[sum6(_mul(A[k][i], B[k][j]) for k in range(6))
             for j in range(6)] for i in range(6)]


def m6_add(A, B):
    return [[_acc(A[i][j], B[i][j]) for j in range(6)] for i in range(6)]


def v6_dot(a, b):
    return sum6(_mul(a[i], b[i]) for i in range(6))


# ---------------------------------------------------------------------------
# lane FK (positions + velocities), mirrors ops/dynamics.fk_vel
# ---------------------------------------------------------------------------

class LaneKin(NamedTuple):
    pos: list       # per link (3, S, L)
    quat: list      # per link (4, S, L)
    lv: list        # per link (3, S, L)
    av: list        # per link (3, S, L)


def lane_fk_vel(tree: KineTree, q, qd) -> LaneKin:
    """q, qd: (n_dof, S, L). Mirrors dynamics.fk_vel link-by-link."""
    lane_shape = q.shape[1:]
    pos, quat, lv, av = [], [], [], []
    for i in range(tree.n_dof):
        p = tree.parent[i]
        if p < 0:
            pp = cvec(tree.base_pos, q[0])
            pq = cvec(tree.base_quat, q[0])
            plv = jnp.zeros_like(pp)
            pav = jnp.zeros_like(pp)
        else:
            pp, pq, plv, pav = pos[p], quat[p], lv[p], av[p]
        jp = pp + ln.quat_rotate(pq, cvec(tree.pre_pos[i], q[0]))
        jq = ln.quat_multiply(pq, cvec(tree.pre_quat[i], q[0]))
        a_const = np.asarray(tree.axis[i], f32)
        if tree.jtype[i] == REVOLUTE:
            dq = ln.quat_from_axis_angle(a_const, q[i])
            jq = ln.quat_normalize(ln.quat_multiply(jq, dq))
        else:
            jp = jp + ln.quat_rotate(
                jq, cvec(a_const, q[0]) * q[i][None])
        vlin = plv + ln.cross(pav, jp - pp)
        vang = pav
        a_w = ln.quat_rotate(jq, cvec(a_const, q[0]))
        if tree.jtype[i] == REVOLUTE:
            vang = vang + a_w * qd[i][None]
        else:
            vlin = vlin + a_w * qd[i][None]
        pos.append(jp)
        quat.append(jq)
        lv.append(vlin)
        av.append(vang)
    return LaneKin(pos, quat, lv, av)


def lane_pad_kinematics(tree: KineTree, arm: ArmConfig, kin: LaneKin):
    """Mirrors envs/physics.pad_sphere_kinematics."""
    centers, vels, radii, dofs = [], [], [], []
    for site, off, r in arm.pad_spheres:
        par = tree.site_parent[site]
        tpl = kin.pos[par][0]
        spos = kin.pos[par] + ln.quat_rotate(
            kin.quat[par], cvec(tree.site_pos[site], tpl))
        squat = ln.quat_multiply(kin.quat[par],
                                 cvec(tree.site_quat[site], tpl))
        c = spos + ln.quat_rotate(squat, cvec(off, tpl))
        v = kin.lv[par] + ln.cross(kin.av[par], c - kin.pos[par])
        centers.append(c)
        vels.append(v)
        radii.append(float(r))
        dofs.append(par)
    return centers, vels, radii, tuple(dofs)


# ---------------------------------------------------------------------------
# lane ABA, mirrors ops/dynamics.aba (6x6 as nested python lists)
# ---------------------------------------------------------------------------

def lane_aba(tree: KineTree, q, qd, kin: LaneKin,
             f_ext: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]],
             gravity: float = -9.8):
    """Returns (qdd (n,S,L), D (n,S,L)). f_ext: dof → (torque v3, force v3)
    world wrenches about link origins (sparse dict; mirrors f_ext_world)."""
    n = tree.n_dof
    X = [None] * n
    S6 = [None] * n
    v6 = [None] * n
    c6 = [None] * n
    IA = [None] * n
    pA = [None] * n
    def neg(x):
        return -x if not _is0(x) else 0.0

    for i in range(n):
        a_const = np.asarray(tree.axis[i], f32)
        pre_q = np.asarray(tree.pre_quat[i], f32)
        if tree.jtype[i] == REVOLUTE:
            # jq = pre_quat * axis_angle(q_i); E = R(conj(jq)); p = pre_pos
            dq = ln.quat_from_axis_angle(a_const, q[i])
            jq = ln.quat_multiply(cvec(pre_q, q[0]), dq)
            Emat = ln.quat_to_mat33(ln.quat_conjugate(jq))   # (3,3,S,L)
            E = [[Emat[r, c] for c in range(3)] for r in range(3)]
            p_const = np.asarray(tree.pre_pos[i], np.float64)
            px, py, pz = float(p_const[0]), float(p_const[1]), float(p_const[2])
        else:
            # prismatic: child orientation is CONSTANT (pre_quat); only the
            # translation depends on q — E folds to numpy floats
            x_, y_, z_, w_ = -pre_q[0], -pre_q[1], -pre_q[2], pre_q[3]
            cq = np.array([x_, y_, z_, w_], np.float64)
            E_np = np.array([
                [1 - 2 * (cq[1] ** 2 + cq[2] ** 2),
                 2 * (cq[0] * cq[1] - cq[3] * cq[2]),
                 2 * (cq[0] * cq[2] + cq[3] * cq[1])],
                [2 * (cq[0] * cq[1] + cq[3] * cq[2]),
                 1 - 2 * (cq[0] ** 2 + cq[2] ** 2),
                 2 * (cq[1] * cq[2] - cq[3] * cq[0])],
                [2 * (cq[0] * cq[2] - cq[3] * cq[1]),
                 2 * (cq[1] * cq[2] + cq[3] * cq[0]),
                 1 - 2 * (cq[0] ** 2 + cq[1] ** 2)]])
            E = [[float(E_np[r, c]) for c in range(3)] for r in range(3)]
            # p = pre_pos + R(pre_quat) axis * q_i (lane)
            Rax = _np_quat_rotate(pre_q, a_const)
            pp_c = np.asarray(tree.pre_pos[i], np.float64)
            px = float(pp_c[0]) + float(Rax[0]) * q[i]
            py = float(pp_c[1]) + float(Rax[1]) * q[i]
            pz = float(pp_c[2]) + float(Rax[2]) * q[i]

        # X = [[E, 0], [-E p~, E]]; (E @ skew(p))[r][c] with
        # skew(p) = [[0,-pz,py],[pz,0,-px],[-py,px,0]]
        Sk = [[0.0, neg(pz), py], [pz, 0.0, neg(px)], [neg(py), px, 0.0]]

        def eps(r, c):
            return sum6(_mul(E[r][k], Sk[k][c]) for k in range(3))

        Xi = [[E[0][0], E[0][1], E[0][2], 0.0, 0.0, 0.0],
              [E[1][0], E[1][1], E[1][2], 0.0, 0.0, 0.0],
              [E[2][0], E[2][1], E[2][2], 0.0, 0.0, 0.0],
              [neg(eps(0, 0)), neg(eps(0, 1)), neg(eps(0, 2)),
               E[0][0], E[0][1], E[0][2]],
              [neg(eps(1, 0)), neg(eps(1, 1)), neg(eps(1, 2)),
               E[1][0], E[1][1], E[1][2]],
              [neg(eps(2, 0)), neg(eps(2, 1)), neg(eps(2, 2)),
               E[2][0], E[2][1], E[2][2]]]

        if tree.jtype[i] == REVOLUTE:
            Si = [float(a_const[0]), float(a_const[1]), float(a_const[2]),
                  0.0, 0.0, 0.0]
        else:
            Si = [0.0, 0.0, 0.0,
                  float(a_const[0]), float(a_const[1]), float(a_const[2])]
        par = tree.parent[i]
        vp = v6[par] if par >= 0 else [0.0] * 6
        vi = m6v(Xi, vp)
        vi = [_acc(vi[j], _mul(Si[j], qd[i])) for j in range(6)]
        # c = v x (S qd)  (motion cross)
        sqd = [_mul(Si[j], qd[i]) for j in range(6)]
        w, u = vi[:3], vi[3:]
        mw, mv = sqd[:3], sqd[3:]
        cx = _cross_l(w, mw)
        cv = [_acc(a, b) for a, b in zip(_cross_l(u, mw), _cross_l(w, mv))]
        ci = cx + cv
        Ii_np = _np_spatial_inertia(float(tree.mass[i]),
                                    np.asarray(tree.com[i], np.float64),
                                    np.asarray(tree.inertia[i], np.float64))
        Ii = [[float(Ii_np[r, c]) for c in range(6)] for r in range(6)]
        Iv = m6v(Ii, vi)
        # p = v x* (I v)
        fw, fv = Iv[:3], Iv[3:]
        pn = [_acc(a, b) for a, b in zip(_cross_l(w, fw), _cross_l(u, fv))]
        pf = _cross_l(w, fv)
        pi = pn + pf
        if i in f_ext:
            trq, frc = f_ext[i]
            Rwi = ln.quat_to_mat33(kin.quat[i])              # body->world
            nb = ln.mat33_T_vec(Rwi, trq)
            fb = ln.mat33_T_vec(Rwi, frc)
            pi = [_acc(pi[0], -nb[0]), _acc(pi[1], -nb[1]),
                  _acc(pi[2], -nb[2]), _acc(pi[3], -fb[0]),
                  _acc(pi[4], -fb[1]), _acc(pi[5], -fb[2])]
        X[i], S6[i], v6[i], c6[i], IA[i], pA[i] = Xi, Si, vi, ci, Ii, pi

    U6 = [None] * n
    D = [None] * n
    u6 = [None] * n
    for i in range(n - 1, -1, -1):
        Ui = m6v(IA[i], S6[i])
        Di = _acc(v6_dot(S6[i], Ui), 1e-9)
        taui = _mul(-float(tree.damping[i]), qd[i])
        ui = _acc(taui, -v6_dot(S6[i], pA[i]))
        U6[i], D[i], u6[i] = Ui, Di, ui
        par = tree.parent[i]
        if par >= 0:
            invD = 1.0 / Di
            Ia = [[_acc(IA[i][r][c], -_mul(_mul(Ui[r], invD), Ui[c]))
                   for c in range(6)] for r in range(6)]
            Iac = m6v(Ia, c6[i])
            uD = _mul(ui, invD)
            pa = [_acc(_acc(pA[i][j], Iac[j]), _mul(Ui[j], uD))
                  for j in range(6)]
            XtIaX = m6T_m6(X[i], m6_m6(Ia, X[i]))
            IA[par] = m6_add(IA[par], XtIaX)
            Xtpa = m6T_v(X[i], pa)
            pA[par] = [_acc(pA[par][j], Xtpa[j]) for j in range(6)]

    # base gravity accel in base coords (base_quat constant)
    bq = np.asarray(tree.base_quat, np.float64)
    # rotate (0,0,-g) by conj(base_quat) — constant
    gvec = np.array([0.0, 0.0, -float(gravity)])
    x, y, z, w = -bq[0], -bq[1], -bq[2], bq[3]
    uq = np.array([x, y, z])
    g_base = (2 * np.dot(uq, gvec) * uq
              + (w * w - np.dot(uq, uq)) * gvec
              + 2 * w * np.cross(uq, gvec))
    a_base = [0.0, 0.0, 0.0, float(g_base[0]), float(g_base[1]),
              float(g_base[2])]
    a6 = [None] * n
    qdd = [None] * n
    for i in range(n):
        par = tree.parent[i]
        ap = a6[par] if par >= 0 else a_base
        Xap = m6v(X[i], ap)
        ai = [_acc(Xap[j], c6[i][j]) for j in range(6)]
        num = _acc(u6[i], -v6_dot(U6[i], ai))
        qdd_i = num / D[i]
        a6[i] = [_acc(ai[j], _mul(S6[i][j], qdd_i)) for j in range(6)]
        qdd[i] = qdd_i
    return (jnp.stack([_lane_of(qdd[i], q[0]) for i in range(n)]),
            jnp.stack([_lane_of(D[i], q[0]) for i in range(n)]))


def _np_quat_rotate(q, v):
    """numpy constant quat rotate (xyzw)."""
    q = np.asarray(q, np.float64)
    v = np.asarray(v, np.float64)
    u, w = q[:3], q[3]
    return 2 * np.dot(u, v) * u + (w * w - np.dot(u, u)) * v \
        + 2 * w * np.cross(u, v)


def _lane_of(x, template):
    """Materialize a possibly-constant scalar as a lane array."""
    if isinstance(x, float):
        return jnp.full_like(template, x)
    return x + 0.0 * template if x.shape != template.shape else x


def _cross_l(a, b):
    """Cross product on python lists of lane-or-float scalars."""
    return [_acc(_mul(a[1], b[2]), -_mul(a[2], b[1])),
            _acc(_mul(a[2], b[0]), -_mul(a[0], b[2])),
            _acc(_mul(a[0], b[1]), -_mul(a[1], b[0]))]


# ---------------------------------------------------------------------------
# lane contact primitives (component axis FIRST; mirror ops/contact.py)
# ---------------------------------------------------------------------------

def _sign(x):
    return jnp.sign(x)


def lane_sphere_aabox(c, r, box_pos, box_half):
    """c: (3, ..., lanes); box_pos/box_half: numpy broadcastable (3,...).
    Returns (point, normal, depth). Mirrors contact.sphere_aabox."""
    d = c - box_pos
    clamped = jnp.clip(d, -box_half, box_half)
    out = d - clamped
    dist = jnp.sqrt(jnp.sum(out * out, axis=0) + 1e-12)
    n_out = out / jnp.maximum(dist, 1e-9)[None]
    gap = box_half - jnp.abs(d)                      # (3, ...)
    g0, g1, g2 = gap[0], gap[1], gap[2]
    gmin = jnp.minimum(g0, jnp.minimum(g1, g2))
    a0 = g0 <= jnp.minimum(g1, g2)
    a1 = (~a0) & (g1 <= g2)
    a2 = (~a0) & (~a1)
    n_in = jnp.stack([jnp.where(a0, _sign(d[0]), 0.0),
                      jnp.where(a1, _sign(d[1]), 0.0),
                      jnp.where(a2, _sign(d[2]), 0.0)])
    inside = dist < 1e-5   # above the 1e-6 norm floor (contact.sphere_aabox)
    normal = jnp.where(inside[None], n_in, n_out)
    depth = jnp.where(inside, r + gmin, r - dist)
    point = c - normal * r
    return point, normal, depth


def lane_sphere_obox(c, r, box_pos, box_quat, box_half):
    """Oriented box; box_pos/box_quat may be lane arrays or numpy consts."""
    local = ln.quat_rotate_inverse(box_quat, c - box_pos)
    lp, nrm, dep = lane_sphere_aabox(local, r, 0.0, box_half)
    return (box_pos + ln.quat_rotate(box_quat, lp),
            ln.quat_rotate(box_quat, nrm), dep)


def lane_points_aabox(points, box_pos, box_half):
    """Mirror of contact.points_aabox (min-axis pushout at each point)."""
    d = points - box_pos
    gap = box_half - jnp.abs(d)
    g0, g1, g2 = gap[0], gap[1], gap[2]
    depth = jnp.minimum(g0, jnp.minimum(g1, g2))
    a0 = g0 <= jnp.minimum(g1, g2)
    a1 = (~a0) & (g1 <= g2)
    a2 = (~a0) & (~a1)

    def sgn_nz(x):
        s = _sign(x)
        return jnp.where(s == 0.0, 1.0, s)

    normal = jnp.stack([jnp.where(a0, sgn_nz(d[0]), 0.0),
                        jnp.where(a1, sgn_nz(d[1]), 0.0),
                        jnp.where(a2, sgn_nz(d[2]), 0.0)])
    return points, normal, depth


def lane_points_aabox_ref(points, ref, box_pos, box_half):
    """Mirror of contact.points_aabox_ref: face chosen from the owning
    body's center; fallback to per-point min-axis when ref is inside."""
    d_ref = ref - box_pos                                   # (3, ..., lanes)
    ratio = jnp.abs(d_ref) / jnp.maximum(box_half, 1e-6)
    r0, r1, r2 = ratio[0], ratio[1], ratio[2]
    b0 = r0 >= jnp.maximum(r1, r2)
    b1 = (~b0) & (r1 >= r2)
    b2 = (~b0) & (~b1)

    def sgn_nz(x):
        s = _sign(x)
        return jnp.where(s == 0.0, 1.0, s)

    normal = jnp.stack([jnp.where(b0, sgn_nz(d_ref[0]), 0.0),
                        jnp.where(b1, sgn_nz(d_ref[1]), 0.0),
                        jnp.where(b2, sgn_nz(d_ref[2]), 0.0)])
    dp = points - box_pos
    abs_n = jnp.abs(normal)
    depth_face = jnp.sum(box_half * abs_n, axis=0) \
        - jnp.sum(dp * normal, axis=0)
    inside_other = jnp.all(
        jnp.abs(dp) * (1.0 - abs_n) <= box_half * (1.0 - abs_n) + 1e-6,
        axis=0)
    ref_inside = (r0 < 1.0) & (r1 < 1.0) & (r2 < 1.0)
    fb_p, fb_n, fb_d = lane_points_aabox(points, box_pos, box_half)
    depth = jnp.where(inside_other, depth_face, -1.0)
    depth = jnp.where(ref_inside, fb_d, depth)
    normal = jnp.where(ref_inside[None], fb_n, normal)
    return points, normal, depth


def lane_points_obox_ref(points, ref, box_pos, box_quat, box_half):
    local_p = ln.quat_rotate_inverse(box_quat, points - box_pos)
    local_r = ln.quat_rotate_inverse(box_quat, ref - box_pos)
    lp, nrm, dep = lane_points_aabox_ref(local_p, local_r, 0.0, box_half)
    return (box_pos + ln.quat_rotate(box_quat, lp),
            ln.quat_rotate(box_quat, nrm), dep)


def lane_deepest(point, normal, depth, axis):
    """First-max manifold reduction along a family axis (Mosaic-friendly
    replacement for argmax+gather; same result, measure-zero tie order)."""
    dmax = jnp.max(depth, axis=axis, keepdims=True)
    m = depth == dmax
    # first-max via unrolled prefix-OR: cumsum has no Mosaic lowering, and
    # the family axis is small (≤11)
    R = depth.shape[axis]
    seen = None
    firsts = []
    for i in range(R):
        mi = jax.lax.index_in_dim(m, i, axis, keepdims=False)
        firsts.append(mi if seen is None else mi & ~seen)
        seen = mi if seen is None else seen | mi
    first = jnp.stack(firsts, axis=axis)
    w = first.astype(depth.dtype)
    pt = jnp.sum(point * w[None], axis=axis + 1)
    nm = jnp.sum(normal * w[None], axis=axis + 1)
    dp = jnp.sum(depth * w, axis=axis)
    return pt, nm, dp


# ---------------------------------------------------------------------------
# contact bundles
# ---------------------------------------------------------------------------

class Bundle(NamedTuple):
    """One contact family: R rows sharing static body assignment.
    point/normal: (3, R, S, L); depth: (R, S, L); vkin: (3, R|1, S, L) or
    None; mu: float or numpy (R,1,1); a/b/k/g: static indices (−1 absent)."""
    point: jnp.ndarray
    normal: jnp.ndarray
    depth: jnp.ndarray
    vkin: Optional[jnp.ndarray]
    mu: object
    a: int = -1
    b: int = -1
    k: int = -1
    g: int = -1
    pj: int = -1   # pad index: ARM-COUPLED pad-vs-world row (solver also
                   # corrects arm-joint velocities via the pad Jacobian)


def _real_boxes(scene: Scene, k: int):
    nK = scene.art_boxes_pos.shape[1]
    return [b for b in range(nK)
            if float(np.sum(scene.art_boxes_half[k, b])) > 0.0]


def _lane_art_pose(scene: Scene, k: int, art_q):
    """(pos v3, quat) of articulated frame k; mirrors physics.art_box_pose.
    pos/quat may be constants-broadcast lanes."""
    tpl = art_q[k]
    anchor = cvec(scene.art_anchor[k], tpl)
    axis = np.asarray(scene.art_axis[k], f32)
    if scene.art_is_revolute[k]:
        quat = ln.quat_from_axis_angle(axis, art_q[k])
        pos = anchor + 0.0 * art_q[k][None]
        return pos, quat
    pos = anchor + cvec(axis, tpl) * art_q[k][None]
    quat = cvec(np.array([0, 0, 0, 1], f32), tpl)
    return pos, quat


def gather_bundles(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                   scene: Scene, st: dict, kin2: LaneKin, qd_arm,
                   pads_c, pads_v, pads_r, pad_dofs) -> Tuple[list, dict]:
    """Reduced-manifold contact bundles; mirrors envs/physics.gather_contacts
    (post-reduction). Returns (bundles, aux) with aux carrying gripper data."""
    n_obj = cfg.num_objects
    n_pads = len(pads_c)
    grip_dofs = tuple(dict.fromkeys(pad_dofs))
    grip_slots = tuple(grip_dofs.index(d) for d in pad_dofs)
    u_g = [ln.quat_rotate(kin2.quat[d], cvec(tree.axis[d], kin2.pos[d][0]))
           for d in grip_dofs]
    pads_v_nog = [pads_v[p] - u_g[grip_slots[p]] * qd_arm[pad_dofs[p]][None]
                  for p in range(n_pads)]

    mu_world = float(scene.block_fric) * 0.5
    mu_pad = float(scene.block_fric)
    tpl = st["art_q"][0]                                # (S,L) template
    bundles: List[Bundle] = []

    corners_of = {}
    for o in range(n_obj):
        # corners: (3, 8, S, L)
        op = st["obj_pos"][o][:, None]                  # (3,1,S,L)
        oq = st["obj_quat"][o][:, None]                 # (4,1,S,L)
        local = cvec((_CORNER_SIGNS
                      * np.asarray(scene.block_half, f32)[None]).T,
                     tpl)                               # (3,8,S,L)
        corners = op + ln.quat_rotate(oq, local)
        corners_of[o] = corners

        # floor: depth = plane_z - z, normal +z (points_halfspace)
        nrm = cvec(np.array([0, 0, 1], f32), tpl)[:, None]
        nrm = jnp.broadcast_to(nrm, corners.shape)
        dep = float(scene.plane_z) - corners[2]
        bundles.append(Bundle(corners, nrm, dep, None, mu_world, a=o))

        # statics: deepest per corner over the static-box family
        S_n = scene.static_pos.shape[0]
        if S_n > 0:
            pts = corners[:, :, None]                   # (3,8,1,S,L)
            ref = st["obj_pos"][o][:, None, None]
            bp = cvec(scene.static_pos.T, tpl)[:, None]   # (3,1,Sn,S,L)
            bh = cvec(scene.static_half.T, tpl)[:, None]
            p_, n_, d_ = lane_points_aabox_ref(pts, ref, bp, bh)
            p_, n_, d_ = lane_deepest(p_, n_, d_, axis=1)
            bundles.append(Bundle(p_, n_, d_, None, mu_world, a=o))

        # articulated boxes: deepest real box per corner, per object k
        if scene.has_articulated:
            for k in range(4):
                bs = _real_boxes(scene, k)
                if not bs:
                    continue
                bpos, bquat = _lane_art_pose(scene, k, st["art_q"])
                ps, ns, ds = [], [], []
                for b in bs:
                    center = bpos + ln.quat_rotate(
                        bquat, cvec(scene.art_boxes_pos[k, b], tpl))
                    bh = cvec(scene.art_boxes_half[k, b], tpl)
                    p_, n_, d_ = lane_points_obox_ref(
                        corners, st["obj_pos"][o][:, None],
                        center[:, None], bquat[:, None], bh[:, None])
                    ps.append(p_)
                    ns.append(n_)
                    ds.append(d_)
                p_ = jnp.stack(ps, 2)                   # (3,8,nb,S,L)
                n_ = jnp.stack(ns, 2)
                d_ = jnp.stack(ds, 1)                   # (8,nb,S,L)
                p_, n_, d_ = lane_deepest(p_, n_, d_, axis=1)
                bundles.append(Bundle(p_, n_, d_, None,
                                      0.5 * float(scene.block_fric),
                                      a=o, k=k))

        # pads vs this block (normal flipped INTO the block)
        for p in range(n_pads):
            pt, nm, dp = lane_sphere_obox(pads_c[p], pads_r[p],
                                          st["obj_pos"][o],
                                          st["obj_quat"][o],
                                          cvec(scene.block_half, tpl))
            bundles.append(Bundle(pt[:, None], -nm[:, None], dp[None],
                                  pads_v_nog[p][:, None], mu_pad,
                                  a=o, g=grip_slots[p]))

    if n_obj == 2:
        p_, n_, d_ = lane_points_obox_ref(
            corners_of[0], st["obj_pos"][0][:, None],
            st["obj_pos"][1][:, None], st["obj_quat"][1][:, None],
            cvec(scene.block_half, tpl)[:, None])
        bundles.append(Bundle(p_, n_, d_, None, float(scene.block_fric),
                              a=0, b=1))

    # pads vs articulated: deepest real box per pad per object
    if scene.has_articulated:
        for k in range(4):
            bs = _real_boxes(scene, k)
            if not bs:
                continue
            bpos, bquat = _lane_art_pose(scene, k, st["art_q"])
            for p in range(n_pads):
                ps, ns, ds = [], [], []
                for b in bs:
                    center = bpos + ln.quat_rotate(
                        bquat, cvec(scene.art_boxes_pos[k, b], tpl))
                    pt, nm, dp = lane_sphere_obox(
                        pads_c[p], pads_r[p], center, bquat,
                        cvec(scene.art_boxes_half[k, b], tpl))
                    ps.append(pt)
                    ns.append(-nm)
                    ds.append(dp)
                p_ = jnp.stack(ps, 1)                   # (3,nb,S,L)
                n_ = jnp.stack(ns, 1)
                d_ = jnp.stack(ds, 0)                   # (nb,S,L)
                pt, nm, dp = lane_deepest(p_, n_, d_, axis=0)
                # pj: arm-coupled (finger on a limit-blocked element is
                # resisted through the arm chain — see contact_solver)
                bundles.append(Bundle(pt[:, None], nm[:, None], dp[None],
                                      pads_v_nog[p][:, None], 0.6,
                                      k=k, g=grip_slots[p], pj=p))

    # pads vs WORLD (floor + deepest static), ARM-COUPLED — mirrors
    # physics.gather_contacts' pad-vs-world block
    for p in range(n_pads):
        nrm = cvec(np.array([0, 0, 1], f32), tpl)
        dep = float(pads_r[p]) - (pads_c[p][2] - float(scene.plane_z))
        pt = pads_c[p] - nrm * float(pads_r[p])
        bundles.append(Bundle(pt[:, None], -nrm[:, None], dep[None],
                              pads_v_nog[p][:, None], 0.6,
                              g=grip_slots[p], pj=p))
        S_n = scene.static_pos.shape[0]
        if S_n > 0:
            bp = cvec(scene.static_pos.T, tpl)          # (3,Sn,S,L)
            bh = cvec(scene.static_half.T, tpl)
            p_, n_, d_ = lane_sphere_aabox(pads_c[p][:, None],
                                           pads_r[p], bp, bh)
            pt, nm, dp = lane_deepest(p_, -n_, d_, axis=0)
            bundles.append(Bundle(pt[:, None], nm[:, None], dp[None],
                                  pads_v_nog[p][:, None], 0.6,
                                  g=grip_slots[p], pj=p))

    # pad point Jacobians over the ARM joints (physics.pad_point_jacobians)
    pad_J = []
    for p, (site, _, _) in enumerate(arm.pad_spheres):
        par = tree.site_parent[site]
        anc = set()
        i = par
        while i >= 0:
            anc.add(i)
            i = tree.parent[i]
        cols = []
        for j in range(arm.n_arm):
            if j not in anc:
                cols.append(None)
                continue
            a_w = ln.quat_rotate(kin2.quat[j], cvec(tree.axis[j], tpl))
            if tree.jtype[j] == REVOLUTE:
                cols.append(ln.cross(a_w, pads_c[p] - kin2.pos[j]))
            else:
                cols.append(a_w)
        pad_J.append(cols)                # list P of list n_arm of (3,S,L)

    aux = dict(grip_dofs=grip_dofs, grip_slots=grip_slots, u_g=u_g,
               pad_J=pad_J)
    return bundles, aux


# ---------------------------------------------------------------------------
# lane Jacobi impulse solve — mirrors envs/contact_solver.solve on bundles
# ---------------------------------------------------------------------------

def lane_solve(cfg: EnvConfig, scene: Scene, bundles: List[Bundle],
               st: dict, inv_I_world, inv_m_blk,
               u_g, inv_m_grip, grip_qd0, art_qd0, dt: float,
               pad_J=None, inv_D_arm=None,
               iters: int = 8, relax: float = 1.0, beta: float = 0.2,
               slop: float = 5e-4, v_push_max: float = 0.05,
               lam0=None):
    n_obj = cfg.num_objects
    G = len(u_g)
    lane_shape = st["art_q"].shape[1:]
    arm_coupled = pad_J is not None
    n_arm = len(inv_D_arm) if arm_coupled else 0
    # limit-aware art mobility (contact_solver.art_mobile): lane masks
    eps_lim = 1e-4
    at_low = [(st["art_q"][k] <= float(scene.art_lower[k]) + eps_lim)
              for k in range(4)]
    at_high = [(st["art_q"][k] >= float(scene.art_upper[k]) - eps_lim)
               for k in range(4)]

    def art_mobile(k, j_dir):
        blocked = (at_low[k] & (j_dir < 0.0)) | (at_high[k] & (j_dir > 0.0))
        return jnp.where(blocked, 0.0, 1.0)

    # per-bundle precomputation (positions fixed during the velocity solve)
    pre = []
    for bd in bundles:
        active = bd.depth > 0.0
        af = active.astype(jnp.float32)
        v_target = jnp.minimum(
            beta * jnp.maximum(bd.depth - slop, 0.0) / dt, v_push_max)
        r_a = bd.point - st["obj_pos"][bd.a][:, None] if bd.a >= 0 else None
        r_b = bd.point - st["obj_pos"][bd.b][:, None] if bd.b >= 0 else None
        if bd.k >= 0:
            tpl = bd.depth[0]
            axis_c = cvec(scene.art_axis[bd.k], tpl)[:, None]
            if scene.art_is_revolute[bd.k]:
                anchor_c = cvec(scene.art_anchor[bd.k], tpl)[:, None]
                u_art = ln.cross(jnp.broadcast_to(axis_c, bd.point.shape),
                                 bd.point - anchor_c)
            else:
                u_art = jnp.broadcast_to(axis_c, bd.point.shape)
        else:
            u_art = None
        # tangent basis (mirrors contact_solver._tangent_basis)
        nz = jnp.abs(bd.normal[2]) < 0.9
        ax = jnp.stack([jnp.where(nz, 0.0, 1.0),
                        jnp.zeros_like(bd.normal[0]),
                        jnp.where(nz, 1.0, 0.0)])
        t1 = ln.cross(bd.normal, ax)
        t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, axis=0) + 1e-12)[None]
        t2 = ln.cross(bd.normal, t1)
        pre.append(dict(active=active, af=af, v_target=v_target, r_a=r_a,
                        r_b=r_b, u_art=u_art, t1=t1, t2=t2))

    # mass-splitting counts per body (contact_solver.solve:120-133)
    cnt_blk = [jnp.zeros(lane_shape, jnp.float32) for _ in range(max(n_obj, 1))]
    cnt_art = [jnp.zeros(lane_shape, jnp.float32) for _ in range(4)]
    cnt_grip = [jnp.zeros(lane_shape, jnp.float32) for _ in range(max(G, 1))]
    cnt_arm = jnp.zeros(lane_shape, jnp.float32)
    for bd, pr in zip(bundles, pre):
        s = jnp.sum(pr["af"], axis=0)
        if bd.a >= 0:
            cnt_blk[bd.a] = cnt_blk[bd.a] + s
        if bd.b >= 0:
            cnt_blk[bd.b] = cnt_blk[bd.b] + s
        if bd.k >= 0:
            cnt_art[bd.k] = cnt_art[bd.k] + s
        if bd.g >= 0:
            cnt_grip[bd.g] = cnt_grip[bd.g] + s
        if bd.pj >= 0:
            cnt_arm = cnt_arm + s

    inv_m_art = [1.0 / float(scene.art_mass[k]) for k in range(4)]

    def k_dir(bd, pr, d):
        k = 0.0
        if bd.a >= 0:
            ua = ln.cross(pr["r_a"], d)
            term = inv_m_blk + ln.dot(ua, ln.mat33_vec(
                inv_I_world[bd.a][:, :, None], ua))
            k = _acc(k, term * jnp.maximum(cnt_blk[bd.a], 1.0)[None])
        if bd.b >= 0:
            ub = ln.cross(pr["r_b"], d)
            term = inv_m_blk + ln.dot(ub, ln.mat33_vec(
                inv_I_world[bd.b][:, :, None], ub))
            k = _acc(k, term * jnp.maximum(cnt_blk[bd.b], 1.0)[None])
        if bd.k >= 0:
            ja = ln.dot(pr["u_art"], d)
            sign = -1.0 if bd.a >= 0 else 1.0
            mob = art_mobile(bd.k, ja * sign)
            k = _acc(k, ja * ja * inv_m_art[bd.k] * mob
                     * jnp.maximum(cnt_art[bd.k], 1.0)[None])
        if bd.g >= 0:
            jg = ln.dot(u_g[bd.g][:, None], d)
            k = _acc(k, jg * jg * inv_m_grip[bd.g][None]
                     * jnp.maximum(cnt_grip[bd.g], 1.0)[None])
        if bd.pj >= 0 and arm_coupled:
            split = jnp.maximum(cnt_arm, 1.0)[None]
            for j in range(n_arm):
                col = pad_J[bd.pj][j]
                if col is None:
                    continue
                jd = ln.dot(col[:, None], d)
                k = _acc(k, jd * jd * inv_D_arm[j][None] * split)
        return jnp.maximum(k, 1e-8)

    for bd, pr in zip(bundles, pre):
        pr["k_n"] = k_dir(bd, pr, bd.normal)
        pr["k_t1"] = k_dir(bd, pr, pr["t1"])
        pr["k_t2"] = k_dir(bd, pr, pr["t2"])

    def rel_vel(bd, pr, ov, ow, aqd, gqd, adqd):
        zero = 0.0
        v_a = (ov[bd.a][:, None] + ln.cross(ow[bd.a][:, None], pr["r_a"])
               ) if bd.a >= 0 else None
        v_b = (ov[bd.b][:, None] + ln.cross(ow[bd.b][:, None], pr["r_b"])
               ) if bd.b >= 0 else None
        v_art = pr["u_art"] * aqd[bd.k][None] if bd.k >= 0 else None
        v_grip = u_g[bd.g][:, None] * gqd[bd.g][None] if bd.g >= 0 else None
        vB = zero
        if v_b is not None:
            vB = _acc(vB, v_b)
        if v_art is not None and bd.a >= 0:
            vB = _acc(vB, v_art)
        if v_grip is not None:
            vB = _acc(vB, v_grip)
        if bd.pj >= 0 and arm_coupled:
            # dynamic arm correction on the pad side (baseline in vkin)
            for j in range(n_arm):
                col = pad_J[bd.pj][j]
                if col is not None:
                    vB = _acc(vB, col[:, None] * adqd[j][None])
        if bd.vkin is not None:
            vB = _acc(vB, bd.vkin)
        if bd.a >= 0:
            vA = v_a
        elif bd.k >= 0:
            vA = v_art
        else:
            vA = zero
        if _is0(vB):
            return vA
        if _is0(vA):
            return -vB
        return vA - vB

    def apply_all(ov, ow, aqd, gqd, adqd, imps):
        """Apply per-bundle world impulses (list of (3,R,S,L), on side A;
        −imp on side B) to all solver participants + gear projection —
        shared by the per-iteration update and the warm-start init
        (contact_solver.apply_impulses/gear_project)."""
        d_ov = [jnp.zeros_like(v) for v in ov]
        d_ow = [jnp.zeros_like(v) for v in ow]
        d_aqd = [jnp.zeros_like(aqd[0]) for _ in range(4)]
        d_gqd = [jnp.zeros_like(g) for g in gqd]
        d_arm = [jnp.zeros_like(aqd[0]) for _ in range(max(n_arm, 1))]
        for (bd, pr), imp in zip(zip(bundles, pre), imps):
            if bd.a >= 0:
                d_ov[bd.a] = d_ov[bd.a] + jnp.sum(imp, axis=1) * inv_m_blk
                torq = jnp.sum(ln.cross(pr["r_a"], imp), axis=1)
                d_ow[bd.a] = d_ow[bd.a] + ln.mat33_vec(inv_I_world[bd.a],
                                                       torq)
            if bd.b >= 0:
                d_ov[bd.b] = d_ov[bd.b] - jnp.sum(imp, axis=1) * inv_m_blk
                torq = jnp.sum(ln.cross(pr["r_b"], -imp), axis=1)
                d_ow[bd.b] = d_ow[bd.b] + ln.mat33_vec(inv_I_world[bd.b],
                                                       torq)
            if bd.k >= 0:
                sign = -1.0 if bd.a >= 0 else 1.0
                jrow = ln.dot(pr["u_art"], imp) * sign          # (R,S,L)
                jrow = jrow * art_mobile(bd.k, jrow)
                d_aqd[bd.k] = d_aqd[bd.k] + jnp.sum(jrow, axis=0) \
                    * inv_m_art[bd.k]
            if bd.g >= 0:
                jg = -jnp.sum(ln.dot(u_g[bd.g][:, None], imp), axis=0)
                d_gqd[bd.g] = d_gqd[bd.g] + jg * inv_m_grip[bd.g]
            if bd.pj >= 0 and arm_coupled:
                # arm chain (side B): Δqd_j += −(J_j · imp) · D_j⁻¹
                for j in range(n_arm):
                    col = pad_J[bd.pj][j]
                    if col is None:
                        continue
                    jj = -jnp.sum(ln.dot(col[:, None], imp), axis=0)
                    d_arm[j] = d_arm[j] + jj * inv_D_arm[j]
        ov = [v + d for v, d in zip(ov, d_ov)]
        ow = [v + d for v, d in zip(ow, d_ow)]
        aqd = aqd + jnp.stack(d_aqd)
        gqd = [g + d for g, d in zip(gqd, d_gqd)]
        adqd = [a + d for a, d in zip(adqd, d_arm)] if arm_coupled else adqd
        # gear projection (contact_solver.gear_project)
        if G == 2:
            w0, w1 = inv_m_grip[0], inv_m_grip[1]
            err = gqd[0] - gqd[1]
            p = err / (w0 + w1)
            gqd = [gqd[0] - p * w0, gqd[1] + p * w1]
        return ov, ow, aqd, gqd, adqd

    def body(carry):
        ov, ow, aqd, gqd, adqd, lams = carry
        new_lams, imps = [], []
        for bi, (bd, pr) in enumerate(zip(bundles, pre)):
            ln_, lt1, lt2 = lams[bi]
            v_rel = rel_vel(bd, pr, ov, ow, aqd, gqd, adqd)
            vn = ln.dot(v_rel, bd.normal)
            dln = relax * (pr["v_target"] - vn) / pr["k_n"]
            new_ln = jnp.maximum(ln_ + dln, 0.0) * pr["af"]
            dln = new_ln - ln_
            vt1 = ln.dot(v_rel, pr["t1"])
            vt2 = ln.dot(v_rel, pr["t2"])
            cap = bd.mu * new_ln
            new_lt1 = jnp.clip(lt1 + relax * (-vt1) / pr["k_t1"],
                               -cap, cap) * pr["af"]
            new_lt2 = jnp.clip(lt2 + relax * (-vt2) / pr["k_t2"],
                               -cap, cap) * pr["af"]
            imps.append(dln[None] * bd.normal
                        + (new_lt1 - lt1)[None] * pr["t1"]
                        + (new_lt2 - lt2)[None] * pr["t2"])
            new_lams.append((new_ln, new_lt1, new_lt2))
        ov, ow, aqd, gqd, adqd = apply_all(ov, ow, aqd, gqd, adqd, imps)
        return ov, ow, aqd, gqd, adqd, tuple(new_lams)

    ov = [st["obj_vel"][o] for o in range(n_obj)]
    ow = [st["obj_angvel"][o] for o in range(n_obj)]
    adqd0 = [jnp.zeros(lane_shape, jnp.float32)
             for _ in range(max(n_arm, 1))]
    aqd0, gqd0 = art_qd0, grip_qd0
    if lam0 is None:
        lams = tuple((jnp.zeros_like(bd.depth),) * 3 for bd in bundles)
    else:
        # WARM START (contact_solver.solve lam0 branch): re-mask by the
        # current active set, re-cap friction, apply to free velocities
        lams, imps0 = [], []
        for bi, (bd, pr) in enumerate(zip(bundles, pre)):
            l0n, l0t1, l0t2 = lam0[bi]
            ln_w = jnp.maximum(l0n, 0.0) * pr["af"]
            cap0 = bd.mu * ln_w
            lt1_w = jnp.clip(l0t1, -cap0, cap0) * pr["af"]
            lt2_w = jnp.clip(l0t2, -cap0, cap0) * pr["af"]
            imps0.append(ln_w[None] * bd.normal + lt1_w[None] * pr["t1"]
                         + lt2_w[None] * pr["t2"])
            lams.append((ln_w, lt1_w, lt2_w))
        lams = tuple(lams)
        ov, ow, aqd0, gqd0, adqd0 = apply_all(ov, ow, aqd0, gqd0, adqd0,
                                              imps0)
    carry = (ov, ow, aqd0, gqd0, adqd0, lams)
    # fori_loop keeps the traced/Mosaic instruction count at ONE iteration
    carry = jax.lax.fori_loop(0, iters, lambda i, c: body(c), carry)
    ov, ow, aqd, gqd, adqd, lams = carry
    return ov, ow, aqd, gqd, adqd, lams


# ---------------------------------------------------------------------------
# substep assembly — mirrors envs/physics.physics_substep
# ---------------------------------------------------------------------------

STATE_KEYS = ("q", "qd", "obj_pos", "obj_quat", "obj_vel", "obj_angvel",
              "art_q", "art_qd")


def state_keys(cfg) -> tuple:
    """STATE_KEYS minus the object fields when num_objects == 0 (reach
    envs). Zero-row object arrays must never exist inside the Pallas
    kernel: Mosaic rejects vector<0xSxL> types at lowering ("vector types
    must have positive constant sizes"), even though the plain-jnp twin
    tolerates 0-sized arrays — which is why only the real-chip reach path
    ever hit this."""
    if cfg.num_objects:
        return STATE_KEYS
    return tuple(k for k in STATE_KEYS if not k.startswith("obj_"))


def make_lane_substep(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                      scene: Scene, solve_iters: int = 8):
    dt = float(cfg.dt)
    n_arm = arm.n_arm
    n_dof = tree.n_dof
    n_obj = cfg.num_objects

    def substep(st: dict, ctrl_q, grip, lam0=None):
        q, qd = st["q"], st["qd"]
        lower_c = cvec(tree.lower, q[0])
        upper_c = cvec(tree.upper, q[0])
        kin = lane_fk_vel(tree, q, qd)
        pads_c, pads_v, pads_r, pad_dofs = lane_pad_kinematics(tree, arm, kin)

        # pads-vs-world contact lives in ARM-COUPLED impulse bundles in the
        # solve below (gather_bundles pad-vs-world block) — mirrors the
        # oracle's move away from penalty forces (physics_substep)
        f_ext = {}

        # ---- ABA + servos (physics_substep:272-287)
        qdd, D = lane_aba(tree, q, qd, kin, f_ext)
        qd_free = qd + dt * qdd

        # gripper targets (physics.gripper_targets)
        amount = grip if arm.name == "Panda" else grip - 0.2
        target = [jnp.zeros_like(q[0]) for _ in range(n_dof)]
        force = [0.0] * n_dof
        for dof, scale, offset, fmax in arm.gripper_dofs:
            target[dof] = scale * amount + offset
            force[dof] = float(fmax)
        fdof, ldof, ffollow = arm.grip_follower
        if fdof >= 0:
            target[fdof] = q[ldof]
            force[fdof] = float(ffollow)
        for j in range(n_arm):
            target[j] = ctrl_q[j]
            force[j] = float(arm.servo_force)
        if cfg.fixed_gripper:
            for j in range(n_arm, n_dof):
                force[j] = 0.0
        target = jnp.stack(target)
        force_c = cvec(np.asarray(force, f32), q[0])

        # servo_velocity_impulse (dynamics.py:172-187)
        v_star = 0.1 * (target - q) / dt
        imp = jnp.clip(D * (v_star - qd_free), -force_c * dt, force_c * dt)
        qd_arm = qd_free + imp / jnp.maximum(D, 1e-9)

        # ---- scene free-update (physics_substep:289-305)
        g_c = cvec(np.array([0, 0, -9.8], f32), q[0])[None]   # (1,3,S,L)
        obj_vel = st["obj_vel"] + dt * g_c if n_obj else None
        m_eff = scene.art_mass.astype(np.float64)
        g_axis = (scene.art_axis.astype(np.float64)
                  @ np.array([0, 0, -9.8]))                 # (4,) const
        rev = np.asarray(scene.art_is_revolute)
        atpl = st["art_q"][0]
        art_qd = st["art_qd"] + dt * cvec(
            np.where(rev, 0.0, g_axis).astype(f32), atpl)
        art_qd = art_qd * cvec(
            (1.0 / (1.0 + dt * scene.art_damping.astype(np.float64)
                    / m_eff)).astype(f32), atpl)
        mt_c = cvec(scene.art_motor_target, atpl)
        mf_c = cvec(scene.art_motor_force, atpl)
        me_c = cvec(m_eff.astype(f32), atpl)
        v_star_a = 0.1 * (mt_c - st["art_q"]) / dt
        imp_a = jnp.clip(me_c * (v_star_a - art_qd), -mf_c * dt, mf_c * dt)
        art_qd = art_qd + cvec(np.where(
            scene.art_motor_force > 0, 1.0, 0.0).astype(f32), atpl) \
            * imp_a / me_c

        # ---- impulse solve on post-servo kinematics (physics_substep:307+)
        kin2 = lane_fk_vel(tree, q, qd_arm)
        pads2 = lane_pad_kinematics(tree, arm, kin2)
        st2 = dict(st)
        st2["art_qd"] = art_qd
        if n_obj:
            st2["obj_vel"] = obj_vel  # post-gravity: the solve's initial ov
        bundles, aux = gather_bundles(cfg, tree, arm, scene, st2, kin2,
                                      qd_arm, *pads2)

        h = np.asarray(scene.block_half, np.float64)
        bm = float(scene.block_mass)
        block_I = bm / 3.0 * np.array([h[1] ** 2 + h[2] ** 2,
                                       h[0] ** 2 + h[2] ** 2,
                                       h[0] ** 2 + h[1] ** 2])
        inv_I_world = []
        for o in range(n_obj):
            R = ln.quat_to_mat33(st["obj_quat"][o])          # (3,3,S,L)
            inv_I_world.append(jnp.stack([jnp.stack([
                sum(R[r, j] * float(1.0 / block_I[j]) * R[c, j]
                    for j in range(3)) for c in range(3)]) for r in range(3)]))
        inv_m_blk = 1.0 / bm

        grip_dofs = aux["grip_dofs"]
        u_g = aux["u_g"]
        inv_m_grip = [1.0 / jnp.maximum(D[d], 1e-4) for d in grip_dofs]
        grip_qd0 = [qd_arm[d] for d in grip_dofs]
        inv_D_arm = [1.0 / jnp.maximum(D[j], 1e-4) for j in range(n_arm)]

        ov, ow, aqd, gqd, adqd, lams = lane_solve(
            cfg, scene, bundles, st2, inv_I_world, inv_m_blk,
            u_g, inv_m_grip, grip_qd0, art_qd, dt,
            pad_J=aux["pad_J"], inv_D_arm=inv_D_arm, iters=solve_iters,
            lam0=lam0)

        # write solved gripper-driver velocities back + arm-coupled
        # contact correction (row rebuild: scatter has no Mosaic lowering)
        slot_of = {d: slot for slot, d in enumerate(grip_dofs)}
        qd_arm = jnp.stack([
            gqd[slot_of[i]] if i in slot_of
            else (qd_arm[i] + adqd[i] if i < n_arm else qd_arm[i])
            for i in range(n_dof)])

        # ---- integrate (physics_substep:330-354)
        q_new = jnp.clip(q + dt * qd_arm, lower_c, upper_c)
        hit_low = (q + dt * qd_arm) < lower_c
        hit_high = (q + dt * qd_arm) > upper_c
        qd_new = jnp.where(hit_low, jnp.maximum(qd_arm, 0.0),
                           jnp.where(hit_high, jnp.minimum(qd_arm, 0.0),
                                     qd_arm))

        out = dict(st)
        out["q"] = q_new
        out["qd"] = qd_new
        if n_obj > 0:
            ov_s = jnp.stack(ov)
            ow_s = jnp.stack(ow)
            out["obj_vel"] = ov_s
            out["obj_angvel"] = ow_s
            out["obj_pos"] = st["obj_pos"] + dt * ov_s
            out["obj_quat"] = jnp.stack([
                ln.quat_integrate(st["obj_quat"][o], ow_s[o], dt)
                for o in range(n_obj)])
        art_lo = cvec(scene.art_lower, atpl)
        art_hi = cvec(scene.art_upper, atpl)
        art_q = st["art_q"] + dt * aqd
        art_q_c = jnp.clip(art_q, art_lo, art_hi)
        out["art_qd"] = jnp.where(art_q != art_q_c, 0.0, aqd)
        out["art_q"] = art_q_c
        return out, lams

    return substep


def make_lane_sim(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                  scene: Scene, n_substeps: Optional[int] = None,
                  unroll: bool = False, solve_iters: int = 8):
    """12-substep control interval on lane state (pure jnp; kernel body).

    Contact impulses warm-start across the substeps (zeros on the first,
    mirroring envs/physics.run_simulation): the λ pytree rides the
    fori_loop carry, never EnvState, so the packed layout is unchanged.
    The zero init comes from an eval_shape trace of the substep (no ops
    emitted), keeping the loop body compiled ONCE."""
    sub = make_lane_substep(cfg, tree, arm, scene, solve_iters=solve_iters)
    n = n_substeps if n_substeps is not None else cfg.substeps

    def _lam0(st, ctrl_q, grip):
        lam_sh = jax.eval_shape(lambda s, c, g: sub(s, c, g, None)[1],
                                st, ctrl_q, grip)
        return jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), lam_sh)

    def sim(st: dict, ctrl_q, grip):
        if unroll:
            lam = _lam0(st, ctrl_q, grip)
            for _ in range(n):
                st, lam = sub(st, ctrl_q, grip, lam)
            return st

        keys = state_keys(cfg)

        def body(i, carry):
            d, lam = carry
            d = dict(zip(keys, d))
            d, lam = sub(d, ctrl_q, grip, lam)
            return (tuple(d[k] for k in keys), lam)

        carry = (tuple(st[k] for k in keys), _lam0(st, ctrl_q, grip))
        carry = jax.lax.fori_loop(0, n, body, carry)
        return dict(zip(keys, carry[0]))

    return sim


# ---------------------------------------------------------------------------
# EnvState (B-leading) ↔ packed lane layout, and the Pallas kernel wrapper
# ---------------------------------------------------------------------------

def _field_rows(cfg: EnvConfig, tree: KineTree):
    n, no = tree.n_dof, cfg.num_objects
    rows = [("q", n), ("qd", n), ("obj_pos", 3 * no), ("obj_quat", 4 * no),
            ("obj_vel", 3 * no), ("obj_angvel", 3 * no), ("art_q", 4),
            ("art_qd", 4)]
    return rows, sum(r for _, r in rows)


def pack_state(cfg: EnvConfig, tree: KineTree, state: EnvState):
    """EnvState with leading batch B → (NF, B) f32. B any size."""
    no = cfg.num_objects
    B = state.q.shape[0]
    parts = [state.q.T, state.qd.T]
    for f in ("obj_pos", "obj_quat", "obj_vel", "obj_angvel"):
        arr = getattr(state, f)                         # (B, no, k)
        parts.append(arr.reshape(B, -1).T if no else
                     jnp.zeros((0, B), jnp.float32))
    parts += [state.art_q.T, state.art_qd.T]
    return jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=0)


def unpack_state(cfg: EnvConfig, tree: KineTree, X, template: EnvState
                 ) -> EnvState:
    """(NF, B) → EnvState fields written into `template` (other fields
    — goal, rng, buffers, ctrl — untouched)."""
    rows, _ = _field_rows(cfg, tree)
    no = cfg.num_objects
    B = X.shape[1]
    out = {}
    idx = 0
    for name, r in rows:
        sl = X[idx:idx + r]
        idx += r
        if name.startswith("obj_"):
            k = 4 if name == "obj_quat" else 3
            out[name] = sl.T.reshape(B, no, k) if no else \
                getattr(template, name)
        else:
            out[name] = sl.T
    return template.replace(**out)


def _lanes_from_block(cfg, tree, Xb):
    """(NF, S, L) block → lane state dict."""
    rows, _ = _field_rows(cfg, tree)
    no = cfg.num_objects
    st = {}
    idx = 0
    for name, r in rows:
        if r == 0:          # 0-object envs: never slice a 0-row vector
            continue        # (Mosaic rejects vector<0xSxL>, see state_keys)
        sl = Xb[idx:idx + r]
        idx += r
        if name.startswith("obj_"):
            k = 4 if name == "obj_quat" else 3
            st[name] = sl.reshape(no, k, *Xb.shape[1:])
        else:
            st[name] = sl
    return st


def _block_from_lanes(cfg, tree, st):
    rows, _ = _field_rows(cfg, tree)
    parts = []
    for name, r in rows:
        if r == 0:
            continue        # 0-object envs carry no object fields
        v = st[name]
        if name.startswith("obj_"):
            parts.append(v.reshape(-1, *v.shape[-2:]))
        else:
            parts.append(v)
    return jnp.concatenate(parts, axis=0)


def make_pallas_sim(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                    scene: Scene, n_substeps: Optional[int] = None,
                    block_envs: int = 1024, interpret: bool = False):
    """Returns sim_B(X (NF, B), ctrl (n_arm, B), grip (B,)) → X' via a
    fused Pallas kernel; B must be a multiple of block_envs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, NF = _field_rows(cfg, tree)
    n_arm = arm.n_arm
    L = 128
    S = block_envs // L
    sim = make_lane_sim(cfg, tree, arm, scene, n_substeps)

    def kernel(x_ref, u_ref, y_ref):
        Xb = x_ref[:]                                   # (NF, S, L)
        Ub = u_ref[:]                                   # (n_arm+1, S, L)
        st = _lanes_from_block(cfg, tree, Xb)
        out = sim(st, Ub[:n_arm], Ub[n_arm])
        y_ref[:] = _block_from_lanes(cfg, tree, out)

    def sim_B(X, ctrl, grip):
        B = X.shape[1]
        assert B % block_envs == 0, (B, block_envs)
        G = B // block_envs
        X3 = X.reshape(NF, G * S, L)
        U3 = jnp.concatenate([ctrl, grip[None]], axis=0
                             ).reshape(n_arm + 1, G * S, L)
        Y3 = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NF, S, L), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_arm + 1, S, L), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NF, S, L), lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NF, G * S, L), jnp.float32),
            interpret=interpret,
        )(X3, U3)
        return Y3.reshape(NF, B)

    return sim_B


def make_reference_sim(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                       scene: Scene, n_substeps: Optional[int] = None,
                       block_envs: int = 1024):
    """Same computation as make_pallas_sim but as plain traced jnp —
    the correctness oracle and the CPU fallback."""
    rows, NF = _field_rows(cfg, tree)
    n_arm = arm.n_arm
    L = 128
    S = block_envs // L
    sim = make_lane_sim(cfg, tree, arm, scene, n_substeps)

    def sim_B(X, ctrl, grip):
        B = X.shape[1]
        X3 = X.reshape(NF, B // L, L)
        st = _lanes_from_block(cfg, tree, X3)
        out = sim(st, ctrl.reshape(n_arm, B // L, L),
                  grip.reshape(B // L, L))
        return _block_from_lanes(cfg, tree, out).reshape(NF, B)

    return sim_B


# ---------------------------------------------------------------------------
# lane control: action decode + DLS IK (mirrors envs/core.control +
# ops/kinematics.ik_dls), so the WHOLE control step fuses into one kernel
# ---------------------------------------------------------------------------

def lane_fk_links(tree: KineTree, q):
    """Positions/quats only (IK inner loop)."""
    lane_shape = q.shape[1:]
    pos, quat = [], []
    for i in range(tree.n_dof):
        p = tree.parent[i]
        if p < 0:
            pp = cvec(tree.base_pos, q[0])
            pq = cvec(tree.base_quat, q[0])
        else:
            pp, pq = pos[p], quat[p]
        jp = pp + ln.quat_rotate(pq, cvec(tree.pre_pos[i], q[0]))
        jq = ln.quat_multiply(pq, cvec(tree.pre_quat[i], q[0]))
        a_const = np.asarray(tree.axis[i], f32)
        if tree.jtype[i] == REVOLUTE:
            dq = ln.quat_from_axis_angle(a_const, q[i])
            jq = ln.quat_normalize(ln.quat_multiply(jq, dq))
        else:
            jp = jp + ln.quat_rotate(
                jq, cvec(a_const, q[0]) * q[i][None])
        pos.append(jp)
        quat.append(jq)
    return pos, quat


def _lane_site_pose(tree: KineTree, pos, quat, site: int):
    par = tree.site_parent[site]
    tpl = pos[par][0]
    xp = pos[par] + ln.quat_rotate(quat[par], cvec(tree.site_pos[site], tpl))
    xq = ln.quat_multiply(quat[par], cvec(tree.site_quat[site], tpl))
    return xp, xq


def _chol6_solve(A, bs):
    """Cholesky-solve the SPD 6x6 lane system for each rhs in bs.
    A: nested 6x6 list; bs: list of 6-vectors (lists). Unrolled."""
    L = [[0.0] * 6 for _ in range(6)]
    for j in range(6):
        acc = A[j][j]
        for k in range(j):
            acc = _acc(acc, -_mul(L[j][k], L[j][k]))
        Ljj = jnp.sqrt(jnp.maximum(acc, 1e-12))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, 6):
            acc = A[i][j]
            for k in range(j):
                acc = _acc(acc, -_mul(L[i][k], L[j][k]))
            L[i][j] = _mul(acc, inv)
    outs = []
    for b in bs:
        y = [0.0] * 6
        for i in range(6):
            acc = b[i]
            for k in range(i):
                acc = _acc(acc, -_mul(L[i][k], y[k]))
            y[i] = acc / L[i][i]
        x = [0.0] * 6
        for i in range(5, -1, -1):
            acc = y[i]
            for k in range(i + 1, 6):
                acc = _acc(acc, -_mul(L[k][i], x[k]))
            x[i] = acc / L[i][i]
        outs.append(x)
    return outs


def lane_ik_dls(tree: KineTree, arm: ArmConfig, q0, target_pos, target_quat,
                iters: int, damping: float = 0.05, null_gain: float = 0.05):
    """Mirror of kinematics.ik_dls on lane state (only first n_arm dofs
    move). q0: (n_dof, S, L); targets: (3/4, S, L). Returns q."""
    n_active = arm.n_arm
    site = arm.ee_site
    rest = np.zeros(tree.n_dof, f32)
    rest[:n_active] = np.asarray(arm.rest_pose, f32)

    # ancestors of the site's parent link (static mask)
    anc = set()
    i = tree.site_parent[site]
    while i >= 0:
        anc.add(i)
        i = tree.parent[i]

    def body(it, q):
        lower_c = cvec(tree.lower, q[0])
        upper_c = cvec(tree.upper, q[0])
        pos, quat = lane_fk_links(tree, q)
        xp, xq = _lane_site_pose(tree, pos, quat, site)
        # orientation error (kinematics._orientation_error)
        dq4 = ln.quat_multiply(target_quat, ln.quat_conjugate(xq))
        sgn = jnp.sign(dq4[3] + 1e-12)
        err = [target_pos[0] - xp[0], target_pos[1] - xp[1],
               target_pos[2] - xp[2],
               2.0 * dq4[0] * sgn, 2.0 * dq4[1] * sgn, 2.0 * dq4[2] * sgn]
        # jacobian columns (kinematics.jacobian_site), active dofs only
        cols = []
        for i in range(n_active):
            if i not in anc:
                cols.append(None)
                continue
            a_w = ln.quat_rotate(quat[i], cvec(tree.axis[i], xp[0]))
            if tree.jtype[i] == REVOLUTE:
                lin = ln.cross(a_w, xp - pos[i])
                col = [lin[0], lin[1], lin[2], a_w[0], a_w[1], a_w[2]]
            else:
                col = [a_w[0], a_w[1], a_w[2], 0.0, 0.0, 0.0]
            cols.append(col)
        # JJt + damping^2 I (6x6)
        A = [[0.0] * 6 for _ in range(6)]
        for r in range(6):
            for c in range(r, 6):
                acc = (damping * damping) if r == c else 0.0
                for col in cols:
                    if col is not None:
                        acc = _acc(acc, _mul(col[r], col[c]))
                A[r][c] = acc
                A[c][r] = acc
        # J @ dq_null
        dq_null = [null_gain * (float(rest[i]) - q[i])
                   for i in range(n_active)]
        Jdn = [sum6(_mul(cols[i][r], dq_null[i])
                    for i in range(n_active) if cols[i] is not None)
               for r in range(6)]
        w_err, w_null = _chol6_solve(A, [err, Jdn])
        dq_rows = []
        for i in range(tree.n_dof):
            if i < n_active:
                if cols[i] is None:
                    d = dq_null[i]
                else:
                    jt_err = sum6(_mul(cols[i][r], w_err[r])
                                  for r in range(6))
                    jt_nul = sum6(_mul(cols[i][r], w_null[r])
                                  for r in range(6))
                    d = _acc(_acc(jt_err, dq_null[i]), -jt_nul)
                d = jnp.clip(_lane_of(d, q[0]), -0.5, 0.5)
            else:
                d = jnp.zeros_like(q[0])
            dq_rows.append(d)
        q = jnp.clip(q + jnp.stack(dq_rows), lower_c, upper_c)
        return q

    return jax.lax.fori_loop(0, iters, body, q0)


def lane_quat_from_euler(rpy):
    r, p, y = rpy[0] * 0.5, rpy[1] * 0.5, rpy[2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp_ = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack([sr * cp * cy - cr * sp_ * sy,
                      cr * sp_ * cy + sr * cp * sy,
                      cr * cp * sy - sr * sp_ * cy,
                      cr * cp * cy + sr * sp_ * sy])


def lane_quat_to_euler(qv):
    x, y, z, w = qv[0], qv[1], qv[2], qv[3]
    sinr = 2.0 * (w * x + y * z)
    cosr = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr, cosr)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0 + 1e-7, 1.0 - 1e-7)
    pitch = jnp.arcsin(sinp)
    siny = 2.0 * (w * z + x * y)
    cosy = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny, cosy)
    return jnp.stack([roll, pitch, yaw])


def make_lane_control(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                      ik_iters: Optional[int] = None):
    """action (A, S, L) + state q → (ctrl targets (n_arm,S,L), grip (S,L)).
    Mirrors envs/core.control."""
    at = cfg.action_type
    n_arm = arm.n_arm
    iters = ik_iters if ik_iters is not None else \
        (16 if arm.name == "Panda" else 24)

    def control(q, action):
        high = cvec(np.asarray(cfg.action_high, f32), q[0])
        action = jnp.clip(action, -high, high)
        grip = action[action.shape[0] - 1]   # [-1] lowers to dynamic_slice
        pos_l, quat_l = lane_fk_links(tree, q)
        ee_pos, ee_quat = _lane_site_pose(tree, pos_l, quat_l, arm.ee_site)

        if at in ("relative_joints", "absolute_joints"):
            if at == "relative_joints":
                targets = q[:n_arm] + action[:n_arm]
            else:
                targets = action[:n_arm]
        else:
            if at == "absolute_quat":
                pos = action[0:3]
                quat = (ln.quat_normalize(action[3:7]) if cfg.use_orientation
                        else cvec(np.array([0, 0, 0, 1], f32), q[0]))
            elif at == "relative_quat":
                pos = action[0:3] + ee_pos
                quat = ln.quat_normalize(action[3:7] + ee_quat)
            elif at == "absolute_rpy":
                pos = action[0:3]
                quat = lane_quat_from_euler(action[3:6])
            elif at == "relative_rpy":
                pos = action[0:3] + ee_pos
                quat = lane_quat_from_euler(
                    lane_quat_to_euler(ee_quat) + action[3:6])
            else:
                pos = action[0:3] + ee_pos
                if cfg.use_orientation:
                    quat = lane_quat_from_euler(
                        lane_quat_to_euler(ee_quat) + action[3:6])
                else:
                    quat = cvec(np.array([0, 0, 0, 1], f32), q[0])
            sol = lane_ik_dls(tree, arm, q, pos, quat, iters)
            targets = sol[:n_arm]

        ll = cvec(np.asarray(arm.ctrl_lower, f32), q[0])
        ul = cvec(np.asarray(arm.ctrl_upper, f32), q[0])
        inc = cvec(np.asarray(arm.rate_limit, f32), q[0])
        targets = jnp.clip(targets, ll, ul)
        cur = q[:n_arm]
        targets = jnp.clip(targets, cur - inc, cur + inc)
        return targets, grip

    return control


def make_pallas_step(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                     scene: Scene, n_substeps: Optional[int] = None,
                     block_envs: int = 1024, interpret: bool = False,
                     ik_iters: Optional[int] = None, solve_iters: int = 8):
    """FULL control step (clip → control/IK → 12 substeps) as ONE kernel.
    sim_B(X (NF,B), actions (A,B)) → X'. ik_iters/solve_iters below the
    defaults yield a cheaper PREVIEW model (planner scoring), not the
    reference-parity env step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, NF = _field_rows(cfg, tree)
    A_dim = cfg.action_dim
    L = 128
    S = block_envs // L
    sim = make_lane_sim(cfg, tree, arm, scene, n_substeps,
                        solve_iters=solve_iters)
    control = make_lane_control(cfg, tree, arm, ik_iters=ik_iters)

    def kernel(x_ref, a_ref, y_ref):
        Xb = x_ref[:]
        Ab = a_ref[:]
        st = _lanes_from_block(cfg, tree, Xb)
        ctrl, grip = control(st["q"], Ab)
        out = sim(st, ctrl, grip)
        y_ref[:] = _block_from_lanes(cfg, tree, out)

    def step_B(X, actions):
        B = X.shape[1]
        assert B % block_envs == 0, (B, block_envs)
        G = B // block_envs
        X3 = X.reshape(NF, G * S, L)
        A3 = actions.reshape(A_dim, G * S, L)
        Y3 = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NF, S, L), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((A_dim, S, L), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NF, S, L), lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NF, G * S, L), jnp.float32),
            interpret=interpret,
        )(X3, A3)
        return Y3.reshape(NF, B)

    return step_B


def make_reference_step(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                        scene: Scene, n_substeps: Optional[int] = None,
                        ik_iters: Optional[int] = None,
                        solve_iters: int = 8):
    """Plain-jnp twin of make_pallas_step (oracle / CPU fallback).
    ik_iters/solve_iters mirror make_pallas_step's preview-model knobs."""
    rows, NF = _field_rows(cfg, tree)
    A_dim = cfg.action_dim
    L = 128
    sim = make_lane_sim(cfg, tree, arm, scene, n_substeps,
                        solve_iters=solve_iters)
    control = make_lane_control(cfg, tree, arm, ik_iters=ik_iters)

    def step_B(X, actions):
        B = X.shape[1]
        X3 = X.reshape(NF, B // L, L)
        A3 = actions.reshape(A_dim, B // L, L)
        st = _lanes_from_block(cfg, tree, X3)
        ctrl, grip = control(st["q"], A3)
        out = sim(st, ctrl, grip)
        return _block_from_lanes(cfg, tree, out).reshape(NF, B)

    return step_B


def make_pallas_rollout(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                        scene: Scene, horizon: int,
                        n_substeps: Optional[int] = None,
                        block_envs: int = 1024, interpret: bool = False,
                        ik_iters: Optional[int] = None,
                        solve_iters: int = 8, with_ee: bool = False):
    """ENTIRE H-step rollout as ONE kernel invocation per env block.

    Each kernel call costs ~1.5 ms of fixed dispatch/launch overhead on the
    tunneled chip; folding the horizon loop inside amortizes it H-fold.
    roll_B(X (NF, B), actions (H, A, B)) → (X', ags (H, ag_dim, B)).
    Achieved goals: sliced from packed rows (object/play envs) or lane-FK
    ee position (reach envs) — all 19 catalog ids are covered.
    with_ee=True appends the lane-FK ee world position (3 rows) to each
    per-step ag — the MPC eval path's reach-shaping signal (solver/eval.py);
    reward consumers slice fixed play indices so the tail is inert."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, NF = _field_rows(cfg, tree)
    A_dim = cfg.action_dim
    n, no = tree.n_dof, cfg.num_objects
    with_ee = with_ee and (no > 0 or cfg.play)   # reach ag already IS ee
    ag_dim = ((7 * no + 4) if cfg.play else
              (((7 if cfg.use_orientation else 3) * no) if no else 3)) \
        + (3 if with_ee else 0)
    L = 128
    S = block_envs // L
    sim = make_lane_sim(cfg, tree, arm, scene, n_substeps,
                        solve_iters=solve_iters)
    control = make_lane_control(cfg, tree, arm, ik_iters=ik_iters)
    pos0 = 2 * n
    quat0 = pos0 + 3 * no
    art0 = quat0 + 4 * no + 6 * no

    def ag_of(Xb):
        if no == 0 and not cfg.play:
            # reach envs: ag = ee site world position (obs.achieved_goal
            # FK branch, reference environments.py:835) via lane FK
            pos_l, quat_l = lane_fk_links(tree, Xb[0:n])
            ee_pos, _ = _lane_site_pose(tree, pos_l, quat_l, arm.ee_site)
            return ee_pos
        parts = []
        for o in range(no):
            parts.append(Xb[pos0 + 3 * o: pos0 + 3 * (o + 1)])
            if cfg.play or cfg.use_orientation:
                parts.append(Xb[quat0 + 4 * o: quat0 + 4 * (o + 1)])
        if cfg.play:
            art = Xb[art0:art0 + 4]
            # dial_to_0_1_range (reference scenes.py:342-343, bug included)
            parts.append(jnp.stack([art[0], art[1], art[2],
                                    (art[3] % 2.0) * np.pi
                                    / (2.2 * np.pi)]))
        if with_ee:
            pos_l, quat_l = lane_fk_links(tree, Xb[0:n])
            ee_pos, _ = _lane_site_pose(tree, pos_l, quat_l, arm.ee_site)
            parts.append(ee_pos)
        return jnp.concatenate(parts, axis=0)

    keys = state_keys(cfg)

    def kernel(x_ref, a_ref, y_ref, ag_ref):
        Xb = x_ref[:]                                  # (NF, S, L)
        st = _lanes_from_block(cfg, tree, Xb)

        def body(h, carry):
            d = dict(zip(keys, carry))
            a_h = a_ref[h]                             # (A, S, L)
            ctrl, grip = control(d["q"], a_h)
            d = sim(d, ctrl, grip)
            ag_ref[h] = ag_of(_block_from_lanes(cfg, tree, d))
            return tuple(d[k] for k in keys)

        carry = tuple(st[k] for k in keys)
        carry = jax.lax.fori_loop(0, horizon, body, carry)
        y_ref[:] = _block_from_lanes(cfg, tree,
                                     dict(zip(keys, carry)))

    # Bound each pallas_call to max_grid blocks: H×substeps×grid physics
    # in one invocation runs long, and the tunneled dev chip faults once
    # the *executable's* device time passes ~0.1-0.2 s (B=8192/H=40 fails
    # even chunked; B=4096 is the practical ceiling there — real TPU
    # hosts without the tunnel watchdog can raise both).
    max_grid = 4

    def _call(X3, A4, G):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((NF, S, L), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((horizon, A_dim, S, L),
                             lambda g: (0, 0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((NF, S, L), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((horizon, ag_dim, S, L),
                             lambda g: (0, 0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NF, G * S, L), jnp.float32),
                jax.ShapeDtypeStruct((horizon, ag_dim, G * S, L),
                                     jnp.float32),
            ],
            interpret=interpret,
        )(X3, A4)

    def roll_B(X, actions):
        B = X.shape[1]
        assert B % block_envs == 0, (B, block_envs)
        G = B // block_envs
        X3 = X.reshape(NF, G * S, L)
        A4 = actions.reshape(horizon, A_dim, G * S, L)
        if G <= max_grid:
            Y3, AG4 = _call(X3, A4, G)
        else:
            ys, ags_parts = [], []
            for c0 in range(0, G, max_grid):
                gc = min(max_grid, G - c0)
                y, a = _call(X3[:, c0 * S:(c0 + gc) * S],
                             A4[:, :, c0 * S:(c0 + gc) * S], gc)
                ys.append(y)
                ags_parts.append(a)
            Y3 = jnp.concatenate(ys, axis=1)
            AG4 = jnp.concatenate(ags_parts, axis=2)
        return (Y3.reshape(NF, B),
                AG4.reshape(horizon, ag_dim, B))

    return roll_B
