"""Forward kinematics, geometric Jacobians, damped-least-squares IK.

TPU-first design: the tree is tiny (≤16 DoFs) and its structure is static,
so the FK sweep is an unrolled chain of quaternion composes — XLA fuses it
into straight-line VPU code, and `vmap` batches thousands of configurations
with the batch dim on the vector lanes. No data-dependent control flow.

Reference parity:
  * FK composes the baked URDF joint frames (models/panda_data.py /
    ur5e_data.py, extracted verbatim from the reference URDFs) exactly as
    PyBullet's getLinkState does; validated in-repo by analytic pose
    identities and the kinematic property suite (tests/test_kinematics.py,
    FIDELITY.md). A live PyBullet cross-check harness exists
    (tools/validate_pybullet.py) but pybullet is not installable in this
    sandbox, so no recorded-oracle fixture is committed.
  * IK reproduces the reference's two stabilizers *functionally*:
    rest-pose seeding (environments.py:591) and the UR5 shadow-client
    fixed-point re-solve (inverseKinematics.py:44-50) — here: DLS iterations
    with a rest-pose nullspace bias, iterated from the current configuration.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.kinetree import KineTree, REVOLUTE, PRISMATIC
from . import spatial as sp


def fk_links(tree: KineTree, q: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World pose of every reduced link. q: (n_dof,). Returns ((n,3),(n,4))."""
    pos, quat = [], []
    for i in range(tree.n_dof):
        p = tree.parent[i]
        if p < 0:
            pp, pq = tree.base_pos, tree.base_quat
        else:
            pp, pq = pos[p], quat[p]
        jp, jq = sp.transform_compose(pp, pq, tree.pre_pos[i], tree.pre_quat[i])
        if tree.jtype[i] == REVOLUTE:
            dq = sp.quat_from_axis_angle(tree.axis[i], q[i])
            jq = sp.quat_normalize(sp.quat_multiply(jq, dq))
        else:  # prismatic
            jp = jp + sp.quat_rotate(jq, tree.axis[i] * q[i])
        pos.append(jp)
        quat.append(jq)
    return jnp.stack(pos), jnp.stack(quat)


def fk_site(tree: KineTree, q: jnp.ndarray, site: int):
    """World (pos, quat) of a named site frame."""
    lp, lq = fk_links(tree, q)
    par = tree.site_parent[site]  # static int
    if par < 0:
        pp, pq = tree.base_pos, tree.base_quat
    else:
        pp, pq = lp[par], lq[par]
    return sp.transform_compose(pp, pq, tree.site_pos[site], tree.site_quat[site])


def fk_all_sites(tree: KineTree, q: jnp.ndarray):
    """World poses of all sites: ((s,3), (s,4))."""
    lp, lq = fk_links(tree, q)
    pp, pq = [], []
    for s, par in enumerate(tree.site_parent):
        a, b = (tree.base_pos, tree.base_quat) if par < 0 else (lp[par], lq[par])
        c, d = sp.transform_compose(a, b, tree.site_pos[s], tree.site_quat[s])
        pp.append(c)
        pq.append(d)
    return jnp.stack(pp), jnp.stack(pq)


def _ancestor_mask(tree: KineTree, link: int, n: int):
    mask = [False] * n
    i = link
    while i >= 0:
        mask[i] = True
        i = tree.parent[i]
    return mask


def site_pose_and_jacobian(tree: KineTree, q: jnp.ndarray, site: int):
    """(site pos, site quat, geometric Jacobian) sharing ONE fk_links sweep
    — the IK inner loop calls this instead of fk_site + jacobian_site,
    halving the sequential FK chain per iteration."""
    lp, lq = fk_links(tree, q)
    par = tree.site_parent[site]  # static int
    if par < 0:
        pp, pq = tree.base_pos, tree.base_quat
    else:
        pp, pq = lp[par], lq[par]
    xp, xq = sp.transform_compose(pp, pq, tree.site_pos[site],
                                  tree.site_quat[site])
    J = _jacobian_from_links(tree, q, lp, lq, par, xp)
    return xp, xq, J


def jacobian_site(tree: KineTree, q: jnp.ndarray, site: int) -> jnp.ndarray:
    """Geometric Jacobian (6, n_dof) of a site: rows [lin(3), ang(3)].

    Linear part maps qd -> site world velocity; angular -> world angular vel.
    """
    lp, lq = fk_links(tree, q)
    par = tree.site_parent[site]  # static int
    if par < 0:
        return jnp.zeros((6, tree.n_dof), dtype=q.dtype)
    xp, _ = sp.transform_compose(lp[par], lq[par],
                                 tree.site_pos[site], tree.site_quat[site])
    return _jacobian_from_links(tree, q, lp, lq, par, xp)


def _jacobian_from_links(tree: KineTree, q, lp, lq, par: int,
                         xp) -> jnp.ndarray:
    if par < 0:
        return jnp.zeros((6, tree.n_dof), dtype=q.dtype)
    mask = _ancestor_mask(tree, par, tree.n_dof)
    cols = []
    for i in range(tree.n_dof):
        if not mask[i]:
            cols.append(jnp.zeros(6, dtype=q.dtype))
            continue
        a_world = sp.quat_rotate(lq[i], tree.axis[i])
        if tree.jtype[i] == REVOLUTE:
            lin = jnp.cross(a_world, xp - lp[i])
            ang = a_world
        else:
            lin = a_world
            ang = jnp.zeros(3, dtype=q.dtype)
        cols.append(jnp.concatenate([lin, ang]))
    return jnp.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# damped-least-squares IK with rest-pose nullspace bias
# ---------------------------------------------------------------------------

def _orientation_error(q_cur, q_des):
    """3-vector rotation error (world frame) steering q_cur -> q_des."""
    dq = sp.quat_multiply(q_des, sp.quat_conjugate(q_cur))
    # ensure shortest path
    dq = dq * jnp.sign(dq[..., 3:4] + 1e-12)
    return 2.0 * dq[..., :3]


@partial(jax.jit, static_argnames=("site", "iters", "n_active",
                                   "damping", "null_gain"))
def ik_dls(tree: KineTree, q0: jnp.ndarray, target_pos: jnp.ndarray,
           target_quat: jnp.ndarray, rest_pose: jnp.ndarray,
           site: int = 0, iters: int = 12, n_active: int = None,
           damping: float = 0.05, null_gain: float = 0.05) -> jnp.ndarray:
    """Iterated DLS IK to (pos, quat) target at `site`.

    Only the first `n_active` DoFs move (the arm; gripper DoFs frozen) —
    mirroring the reference which IKs the arm chain only
    (environments.py:995-1001, inverseKinematics.py:44-50). The rest-pose
    nullspace bias plays the role of the reference's rest-pose seeding /
    shadow-client stabilization.
    """
    n = tree.n_dof
    if n_active is None:
        n_active = n
    active = jnp.arange(n) < n_active

    def body(q, _):
        pos, quat, J = site_pose_and_jacobian(tree, q, site)
        err = jnp.concatenate([target_pos - pos,
                               _orientation_error(quat, target_quat)])
        J = J * active[None, :]
        JJt = J @ J.T + (damping ** 2) * jnp.eye(6, dtype=q.dtype)
        dq = J.T @ jnp.linalg.solve(JJt, err)
        # nullspace pull toward rest pose
        dq_null = null_gain * (rest_pose - q) * active
        JtJinvJ = J.T @ jnp.linalg.solve(JJt, J)
        dq = dq + dq_null - JtJinvJ @ dq_null
        q = q + jnp.clip(dq, -0.5, 0.5) * active
        q = jnp.clip(q, tree.lower, tree.upper)
        return q, None

    q, _ = jax.lax.scan(body, q0, None, length=iters)
    return q
