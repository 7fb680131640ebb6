"""Ray-cast gripper proprioception (reference environments.py:720-743).

The reference casts a Bullet ray from the ee/wrist midpoint to just past
the inter-pad midpoint; obs.py mirrors that segment against the analytic
colliders. Key geometry case: a block ON the segment but OFF-center from
the inter-pad midpoint must trip the ray (the old midpoint-in-box
heuristic missed exactly this)."""
import jax
import jax.numpy as jnp
import numpy as np

from roboticsplayroompybullet_tpu.envs.config import CATALOG
from roboticsplayroompybullet_tpu.envs import core, obs
from roboticsplayroompybullet_tpu.ops import dynamics as dyn
from roboticsplayroompybullet_tpu.ops import spatial as sp


def _segment(m, state):
    """Replicate the obs.py ray endpoints from the same kinematics."""
    kin = dyn.fk_vel(m.tree, state.q, state.qd)
    centers = []
    for site, off, _r in m.arm.pad_spheres:
        par = m.tree.site_parent[site]
        spos, squat = sp.transform_compose(
            kin.pos[par], kin.quat[par],
            m.tree.site_pos[site], m.tree.site_quat[site])
        centers.append(spos + sp.quat_rotate(squat,
                                             jnp.asarray(off, jnp.float32)))
    avg_pad = jnp.mean(jnp.stack(centers), axis=0)
    ee_pos, _, _, _ = obs.ee_state(m.tree, m.arm, kin)
    wrist = int(m.tree.parent[m.tree.site_parent[m.arm.ee_site]])
    wrist_pos = kin.pos[wrist]
    p1 = ee_pos - (ee_pos - wrist_pos) * 0.5
    p2 = avg_pad + (ee_pos - wrist_pos) * 0.2
    return np.asarray(p1), np.asarray(p2), np.asarray(avg_pad)


def _prop(m, state):
    o = jax.jit(lambda s: obs.calc_obs(m.cfg, m.tree, m.arm, m.scene, s))(
        state)
    return float(o["gripper_proprioception"])


def test_offcenter_block_on_ray_trips():
    """Block centered on the segment but > block_half away from the
    inter-pad midpoint: ray hit (the midpoint heuristic would say 0)."""
    m = core.build_model(CATALOG["UR5PlayAbsRPY1Obj-v0"])
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(0))
    p1, p2, avg_pad = _segment(m, state)
    # point 25% along the segment from p1 — far from avg_pad (≈ p2)
    c = p1 + 0.25 * (p2 - p1)
    assert np.linalg.norm(c - avg_pad) > float(
        np.max(np.asarray(m.scene.block_half))) + 0.01, \
        "test geometry must be outside the old midpoint heuristic's box"
    st = state.replace(
        obj_pos=state.obj_pos.at[0].set(jnp.asarray(c)),
        obj_quat=state.obj_quat.at[0].set(
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)))
    assert _prop(m, st) == 1.0


def test_empty_gripper_reads_zero():
    """Block far away → nothing between the prongs (pads themselves are
    never tested, mirroring the reference's link-18/20 exclusion)."""
    m = core.build_model(CATALOG["UR5PlayAbsRPY1Obj-v0"])
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(0))
    far = jnp.array([5.0, 5.0, 5.0], jnp.float32)
    st = state.replace(obj_pos=state.obj_pos.at[0].set(far))
    assert _prop(m, st) == 0.0


def test_panda_reads_minus_one():
    m = core.build_model(CATALOG["pandaPlayAbsRPY1Obj-v0"])
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(1))
    assert _prop(m, state) == -1.0
