"""Fused lane-physics kernel vs the vmap oracle (envs/physics.py).

The lane program must reproduce the vmap pipeline to float rounding on
every env family: no-contact (UR5Reach), gripper+block (pandaPick), and
the small-but-complete play scene exercised here via pandaPlay's panda
arm. The full UR5 playroom equivalence is covered by the (slow) script in
tools/check_fused.py; here we keep CI-sized cases.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roboticsplayroompybullet_tpu.envs.config import CATALOG
from roboticsplayroompybullet_tpu.envs import core, physics
from roboticsplayroompybullet_tpu.ops import fused_step as fs
from roboticsplayroompybullet_tpu.parallel import rollout as R

B = 128


def _setup(env_id, seed=0, substeps=None):
    cfg = CATALOG[env_id]
    if substeps is not None:
        cfg = dataclasses.replace(cfg, substeps=substeps)
    m = core.build_model(cfg)
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    states, _ = jax.jit(lambda k: R.batched_reset(m, k))(keys)
    states = states.replace(
        qd=jax.random.normal(jax.random.PRNGKey(1), states.qd.shape) * 0.3,
        grip=jax.random.uniform(jax.random.PRNGKey(2), states.grip.shape))
    return m, states


def _compare_sim(m, states, atol, n_substeps=3):
    # 3 substeps, not 12: identical code path, ~4x smaller jaxprs to
    # compile (1-core CI box); 12-substep equivalence runs on real TPU
    # via tools/check_fused.py
    ref = jax.jit(jax.vmap(lambda s: physics.run_simulation(
        m.cfg, m.tree, m.arm, m.scene, s,
        n_substeps=n_substeps)))(states)
    X = fs.pack_state(m.cfg, m.tree, states)
    sim = fs.make_reference_sim(m.cfg, m.tree, m.arm, m.scene,
                                n_substeps=n_substeps)
    X2 = jax.jit(sim)(X, states.ctrl_q.T.astype(jnp.float32),
                      states.grip.astype(jnp.float32))
    lane = fs.unpack_state(m.cfg, m.tree, X2, states)
    for f in ["q", "qd", "obj_pos", "obj_quat", "obj_vel", "obj_angvel",
              "art_q", "art_qd"]:
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(lane, f))
        if a.size:
            np.testing.assert_allclose(b, a, atol=atol, err_msg=f)


def test_fused_sim_matches_reach():
    m, states = _setup("UR5Reach-v0")
    _compare_sim(m, states, atol=1e-4)


def test_fused_sim_matches_pick():
    m, states = _setup("pandaPick-v0")
    _compare_sim(m, states, atol=1e-4)


@pytest.mark.parametrize("env_id", [
    # one env per action decode mode (environments.py:936-1007), arms
    # alternated so both IK budgets (Panda 16 / UR5 24 iters) are hit;
    # relative_quat pins the componentwise quat-add quirk
    # (environments.py:951 ↔ envs/core.py:101 ↔ fused_step.py lane twin)
    "pandaPlayAbsRPY1Obj-v0",     # absolute_rpy
    "UR5PlayRelRPY1Obj-v0",       # relative_rpy
    "pandaPlay1Obj-v0",           # absolute_quat
    "UR5PlayRel1Obj-v0",          # relative_quat
    "pandaPlayRelJoints1Obj-v0",  # relative_joints
    "UR5PlayAbsJoints1Obj-v0",    # absolute_joints
])
def test_fused_control_matches(env_id):
    """Lane control (decode + IK) vs envs/core.control, all 6 modes."""
    m, states = _setup(env_id)
    acts = jax.random.uniform(jax.random.PRNGKey(3),
                              (B, m.cfg.action_dim), jnp.float32, -0.5, 0.5)
    high = jnp.asarray(m.cfg.action_high, jnp.float32)
    clipped = jnp.clip(acts, -high, high)
    ref_t, ref_g, _ = jax.jit(jax.vmap(
        lambda s, a: core.control(m, s, a)))(states, clipped)
    ctrl = fs.make_lane_control(m.cfg, m.tree, m.arm)
    q_l = states.q.T.reshape(m.tree.n_dof, B // 128, 128)
    a_l = acts.T.reshape(m.cfg.action_dim, B // 128, 128)
    t_l, g_l = jax.jit(ctrl)(q_l, a_l)
    t_l = t_l.reshape(m.arm.n_arm, B).T
    g_l = g_l.reshape(B)
    d = np.abs(np.asarray(t_l) - np.asarray(ref_t))
    # iterated DLS IK: Cholesky (lane) vs LU (oracle) rounding can land a
    # few solves on marginally different fixed points — quantile bound
    assert np.quantile(d, 0.99) < 1e-3, np.quantile(d, 0.99)
    assert d.max() < 0.1, d.max()
    np.testing.assert_allclose(np.asarray(g_l), np.asarray(ref_g),
                               atol=1e-6)


def test_fused_full_step_matches():
    """Whole-step kernel body (control + sim) vs core.step_physics_only."""
    m, states = _setup("pandaPick-v0", seed=5, substeps=3)
    acts = jax.random.uniform(jax.random.PRNGKey(6),
                              (B, m.cfg.action_dim), jnp.float32, -0.3, 0.3)
    ref = jax.jit(jax.vmap(
        lambda s, a: core.step_physics_only(m, s, a)))(states, acts)
    step = fs.make_reference_step(m.cfg, m.tree, m.arm, m.scene)
    X = fs.pack_state(m.cfg, m.tree, states)
    X2 = jax.jit(step)(X, acts.T.astype(jnp.float32))
    lane = fs.unpack_state(m.cfg, m.tree, X2, states)
    for f in ["q", "obj_pos", "obj_quat"]:
        np.testing.assert_allclose(np.asarray(getattr(lane, f)),
                                   np.asarray(getattr(ref, f)),
                                   atol=5e-4, err_msg=f)
    # qd: IK fixed-point variance (see test_fused_control_matches) is
    # amplified by the servo gain — bound the tail, not the max
    d = np.abs(np.asarray(lane.qd) - np.asarray(ref.qd))
    assert np.quantile(d, 0.999) < 5e-4, np.quantile(d, 0.999)
    assert d.max() < 5e-3, d.max()


def test_pallas_interpret_matches_reference():
    """pallas_call(interpret=True) == the plain-jnp twin (tiny case).

    2 substeps instead of 12: identical code path, ~6x less interpreter
    time (this CI box is 1 CPU core; full fidelity is covered on real TPU
    by tools/check_fused.py)."""
    m, states = _setup("UR5Reach-v0", seed=7)
    X = fs.pack_state(m.cfg, m.tree, states)
    ctrl = states.ctrl_q.T.astype(jnp.float32)
    grip = states.grip.astype(jnp.float32)
    ref = jax.jit(fs.make_reference_sim(m.cfg, m.tree, m.arm, m.scene,
                                        n_substeps=2,
                                        block_envs=128))(X, ctrl, grip)
    pal = fs.make_pallas_sim(m.cfg, m.tree, m.arm, m.scene, n_substeps=2,
                             block_envs=128, interpret=True)(X, ctrl, grip)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)


def test_pallas_rollout_interpret_matches_stepwise():
    """Whole-horizon kernel == H applications of the step kernel (both
    interpret mode, tiny case; reduced substeps/iters — see above)."""
    m, states = _setup("pandaPick-v0", seed=9)
    H = 2
    X = fs.pack_state(m.cfg, m.tree, states)
    acts = jax.random.uniform(jax.random.PRNGKey(10),
                              (H, m.cfg.action_dim, B), jnp.float32,
                              -0.3, 0.3)
    kw = dict(block_envs=128, interpret=True, n_substeps=2,
              ik_iters=2, solve_iters=4)
    stepk = fs.make_pallas_step(m.cfg, m.tree, m.arm, m.scene, **kw)
    Xs = X
    for h in range(H):
        Xs = stepk(Xs, acts[h])
    roll = fs.make_pallas_rollout(m.cfg, m.tree, m.arm, m.scene, H, **kw)
    Xr, ags = roll(X, acts)
    np.testing.assert_allclose(np.asarray(Xr), np.asarray(Xs), atol=1e-5)
    ag_dim = (7 if m.cfg.use_orientation else 3) * m.cfg.num_objects
    assert ags.shape == (H, ag_dim, B)   # pick env: obj pos


def test_sphere_box_interior_normal():
    """A sphere center fully INSIDE a box must get a unit min-axis normal,
    not a zero vector (zero normals made the impulse solver silently
    no-op: a gripper pad sunk into the playroom button pressed nothing).
    Covers both twins: contact.sphere_aabox and lane_sphere_aabox."""
    from roboticsplayroompybullet_tpu.ops import contact as ct

    center = jnp.array([0.006, 0.003, -0.003], jnp.float32)
    half = jnp.array([0.02, 0.02, 0.005], jnp.float32)
    cs = ct.sphere_aabox(center, 0.008, jnp.zeros(3), half)
    n = np.asarray(cs.normal)
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-6)
    np.testing.assert_allclose(n, [0.0, 0.0, -1.0], atol=1e-6)  # min gap: z
    assert float(cs.depth) == pytest.approx(0.008 + 0.002, abs=1e-6)

    # lane twin (lanes trailing axis)
    c_l = center[:, None]
    p, n_l, d = fs.lane_sphere_aabox(c_l, 0.008, np.zeros((3, 1), np.float32),
                                     np.asarray(half)[:, None])
    np.testing.assert_allclose(np.asarray(n_l)[:, 0], [0.0, 0.0, -1.0],
                               atol=1e-6)
    np.testing.assert_allclose(float(d[0]), 0.008 + 0.002, atol=1e-6)


def test_fused_reach_ag_matches_vmap():
    """Reach envs ride the fused path too: the lane-FK ee-position
    achieved goal (ag) of the fused whole-horizon rollout matches the
    vmap oracle's FK ag, so make_fused_planner covers all 19 envs."""
    from roboticsplayroompybullet_tpu.parallel import fused as F

    m, states = _setup("UR5Reach-v0", seed=11, substeps=3)
    H = 2
    acts = jax.random.uniform(jax.random.PRNGKey(12),
                              (B, H, m.cfg.action_dim), jnp.float32,
                              -0.3, 0.3)
    assert F.supports_fused(m)
    ref_fin, ref_rs, ref_ags = jax.jit(
        lambda s, a: R.batched_rollout(m, s, a))(states, acts)
    roll = jax.jit(F.make_fused_rollout_whole(m, H, block_envs=128,
                                              backend="reference"))
    fin, rs, ags = roll(states, acts)
    d = np.abs(np.asarray(ags) - np.asarray(ref_ags))
    # IK fixed-point variance (see test_fused_control_matches): bound the
    # tail tightly, allow isolated branch flips at the max
    assert np.quantile(d, 0.99) < 1e-3, np.quantile(d, 0.99)
    assert d.max() < 0.05, d.max()
    assert np.mean(np.abs(np.asarray(rs) - np.asarray(ref_rs))) < 0.02


def test_fused_sim_matches_two_object_play():
    """2-object complex scene (pandaPlay-v0): block-block contact rows +
    full articulation in the lane program vs the vmap oracle."""
    m, states = _setup("pandaPlay-v0")
    _compare_sim(m, states, atol=1e-4)
