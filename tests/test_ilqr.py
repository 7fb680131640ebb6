"""iLQR: toy-LQR convergence + env-level improvement; Adam refiner."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roboticsplayroompybullet_tpu.envs.config import CATALOG
from roboticsplayroompybullet_tpu.envs import core
from roboticsplayroompybullet_tpu import solver as sol
from roboticsplayroompybullet_tpu.solver.ilqr import (
    ilqr, ILQRConfig, _extract, _inject, _rollout_flat,
    make_flat_dynamics, make_stage_cost)


def test_ilqr_double_integrator():
    """Point mass must brake to the origin: classic LQR sanity check."""
    dt = 0.1

    def f(x, u):
        p, v = x[0], x[1]
        return jnp.stack([p + v * dt, v + u[0] * dt])

    def stage(x, u):
        return 0.1 * (x @ x) + 0.01 * (u @ u)

    def final(x):
        return 100.0 * (x @ x)

    x0 = jnp.array([1.0, 0.0])
    us0 = jnp.zeros((30, 1))
    res = jax.jit(lambda x, u: ilqr(f, stage, final, x, u,
                                    ILQRConfig(iters=15)))(x0, us0)
    _, c0 = _rollout_flat(f, stage, final, x0, us0)
    assert float(res.cost) < 0.05 * float(c0)
    assert abs(float(res.xs[-1, 0])) < 0.05     # parks near origin


def test_extract_inject_roundtrip():
    m = core.build_model(CATALOG["pandaPick-v0"])
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(1))
    x = _extract(state)
    s2 = _inject(state, x)
    np.testing.assert_array_equal(np.asarray(state.q), np.asarray(s2.q))
    np.testing.assert_array_equal(np.asarray(state.obj_quat),
                                  np.asarray(s2.obj_quat))
    # perturbation flows through
    s3 = _inject(state, x.at[0].add(0.5))
    assert float(s3.q[0]) == pytest.approx(float(state.q[0]) + 0.5)


def test_ilqr_plan_improves_reach():
    # 3 substeps instead of 12: same code path, ~4x smaller jaxpr to
    # differentiate (this test is compile-bound on CPU)
    m = core.build_model(dataclasses.replace(
        CATALOG["UR5Reach-v0"], substeps=3))
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(2))
    H = 4
    us0 = jnp.zeros((H, m.cfg.action_dim))
    f = make_flat_dynamics(m, state)
    stage, final = make_stage_cost(m, state)
    x0 = _extract(state)
    _, c0 = _rollout_flat(f, stage, final, x0, us0)
    res = jax.jit(lambda s, u: sol.ilqr_plan(m, s, u,
                                             sol.ILQRConfig(iters=4)))(
        state, us0)
    assert float(res.cost) < float(c0)
    assert np.all(np.isfinite(np.asarray(res.us)))


def test_ilqr_plan_improves_pick_contact():
    """iLQR THROUGH contact. A dead-gripper rollout can't prove anything:
    with no pad-block rows active, ∂cost/∂u is legitimately zero (the arm
    never couples to the block). So the test first SCRIPTS a pinch on the
    full 12-substep model (same approach as test_grasp_hold_endurance) —
    from the pinched state both floor rows AND pad rows are active inside
    the 16-iteration Jacobi impulse scan, and every gradient flows through
    it. Then, on the 2-substep preview model (same code path, jacrev of
    the full contact step is the heaviest jaxpr in the suite):

      * ∂cost/∂(x0, us) of the goal-only cost: finite, and ∂/∂us is
        informative (the block can only move via the contact impulses);
      * ilqr_plan strictly improves (measured 1.90 → 1.53 at 3 iters).
    """
    from roboticsplayroompybullet_tpu.ops import kinematics as K
    from roboticsplayroompybullet_tpu.ops import spatial as sp
    from roboticsplayroompybullet_tpu.solver.cost import CostWeights

    mfull = core.build_model(CATALOG["pandaPick-v0"])
    state, obs = jax.jit(lambda k: core.reset(mfull, k))(jax.random.PRNGKey(3))
    step = jax.jit(lambda s, a: core.step(mfull, s, a))
    rest = jnp.zeros(mfull.tree.n_dof, jnp.float32).at[:mfull.arm.n_arm].set(
        jnp.asarray(mfull.arm.rest_pose, jnp.float32))
    _, q0, _ = K.site_pose_and_jacobian(mfull.tree, rest, mfull.arm.ee_site)
    rpy = tuple(float(x) for x in np.asarray(sp.quat_to_euler(q0)))

    def go(st, pos, grip, n):
        a = jnp.asarray([*pos, *rpy, grip], jnp.float32)
        for _ in range(n):
            st, _, _, _ = step(st, a)
        return st

    b = np.asarray(state.obj_pos[0])
    ee0 = np.asarray(obs["controllable_achieved_goal"])[:3]
    st = go(state, (ee0[0], ee0[1], 0.15), -1.0, 20)
    st = go(st, (b[0], b[1], 0.15), -1.0, 25)
    for zt in np.arange(0.12, b[2] + 0.005, -0.03):
        st = go(st, (b[0], b[1], zt), -1.0, 8)
    st = go(st, (b[0], b[1], b[2] + 0.008), -1.0, 20)
    st = go(st, (b[0], b[1], b[2] + 0.008), 1.0, 15)         # pinch

    m = core.build_model(dataclasses.replace(
        CATALOG["pandaPick-v0"], substeps=2))
    H = 3
    hold = jnp.asarray([b[0], b[1], b[2] + 0.10, *rpy, 1.0], jnp.float32)
    us0 = jnp.tile(hold[None], (H, 1))
    w = CostWeights(action=0.0)                # goal cost ONLY: no trivial
    f = make_flat_dynamics(m, st)              # action-penalty gradient
    stage, final = make_stage_cost(m, st, w)
    x0 = _extract(st)
    _, c0 = _rollout_flat(f, stage, final, x0, us0)

    gx, gu = jax.jit(jax.grad(
        lambda x, u: _rollout_flat(f, stage, final, x, u)[1],
        argnums=(0, 1)))(x0, us0)
    gx, gu = np.asarray(gx), np.asarray(gu)
    assert np.all(np.isfinite(gx)), "NaN/inf d cost/d x0 through contact"
    assert np.all(np.isfinite(gu)), "NaN/inf d cost/d us through contact"
    assert np.abs(gu).max() > 1e-3, "dead action gradient through contact"
    assert np.count_nonzero(gx) > 0, "dead state gradient through contact"

    res = jax.jit(lambda s, u: sol.ilqr_plan(m, s, u,
                                             sol.ILQRConfig(iters=3), w))(
        st, us0)
    assert np.all(np.isfinite(np.asarray(res.us)))
    assert np.all(np.isfinite(np.asarray(res.cost_trace)))
    assert float(res.cost) < 0.95 * float(c0)  # strict improvement


def test_gradient_refine_improves_reach():
    m = core.build_model(dataclasses.replace(
        CATALOG["UR5Reach-v0"], substeps=3))
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(5))
    us0 = jnp.zeros((4, m.cfg.action_dim))
    cfg = sol.GradConfig(iters=12, lr=0.1)
    a, trace = jax.jit(lambda s, u: sol.refine(m, s, u, cfg))(state, us0)
    assert float(trace[-1]) < float(trace[0])
