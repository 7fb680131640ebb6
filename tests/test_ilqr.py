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
    """iLQR THROUGH contact: pandaPick starts with the block resting on
    the floor (active floor rows in the 16-iteration impulse scan), so the
    backward pass differentiates the Jacobi solve. Gradients must stay
    finite and informative; the plan must not regress.

    2 substeps (same code path, compile-bound CPU) — jacrev of the full
    contact step is the heaviest jaxpr in the suite."""
    m = core.build_model(dataclasses.replace(
        CATALOG["pandaPick-v0"], substeps=2))
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(7))
    H = 3
    us0 = jnp.zeros((H, m.cfg.action_dim))
    f = make_flat_dynamics(m, state)
    stage, final = make_stage_cost(m, state)
    x0 = _extract(state)
    _, c0 = _rollout_flat(f, stage, final, x0, us0)

    # raw gradient through the impulse solve: finite and nonzero
    g = jax.jit(jax.grad(
        lambda u: _rollout_flat(f, stage, final, x0, u)[1]))(us0)
    g = np.asarray(g)
    assert np.all(np.isfinite(g)), "NaN/inf gradient through contact solve"
    assert np.abs(g).max() > 0.0, "dead gradient through contact solve"

    res = jax.jit(lambda s, u: sol.ilqr_plan(m, s, u,
                                             sol.ILQRConfig(iters=3)))(
        state, us0)
    assert np.all(np.isfinite(np.asarray(res.us)))
    assert np.all(np.isfinite(np.asarray(res.cost_trace)))
    assert float(res.cost) <= float(c0) + 1e-6
    assert float(res.cost) < float(c0)      # strictly improves from zeros


def test_gradient_refine_improves_reach():
    m = core.build_model(dataclasses.replace(
        CATALOG["UR5Reach-v0"], substeps=3))
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(5))
    us0 = jnp.zeros((4, m.cfg.action_dim))
    cfg = sol.GradConfig(iters=12, lr=0.1)
    a, trace = jax.jit(lambda s, u: sol.refine(m, s, u, cfg))(state, us0)
    assert float(trace[-1]) < float(trace[0])
