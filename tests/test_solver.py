"""MPC solver tests: cost sanity, planner improvement, sharded == invariant
properties (8-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roboticsplayroompybullet_tpu.envs.config import CATALOG
from roboticsplayroompybullet_tpu.envs import core
from roboticsplayroompybullet_tpu.envs.obs import achieved_goal
from roboticsplayroompybullet_tpu import parallel as par
from roboticsplayroompybullet_tpu import solver as sol
from roboticsplayroompybullet_tpu.parallel.rollout import rollout as rollout_fn
from roboticsplayroompybullet_tpu.solver.cost import trajectory_cost


@pytest.fixture(scope="module")
def model():
    return core.build_model(CATALOG["UR5Reach-v0"])


@pytest.fixture(scope="module")
def state0(model):
    state, _ = jax.jit(lambda k: core.reset(model, k))(jax.random.PRNGKey(3))
    return state


def test_goal_distance_zero_at_goal(model):
    g = jnp.array([0.1, 0.2, 0.3])
    assert float(sol.goal_distance(model.cfg, g, g)) == pytest.approx(0.0)


def test_goal_distance_play_layout():
    cfg = CATALOG["UR5PlayAbsRPY1Obj-v0"]
    ag = jnp.concatenate([jnp.array([0.1, 0.0, 0.0]),
                          jnp.array([0.0, 0.0, 0.0, 1.0]),
                          jnp.zeros(4)])
    g = ag.at[0].add(0.2)
    d = float(sol.goal_distance(cfg, ag, g))
    # abs tol covers the intentional arccos clip at 1-1e-6 (rot term ~3e-4)
    assert d == pytest.approx(0.2, abs=1e-3)


def test_plan_improves_over_zero_action(model, state0):
    mpc = sol.MPCConfig(horizon=4, pop=32, iters=3, algorithm="mppi",
                        sigma_init=0.3)
    pl0 = sol.init_plan(model, mpc)

    def cost_of(mean):
        _, _, ags = rollout_fn(model, state0, mean)
        return trajectory_cost(model.cfg, ags, state0.goal, mean,
                               mpc.weights)

    c_zero = float(jax.jit(cost_of)(pl0.mean))
    planner = jax.jit(lambda s, p, k: sol.plan(model, mpc, s, p, k))
    pl1, best = planner(state0, pl0, jax.random.PRNGKey(4))
    c_planned = float(jax.jit(cost_of)(pl1.mean))
    assert float(best) <= c_zero + 1e-5      # warm-start candidate bounds it
    assert c_planned < c_zero                 # the plan actually helps


@pytest.mark.parametrize("algo", ["mppi", "cem"])
def test_sharded_planner_runs_and_bounds(model, state0, algo):
    mesh = par.make_mesh()
    mpc = sol.MPCConfig(horizon=3, pop=16, iters=2, algorithm=algo)
    planner = sol.make_sharded_planner(model, mpc, mesh)
    pl, best = planner(state0, sol.init_plan(model, mpc),
                       jax.random.PRNGKey(5))
    high = np.asarray(model.cfg.action_high)
    assert np.all(np.isfinite(np.asarray(pl.mean)))
    assert np.all(np.abs(np.asarray(pl.mean)) <= high[None] + 1e-5)
    assert np.isfinite(float(best))


def test_mpc_rollout_reach_makes_progress(model, state0):
    """Receding-horizon MPPI on UR5Reach should shrink EE-goal distance."""
    mpc = sol.MPCConfig(horizon=5, pop=64, iters=2, algorithm="mppi",
                        sigma_init=0.35)
    d0 = float(sol.goal_distance(
        model.cfg, achieved_goal(model.cfg, model.tree, model.arm, state0),
        state0.goal))
    # 14 steps: the pad-floor contact added in the arm-coupled solve makes
    # low-goal approaches slower (physically: the gripper now rests on the
    # plane instead of clipping through), and this tiny search budget
    # (pop=64, 2 iters) needs the extra horizon to clear 25% progress
    run = jax.jit(lambda s, k: sol.mpc_rollout(model, mpc, s, k, 14))
    final, acts, rs, bests = run(state0, jax.random.PRNGKey(6))
    d1 = float(sol.goal_distance(
        model.cfg, achieved_goal(model.cfg, model.tree, model.arm, final),
        final.goal))
    assert d1 < d0 * 0.75, (d0, d1)
