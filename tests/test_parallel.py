"""Sharding tests: vmap/shard_map equivalence over the 8-device CPU mesh.

Strategy per SURVEY.md §4: batched == loop-of-unbatched, sharded ==
unsharded, on the cheapest env (UR5Reach: no objects/contact)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roboticsplayroompybullet_tpu.envs.config import CATALOG
from roboticsplayroompybullet_tpu.envs import core
from roboticsplayroompybullet_tpu import parallel as par
from roboticsplayroompybullet_tpu.parallel import rollout as R


@pytest.fixture(scope="module")
def model():
    return core.build_model(CATALOG["UR5Reach-v0"])


@pytest.fixture(scope="module")
def batch(model):
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states, obs = jax.jit(lambda k: R.batched_reset(model, k))(keys)
    return states, obs


def test_mesh_shapes():
    mesh = par.make_mesh()
    assert par.mesh_size(mesh) == 8
    assert mesh.axis_names == ("env",)
    mesh2 = par.make_mesh(n_hosts=2)
    assert mesh2.axis_names == ("dcn", "env")
    assert dict(mesh2.shape) == {"dcn": 2, "env": 4}


def test_batched_step_matches_loop(model, batch):
    states, _ = batch
    acts = jax.random.uniform(jax.random.PRNGKey(1),
                              (8, model.cfg.action_dim), jnp.float32,
                              -0.2, 0.2)
    s2, obs, r, _ = jax.jit(
        lambda s, a: R.batched_step(model, s, a))(states, acts)
    step1 = jax.jit(lambda s, a: core.step(model, s, a))
    for i in [0, 3, 7]:
        si = jax.tree.map(lambda x: x[i], states)
        s2i, obsi, ri, _ = step1(si, acts[i])
        np.testing.assert_allclose(np.asarray(s2.q[i]), np.asarray(s2i.q),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(float(r[i]), float(ri), atol=1e-5)


def test_sharded_rollout_matches_unsharded(model, batch):
    states, _ = batch
    H = 3
    acts = jax.random.uniform(jax.random.PRNGKey(2),
                              (8, H, model.cfg.action_dim), jnp.float32,
                              -0.2, 0.2)
    ref_fin, ref_rs, ref_ags = jax.jit(
        lambda s, a: R.batched_rollout(model, s, a))(states, acts)

    mesh = par.make_mesh()
    sh_states = par.shard_batch(states, mesh)
    sh_acts = par.shard_batch(acts, mesh)
    fin, rs, ags = par.make_sharded_rollout(model, mesh)(sh_states, sh_acts)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(ref_rs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ags), np.asarray(ref_ags),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fin.q), np.asarray(ref_fin.q),
                               atol=1e-5)


def test_sharded_step_runs_on_2d_mesh(model, batch):
    states, _ = batch
    mesh = par.make_mesh(n_hosts=2)
    sh_states = par.shard_batch(states, mesh)
    acts = par.shard_batch(
        jnp.zeros((8, model.cfg.action_dim), jnp.float32), mesh)
    s2, obs, r, _ = par.make_sharded_step(model, mesh)(sh_states, acts)
    assert np.all(np.isfinite(np.asarray(r)))


def test_success_rate_reduction():
    rewards = jnp.array([0.0, -1.0, -1.0, 0.0])
    assert float(par.success_rate(rewards)) == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# sharded FUSED path: the flagship Pallas kernel under shard_map
# ---------------------------------------------------------------------------

def test_sharded_fused_rollout_matches_unsharded():
    """The whole-horizon Pallas rollout kernel (interpret mode on CPU)
    sharded over the 8-device mesh == the unsharded kernel. This is the
    flagship perf path running inside the multi-chip program (reduced
    substeps/iters: identical code path, CI-sized — see test_fused.py)."""
    m = core.build_model(CATALOG["pandaPick-v0"])
    B, H = 1024, 2
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states, _ = jax.jit(lambda k: R.batched_reset(m, k))(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(4),
                              (B, H, m.cfg.action_dim), jnp.float32,
                              -0.3, 0.3)
    kw = dict(block_envs=128, interpret=True, n_substeps=2,
              ik_iters=2, solve_iters=4, backend="pallas")
    ref_fin, ref_rs, ref_ags = jax.jit(
        par.make_fused_rollout_whole(m, H, **kw))(states, acts)

    mesh = par.make_mesh()
    sh_states = par.shard_batch(states, mesh)
    sh_acts = par.shard_batch(acts, mesh)
    fin, rs, ags = par.make_sharded_fused_rollout(m, mesh, H, **kw)(
        sh_states, sh_acts)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(ref_rs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ags), np.asarray(ref_ags),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fin.q), np.asarray(ref_fin.q),
                               atol=1e-5)


def test_sharded_fused_rollout_reference_backend_2d_mesh():
    """CPU fallback backend ("reference": the plain-jnp lane twin) through
    the same shard_map wrapper on the 2-D ("dcn", "env") mesh."""
    m = core.build_model(CATALOG["pandaPick-v0"])
    B, H = 256, 2
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    states, _ = jax.jit(lambda k: R.batched_reset(m, k))(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(6),
                              (B, H, m.cfg.action_dim), jnp.float32,
                              -0.3, 0.3)
    # 2-D ("dcn","env") 2×1 mesh: per-shard B=128 (must be a multiple of
    # the 128-lane width)
    mesh = par.make_mesh(n_hosts=2, n_devices=2)
    sh_states = par.shard_batch(states, mesh)
    sh_acts = par.shard_batch(acts, mesh)
    fin, rs, ags = par.make_sharded_fused_rollout(
        m, mesh, H, block_envs=128, n_substeps=2, ik_iters=2,
        solve_iters=4, backend="reference")(sh_states, sh_acts)
    assert np.all(np.isfinite(np.asarray(rs)))
    assert np.all(np.isfinite(np.asarray(ags)))


def test_sharded_fused_planner_improves_cost():
    """Population-sharded fused planner (reference backend on CPU): runs
    over the full 8-device mesh with psum/pmin reductions and returns a
    finite best cost + a plan whose replan actually moved the mean."""
    from roboticsplayroompybullet_tpu import solver as sol

    m = core.build_model(CATALOG["pandaPick-v0"])
    mesh = par.make_mesh()
    cfg = sol.MPCConfig(horizon=2, pop=1024, iters=1, algorithm="mppi",
                        preview_ik_iters=2, preview_solve_iters=4)
    # n_substeps=2: identical code path, CI-sized jaxpr (see test_fused.py)
    planner = sol.make_sharded_fused_planner(m, cfg, mesh, block_envs=128,
                                             backend="reference",
                                             n_substeps=2)
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(7))
    plan0 = sol.init_plan(m, cfg)
    plan1, best = planner(state, plan0, jax.random.PRNGKey(8))
    assert np.isfinite(float(best))
    assert plan1.mean.shape == plan0.mean.shape
    assert float(jnp.abs(plan1.mean - plan0.mean).max()) > 0.0
