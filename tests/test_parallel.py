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
