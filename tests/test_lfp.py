"""LfP consumer: window relabelling, aligned sampling, BC loss descent."""
import numpy as np
import jax
import pytest

from roboticsplayroompybullet_tpu.utils.episodelog import (
    EpisodeWriter, EpisodeReader)
from roboticsplayroompybullet_tpu.learn import lfp

pytestmark = pytest.mark.smoke

FIELDS = {"obs_quat": 6, "action": 2, "achieved_goal": 3}


def _make_log(path, n_eps=4, T=30, seed=0):
    """Synthetic log with the COLLECTOR's row semantics
    (tools/collect_play.py): row t is (obs_t, a_t) where obs_t is the
    state AFTER a_t executed — so the action a demonstrator took FROM
    obs_{t-1} is a_t, i.e. the learnable relation sits across rows:
    act[t] = f(obs[t-1], ag[t-1])."""
    rng = np.random.default_rng(seed)
    with EpisodeWriter(path, FIELDS) as w:
        for _ in range(n_eps):
            w.begin_episode()
            obs = rng.normal(size=(T, 6)).astype(np.float32)
            ag = np.cumsum(rng.normal(size=(T, 3)) * 0.1,
                           axis=0).astype(np.float32)
            act = np.zeros((T, 2), np.float32)
            act[1:] = obs[:-1, :2] * 0.5 + ag[:-1, :2]
            w.append_batch({"obs_quat": obs, "action": act,
                            "achieved_goal": ag})
            w.end_episode()


def test_relabel_windows_shapes_and_goal():
    B, W = 3, 5
    obs = np.zeros((B, W, 4), np.float32)
    act = np.zeros((B, W, 2), np.float32)
    ag = np.arange(B * W * 3, dtype=np.float32).reshape(B, W, 3)
    batch = lfp.relabel_windows(obs, act, ag)
    assert batch["obs"].shape == (B * W, 4)
    assert batch["act"].shape == (B * W, 2)
    # every step of window b carries that window's FINAL ag as goal
    for b in range(B):
        np.testing.assert_array_equal(
            batch["goal"][b * W:(b + 1) * W],
            np.tile(ag[b, -1], (W, 1)))


def test_sample_lfp_batch_aligned(tmp_path):
    p = str(tmp_path / "play.elog")
    _make_log(p)
    with EpisodeReader(p, fields=list(FIELDS)) as r:
        batch = lfp.sample_lfp_batch(r, np.random.default_rng(1),
                                     batch=8, window=6)
    assert batch["obs"].shape == (48, 6)
    assert batch["act"].shape == (48, 2)
    assert batch["goal"].shape == (48, 3)
    # alignment: the sampler pairs obs row t with action row t+1 (the
    # action taken FROM that obs, see sample_lfp_batch docstring). At the
    # window's final step the relabelled goal IS that row's ag, so
    # act_w[-1] = obs_w[-1]*0.5 + goal — holds only if windows are drawn
    # from one (ep, t0) AND the one-row action shift is applied.
    a_last = batch["act"].reshape(8, 6, 2)[:, -1]
    o_last = batch["obs"].reshape(8, 6, 2 * 3)[:, -1][:, :2]
    g = batch["goal"].reshape(8, 6, 3)[:, -1][:, :2]
    np.testing.assert_allclose(a_last, o_last * 0.5 + g, atol=1e-5)


def test_memory_sampler_matches_reader_semantics(tmp_path):
    """The vectorized in-RAM sampler must keep the (obs_t, a_{t+1})
    alignment of sample_lfp_batch (same synthetic-log invariant as
    test_sample_lfp_batch_aligned)."""
    p = str(tmp_path / "play3.elog")
    _make_log(p)
    with EpisodeReader(p, fields=list(FIELDS)) as r:
        sampler = lfp.make_memory_sampler(r, fields=tuple(FIELDS))
    batch = sampler(np.random.default_rng(1), 8, 6)
    assert batch["obs"].shape == (48, 6)
    a_last = batch["act"].reshape(8, 6, 2)[:, -1]
    o_last = batch["obs"].reshape(8, 6, 6)[:, -1][:, :2]
    g = batch["goal"].reshape(8, 6, 3)[:, -1][:, :2]
    np.testing.assert_allclose(a_last, o_last * 0.5 + g, atol=1e-5)


def test_play_actor_structured_actions():
    """The play actor's absolute-rpy actions stay inside the workspace
    box + orientation wander bounds (learn/play_policy.py) — the property
    the r4 raw-box AR(1) collector violated (targets saturating ±6)."""
    import jax.numpy as jnp
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.learn import play_policy

    m = core.build_model(CATALOG["UR5PlayAbsRPY1Obj-v0"])
    acfg = play_policy.default_actor_config(m)
    a_init, a_step = play_policy.make_play_actor(m, acfg)

    def roll(key):
        st = a_init(key, 32)

        def body(carry, k):
            st, _ = carry, None
            st2, acts = a_step(carry, k)
            return st2, acts

        _, acts = jax.lax.scan(body, st, jax.random.split(key, 50))
        return acts                                     # (50, 32, 7)

    acts = np.asarray(jax.jit(roll)(jax.random.PRNGKey(0)))
    lo = np.asarray(acfg.box_lo) - 1e-5
    hi = np.asarray(acfg.box_hi) + 1e-5
    assert (acts[..., 0:3] >= lo).all() and (acts[..., 0:3] <= hi).all()
    rpy0 = np.asarray(acfg.rpy0)
    wander = np.abs(acts[..., 3:6] - rpy0)
    assert wander[..., :2].max() <= acfg.rpy_clip + 1e-5
    assert wander[..., 2].max() <= acfg.yaw_clip + 1e-5
    assert np.abs(acts[..., 6]).max() <= 1.0 + 1e-5


def test_bc_training_loss_decreases(tmp_path):
    pytest.importorskip("flax")
    p = str(tmp_path / "play2.elog")
    _make_log(p, n_eps=6, T=40, seed=2)
    policy, params, tx, opt_state = lfp.init_training(
        jax.random.PRNGKey(0), obs_dim=6, goal_dim=3, action_dim=2,
        action_high=(1.5, 1.5), hidden=(64, 64))
    step = jax.jit(lfp.make_train_step(policy, tx))
    rng = np.random.default_rng(3)
    losses = []
    with EpisodeReader(p, fields=list(FIELDS)) as r:
        for i in range(60):
            batch = lfp.sample_lfp_batch(r, rng, batch=16, window=8)
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
