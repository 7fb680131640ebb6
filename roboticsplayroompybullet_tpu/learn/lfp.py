"""Learning-from-play consumer: goal-conditioned BC over play windows.

The reference exists to produce teleoperated play data for the author's
`learning_from_play` project (reference README.md:2-10): episodes are
replayed as random windows whose FINAL achieved goal relabels the window
as a goal-conditioned demonstration. This module is the TPU-native
consumer of that pipeline: it reads the native episode log
(utils/episodelog.py), performs hindsight window relabelling, and trains
a goal-conditioned policy π(a | obs, goal) with flax/optax — batched,
jitted, shardable over the batch axis like everything else here.

No claim of matching the upstream LfP architecture (a seq2seq CVAE); the
deliverable is the data path: log → windows → relabel → train step.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    import optax
    _HAVE_FLAX = True
except ImportError:           # pragma: no cover - flax is baked in
    _HAVE_FLAX = False


# --------------------------------------------------------------------------
# hindsight window relabelling (the LfP batch construction)
# --------------------------------------------------------------------------

def relabel_windows(obs_w: np.ndarray, act_w: np.ndarray,
                    ag_w: np.ndarray) -> Dict[str, np.ndarray]:
    """(B, W, ·) windows → flat training batch with hindsight goals.

    Every step of a window is conditioned on the window's FINAL achieved
    goal — play data needs no reward or task labels, the future IS the
    goal (LfP relabelling; the reference's play envs expose exactly the
    achieved_goal layout this consumes, environments.py:804-839).
    """
    B, W, _ = obs_w.shape
    goal = np.repeat(ag_w[:, -1:, :], W, axis=1)        # (B, W, ag)
    return {
        "obs": obs_w.reshape(B * W, -1).astype(np.float32),
        "goal": goal.reshape(B * W, -1).astype(np.float32),
        "act": act_w.reshape(B * W, -1).astype(np.float32),
    }


def sample_lfp_batch(reader, rng: np.random.Generator, batch: int,
                     window: int,
                     fields: Tuple[str, str, str] = ("obs_quat", "action",
                                                     "achieved_goal"),
                     ) -> Dict[str, np.ndarray]:
    """Draw aligned windows of (obs, act, ag) from an EpisodeReader and
    relabel. Uses one episode/offset draw per window so the three fields
    stay aligned.

    Alignment: the collector (tools/collect_play.py) logs the observation
    AFTER each action executes — row t is (obs_t, a_t) where obs_t is
    a_t's RESULT. A policy must map the obs it sees to the action taken
    FROM it, so the action window is shifted one step forward: obs_t is
    paired with a_{t+1} (training P(a|obs_before, goal), not inverse
    dynamics)."""
    f_obs, f_act, f_ag = fields
    di = {k: reader.dims[reader.names.index(k)] for k in fields}
    obs_w = np.empty((batch, window, di[f_obs]), np.float32)
    act_w = np.empty((batch, window, di[f_act]), np.float32)
    ag_w = np.empty((batch, window, di[f_ag]), np.float32)
    for b in range(batch):
        ep = int(rng.integers(reader.n_episodes))
        T = reader.episode_len(ep)
        # leave one row after the window so the shifted action exists
        t0 = int(rng.integers(max(T - window, 1)))

        def win(field, shift=0):
            arr = reader.read(ep, field)[t0 + shift:t0 + shift + window]
            if arr.shape[0] < window:
                arr = np.concatenate(
                    [arr] + [arr[-1:]] * (window - arr.shape[0]))
            return arr

        obs_w[b] = win(f_obs)
        act_w[b] = win(f_act, shift=1)
        ag_w[b] = win(f_ag)
    return relabel_windows(obs_w, act_w, ag_w)


def make_memory_sampler(reader, fields: Tuple[str, str, str] = (
        "obs_quat", "action", "achieved_goal")):
    """Load the whole log into RAM and return a vectorized window sampler
    with the same (obs_t, a_{t+1}) alignment as sample_lfp_batch — the
    per-window Python-loop reader caps training at ~10 steps/s on this
    host, which made >2k-step runs impractical (r4's under-trained
    policy). Requires fixed-length episodes (the batched collector's
    output). sampler(rng, batch, window) → relabelled flat batch."""
    f_obs, f_act, f_ag = fields
    E = reader.n_episodes
    arrs = {f: np.stack([reader.read(e, f) for e in range(E)])
            for f in fields}                              # (E, T, d) each
    T = arrs[f_obs].shape[1]

    def sample(rng: np.random.Generator, batch: int, window: int):
        eps = rng.integers(0, E, batch)
        t0 = rng.integers(0, max(T - window - 1, 1), batch)
        idx = t0[:, None] + np.arange(window)[None]       # (B, W)
        return relabel_windows(arrs[f_obs][eps[:, None], idx],
                               arrs[f_act][eps[:, None], idx + 1],
                               arrs[f_ag][eps[:, None], idx])

    return sample


# --------------------------------------------------------------------------
# policy + train step
# --------------------------------------------------------------------------

if _HAVE_FLAX:

    class GoalConditionedPolicy(nn.Module):
        """MLP π(a | obs ⊕ goal), tanh-squashed to the action box."""
        action_dim: int
        action_high: Sequence[float]
        hidden: Sequence[int] = (256, 256)

        @nn.compact
        def __call__(self, obs, goal):
            x = jnp.concatenate([obs, goal], axis=-1)
            for h in self.hidden:
                x = nn.relu(nn.Dense(h)(x))
            a = nn.Dense(self.action_dim)(x)
            high = jnp.asarray(self.action_high, jnp.float32)
            return jnp.tanh(a) * high

    def make_train_step(policy, tx):
        """(params, opt_state, batch) → (params, opt_state, loss); jit me."""

        def loss_fn(params, batch):
            pred = policy.apply(params, batch["obs"], batch["goal"])
            return jnp.mean(jnp.square(pred - batch["act"]))

        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return train_step

    def init_training(rng, obs_dim: int, goal_dim: int, action_dim: int,
                      action_high: Sequence[float], lr: float = 3e-4,
                      hidden: Sequence[int] = (256, 256)):
        """(policy, params, tx, opt_state) ready for make_train_step."""
        policy = GoalConditionedPolicy(action_dim=action_dim,
                                       action_high=tuple(action_high),
                                       hidden=tuple(hidden))
        params = policy.init(rng, jnp.zeros((1, obs_dim)),
                             jnp.zeros((1, goal_dim)))
        tx = optax.adam(lr)
        return policy, params, tx, tx.init(params)
