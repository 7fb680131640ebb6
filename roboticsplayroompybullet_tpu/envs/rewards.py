"""Reward / success functions.

JAX reimplementation of the reference's two reward paths:
  * play success: the all-or-nothing 11-D threshold test
    (playRewardFunc.py:9-77) — element thresholds: block xyz 0.05, block RPY
    π/4 (compared on raw Euler differences, unwrapped, exactly as the
    reference does), drawer 0.025, door 0.04 (the `limit` param is ignored
    upstream, playRewardFunc.py:40-41), button 0.01, dial 0.3.
  * non-play sparse piecewise per-goal distance (environments.py:278-304)
    with the reference's ag stride of (3+4) per goal.
Dense reward: −‖ag − g‖ (environments.py:274-275).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops import spatial as sp
from .config import EnvConfig

# achieved-goal indices for 1-object play (playRewardFunc.py:9-14)
BLOCK = slice(0, 3)
QUAT = slice(3, 7)


def play_success(cfg: EnvConfig, ag: jnp.ndarray, g: jnp.ndarray):
    """0 if ALL elements within threshold else −1 (playRewardFunc.py:66-77).

    Generalizes to 2-object play: per-block xyz+RPY tests, then the 4
    articulated scalars.
    """
    ok = jnp.bool_(True)
    idx = 0
    for _ in range(cfg.num_objects):
        dxyz = jnp.abs(g[..., idx:idx + 3] - ag[..., idx:idx + 3])
        ok &= jnp.all(dxyz <= 0.05, axis=-1)
        g_rpy = sp.quat_to_euler(sp.quat_normalize(g[..., idx + 3:idx + 7]))
        ag_rpy = sp.quat_to_euler(sp.quat_normalize(ag[..., idx + 3:idx + 7]))
        ok &= jnp.all(jnp.abs(g_rpy - ag_rpy) <= math.pi / 4, axis=-1)
        idx += 7
    thresholds = jnp.array([0.025, 0.04, 0.01, 0.3], jnp.float32)
    d = jnp.abs(g[..., idx:idx + 4] - ag[..., idx:idx + 4])
    ok &= jnp.all(d <= thresholds, axis=-1)
    return jnp.where(ok, 0.0, -1.0)


def sparse_reward(cfg: EnvConfig, ag: jnp.ndarray, g: jnp.ndarray):
    """Piecewise per-goal: −1 if beyond threshold else −distance
    (environments.py:290-304). ag strides 3+4 per goal, g strides 3."""
    reward = jnp.zeros(ag.shape[:-1], ag.dtype)
    g_ag = 0
    g_dg = 0
    for _ in range(cfg.num_goals):
        d = jnp.linalg.norm(ag[..., g_ag:g_ag + 3] - g[..., g_dg:g_dg + 3],
                            axis=-1)
        reward += jnp.where(d > cfg.sparse_rew_thresh, -1.0, -d)
        g_ag += 3 + 4
        g_dg += 3
    return reward


def dense_reward(ag: jnp.ndarray, g: jnp.ndarray):
    return -jnp.linalg.norm(ag - g, axis=-1)


def compute_reward(cfg: EnvConfig, ag: jnp.ndarray, g: jnp.ndarray):
    if not cfg.sparse:
        return dense_reward(ag, g)
    if cfg.play:
        return play_success(cfg, ag, g)
    return sparse_reward(cfg, ag, g)
