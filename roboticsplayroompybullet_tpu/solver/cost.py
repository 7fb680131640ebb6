"""Trajectory costs for the MPC solver.

The env's own rewards (envs/rewards.py) replicate the reference exactly —
sparse 0/−1 play success (playRewardFunc.py:66-77) and piecewise sparse
goal rewards (environments.py:278-304) — but sparse signals can't rank
rollouts. The solver therefore scores with a dense surrogate whose zero
set matches the sparse success set: weighted distances per goal element,
mirroring the 11-D play layout (playRewardFunc.py:9-14).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..envs.config import EnvConfig
from ..ops import spatial as sp


class CostWeights(NamedTuple):
    block_xyz: float = 1.0
    block_rot: float = 0.1
    scalars: float = 1.0       # drawer/door/button/dial
    action: float = 1e-3
    terminal: float = 10.0     # extra weight on the final step


def goal_distance(cfg: EnvConfig, ag: jnp.ndarray, g: jnp.ndarray,
                  w: CostWeights = CostWeights()) -> jnp.ndarray:
    """Dense distance between achieved and desired goal, any batch shape."""
    if cfg.play:
        d = jnp.zeros(ag.shape[:-1], jnp.float32)
        idx = 0
        for _ in range(cfg.num_objects):
            d += w.block_xyz * jnp.linalg.norm(
                ag[..., idx:idx + 3] - g[..., idx:idx + 3], axis=-1)
            qa = sp.quat_normalize(ag[..., idx + 3:idx + 7])
            qg = sp.quat_normalize(g[..., idx + 3:idx + 7])
            # clip strictly inside ±1: arccos' gradient is infinite at 1,
            # and aligned quats (ag == g at reset) sit exactly there
            dot = jnp.clip(jnp.abs(jnp.sum(qa * qg, axis=-1)), 0.0,
                           1.0 - 1e-6)
            d += w.block_rot * 2.0 * jnp.arccos(dot)
            idx += 7
        d += w.scalars * jnp.sum(
            jnp.abs(ag[..., idx:idx + 4] - g[..., idx:idx + 4]), axis=-1)
        return d
    if cfg.num_objects > 0:
        d = jnp.zeros(ag.shape[:-1], jnp.float32)
        g_ag, g_dg = 0, 0
        stride = 3 + (4 if cfg.use_orientation else 0)
        for _ in range(cfg.num_goals):
            d += jnp.linalg.norm(
                ag[..., g_ag:g_ag + 3] - g[..., g_dg:g_dg + 3], axis=-1)
            g_ag += stride
            g_dg += 3
        return d
    return jnp.linalg.norm(ag - g, axis=-1)


def trajectory_cost(cfg: EnvConfig, ags: jnp.ndarray, goal: jnp.ndarray,
                    actions: jnp.ndarray,
                    w: CostWeights = CostWeights()) -> jnp.ndarray:
    """Score one rollout: ags (H, ag), actions (H, A) → scalar cost."""
    d = goal_distance(cfg, ags, goal[None, :], w)          # (H,)
    stage = jnp.sum(d) + w.terminal * d[-1]
    act = w.action * jnp.sum(jnp.square(actions))
    return stage + act
