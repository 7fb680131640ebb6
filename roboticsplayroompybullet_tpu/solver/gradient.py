"""First-order trajectory refinement: Adam through the differentiable
rollout (the "SQP-lite" companion to solver/ilqr.py — cheaper per
iteration, no Hessians, batches trivially over many starts via vmap)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs.core import EnvModel
from ..envs.state import EnvState
from ..parallel.rollout import rollout as _rollout_fn
from .cost import CostWeights, trajectory_cost


class GradConfig(NamedTuple):
    iters: int = 50
    lr: float = 0.05
    weights: CostWeights = CostWeights()


def refine(m: EnvModel, state: EnvState, actions0: jnp.ndarray,
           cfg: GradConfig = GradConfig()):
    """Adam-refine an (H, A) action sequence. Returns (actions, cost_trace)."""
    high = jnp.asarray(m.cfg.action_high, jnp.float32)

    def loss(actions):
        a = jnp.clip(actions, -high, high)
        _, _, ags = _rollout_fn(m, state, a)
        return trajectory_cost(m.cfg, ags, state.goal, a, cfg.weights)

    opt = optax.adam(cfg.lr)

    def step(carry, _):
        a, opt_state = carry
        c, g = jax.value_and_grad(loss)(a)
        upd, opt_state = opt.update(g, opt_state)
        a = optax.apply_updates(a, upd)
        return (a, opt_state), c

    (a, _), trace = jax.lax.scan(step, (actions0, opt.init(actions0)),
                                 None, length=cfg.iters)
    return jnp.clip(a, -high, high), trace
