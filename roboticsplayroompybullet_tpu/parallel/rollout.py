"""Batched + sharded rollouts: the framework's data-parallel hot path.

The reference steps ONE env at 25 Hz through per-call Python→C FFI
(reference environments.py:206-214, 485-490). Here the whole control step
is one jittable pure function, `vmap`ed over an env batch and `lax.scan`ned
over the horizon; the batch dim shards over the device mesh via
`shard_map`, so a pod steps millions of env instances in lockstep with no
host round-trips.

Horizon stays local per device (never sharded — SURVEY.md §2.3); only the
batch/scenario axis is distributed.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..envs import core
from ..envs.core import EnvModel
from ..envs.obs import achieved_goal
from ..envs.rewards import compute_reward
from ..envs.state import EnvState
from .mesh import batch_spec


# ---------------------------------------------------------------------------
# single-device batched primitives (vmap)
# ---------------------------------------------------------------------------

def batched_reset(m: EnvModel, rngs: jnp.ndarray
                  ) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
    """Reset a batch of envs from a (B, 2) array of PRNG keys."""
    return jax.vmap(partial(core.reset, m))(rngs)


def batched_step(m: EnvModel, states: EnvState, actions: jnp.ndarray):
    return jax.vmap(partial(core.step, m))(states, actions)


def rollout(m: EnvModel, state: EnvState, actions: jnp.ndarray):
    """Roll one env through an (H, A) action sequence.

    Returns (final_state, per-step rewards (H,), per-step achieved goals
    (H, ag_dim)). The full obs dict is NOT assembled per step — rollouts
    used for MPC scoring only need ag/reward (light path)."""
    def body(s, a):
        s2 = core.step_physics_only(m, s, a)
        ag = achieved_goal(m.cfg, m.tree, m.arm, s2)
        r = compute_reward(m.cfg, ag, s2.goal)
        return s2, (r, ag)

    final, (rs, ags) = jax.lax.scan(body, state, actions)
    return final, rs, ags


def batched_rollout(m: EnvModel, states: EnvState, actions: jnp.ndarray):
    """(B,) states × (B, H, A) actions → (B, H) rewards, (B, H, ag) goals."""
    return jax.vmap(partial(rollout, m))(states, actions)


# ---------------------------------------------------------------------------
# sharded variants (shard_map over the mesh)
# ---------------------------------------------------------------------------

def make_sharded_rollout(m: EnvModel, mesh):
    """jit-compiled rollout with the batch dim sharded over the whole mesh.

    Per-shard compute is purely local (envs are independent); XLA lays the
    batch across chips and the result stays device-resident for the
    solver's collective reductions."""
    spec = batch_spec(mesh)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec, spec), out_specs=(spec, spec, spec),
             check_vma=False)
    def _sharded(states, actions):
        return batched_rollout(m, states, actions)

    return jax.jit(_sharded)


def make_sharded_step(m: EnvModel, mesh):
    spec = batch_spec(mesh)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec),
             out_specs=(spec, spec, spec, spec), check_vma=False)
    def _sharded(states, actions):
        return batched_step(m, states, actions)

    return jax.jit(_sharded)


def success_rate(rewards: jnp.ndarray) -> jnp.ndarray:
    """Global success fraction from final-step rewards; works under jit on
    sharded arrays (XLA inserts the psum over the mesh)."""
    return jnp.mean(jnp.where(rewards >= 0.0, 1.0, 0.0))
