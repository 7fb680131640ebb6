"""EnvState: the immutable env-state pytree.

The reference's mutable Bullet world (class `instance`, environments.py:320)
inverts into this explicit state record: `state' = step(state, action)`.
Checkpoint/resume is a plain pytree save (SURVEY.md §5) and — unlike the
reference's `reset(o)` path (environments.py:520 TODO) — object velocities
ARE part of the state, so restore is exact.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "qd", "ctrl_q", "grip", "obj_pos", "obj_quat",
                      "obj_vel", "obj_angvel", "art_q", "art_qd", "goal",
                      "prev_obs", "prev_ag", "has_prev", "rng", "t"],
         meta_fields=[])
@dataclass(frozen=True)
class EnvState:
    q: jnp.ndarray          # (n_dof,) arm+gripper joint positions
    qd: jnp.ndarray         # (n_dof,)
    ctrl_q: jnp.ndarray     # (n_arm,) current arm servo targets
    grip: jnp.ndarray       # () last gripper command [0,1]
    obj_pos: jnp.ndarray    # (n_obj,3) block positions
    obj_quat: jnp.ndarray   # (n_obj,4)
    obj_vel: jnp.ndarray    # (n_obj,3)
    obj_angvel: jnp.ndarray # (n_obj,3)
    art_q: jnp.ndarray      # (4,) drawer-y, door, button, dial
    art_qd: jnp.ndarray     # (4,)
    goal: jnp.ndarray       # (goal_dim,)
    prev_obs: jnp.ndarray   # (obs_dim,) for quaternion sign continuity
    prev_ag: jnp.ndarray    # (ag_dim,)
    has_prev: jnp.ndarray   # () bool
    rng: jnp.ndarray        # PRNG key
    t: jnp.ndarray          # () int32 control step counter

    def replace(self, **kw):
        from dataclasses import replace as _r
        return _r(self, **kw)
