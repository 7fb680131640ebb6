"""Batched rollouts over the fused Pallas control-step kernel.

The measured hot spot of the vmap path is HBM traffic (~20.6 GB per
control step at B=1024); ops/fused_step.py keeps the whole step — action
decode, DLS IK, 12 ABA+contact substeps — in VMEM. Here the rollout stays
in the packed lane layout (NF, B) across the entire horizon: the scan
carries X, per-step achieved goals are sliced straight out of the packed
rows, and EnvState is only unpacked once at the end.

Measured on one v5e chip (B=4096, H=40, UR5PlayAbsRPY1Obj): 38.4k
rollouts/s — vs 10k north-star and 187 rollouts/s on the vmap path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..envs import core
from ..envs.core import EnvModel
from ..envs.rewards import compute_reward
from ..envs.state import EnvState
from ..models.playroom import dial_to_0_1_range
from ..ops import fused_step as fs


def _ag_row_gather(m: EnvModel, with_ee: bool = False):
    """Achieved goals out of the packed state X (NF, B) — mirrors
    obs.achieved_goal for every layout: object/play envs slice packed
    rows; reach envs run lane FK for the ee position (environments.py:835
    FK branch), so all 19 catalog ids ride the fused path. with_ee appends
    the lane-FK ee position (3 rows) for MPC reach shaping (inert for
    reward consumers, which slice fixed play indices)."""
    cfg, tree, arm = m.cfg, m.tree, m.arm
    n, no = tree.n_dof, cfg.num_objects
    with_ee = with_ee and (no > 0 or cfg.play)
    pos0 = 2 * n
    quat0 = pos0 + 3 * no
    art0 = quat0 + 4 * no + 6 * no

    def ag(X):
        if no == 0 and not cfg.play:
            pos_l, quat_l = fs.lane_fk_links(tree, X[0:n])
            ee_pos, _ = fs._lane_site_pose(tree, pos_l, quat_l, arm.ee_site)
            return ee_pos                          # (3, B)
        parts = []
        for o in range(no):
            parts.append(X[pos0 + 3 * o: pos0 + 3 * (o + 1)])
            if cfg.play or cfg.use_orientation:
                parts.append(X[quat0 + 4 * o: quat0 + 4 * (o + 1)])
        if cfg.play:
            art = X[art0:art0 + 4]
            parts.append(jnp.stack([art[0], art[1], art[2],
                                    dial_to_0_1_range(art[3])]))
        if with_ee:
            pos_l, quat_l = fs.lane_fk_links(tree, X[0:n])
            ee_pos, _ = fs._lane_site_pose(tree, pos_l, quat_l, arm.ee_site)
            parts.append(ee_pos)
        return jnp.concatenate(parts, axis=0)      # (ag_dim, B)

    return ag


def supports_fused(m: EnvModel) -> bool:
    """Every catalog env rides the fused path (object/play goals slice
    packed rows; reach/ee goals use lane FK — see _ag_row_gather)."""
    return True


def make_fused_rollout(m: EnvModel, interpret: bool = False,
                       block_envs: int = 1024, ik_iters=None,
                       solve_iters: int = 8):
    """(states (B,), actions (B, H, A)) → (final states, rewards (B, H),
    ags (B, H, ag_dim)). B must be a multiple of block_envs. ik_iters /
    solve_iters below defaults = cheaper preview model (planner use)."""
    stepk = fs.make_pallas_step(m.cfg, m.tree, m.arm, m.scene,
                                block_envs=block_envs, interpret=interpret,
                                ik_iters=ik_iters, solve_iters=solve_iters)
    ag_fn = _ag_row_gather(m)

    def rollout(states: EnvState, actions: jnp.ndarray):
        X = fs.pack_state(m.cfg, m.tree, states)
        acts = jnp.moveaxis(actions, 0, -1)          # (H, A, B)

        def body(Xc, a):
            X2 = stepk(Xc, a)
            return X2, ag_fn(X2)

        Xf, ags = jax.lax.scan(body, X, acts)        # ags (H, ag_dim, B)
        ags = jnp.moveaxis(ags, -1, 0)               # (B, H, ag_dim)
        rs = compute_reward(m.cfg, ags, states.goal[:, None, :])
        final = fs.unpack_state(m.cfg, m.tree, Xf, states)
        final = final.replace(t=states.t + actions.shape[1])
        return final, rs, ags

    return rollout


def make_fused_batched_step(m: EnvModel, interpret: bool = False,
                            block_envs: int = 1024):
    """Single control step through the kernel, EnvState in/out."""
    stepk = fs.make_pallas_step(m.cfg, m.tree, m.arm, m.scene,
                                block_envs=block_envs, interpret=interpret)

    def step(states: EnvState, actions: jnp.ndarray) -> EnvState:
        X = fs.pack_state(m.cfg, m.tree, states)
        X2 = stepk(X, actions.T.astype(jnp.float32))
        states = fs.unpack_state(m.cfg, m.tree, X2, states)
        return states.replace(t=states.t + 1)

    return step


def _resolve_backend(backend: str) -> str:
    """"auto" → the Pallas kernel on TPU, the plain-jnp lane twin on CPU
    (make_reference_sim fallback per the multi-chip test strategy)."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "reference"
    assert backend in ("pallas", "reference"), backend
    return backend


def make_fused_rollout_whole(m: EnvModel, horizon: int,
                             interpret: bool = False,
                             block_envs: int = 1024, ik_iters=None,
                             solve_iters: int = 8,
                             backend: str = "pallas",
                             n_substeps=None, with_ee: bool = False):
    """Whole-horizon single-kernel rollout: ONE pallas invocation per env
    block for all H control steps (~1.5 ms fixed dispatch cost amortized
    H-fold vs the per-step kernel). Same signature as make_fused_rollout.

    backend: "pallas" (the TPU kernel; `interpret` emulates it on CPU),
    "reference" (the plain-jnp lane twin — same math, XLA-compiled; the
    CPU fallback for sharded dryruns), or "auto". with_ee appends the ee
    world position to each per-step ag (see _ag_row_gather)."""
    backend = _resolve_backend(backend)
    if backend == "pallas":
        roll_B = fs.make_pallas_rollout(
            m.cfg, m.tree, m.arm, m.scene, horizon, block_envs=block_envs,
            interpret=interpret, ik_iters=ik_iters, solve_iters=solve_iters,
            n_substeps=n_substeps, with_ee=with_ee)
    else:
        stepk = fs.make_reference_step(m.cfg, m.tree, m.arm, m.scene,
                                       n_substeps=n_substeps,
                                       ik_iters=ik_iters,
                                       solve_iters=solve_iters)
        ag_fn = _ag_row_gather(m, with_ee=with_ee)

        def roll_B(X, acts):                         # acts (H, A, B)
            def body(Xc, a):
                X2 = stepk(Xc, a)
                return X2, ag_fn(X2)
            Xf, ags = jax.lax.scan(body, X, acts)    # ags (H, ag_dim, B)
            return Xf, ags

    def rollout(states: EnvState, actions: jnp.ndarray):
        assert actions.shape[1] == horizon, (actions.shape, horizon)
        X = fs.pack_state(m.cfg, m.tree, states)
        acts = jnp.moveaxis(actions, 0, -1)          # (H, A, B)
        Xf, ags = roll_B(X, acts)                    # ags (H, ag_dim, B)
        ags = jnp.moveaxis(ags, -1, 0)               # (B, H, ag_dim)
        rs = compute_reward(m.cfg, ags, states.goal[:, None, :])
        final = fs.unpack_state(m.cfg, m.tree, Xf, states)
        final = final.replace(t=states.t + horizon)
        return final, rs, ags

    return rollout


def make_sharded_fused_rollout(m: EnvModel, mesh, horizon: int,
                               interpret: bool = False,
                               block_envs: int = 1024, ik_iters=None,
                               solve_iters: int = 8,
                               backend: str = "auto",
                               n_substeps=None):
    """Whole-horizon FUSED rollout with the env batch sharded over the mesh.

    The flagship perf path (the Pallas kernel) under `shard_map`: each
    device runs the kernel on its local batch shard — per-device compute is
    fully local (envs are independent, SURVEY.md §2.3 DP row mirroring the
    reference's per-instance offset hook, environments.py:456-466), so the
    program scales over ICI/DCN with zero rollout-time collectives; results
    stay device-resident for the solver's psum/all_gather reductions.

    Per-shard batch (global B / mesh size) must be a multiple of
    block_envs. Returns jitted (states, actions) → (final, rs, ags) with
    batch-sharded in/outputs."""
    from jax import shard_map
    from .mesh import batch_spec

    roll = make_fused_rollout_whole(m, horizon, interpret=interpret,
                                    block_envs=block_envs,
                                    ik_iters=ik_iters,
                                    solve_iters=solve_iters,
                                    backend=backend, n_substeps=n_substeps)
    spec = batch_spec(mesh)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec),
             out_specs=(spec, spec, spec), check_vma=False)
    def _sharded(states, actions):
        return roll(states, actions)

    return jax.jit(_sharded)
