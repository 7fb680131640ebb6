"""Sampling MPC (MPPI / CEM) over batched `lax.scan` rollouts.

This is the subsystem the reference never had (SURVEY.md §2.3: no solver,
no parallelism): a receding-horizon controller that scores thousands of
candidate action sequences per replan by `vmap`ing the physics rollout,
sharded over the device mesh with elite/weight statistics reduced via
`psum` / `all_gather` collectives riding ICI (BASELINE.json north star).

Two update rules, both pure functions:
  * MPPI — softmax-weighted mean over ALL samples (global logsumexp via
    pmax + psum; no sample data ever crosses devices, only (pop,)-sized
    score moments).
  * CEM  — global elite threshold via an all_gather of scores (tiny:
    pop floats), then masked psum moments.

Horizon stays device-local (`lax.scan`); only the population axis shards.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..envs import core
from ..envs.core import EnvModel
from ..envs.obs import achieved_goal
from ..envs.rewards import compute_reward
from ..envs.state import EnvState
from ..parallel.rollout import rollout as _rollout_fn
from ..parallel.mesh import mesh_size
from .cost import CostWeights, trajectory_cost


class MPCConfig(NamedTuple):
    horizon: int = 40
    pop: int = 512              # global population per replan iteration
    iters: int = 3              # CEM/MPPI refinement iterations per replan
    elite_frac: float = 0.1     # CEM
    temperature: float = 0.05   # MPPI
    sigma_init: float = 0.25
    sigma_min: float = 0.02
    smooth: float = 0.7         # AR(1) coefficient for time-correlated noise
    algorithm: str = "mppi"     # "mppi" | "cem"
    weights: CostWeights = CostWeights()
    # fused-planner preview-model fidelity (None/16 = full parity)
    preview_ik_iters: Optional[int] = 8
    preview_solve_iters: int = 8


class PlanState(NamedTuple):
    mean: jnp.ndarray           # (H, A) current nominal action sequence
    sigma: jnp.ndarray          # (H, A) current stddev


def init_plan(m: EnvModel, cfg: MPCConfig) -> PlanState:
    A = m.cfg.action_dim
    return PlanState(mean=jnp.zeros((cfg.horizon, A), jnp.float32),
                     sigma=jnp.full((cfg.horizon, A), cfg.sigma_init,
                                    jnp.float32))


def init_plan_from_state(m: EnvModel, cfg: MPCConfig,
                         state: EnvState) -> PlanState:
    """Plan whose nominal sequence HOLDS the current pose.

    For absolute action modes a zero mean commands the EE to the world
    origin (environments.py:938-947 treats the action as an absolute
    target) — a violent initial jerk that wrecks the search. Seed the mean
    with the current EE pose / joint configuration instead ("stay still"),
    so candidate 0 is a no-op and exploration is centered on the reachable
    neighborhood. Relative modes already mean "stay" at zero."""
    from ..envs.obs import ee_state
    from ..ops import dynamics as dyn
    from ..ops import spatial as sp

    pl = init_plan(m, cfg)
    at = m.cfg.action_type
    if not at.startswith("absolute"):
        return pl
    if at == "absolute_joints":
        hold = jnp.concatenate([state.q[:m.arm.n_arm],
                                jnp.zeros(1, jnp.float32)])
    else:
        kin = dyn.fk_vel(m.tree, state.q, state.qd)
        pos, quat, _, _ = ee_state(m.tree, m.arm, kin)
        if at == "absolute_quat":
            orn = [quat] if m.cfg.use_orientation else []
        else:                                     # absolute_rpy
            orn = [sp.quat_to_euler(quat)]
        hold = jnp.concatenate([pos] + orn + [jnp.zeros(1, jnp.float32)])
    mean = jnp.broadcast_to(hold, (cfg.horizon,) + hold.shape)
    return PlanState(mean=mean.astype(jnp.float32), sigma=pl.sigma)


def shift_plan(plan: PlanState, cfg: MPCConfig) -> PlanState:
    """Receding-horizon warm start: drop step 0, repeat the tail."""
    mean = jnp.concatenate([plan.mean[1:], plan.mean[-1:]], axis=0)
    sigma = jnp.maximum(plan.sigma, cfg.sigma_min)
    return PlanState(mean, sigma)


def _sample(key, plan: PlanState, cfg: MPCConfig, n: int,
            high: jnp.ndarray) -> jnp.ndarray:
    """n time-correlated Gaussian action sequences, clipped to bounds."""
    H, A = plan.mean.shape
    noise = jax.random.normal(key, (n, H, A), jnp.float32)

    def ar1(prev, eps):
        e = cfg.smooth * prev + jnp.sqrt(1.0 - cfg.smooth ** 2) * eps
        return e, e

    _, corr = jax.lax.scan(ar1, jnp.zeros((n, A)),
                           jnp.swapaxes(noise, 0, 1))
    corr = jnp.swapaxes(corr, 0, 1)                       # (n, H, A)
    acts = plan.mean[None] + plan.sigma[None] * corr
    # candidate 0 carries the unperturbed warm start (standard MPPI trick)
    acts = acts.at[0].set(plan.mean)
    return jnp.clip(acts, -high[None, None], high[None, None])


def _score(m: EnvModel, cfg: MPCConfig, state: EnvState,
           actions: jnp.ndarray) -> jnp.ndarray:
    """(n, H, A) candidates → (n,) costs, all from the same start state."""
    def one(acts):
        _, _, ags = _rollout_fn(m, state, acts)
        return trajectory_cost(m.cfg, ags, state.goal, acts, cfg.weights)
    return jax.vmap(one)(actions)


def _mppi_update(plan: PlanState, cfg: MPCConfig, actions, costs,
                 axis: Optional[str]) -> PlanState:
    if axis is None:
        best = jnp.min(costs)
    else:
        best = jax.lax.pmin(jnp.min(costs), axis)
    w = jnp.exp(-(costs - best) / cfg.temperature)        # (n_local,)
    wsum = jnp.sum(w)
    wact = jnp.einsum("n,nha->ha", w, actions)
    if axis is not None:
        wsum = jax.lax.psum(wsum, axis)
        wact = jax.lax.psum(wact, axis)
    mean = wact / jnp.maximum(wsum, 1e-9)
    return PlanState(mean=mean, sigma=plan.sigma)


def _cem_update(plan: PlanState, cfg: MPCConfig, actions, costs,
                axis: Optional[str]) -> PlanState:
    k = max(1, int(cfg.pop * cfg.elite_frac))
    if axis is None:
        all_costs = costs
    else:
        all_costs = jax.lax.all_gather(costs, axis, tiled=True)   # (pop,)
    thresh = -jax.lax.top_k(-all_costs, k)[0][-1]         # kth-smallest cost
    w = jnp.asarray(costs <= thresh, jnp.float32)
    wsum = jnp.sum(w)
    wact = jnp.einsum("n,nha->ha", w, actions)
    wsq = jnp.einsum("n,nha->ha", w, jnp.square(actions))
    if axis is not None:
        wsum = jax.lax.psum(wsum, axis)
        wact = jax.lax.psum(wact, axis)
        wsq = jax.lax.psum(wsq, axis)
    wsum = jnp.maximum(wsum, 1.0)
    mean = wact / wsum
    var = jnp.maximum(wsq / wsum - jnp.square(mean), 0.0)
    sigma = jnp.maximum(jnp.sqrt(var), cfg.sigma_min)
    return PlanState(mean=mean, sigma=sigma)


def _plan_iters(m: EnvModel, cfg: MPCConfig, state: EnvState,
                plan: PlanState, key, n_local: int,
                axis: Optional[str]) -> Tuple[PlanState, jnp.ndarray]:
    high = jnp.asarray(m.cfg.action_high, jnp.float32)
    update = _mppi_update if cfg.algorithm == "mppi" else _cem_update

    def body(carry, k):
        pl = carry
        acts = _sample(k, pl, cfg, n_local, high)
        costs = _score(m, cfg, state, acts)
        pl = update(pl, cfg, acts, costs, axis)
        best = jnp.min(costs)
        if axis is not None:
            best = jax.lax.pmin(best, axis)
        return pl, best

    keys = jax.random.split(key, cfg.iters)
    plan, bests = jax.lax.scan(body, plan, keys)
    return plan, bests[-1]


def plan(m: EnvModel, cfg: MPCConfig, state: EnvState, plan_state: PlanState,
         key) -> Tuple[PlanState, jnp.ndarray]:
    """Single-device replan: refine the nominal sequence from `state`.
    Returns (new plan, best rollout cost)."""
    return _plan_iters(m, cfg, state, plan_state, key, cfg.pop, axis=None)


def make_fused_planner(m: EnvModel, cfg: MPCConfig,
                       interpret: bool = False):
    """Single-chip replanner scoring candidates through the fused Pallas
    rollout (parallel/fused.py) — the real-time (≤20 ms) MPC path.

    The population IS the kernel batch: cfg.pop must be a multiple of the
    kernel block (1024). Returns plan_fn(state, plan_state, key)."""
    from ..parallel import fused as _fused

    roll = _fused.make_fused_rollout_whole(
        m, cfg.horizon, interpret=interpret,
        ik_iters=cfg.preview_ik_iters,
        solve_iters=cfg.preview_solve_iters)
    update = _mppi_update if cfg.algorithm == "mppi" else _cem_update
    high = jnp.asarray(m.cfg.action_high, jnp.float32)

    def replicate(state: EnvState, n):
        return jax.tree.map(lambda x: jnp.broadcast_to(
            x, (n,) + x.shape), state)

    def plan_fn(state: EnvState, plan_state: PlanState, key):
        states = replicate(state, cfg.pop)

        def body(carry, k):
            pl = carry
            acts = _sample(k, pl, cfg, cfg.pop, high)      # (pop, H, A)
            _, _, ags = roll(states, acts)                 # (pop, H, ag)
            costs = jax.vmap(
                lambda ag, a: trajectory_cost(m.cfg, ag, state.goal, a,
                                              cfg.weights))(ags, acts)
            pl = update(pl, cfg, acts, costs, None)
            return pl, jnp.min(costs)

        keys = jax.random.split(key, cfg.iters)
        plan_state, bests = jax.lax.scan(body, plan_state, keys)
        return plan_state, bests[-1]

    return plan_fn


def make_sharded_fused_planner(m: EnvModel, cfg: MPCConfig, mesh,
                               interpret: bool = False,
                               block_envs: int = 1024,
                               backend: str = "auto",
                               n_substeps: Optional[int] = None):
    """Replanner scoring candidates through the FUSED rollout kernel with
    the population sharded over every mesh axis.

    Marries the two fast paths: each device runs the Pallas whole-horizon
    kernel on its local population shard (pop/mesh_size candidates, must be
    a multiple of block_envs), then MPPI/CEM statistics reduce over
    ICI(+DCN) via psum/pmin/all_gather — the pod-scale version of
    make_fused_planner. State/plan replicated; only score moments cross
    the interconnect. Returns jitted plan_fn(state, plan_state, key)."""
    from ..parallel import fused as _fused

    n_dev = mesh_size(mesh)
    assert cfg.pop % n_dev == 0, (cfg.pop, n_dev)
    n_local = cfg.pop // n_dev
    assert n_local % block_envs == 0, (n_local, block_envs)
    axes = mesh.axis_names
    axis = axes if len(axes) > 1 else axes[0]
    rep = P()

    roll = _fused.make_fused_rollout_whole(
        m, cfg.horizon, interpret=interpret, block_envs=block_envs,
        ik_iters=cfg.preview_ik_iters,
        solve_iters=cfg.preview_solve_iters, backend=backend,
        n_substeps=n_substeps)
    update = _mppi_update if cfg.algorithm == "mppi" else _cem_update
    high = jnp.asarray(m.cfg.action_high, jnp.float32)

    @partial(shard_map, mesh=mesh, in_specs=(rep, rep, rep),
             out_specs=(rep, rep), check_vma=False)
    def _plan(state, plan_state, key):
        idx = jax.lax.axis_index(axes[0])
        for ax in axes[1:]:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        key = jax.random.fold_in(key, idx)
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_local,) + x.shape), state)

        def body(carry, k):
            pl = carry
            acts = _sample(k, pl, cfg, n_local, high)   # (n_local, H, A)
            _, _, ags = roll(states, acts)              # (n_local, H, ag)
            costs = jax.vmap(
                lambda ag, a: trajectory_cost(m.cfg, ag, state.goal, a,
                                              cfg.weights))(ags, acts)
            pl = update(pl, cfg, acts, costs, axis)
            best = jax.lax.pmin(jnp.min(costs), axis)
            return pl, best

        keys = jax.random.split(key, cfg.iters)
        plan_state2, bests = jax.lax.scan(body, plan_state, keys)
        return plan_state2, bests[-1]

    return jax.jit(_plan)


def make_sharded_planner(m: EnvModel, cfg: MPCConfig, mesh):
    """Replan with the population sharded over every mesh axis.

    State and plan are replicated; each shard draws its own noise (key
    folded with its linearized mesh coordinate) and only score moments
    cross the interconnect."""
    n_dev = mesh_size(mesh)
    assert cfg.pop % n_dev == 0, (cfg.pop, n_dev)
    n_local = cfg.pop // n_dev
    axes = mesh.axis_names
    rep = P()

    @partial(shard_map, mesh=mesh, in_specs=(rep, rep, rep),
             out_specs=(rep, rep), check_vma=False)
    def _plan(state, plan_state, key):
        idx = jax.lax.axis_index(axes[0])
        for ax in axes[1:]:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        key = jax.random.fold_in(key, idx)
        # reductions over the flattened mesh = sequential over all axes
        pl, best = _plan_iters(m, cfg, state, plan_state, key, n_local,
                               axis=axes if len(axes) > 1 else axes[0])
        return pl, best

    return jax.jit(_plan)


def init_batched_plan(m: EnvModel, cfg: MPCConfig, n_envs: int,
                      states: Optional[EnvState] = None) -> PlanState:
    """PlanState with a leading env axis — one independent plan per env.
    With `states`, each plan is seeded to hold that env's current pose
    (init_plan_from_state)."""
    if states is not None:
        return jax.vmap(lambda s: init_plan_from_state(m, cfg, s))(states)
    pl = init_plan(m, cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_envs,) + x.shape),
                        pl)


def make_batched_fused_mpc_step(m: EnvModel, cfg: MPCConfig, n_envs: int,
                                interpret: bool = False,
                                backend: str = "pallas",
                                block_envs: int = 1024,
                                n_substeps: Optional[int] = None,
                                exec_ik_iters: Optional[int] = None,
                                exec_solve_iters: int = 8,
                                cost_fn=None, with_ee: bool = False):
    """One receding-horizon control step for a BATCH of independently
    goal-conditioned envs — the task-competence eval path (tools/eval_mpc.py).

    Each of the n_envs envs refines its own cfg.pop-candidate plan against
    its own goal: all n_envs × pop preview rollouts ride ONE fused-kernel
    batch (per-env MPPI/CEM statistics are a vmap over the env axis), then
    every env advances one PARITY-model control step (full IK/solve iters —
    the planner previews with the cheap model but is scored against the
    reference-fidelity physics, reference hot loop environments.py:485-490).

    backend/interpret/n_substeps mirror parallel/fused.py (reference = the
    plain-jnp lane twin for CPU tests). cost_fn(ags_1 (H, agE), goal,
    acts_1, params_1) → scalar overrides the default trajectory_cost
    (eval.py supplies family-shaped costs; params_1 is the per-env slice of
    the cost_params pytree passed to step_fn, so one compiled program
    serves every goal family — the family is data). with_ee appends the ee
    position to the preview ags the cost sees. Returns
    step_fn(states, plans, key, cost_params={}) → (states', plans',
    rewards, ags) with states (n_envs,), plans (n_envs, H, A) leaves,
    rewards/ags (n_envs, …).
    """
    from ..parallel import fused as _fused
    from ..ops import fused_step as fs

    pop = cfg.pop
    B = n_envs * pop
    lane = block_envs if _fused._resolve_backend(backend) == "pallas" else 128
    assert B % lane == 0, (n_envs, pop, lane)

    roll = _fused.make_fused_rollout_whole(
        m, cfg.horizon, interpret=interpret, block_envs=block_envs,
        ik_iters=cfg.preview_ik_iters, solve_iters=cfg.preview_solve_iters,
        backend=backend, n_substeps=n_substeps, with_ee=with_ee)
    if cost_fn is None:
        cost_fn = lambda ag1, g1, a1, p1: trajectory_cost(  # noqa: E731
            m.cfg, ag1, g1, a1, cfg.weights)

    # parity-model executed step (EnvState in/out), padded to one lane block
    if _fused._resolve_backend(backend) == "pallas":
        stepk = fs.make_pallas_step(m.cfg, m.tree, m.arm, m.scene,
                                    block_envs=block_envs,
                                    interpret=interpret,
                                    ik_iters=exec_ik_iters,
                                    solve_iters=exec_solve_iters,
                                    n_substeps=n_substeps)
        exec_B = block_envs
    else:
        stepk = fs.make_reference_step(m.cfg, m.tree, m.arm, m.scene,
                                       n_substeps=n_substeps,
                                       ik_iters=exec_ik_iters,
                                       solve_iters=exec_solve_iters)
        exec_B = ((n_envs + 127) // 128) * 128

    update = _mppi_update if cfg.algorithm == "mppi" else _cem_update
    high = jnp.asarray(m.cfg.action_high, jnp.float32)
    ag_fn = partial(achieved_goal, m.cfg, m.tree, m.arm)
    pad_idx = jnp.arange(exec_B) % n_envs

    def step_fn(states: EnvState, plans: PlanState, key, cost_params=None):
        cp = {} if cost_params is None else cost_params
        states_rep = jax.tree.map(
            lambda x: jnp.repeat(x, pop, axis=0), states)   # (B, ...)

        def body(pls, k):
            ks = jax.random.split(k, n_envs)
            acts = jax.vmap(
                lambda kk, p: _sample(kk, p, cfg, pop, high))(ks, pls)
            _, _, ags = roll(states_rep,
                             acts.reshape(B, cfg.horizon, -1))
            ags = ags.reshape(n_envs, pop, cfg.horizon, -1)
            costs = jax.vmap(
                lambda agE, g1, actE, p1: jax.vmap(
                    lambda ag1, a1: cost_fn(ag1, g1, a1, p1))(agE, actE),
                )(ags, states.goal, acts, cp)
            pls = jax.vmap(
                lambda p, a, c: update(p, cfg, a, c, None))(pls, acts, costs)
            return pls, None

        keys = jax.random.split(key, cfg.iters)
        plans, _ = jax.lax.scan(body, plans, keys)

        a = plans.mean[:, 0]                                 # (n_envs, A)
        sts_pad = jax.tree.map(lambda x: x[pad_idx], states)
        X = fs.pack_state(m.cfg, m.tree, sts_pad)
        X2 = stepk(X, a[pad_idx].T.astype(jnp.float32))
        sts2_pad = fs.unpack_state(m.cfg, m.tree, X2, sts_pad)
        states2 = jax.tree.map(lambda x: x[:n_envs], sts2_pad)
        states2 = states2.replace(t=states.t + 1)
        ags = jax.vmap(ag_fn)(states2)
        rs = compute_reward(m.cfg, ags, states2.goal)
        plans2 = jax.vmap(lambda p: shift_plan(p, cfg))(plans)
        return states2, plans2, rs, ags

    return step_fn


def make_fused_mpc_rollout(m: EnvModel, cfg: MPCConfig, n_steps: int,
                           interpret: bool = False):
    """Fully-fused receding-horizon loop: fused planner + fused env step.

    The single controlled env rides lane 0 of a replicated kernel block, so
    the between-solve env advance costs one kernel step (~0.4 ms) instead
    of an unbatched XLA step (~25 ms). Returns run(state, key) →
    (final state, actions (T, A), rewards (T,), best costs (T,))."""
    from ..parallel import fused as _fused

    planner = make_fused_planner(m, cfg, interpret=interpret)
    stepB = _fused.make_fused_batched_step(m, interpret=interpret)
    ag_fn = partial(achieved_goal, m.cfg, m.tree, m.arm)
    BLOCK = 1024

    def run(state: EnvState, key):
        def body(carry, k):
            st, pl = carry
            pl, best = planner(st, pl, k)
            a = pl.mean[0]
            sts = jax.tree.map(lambda x: jnp.broadcast_to(
                x, (BLOCK,) + x.shape), st)
            sts2 = stepB(sts, jnp.broadcast_to(a, (BLOCK,) + a.shape))
            st2 = jax.tree.map(lambda x: x[0], sts2)
            ag = ag_fn(st2)
            r = compute_reward(m.cfg, ag, st2.goal)
            return (st2, shift_plan(pl, cfg)), (a, r, best)

        keys = jax.random.split(key, n_steps)
        (final, _), (acts, rs, bests) = jax.lax.scan(
            body, (state, init_plan(m, cfg)), keys)
        return final, acts, rs, bests

    return run


def mpc_rollout(m: EnvModel, cfg: MPCConfig, state: EnvState, key,
                n_steps: int, planner=None):
    """Receding-horizon control loop: replan → apply first action → step.

    Returns (final state, actions (T, A), rewards (T,), best-costs (T,)).
    `planner` defaults to the single-device `plan`; pass a
    `make_sharded_planner` result to distribute each replan."""
    do_plan = planner if planner is not None else partial(plan, m, cfg)

    def body(carry, k):
        st, pl = carry
        pl, best = do_plan(st, pl, k)
        a = pl.mean[0]
        st2 = core.step_physics_only(m, st, a)
        ag = achieved_goal(m.cfg, m.tree, m.arm, st2)
        r = compute_reward(m.cfg, ag, st2.goal)
        return (st2, shift_plan(pl, cfg)), (a, r, best)

    keys = jax.random.split(key, n_steps)
    (final, _), (acts, rs, bests) = jax.lax.scan(
        body, (state, init_plan(m, cfg)), keys)
    return final, acts, rs, bests
