"""Task-competence evaluation: does the fused MPC planner actually achieve
playroom goals?

The reference frames the playroom as a goal-reaching benchmark (README.md:
2-10); its success criterion is the all-or-nothing 11-D play threshold test
(playRewardFunc.py:16-77). This module closes the loop: for each goal
family — block position, drawer, door, button, dial (the five independently
controllable elements of the play goal vector) plus EE reach (the non-play
catalog ids) — it runs the fused receding-horizon planner
(solver/mpc.py:make_batched_fused_mpc_step) from seeded resets against
goals that differ from the reset state in that family only, and reports the
fraction of episodes that reach the success set at ANY control step.

Goals are constructed host-side (numpy) from the read-back reset achieved
goals: the untouched elements are pinned to their reset values, so solving
a family also requires NOT disturbing the rest of the scene — exactly the
reference's success semantics (play_success requires ALL elements within
threshold, envs/rewards.py:27-45; thresholds per playRewardFunc.py:16-55:
block xyz 0.05, drawer 0.025, door 0.04, button 0.01, dial 0.3).

The planner scores candidates with the sparse-matching dense surrogate
(solver/cost.py) PLUS an end-effector reach-shaping term: distance from the
lane-FK EE position to the family's interaction site (block center, drawer
/ door handle, button pad, dial paddle edge — the same targets the scripted
behavioral tests drive to, tests/test_env.py:164-323). The site is a
per-env DATA pytree (base + axis·scalar + block-tracking), so one compiled
program serves every family.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..envs import core
from ..envs.config import CATALOG
from ..envs.core import EnvModel
from ..envs.obs import achieved_goal
from ..parallel.rollout import batched_reset
from .cost import CostWeights, trajectory_cost
from .mpc import (MPCConfig, init_batched_plan, make_batched_fused_mpc_step)

# achieved-goal indices, 1-object play (playRewardFunc.py:9-14)
_DRAWER, _DOOR, _BUTTON, _DIAL = 7, 8, 9, 10

GOAL_FAMILIES = ("reach", "block", "drawer", "door", "button", "dial")

# the non-play task families (envList.py:8-26): reach rides the env's own
# 3-D ee goal; pick (pandaPick-v0) must grasp the block and carry it to a
# sampled 3-D goal up to 10 cm above the table (reward
# environments.py:290-304, success = block within sparse_rew_thresh)
PICK_FAMILY = "pick"

# family targets, chosen to be (a) well past the success threshold from
# any reset state and (b) inside the articulated joint limits
# (models/playroom.py:196-198): drawer slides y∈[-0.22, 0.05] (open = -y,
# handle side), door slides x∈[-0.15, 0.15], button is sprung UP to 0.03
# (scenes.py:238) so pressed = 0, dial maps to [0,1).
_DRAWER_OPEN = -0.12
_DOOR_TARGET = 0.10
_BUTTON_PRESSED = 0.0
_DIAL_DELTA = 0.45


def family_goals(cfg, ags: np.ndarray, family: str,
                 rng: np.random.Generator) -> np.ndarray:
    """(n, ag_dim) reset achieved goals → (n, ag_dim) eval goals that differ
    in `family` only. For 'reach' (non-play envs) the env's own reset goal
    is used instead — callers keep state.goal."""
    assert cfg.play, family
    goals = np.array(ags, dtype=np.float32, copy=True)
    n = goals.shape[0]
    if family != "button":
        # the button is SPRUNG to 0.03 (scenes.py:238) and is still rising
        # at reset (the 100-substep settle isn't enough for the spring to
        # finish) — pinning its goal to the transient reset value would
        # make every other family unsolvable once it reaches equilibrium
        # past the 0.01 threshold. Pin it to the rest point instead.
        goals[:, _BUTTON] = 0.03
    if family == "block":
        lo = np.asarray(cfg.obj_lower_bound, np.float32)
        hi = np.asarray(cfg.obj_upper_bound, np.float32)
        for i in range(n):
            # resample until the target is non-trivially far (> 2x the
            # 0.05 success threshold), mirroring the reference's
            # resample-until-unsolved reset loop (environments.py:179-186)
            for _ in range(100):
                xy = rng.uniform(lo[:2], hi[:2])
                if np.linalg.norm(xy - ags[i, :2]) > 0.10:
                    break
            goals[i, 0:2] = xy          # z pinned: push goal, stays on table
    elif family == "drawer":
        goals[:, _DRAWER] = _DRAWER_OPEN
    elif family == "door":
        # slide away from the current side so the move is always >= 0.1
        goals[:, _DOOR] = np.where(ags[:, _DOOR] > 0.0,
                                   -_DOOR_TARGET, _DOOR_TARGET)
    elif family == "button":
        goals[:, _BUTTON] = _BUTTON_PRESSED
    elif family == "dial":
        goals[:, _DIAL] = np.where(ags[:, _DIAL] < 0.5,
                                   ags[:, _DIAL] + _DIAL_DELTA,
                                   ags[:, _DIAL] - _DIAL_DELTA)
    else:
        raise ValueError(family)
    return goals


# ---------------------------------------------------------------------------
# family-shaped cost: base surrogate + EE-to-site reach term
# ---------------------------------------------------------------------------

def family_site_params(m: EnvModel, family: str,
                       reach_w: float = 1.0) -> Dict[str, np.ndarray]:
    """Per-family interaction-site parametrization (DATA, not code):
    site(ag) = base + axis * <sel, ag[7:11]> + block_w * ag[0:3].
    Sites mirror the scripted ground truth (tests/test_env.py:164-323):
    handles at anchor + collider offset, moving with the articulation."""
    s = m.scene
    base = np.zeros(3, np.float32)
    axis = np.zeros(3, np.float32)
    sel = np.zeros(4, np.float32)
    block_w = 0.0
    push_w = 0.0
    if family == "block":
        block_w = 1.0
        # push_w offsets the EE site to the far side of the block along
        # the goal→block line (a contact-aware push-approach site). The
        # r5 ablation on the real chip measured it HURTING: 0.69-0.81
        # success with the offset vs 0.75-0.94 at push_w=0 — the MPPI
        # preview already discovers approach directions, and the offset
        # site fights it whenever the best push is a sequence of nudges
        # from different sides. Kept as a data knob, default off.
        push_w = 0.0
    elif family == "drawer":
        # hover just in front of / above the protruding handle lip
        base = (np.asarray(s.art_anchor[0]) + np.asarray(s.art_boxes_pos[0, 5])
                + np.array([0.0, -0.01, 0.01], np.float32))
        axis = np.asarray(s.art_axis[0])        # handle rides the drawer
        sel[0] = 1.0
    elif family == "door":
        base = np.asarray(s.art_anchor[1]) + np.asarray(s.art_boxes_pos[1, 1])
        axis = np.asarray(s.art_axis[1])
        sel[1] = 1.0
    elif family == "button":
        base = (np.asarray(s.art_anchor[2])
                + np.array([0.0, 0.0, 0.012], np.float32))
        axis = np.asarray(s.art_axis[2])
        sel[2] = 1.0
    elif family == "dial":
        # paddle top edge: center pushes have no moment arm
        base = (np.asarray(s.art_anchor[3])
                + np.array([0.0, 0.0, 0.025], np.float32))
    else:
        raise ValueError(family)
    return {"base": np.asarray(base, np.float32),
            "axis": np.asarray(axis, np.float32),
            "sel": sel, "block_w": np.float32(block_w),
            "push_w": np.float32(push_w),
            "reach_w": np.float32(reach_w)}


def make_play_cost(m: EnvModel, weights: CostWeights = CostWeights()):
    """cost_fn(ags (H, 11+3 incl. ee), goal (11,), acts, params) for
    make_batched_fused_mpc_step(with_ee=True)."""
    nag = m.cfg.ag_dim

    def cost_fn(ags, goal, acts, p):
        base_cost = trajectory_cost(m.cfg, ags[..., :nag], goal, acts,
                                    weights)
        ee = ags[..., nag:nag + 3]
        # raw art scalars for the site (dial enters mapped, but dial sites
        # don't select scalars, so the mapped value never reaches a site)
        scal = jnp.sum(p["sel"] * ags[..., 7:11], axis=-1, keepdims=True)
        site = (p["base"] + p["axis"] * scal
                + p["block_w"] * ags[..., 0:3])
        # block push approach: offset the site to the far side of the
        # block along the goal→block line (xy), push_w = half-extent + pad
        d_xy = ags[..., 0:2] - goal[0:2]
        u = d_xy / (jnp.linalg.norm(d_xy, axis=-1, keepdims=True) + 1e-6)
        site = site + p["push_w"] * jnp.concatenate(
            [u, jnp.zeros_like(u[..., :1])], axis=-1)
        d = jnp.linalg.norm(ee - site, axis=-1)          # (H,)
        return base_cost + p["reach_w"] * jnp.sum(d)

    return cost_fn


def pick_params(reach_w: float = 1.0, grasp_w: float = 0.3,
                open_w: float = 0.0, near: float = 0.04,
                grasp_z: float = 0.008,
                goal_w: Tuple[float, float, float] = (1.0, 1.0, 2.0)
                ) -> Dict[str, np.ndarray]:
    """Tunable DATA for make_pick_cost — passed through step_fn's
    cost_params so tuning never recompiles the planner.

    open_w defaults to 0: penalizing a closed gripper while far from the
    block (r5 first attempt) locks the planner into a push-only local
    optimum — the mean grip pins at −1 and the z-gap to lifted goals
    never closes (measured: grasp episodes track the goal to ~2 cm while
    push-only episodes stall at the goal's height deficit). goal_w
    up-weights the z error for the same reason: xy is solvable by
    pushing, z only by a grasp."""
    return {"reach_w": np.float32(reach_w), "grasp_w": np.float32(grasp_w),
            "open_w": np.float32(open_w), "near": np.float32(near),
            "grasp_z": np.float32(grasp_z),
            "goal_w": np.asarray(goal_w, np.float32)}


def make_pick_cost(m: EnvModel, weights: CostWeights = CostWeights()):
    """cost_fn for the pick family (pandaPick-v0): carry the block to the
    3-D goal. Dense surrogate of the sparse reward (environments.py:
    290-304) plus two solver-side shaping terms (the reference has no
    solver — this is our subsystem's cost design, not env parity):

      * EE-to-grasp-point reach: ee to just above the block center (the
        scripted grasp descends to block_z + 8 mm, tests/test_env.py:244).
      * grip schedule: open (−1) while far from the block, closed (+1)
        once the EE is within grasp range — the coupling MPPI's 10-step
        preview cannot discover on its own because a grasp only pays off
        many steps later.

    All shaping constants come from the `p` data pytree (pick_params).
    """
    nag = m.cfg.ag_dim   # 3: block position

    def cost_fn(ags, goal, acts, p):
        block = ags[..., :3]
        ee = ags[..., nag:nag + 3]
        d_goal = jnp.linalg.norm((block - goal) * p["goal_w"], axis=-1)
        base = jnp.sum(d_goal) + weights.terminal * d_goal[-1]
        up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
        grasp_pt = block + up * p["grasp_z"]
        d_reach = jnp.linalg.norm(ee - grasp_pt, axis=-1)          # (H,)
        reach = p["reach_w"] * jnp.sum(d_reach)
        grip = acts[..., -1]                                       # (H,)
        near = (d_reach < p["near"]).astype(jnp.float32)
        grasp = (p["grasp_w"] * jnp.sum(near * jnp.abs(grip - 1.0))
                 + p["open_w"] * jnp.sum((1.0 - near)
                                         * jnp.abs(grip + 1.0)))
        act = weights.action * jnp.sum(jnp.square(acts))
        return base + reach + grasp + act

    return cost_fn


def _stack_params(params: Dict[str, np.ndarray], n: int):
    return jax.tree.map(lambda x: jnp.broadcast_to(jnp.asarray(x),
                                                   (n,) + np.shape(x)),
                        params)


def _success(cfg, family: str, rs: np.ndarray, ags: np.ndarray,
             goals: np.ndarray) -> np.ndarray:
    """(T, n) rewards / (T, n, ag) achieved → (n,) solved-at-any-step."""
    if cfg.play:
        return (rs >= 0.0).any(axis=0)
    # reach: sparse reward is -d within threshold else -1
    # (environments.py:290-304); success = within sparse_rew_thresh
    d = np.linalg.norm(ags - goals[None], axis=-1)
    return (d < cfg.sparse_rew_thresh).any(axis=0)


def eval_family(m: EnvModel, mpc: MPCConfig, family: str, *,
                n_episodes: int, n_envs: int, n_steps: int, seed: int = 0,
                backend: str = "pallas", interpret: bool = False,
                n_substeps: Optional[int] = None, reach_w: float = 1.0,
                step_fn=None, cost_params: Optional[Dict] = None,
                verbose: bool = False) -> Dict:
    """Evaluate one goal family. Returns a stats dict (success rate, per-
    episode solve step, wall time). n_episodes must be a multiple of
    n_envs (episodes run in device-batched groups)."""
    assert n_episodes % n_envs == 0, (n_episodes, n_envs)
    play = m.cfg.play
    if step_fn is None:
        kw = dict(backend=backend, interpret=interpret,
                  n_substeps=n_substeps)
        if play:
            kw.update(cost_fn=make_play_cost(m), with_ee=True)
        elif family == PICK_FAMILY:
            kw.update(cost_fn=make_pick_cost(m), with_ee=True)
        step_fn = jax.jit(make_batched_fused_mpc_step(m, mpc, n_envs, **kw))
    reset = jax.jit(lambda k: batched_reset(m, k))
    init_plans = jax.jit(lambda s: init_batched_plan(m, mpc, n_envs, s))
    if cost_params is not None:
        params = _stack_params(cost_params, n_envs)
    elif play:
        params = _stack_params(family_site_params(m, family, reach_w),
                               n_envs)
    elif family == PICK_FAMILY:
        params = _stack_params(pick_params(), n_envs)
    else:
        params = None
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    succ, solve_steps = [], []
    t_start = time.perf_counter()
    for ep in range(n_episodes // n_envs):
        key, kr = jax.random.split(key)
        states, _ = reset(jax.random.split(kr, n_envs))
        if play:
            ags0 = np.asarray(
                jax.vmap(partial(achieved_goal, m.cfg, m.tree, m.arm))(
                    states))
            goals = family_goals(m.cfg, ags0, family, rng)
            states = states.replace(goal=jnp.asarray(goals))
        else:
            goals = np.asarray(states.goal)
        plans = init_plans(states)
        rs_t, ags_t = [], []
        for t in range(n_steps):
            key, kt = jax.random.split(key)
            if params is not None:
                states, plans, rs, ags = step_fn(states, plans, kt, params)
            else:
                states, plans, rs, ags = step_fn(states, plans, kt)
            rs_t.append(rs)
            ags_t.append(ags)
        rs_np = np.asarray(jnp.stack(rs_t))          # (T, n_envs)
        ags_np = np.asarray(jnp.stack(ags_t))        # (T, n_envs, ag)
        ok = _success(m.cfg, family, rs_np, ags_np, goals)
        succ.extend(ok.tolist())
        if play:
            hit = rs_np >= 0.0
        else:
            hit = np.linalg.norm(ags_np - goals[None], axis=-1) \
                < m.cfg.sparse_rew_thresh
        first = np.where(hit.any(axis=0), hit.argmax(axis=0), -1)
        solve_steps.extend(first.tolist())
        if verbose:
            print(f"  {family} batch {ep}: {ok.astype(int).tolist()}",
                  flush=True)
    wall = time.perf_counter() - t_start
    succ = np.asarray(succ)
    solved = np.asarray(solve_steps)[succ]
    return {
        "family": family,
        "n_episodes": int(n_episodes),
        "success_rate": float(succ.mean()),
        "n_success": int(succ.sum()),
        "mean_solve_step": float(solved.mean()) if solved.size else None,
        "n_steps": int(n_steps),
        "wall_s": round(wall, 1),
    }


def eval_pick(m: EnvModel, mpc: MPCConfig, *, n_episodes: int, n_envs: int,
              n_steps: int, seed: int = 0, backend: str = "pallas",
              interpret: bool = False, n_substeps: Optional[int] = None,
              step_fn=None, acquire_budget: int = 70,
              verbose: bool = False) -> Dict:
    """Two-phase pick controller for pandaPick-v0 (reward
    environments.py:290-304): a scripted GRASP-ACQUISITION option driven
    by feedback on the observed block pose (the closed-loop analogue of
    the scripted grasp test, tests/test_env.py:223-250 — lift clear of
    the table, hover, staged descend with xy-abort, close, then a
    TEST-LIFT verification: if the block does not rise the grasp missed
    and the env gets one full retry), then the fused MPC planner CARRIES
    the held block to the sampled 3-D goal (carry-phase pick cost:
    always-near grasp shaping keeps the grip closed, goal tracking does
    the rest).

    Pure sampling MPC with a 10-step preview discovers pushes but not
    grasps (measured: <=3/8 across the r5 shaping sweep — the grasp's
    payoff sits beyond the preview). Hierarchical option + MPC is the
    standard fix and everything here remains our solver subsystem; the
    physics/ env are untouched. Success: block within sparse_rew_thresh
    of the goal at ANY control step (up to acquire_budget acquire steps,
    then n_steps carry steps)."""
    assert n_episodes % n_envs == 0, (n_episodes, n_envs)
    from ..ops import kinematics as K
    from ..ops import dynamics as dyn
    from ..envs.obs import ee_state as _ee_state

    if step_fn is None:
        step_fn = jax.jit(make_batched_fused_mpc_step(
            m, mpc, n_envs, backend=backend, interpret=interpret,
            n_substeps=n_substeps, cost_fn=make_pick_cost(m), with_ee=True))
    reset = jax.jit(lambda k: batched_reset(m, k))
    init_plans = jax.jit(lambda s: init_batched_plan(m, mpc, n_envs, s))
    stepA = jax.jit(jax.vmap(partial(core.step_physics_only, m)))

    def _ee_one(s):
        kin = dyn.fk_vel(m.tree, s.q, s.qd)
        pos, _, _, _ = _ee_state(m.tree, m.arm, kin)
        return pos

    _ee_jit = jax.jit(jax.vmap(_ee_one))

    def ee_of(states):
        return np.asarray(_ee_jit(states))
    rest = np.zeros(m.tree.n_dof, np.float32)
    rest[:m.arm.n_arm] = np.asarray(m.arm.rest_pose, np.float32)
    from ..ops import spatial as _sp
    _, q0 = K.fk_site(m.tree, jnp.asarray(rest), m.arm.ee_site)
    rpy0 = np.asarray(_sp.quat_to_euler(q0))
    carry_params = _stack_params(
        pick_params(reach_w=0.3, grasp_w=1.0, near=0.25), n_envs)
    A = m.cfg.action_dim
    thresh = m.cfg.sparse_rew_thresh

    key = jax.random.PRNGKey(seed)
    succ, solve_steps = [], []
    t_start = time.perf_counter()
    for ep in range(n_episodes // n_envs):
        key, kr = jax.random.split(key)
        states, _ = reset(jax.random.split(kr, n_envs))
        goals = np.asarray(states.goal)
        ok = np.zeros(n_envs, bool)
        first = np.full(n_envs, -1, int)
        phase = np.zeros(n_envs, int)
        close_ctr = np.zeros(n_envs, int)
        lift_ctr = np.zeros(n_envs, int)
        z_at_test = np.zeros(n_envs, np.float32)
        retried = np.zeros(n_envs, bool)
        hold_pos = np.zeros((n_envs, 3), np.float32)
        # stall-triggered integral compensation: the DLS servo sometimes
        # plateaus short of the target (orientation/position tradeoff —
        # measured offsets up to ~15 cm at workspace corners). A plain
        # integrator destabilizes envs that are still converging (pushing
        # the commanded target off the reachable manifold flips the IK
        # solution branch), so the bias only grows while the EE is BOTH
        # far from target and no longer moving, and decays otherwise.
        bias = np.zeros((n_envs, 3), np.float32)
        prev_ee = None
        t = 0
        # ---- phase A: scripted grasp acquisition (feedback) ----
        while t < acquire_budget and (phase < 5).any():
            blk = np.asarray(states.obj_pos[:, 0])
            ee = ee_of(states)
            a = np.zeros((n_envs, A), np.float32)
            a[:, 3:6] = rpy0
            for i in range(n_envs):
                bx, by, bz = blk[i]
                exy = float(np.linalg.norm(ee[i, :2] - (bx, by)))
                if phase[i] == 0:          # lift clear of the table first
                    tgt = np.array([ee[i, 0], ee[i, 1],
                                    max(ee[i, 2], bz) + 0.12], np.float32)
                    grip = -1.0
                    if ee[i, 2] > bz + 0.09 or t >= 8:
                        phase[i] = 1
                elif phase[i] == 1:        # hover above the block
                    tgt = np.array([bx, by, bz + 0.10], np.float32)
                    grip = -1.0
                    if exy < 0.015 and abs(ee[i, 2] - (bz + 0.10)) < 0.03:
                        phase[i] = 2
                elif phase[i] == 2:        # staged descend (carrot in z);
                    grip = -1.0            # abort up if xy alignment lost
                    tgt = np.array([bx, by,
                                    max(bz + 0.008, ee[i, 2] - 0.035)],
                                   np.float32)
                    if exy > 0.03:
                        phase[i] = 1
                    elif exy < 0.02 and ee[i, 2] < bz + 0.03:
                        phase[i] = 3
                elif phase[i] == 3:         # close
                    tgt = np.array([bx, by, bz + 0.008], np.float32)
                    grip = 1.0
                    close_ctr[i] += 1
                    if close_ctr[i] >= 10:
                        phase[i] = 4
                        lift_ctr[i] = 0
                        z_at_test[i] = bz
                elif phase[i] == 4:         # VERIFY: test-lift 4 cm — if
                    grip = 1.0              # the block doesn't rise, the
                    tgt = np.array(         # grasp missed; retry once
                        [bx, by, z_at_test[i] + 0.05], np.float32)
                    lift_ctr[i] += 1
                    if bz > z_at_test[i] + 0.012:
                        phase[i] = 5        # verified grasp
                        hold_pos[i] = ee[i]
                    elif lift_ctr[i] >= 8:
                        if not retried[i]:
                            retried[i] = True
                            phase[i] = 0    # reopen, full second attempt
                            close_ctr[i] = 0
                        else:
                            phase[i] = 5    # give up verifying; carry on
                            hold_pos[i] = ee[i]
                else:                       # verified: hold a FIXED pose —
                    tgt = hold_pos[i]       # tracking the block would feed
                    grip = 1.0              # slippage back into a descent
                err = tgt - ee[i]
                moving = (prev_ee is None
                          or np.linalg.norm(ee[i] - prev_ee[i]) > 0.005)
                if phase[i] in (1, 2) and np.linalg.norm(err) > 0.03 \
                        and not moving:
                    bias[i] = np.clip(bias[i] + 0.5 * err, -0.15, 0.15)
                else:
                    bias[i] *= 0.8
                a[i, :3] = tgt + bias[i]
                a[i, 6] = grip
            prev_ee = ee
            states = stepA(states, jnp.asarray(a))
            d = np.linalg.norm(np.asarray(states.obj_pos[:, 0]) - goals,
                               axis=-1)
            hit = d < thresh
            first = np.where(ok | ~hit, first, t)
            ok |= hit
            t += 1
        # ---- phase B: MPC carry to the goal ----
        plans = init_plans(states)
        plans = plans._replace(
            mean=plans.mean.at[..., -1].set(1.0),
            sigma=plans.sigma.at[..., -1].set(0.15))
        for tc in range(n_steps):          # full carry budget after acquire
            key, kt = jax.random.split(key)
            states, plans, rs, ags = step_fn(states, plans, kt,
                                             carry_params)
            d = np.linalg.norm(np.asarray(ags) - goals, axis=-1)
            hit = d < thresh
            first = np.where(ok | ~hit, first, t + tc)
            ok |= hit
        succ.extend(ok.tolist())
        solve_steps.extend(first.tolist())
        if verbose:
            print(f"  pick batch {ep}: {ok.astype(int).tolist()} "
                  f"(acquired {int((phase >= 5).sum())}/{n_envs} "
                  f"in {t} steps)", flush=True)
    wall = time.perf_counter() - t_start
    succ = np.asarray(succ)
    solved = np.asarray(solve_steps)[succ]
    return {
        "family": "pick",
        "n_episodes": int(n_episodes),
        "success_rate": float(succ.mean()),
        "n_success": int(succ.sum()),
        "mean_solve_step": float(solved.mean()) if solved.size else None,
        "n_steps": int(n_steps),
        "wall_s": round(wall, 1),
        "controller": "two_phase_acquire_then_mpc_carry",
    }


def run_eval(families=GOAL_FAMILIES, *, env_id: str = "UR5PlayAbsRPY1Obj-v0",
             reach_id: str = "UR5Reach-v0", pick_id: str = "pandaPick-v0",
             mpc: Optional[MPCConfig] = None,
             n_episodes: int = 8, n_envs: int = 4, n_steps: int = 50,
             seed: int = 0, backend: str = "pallas",
             interpret: bool = False, n_substeps: Optional[int] = None,
             verbose: bool = False) -> Dict[str, Dict]:
    """Full eval sweep. ONE jitted step_fn is shared by all play families
    (goal + site params are data); reach and pick compile their own
    (different env models)."""
    if mpc is None:
        mpc = MPCConfig(horizon=10, pop=1024, iters=2, algorithm="mppi",
                        sigma_init=0.3)
    results = {}
    m_play = core.build_model(CATALOG[env_id])
    play_fams = [f for f in families if f not in ("reach", PICK_FAMILY)]
    step_play = jax.jit(make_batched_fused_mpc_step(
        m_play, mpc, n_envs, backend=backend, interpret=interpret,
        n_substeps=n_substeps, cost_fn=make_play_cost(m_play),
        with_ee=True)) if play_fams else None
    for fam in families:
        if fam == PICK_FAMILY:
            m = core.build_model(CATALOG[pick_id])
            res = eval_pick(m, mpc, n_episodes=n_episodes, n_envs=n_envs,
                            n_steps=n_steps, seed=seed, backend=backend,
                            interpret=interpret, n_substeps=n_substeps,
                            verbose=verbose)
        elif fam == "reach":
            m = core.build_model(CATALOG[reach_id])
            res = eval_family(m, mpc, fam, n_episodes=n_episodes,
                              n_envs=n_envs, n_steps=n_steps, seed=seed,
                              backend=backend, interpret=interpret,
                              n_substeps=n_substeps, verbose=verbose)
        else:
            # the block family gets 1.5x the step budget: free-body pushes
            # routinely need >2 sim-seconds (r5 measurement: 0.94 at 75
            # steps vs 0.75 at 50, every other family saturates by 50)
            fam_steps = int(round(n_steps * 1.5)) if fam == "block" \
                else n_steps
            res = eval_family(m_play, mpc, fam, n_episodes=n_episodes,
                              n_envs=n_envs, n_steps=fam_steps, seed=seed,
                              backend=backend, interpret=interpret,
                              n_substeps=n_substeps, step_fn=step_play,
                              verbose=verbose)
        results[fam] = res
        if verbose:
            print(f"{fam}: {res['success_rate']:.2f} "
                  f"({res['n_success']}/{res['n_episodes']})", flush=True)
    return results
