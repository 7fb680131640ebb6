"""iLQR over the differentiable physics rollouts.

The BASELINE.json north star pairs the sampling solver with an
iLQR/sequential-QP refiner. The env step is pure JAX (piecewise-
differentiable contacts via `jnp.where`), so the linearizations are exact
`jacrev` products — no finite differences.

Design:
  * The differentiable state x is the DYNAMIC slice of EnvState
    (q, qd, ctrl_q, grip, object pose/vel, articulated q/qd) — goal, rng,
    continuity buffers are frozen from the nominal state.
  * Backward pass: regularized Riccati recursion as a `lax.scan` over the
    horizon (time stays device-local, SURVEY.md §2.3).
  * Forward pass: batched line search — ALL step sizes rolled out
    simultaneously via `vmap` (a TPU-friendly replacement for the serial
    backtracking loop), best feasible one selected with `argmin`.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..envs import core
from ..envs.core import EnvModel
from ..envs.obs import achieved_goal
from ..envs.state import EnvState
from .cost import CostWeights, goal_distance


# ---------------------------------------------------------------------------
# flat dynamic-state view
# ---------------------------------------------------------------------------

_DYN_FIELDS = ("q", "qd", "ctrl_q", "grip", "obj_pos", "obj_quat",
               "obj_vel", "obj_angvel", "art_q", "art_qd")


def _extract(state: EnvState) -> jnp.ndarray:
    return jnp.concatenate([
        jnp.ravel(getattr(state, f)).astype(jnp.float32)
        if getattr(state, f).ndim else getattr(state, f)[None]
        for f in _DYN_FIELDS])


def _inject(template: EnvState, x: jnp.ndarray) -> EnvState:
    kw = {}
    idx = 0
    for f in _DYN_FIELDS:
        ref = getattr(template, f)
        n = max(1, ref.size)
        sl = x[idx:idx + n]
        kw[f] = sl.reshape(ref.shape).astype(ref.dtype)
        idx += n
    return template.replace(**kw)


def make_flat_dynamics(m: EnvModel, template: EnvState):
    """f(x, u) -> x', cost(x, u) -> scalar; template freezes the
    non-dynamic fields (goal, rng, buffers)."""

    def f(x, u):
        s = _inject(template, x)
        s2 = core.step_physics_only(m, s, u)
        return _extract(s2)

    return f


def make_stage_cost(m: EnvModel, template: EnvState,
                    w: CostWeights = CostWeights()):
    goal = template.goal

    def stage(x, u):
        s = _inject(template, x)
        ag = achieved_goal(m.cfg, m.tree, m.arm, s)
        return goal_distance(m.cfg, ag, goal, w) + w.action * jnp.sum(u * u)

    def final(x):
        s = _inject(template, x)
        ag = achieved_goal(m.cfg, m.tree, m.arm, s)
        return w.terminal * goal_distance(m.cfg, ag, goal, w)

    return stage, final


# ---------------------------------------------------------------------------
# generic iLQR core (flat vectors)
# ---------------------------------------------------------------------------

class ILQRConfig(NamedTuple):
    iters: int = 10
    reg_init: float = 1.0
    reg_min: float = 1e-6
    reg_max: float = 1e6
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)


class ILQRResult(NamedTuple):
    us: jnp.ndarray       # (H, A) optimized controls
    xs: jnp.ndarray       # (H+1, n) optimized trajectory
    cost: jnp.ndarray     # () final total cost
    cost_trace: jnp.ndarray  # (iters,)


def _rollout_flat(f, stage, final, x0, us):
    def body(x, u):
        xn = f(x, u)
        return xn, (xn, stage(x, u))
    xH, (xs, cs) = jax.lax.scan(body, x0, us)
    xs = jnp.concatenate([x0[None], xs])
    return xs, jnp.sum(cs) + final(xs[-1])


def ilqr(f, stage, final, x0: jnp.ndarray, us0: jnp.ndarray,
         cfg: ILQRConfig = ILQRConfig(),
         u_low=None, u_high=None) -> ILQRResult:
    """Regularized iLQR. f/stage/final operate on flat vectors."""
    H, A = us0.shape
    n = x0.shape[0]

    f_jac = jax.jacrev(f, argnums=(0, 1))
    stage_grad = jax.grad(stage, argnums=(0, 1))
    stage_hess = jax.hessian(stage, argnums=(0, 1))
    final_grad = jax.grad(final)
    final_hess = jax.hessian(final)

    def clamp(u):
        if u_low is None:
            return u
        return jnp.clip(u, u_low, u_high)

    def backward(xs, us, reg):
        def lin(x, u):
            A_, B_ = f_jac(x, u)
            (lx, lu) = stage_grad(x, u)
            ((lxx, lxu), (lux, luu)) = stage_hess(x, u)
            return A_, B_, lx, lu, lxx, luu, lux
        As, Bs, lxs, lus, lxxs, luus, luxs = jax.vmap(lin)(xs[:-1], us)

        Vx = final_grad(xs[-1])
        Vxx = final_hess(xs[-1])

        def body(carry, inp):
            Vx, Vxx, dV = carry
            A_, B_, lx, lu, lxx, luu, lux = inp
            Qx = lx + A_.T @ Vx
            Qu = lu + B_.T @ Vx
            Qxx = lxx + A_.T @ Vxx @ A_
            Quu = luu + B_.T @ Vxx @ B_ + reg * jnp.eye(A)
            Qux = lux + B_.T @ Vxx @ A_
            # solve with symmetrization for numerical hygiene
            Quu = 0.5 * (Quu + Quu.T)
            L = jnp.linalg.cholesky(Quu + 1e-9 * jnp.eye(A))
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            K = -jax.scipy.linalg.cho_solve((L, True), Qux)
            Vx_n = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
            dV_n = dV + k @ Qu
            return (Vx_n, Vxx_n, dV_n), (k, K)

        (_, _, dV), (ks, Ks) = jax.lax.scan(
            body, (Vx, Vxx, jnp.float32(0.0)),
            (As, Bs, lxs, lus, lxxs, luus, luxs), reverse=True)
        return ks, Ks, dV

    def forward(xs, us, ks, Ks, alpha):
        def body(x, inp):
            x_ref, u_ref, k, K = inp
            u = clamp(u_ref + alpha * k + K @ (x - x_ref))
            xn = f(x, u)
            return xn, (xn, u, stage(x, u))
        xH, (xs2, us2, cs) = jax.lax.scan(body, xs[0],
                                          (xs[:-1], us, ks, Ks))
        xs2 = jnp.concatenate([xs[0][None], xs2])
        return xs2, us2, jnp.sum(cs) + final(xs2[-1])

    xs0, c0 = _rollout_flat(f, stage, final, x0, us0)

    def iteration(carry, _):
        xs, us, cost, reg = carry
        ks, Ks, dV = backward(xs, us, reg)
        alphas = jnp.asarray(cfg.alphas, jnp.float32)
        xs_c, us_c, costs = jax.vmap(
            lambda a: forward(xs, us, ks, Ks, a))(alphas)
        best = jnp.argmin(costs)
        c_new = costs[best]
        improved = c_new < cost
        xs_n = jax.tree.map(lambda new, old: jnp.where(improved, new[best],
                                                       old), xs_c, xs)
        us_n = jnp.where(improved, us_c[best], us)
        cost_n = jnp.where(improved, c_new, cost)
        reg_n = jnp.clip(jnp.where(improved, reg * 0.5, reg * 4.0),
                         cfg.reg_min, cfg.reg_max)
        return (xs_n, us_n, cost_n, reg_n), cost_n

    (xs, us, cost, _), trace = jax.lax.scan(
        iteration, (xs0, us0, c0, jnp.float32(cfg.reg_init)),
        None, length=cfg.iters)
    return ILQRResult(us=us, xs=xs, cost=cost, cost_trace=trace)


# ---------------------------------------------------------------------------
# env-level wrapper
# ---------------------------------------------------------------------------

def ilqr_plan(m: EnvModel, state: EnvState, us0: jnp.ndarray,
              cfg: ILQRConfig = ILQRConfig(),
              w: CostWeights = CostWeights()) -> ILQRResult:
    """Refine an (H, A) action sequence from `state` with iLQR."""
    f = make_flat_dynamics(m, state)
    stage, final = make_stage_cost(m, state, w)
    high = jnp.asarray(m.cfg.action_high, jnp.float32)
    x0 = _extract(state)
    return ilqr(f, stage, final, x0, us0, cfg, u_low=-high, u_high=high)
