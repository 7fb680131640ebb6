"""Sampling + gradient MPC solvers over differentiable rollouts."""
from .cost import CostWeights, goal_distance, trajectory_cost
from .mpc import (MPCConfig, PlanState, init_plan, shift_plan, plan,
                  make_sharded_planner, make_fused_planner,
                  make_sharded_fused_planner,
                  make_fused_mpc_rollout, mpc_rollout,
                  init_batched_plan, make_batched_fused_mpc_step)
from .eval import GOAL_FAMILIES, family_goals, eval_family, run_eval
from .ilqr import ILQRConfig, ILQRResult, ilqr, ilqr_plan
from .gradient import GradConfig, refine

__all__ = [
    "CostWeights", "goal_distance", "trajectory_cost",
    "MPCConfig", "PlanState", "init_plan", "shift_plan", "plan",
    "make_sharded_planner", "make_fused_planner",
    "make_sharded_fused_planner",
    "make_fused_mpc_rollout", "mpc_rollout",
    "init_batched_plan", "make_batched_fused_mpc_step",
    "GOAL_FAMILIES", "family_goals", "eval_family", "run_eval",
    "ILQRConfig", "ILQRResult", "ilqr", "ilqr_plan",
    "GradConfig", "refine",
]
