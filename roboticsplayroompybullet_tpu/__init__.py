"""roboticsplayroompybullet_tpu — TPU-native playroom manipulation framework.

A from-scratch JAX/XLA reimplementation of the capability surface of
sholtodouglas/RoboticsPlayroomPybullet (goal-conditioned robotic
manipulation: reach/push/pick/play with Panda & UR5e+Robotiq arms over a
tabletop playroom with door/drawer/button/dial), re-designed TPU-first:

  * physics = batched Featherstone ABA + penalty contact, pure `jax` (the
    role Bullet's C++ engine plays in the reference)
  * envs = pure functions over immutable state pytrees; `vmap` for batches,
    `lax.scan` for horizons, `shard_map` over device meshes for pods
  * solvers = sampling MPC (CEM/MPPI) + iLQR over differentiable rollouts

Quick start:
    import roboticsplayroompybullet_tpu as rp
    env = rp.make("UR5PlayAbsRPY1Obj-v0")      # single env, numpy I/O
    obs = env.reset(); obs, r, done, info = env.step(env.action_space.sample())
    batch = rp.make("UR5Reach-v0", batch_size=4096)   # TPU-batched
"""

from .envs.wrapper import make, PlayEnv, BatchedEnv          # noqa: F401
from .envs.config import EnvConfig, CATALOG                  # noqa: F401
from .envs.state import EnvState                             # noqa: F401
from .envs import core                                       # noqa: F401
from .gym_registry import register_gym_envs                  # noqa: F401

# mirror the reference's register-at-import surface
# (roboticsPlayroomPybullet/__init__.py:3-99) when gym is present
register_gym_envs()

__version__ = "0.1.0"
ENV_IDS = tuple(sorted(CATALOG))
