"""Data-parallel execution over device meshes (SURVEY.md §2.3 mapping)."""
from .mesh import (make_mesh, batch_spec, batch_sharding,
                   replicated_sharding, shard_batch, mesh_size,
                   ENV_AXIS, DCN_AXIS)
from .rollout import (batched_reset, batched_step, batched_rollout,
                      make_sharded_rollout, make_sharded_step, success_rate)
from .fused import (supports_fused, make_fused_rollout,
                    make_fused_rollout_whole, make_fused_batched_step,
                    make_sharded_fused_rollout)
# NB: the single-env `rollout` FUNCTION is deliberately not re-exported —
# it would shadow the `parallel.rollout` submodule attribute.

__all__ = [
    "make_mesh", "batch_spec", "batch_sharding", "replicated_sharding",
    "shard_batch", "mesh_size", "ENV_AXIS", "DCN_AXIS",
    "batched_reset", "batched_step", "batched_rollout",
    "make_sharded_rollout", "make_sharded_step", "success_rate",
    "supports_fused", "make_fused_rollout", "make_fused_rollout_whole",
    "make_fused_batched_step", "make_sharded_fused_rollout",
]
