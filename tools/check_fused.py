"""Full equivalence sweep: fused lane physics vs the vmap oracle.

Slow (CPU compiles of the full playroom); run on demand:
    python tools/check_fused.py UR5PlayAbsRPY1Obj-v0
Expected: max diffs at float-rounding level (<1e-5) on every state field.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from roboticsplayroompybullet_tpu.envs.config import CATALOG  # noqa: E402
from roboticsplayroompybullet_tpu.envs import core, physics  # noqa: E402
from roboticsplayroompybullet_tpu.ops import fused_step as fs  # noqa: E402
from roboticsplayroompybullet_tpu.parallel import rollout as R  # noqa: E402


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "UR5PlayAbsRPY1Obj-v0"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    m = core.build_model(CATALOG[env_id])
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.jit(lambda k: R.batched_reset(m, k))(keys)
    states = states.replace(
        qd=jax.random.normal(jax.random.PRNGKey(1), states.qd.shape) * 0.3,
        grip=jax.random.uniform(jax.random.PRNGKey(2), states.grip.shape))

    ref = jax.jit(jax.vmap(lambda s: physics.run_simulation(
        m.cfg, m.tree, m.arm, m.scene, s)))(states)

    X = fs.pack_state(m.cfg, m.tree, states)
    sim = fs.make_reference_sim(m.cfg, m.tree, m.arm, m.scene)
    X2 = jax.jit(sim)(X, states.ctrl_q.T.astype(jnp.float32),
                      states.grip.astype(jnp.float32))
    lane = fs.unpack_state(m.cfg, m.tree, X2, states)

    worst = 0.0
    for f in ["q", "qd", "obj_pos", "obj_quat", "obj_vel", "obj_angvel",
              "art_q", "art_qd"]:
        a = np.asarray(getattr(ref, f))
        b = np.asarray(getattr(lane, f))
        if a.size == 0:
            continue
        d = np.abs(a - b)
        worst = max(worst, float(d.max()))
        print(f"{f:12s} max {d.max():.3e} mean {d.mean():.3e}")
    print("PASS" if worst < 1e-4 else "FAIL", f"(worst {worst:.3e})")
    sys.exit(0 if worst < 1e-4 else 1)


if __name__ == "__main__":
    main()
