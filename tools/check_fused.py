"""Full-fidelity equivalence sweep: fused lane physics vs the vmap oracle.

Runs the FULL parity configuration (12 substeps at 300 Hz, 8 warm-started
contact iterations — exactly what env.step executes) on both twins and
prints a per-field max/mean divergence table, markdown-ready for
FIDELITY.md. CI runs the same comparison at reduced substeps
(tests/test_fused.py); this is the committed proof that the reduction
hides nothing.

Slow (CPU compiles of the full playroom); run on demand:
    python tools/check_fused.py                      # default 3-env sweep
    python tools/check_fused.py UR5PlayAbsRPY1Obj-v0 [more ids...]
Expected: max diffs at float-rounding level (<1e-4) on every state field.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from roboticsplayroompybullet_tpu.utils import jaxcache  # noqa: E402

jaxcache.setup(jax)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from roboticsplayroompybullet_tpu.envs.config import CATALOG  # noqa: E402
from roboticsplayroompybullet_tpu.envs import core, physics  # noqa: E402
from roboticsplayroompybullet_tpu.ops import fused_step as fs  # noqa: E402
from roboticsplayroompybullet_tpu.parallel import rollout as R  # noqa: E402

# both arms + the 2-object play scene: every contact-row family
# (pad/block/articulation/block-block) and both gripper models
DEFAULT_ENVS = ["UR5PlayAbsRPY1Obj-v0", "pandaPlayAbsRPY1Obj-v0",
                "pandaPlay-v0"]

FIELDS = ["q", "qd", "obj_pos", "obj_quat", "obj_vel", "obj_angvel",
          "art_q", "art_qd"]


def check_env(env_id: str, B: int = 256) -> float:
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
    print(f"\n## {env_id}  (B={B}, substeps={m.cfg.substeps}, "
          f"solve 8 warm-started)")
    print("| field | max | mean |\n|---|---|---|")
    for f in FIELDS:
        a = np.asarray(getattr(ref, f))
        b = np.asarray(getattr(lane, f))
        if a.size == 0:
            continue
        d = np.abs(a - b)
        worst = max(worst, float(d.max()))
        print(f"| {f} | {d.max():.1e} | {d.mean():.1e} |")
    print(f"{env_id}: {'PASS' if worst < 1e-4 else 'FAIL'} "
          f"(worst {worst:.3e})", flush=True)
    return worst


def main():
    args = [a for a in sys.argv[1:] if not a.isdigit()]
    bs = [int(a) for a in sys.argv[1:] if a.isdigit()]
    B = bs[0] if bs else 256
    envs = args or DEFAULT_ENVS
    worst = max(check_env(e, B) for e in envs)
    print(f"\nSWEEP {'PASS' if worst < 1e-4 else 'FAIL'} "
          f"(worst {worst:.3e})")
    sys.exit(0 if worst < 1e-4 else 1)


if __name__ == "__main__":
    main()
