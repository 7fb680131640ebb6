"""Physics property suite: the fidelity instrument PyBullet can't be here.

The PyBullet oracle is uninstallable in this environment (no network), so
conservation laws, the Coulomb cone, dissipation, penetration bounds, and
grasp endurance carry the fidelity burden for the contact solver + full
substep (reference hot loop environments.py:485-490; Bullet PGS solver
with solverResidualThreshold=0, environments.py:326). Measured tolerances
are recorded in FIDELITY.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roboticsplayroompybullet_tpu.envs.config import CATALOG
from roboticsplayroompybullet_tpu.envs import core, physics
from roboticsplayroompybullet_tpu.envs import contact_solver as solver
from roboticsplayroompybullet_tpu.ops import contact as ct
from roboticsplayroompybullet_tpu.ops import spatial as sp


# ---------------------------------------------------------------------------
# direct solver properties
# ---------------------------------------------------------------------------

def _two_block_solve(v_a, v_b, w_a=(0, 0, 0), w_b=(0, 0, 0), mu=0.5,
                     normal=(-1.0, 0.0, 0.0), point=(0.0, 0.0, 0.0)):
    """One block-block contact row, no world/art/gripper coupling.

    Solver convention (contact_solver.ContactRows): `normal` points INTO
    body A. A sits at x=-0.02, B at x=+0.02, so the contact normal is -x.
    """
    m, I = 0.3, 1e-4
    rows = solver.ContactRows(
        point=jnp.asarray([point], jnp.float32),
        normal=jnp.asarray([normal], jnp.float32),
        depth=jnp.asarray([1e-3], jnp.float32),
        v_kin=jnp.zeros((1, 3), jnp.float32),
        mu=jnp.asarray([mu], jnp.float32),
        blk_a=jnp.asarray([0], jnp.int32), blk_b=jnp.asarray([1], jnp.int32),
        art=jnp.asarray([-1], jnp.int32), grip=jnp.asarray([-1], jnp.int32),
        pad=jnp.asarray([-1], jnp.int32))
    obj_pos = jnp.asarray([[-0.02, 0.0, 0.0], [0.02, 0.0, 0.0]], jnp.float32)
    obj_vel = jnp.asarray([v_a, v_b], jnp.float32)
    obj_angvel = jnp.asarray([w_a, w_b], jnp.float32)
    inv_m = jnp.full((2,), 1.0 / m, jnp.float32)
    inv_I = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None] / I, (2, 1, 1))
    res = solver.solve(
        rows, obj_pos, obj_vel, obj_angvel, inv_m, inv_I,
        art_anchor=np.zeros((4, 3), np.float32),
        art_axis=np.tile(np.array([0.0, 0.0, 1.0], np.float32), (4, 1)),
        art_revolute_mask=np.zeros(4, bool),
        inv_m_art=np.ones(4, np.float32),
        art_qd=jnp.zeros(4, jnp.float32),
        grip_u=jnp.zeros((1, 3), jnp.float32),
        inv_m_grip=jnp.zeros(1, jnp.float32),
        grip_qd=jnp.zeros(1, jnp.float32),
        dt=1.0 / 300.0)
    return m, I, obj_pos, obj_vel, obj_angvel, res


def test_solver_block_block_conserves_momentum():
    """Internal (block-block) impulses are equal and opposite: linear AND
    angular momentum (about the origin) are conserved to float rounding."""
    m, I, pos, v0, w0, res = _two_block_solve(
        v_a=(0.5, 0.1, 0.0), v_b=(-0.4, 0.0, 0.05),
        w_a=(0.0, 2.0, 0.0), w_b=(1.0, 0.0, 0.0))
    # the impulse must actually fire (approaching pair), else this test
    # would pass vacuously
    assert float(jnp.linalg.norm(res.obj_vel - v0)) > 0.05
    p0 = m * (v0[0] + v0[1])
    p1 = m * (res.obj_vel[0] + res.obj_vel[1])
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-6)
    L = lambda p, v, w: m * jnp.cross(p, v) + I * w
    L0 = L(pos[0], v0[0], w0[0]) + L(pos[1], v0[1], w0[1])
    L1 = L(pos[0], res.obj_vel[0], res.obj_angvel[0]) \
        + L(pos[1], res.obj_vel[1], res.obj_angvel[1])
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=1e-6)


def test_solver_impulse_dissipates_and_separates():
    """Head-on approach: zero restitution leaves the pair non-approaching
    (vn' ≥ 0 up to the clamped Baumgarte push-out) and never adds kinetic
    energy."""
    m, I, pos, v0, w0, res = _two_block_solve(v_a=(0.5, 0.0, 0.0),
                                              v_b=(-0.5, 0.0, 0.0))
    # vn' = (vA - vB) · n with n = (-1,0,0) into A: the solver drives the
    # approach (vn' < 0) to the clamped Baumgarte push-out target (≥ 0)
    vn = -float(res.obj_vel[0][0] - res.obj_vel[1][0])
    assert vn >= -1e-5                   # approach killed
    assert vn <= 0.06                    # ≤ v_push_max + rounding
    ke0 = 0.5 * m * float(jnp.sum(v0 ** 2))
    ke1 = 0.5 * m * float(jnp.sum(res.obj_vel ** 2)) \
        + 0.5 * I * float(jnp.sum(res.obj_angvel ** 2))
    assert ke1 <= ke0 + 1e-6


# ---------------------------------------------------------------------------
# full-substep properties (pure physics, arm parked away from the action)
# ---------------------------------------------------------------------------

def _parked_state(m, seed=0):
    """Reset, zero all motion, park servo targets at the current pose."""
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(seed))
    return state.replace(
        qd=jnp.zeros_like(state.qd),
        ctrl_q=state.q[:m.arm.n_arm],
        grip=jnp.zeros_like(state.grip),
        obj_vel=jnp.zeros_like(state.obj_vel),
        obj_angvel=jnp.zeros_like(state.obj_angvel),
        art_qd=jnp.zeros_like(state.art_qd))


def test_substep_internal_collision_conserves_momentum():
    """Two blocks colliding mid-air (no floor/pad/art rows active): the
    full substep changes total block momentum by EXACTLY the gravity
    impulse 2·m·g·dt."""
    m = core.build_model(CATALOG["pandaPlay-v0"])       # 2-object playroom
    state = _parked_state(m)
    half = np.asarray(m.scene.block_half)
    # overlap slightly along x in free space above the scene
    c = np.array([0.0, 0.15, 0.35], np.float32)
    state = state.replace(
        obj_pos=jnp.asarray([c - [half[0] - 0.002, 0, 0],
                             c + [half[0] - 0.002, 0, 0]], jnp.float32),
        obj_quat=jnp.tile(jnp.asarray([0., 0., 0., 1.], jnp.float32),
                          (2, 1)),
        obj_vel=jnp.asarray([[0.4, 0.0, 0.0], [-0.4, 0.0, 0.0]],
                            jnp.float32))
    sub = jax.jit(lambda s: physics.physics_substep(m.cfg, m.tree, m.arm,
                                                    m.scene, s)[0])
    s2 = sub(state)
    dt = m.cfg.dt
    mass = float(m.scene.block_mass)
    dp = mass * np.asarray(s2.obj_vel.sum(0) - state.obj_vel.sum(0))
    np.testing.assert_allclose(dp, [0.0, 0.0, -9.8 * dt * 2 * mass],
                               atol=1e-5)
    # the collision impulse must actually fire (approaching pair)
    assert abs(float(s2.obj_vel[0, 0] - state.obj_vel[0, 0])) > 0.05
    # nothing leaked into the articulated elements: art_qd matches a
    # control substep WITHOUT the collision (the button's restoring motor
    # + gravity along its prismatic axis move it autonomously every
    # substep, physics.py free-update — that part is expected)
    ctrl = state.replace(obj_pos=state.obj_pos.at[1, 2].add(0.5))
    s2c = sub(ctrl)
    np.testing.assert_allclose(np.asarray(s2.art_qd),
                               np.asarray(s2c.art_qd), atol=1e-6)


def test_sliding_block_friction_cone():
    """A block sliding on the plane decelerates inside the Coulomb cone:
    per-substep |Δv| ≤ μ·(g·dt + v_push_max), monotonically, and never
    reverses (μ_eff = block_fric/2, Bullet's multiplicative combine —
    physics.py mu_world)."""
    m = core.build_model(CATALOG["pandaPush-v0"])
    state = _parked_state(m, seed=1)
    half_z = float(np.asarray(m.scene.block_half)[2])
    z = float(np.asarray(m.scene.plane_z)) + half_z - 3e-4  # slight contact
    state = state.replace(
        obj_pos=state.obj_pos.at[0].set(
            jnp.asarray([0.0, 0.0, z], jnp.float32)),
        obj_quat=state.obj_quat.at[0].set(
            jnp.asarray([0., 0., 0., 1.], jnp.float32)),
        obj_vel=state.obj_vel.at[0].set(
            jnp.asarray([0.5, 0.0, 0.0], jnp.float32)))
    sub = jax.jit(lambda s: physics.physics_substep(m.cfg, m.tree, m.arm,
                                                    m.scene, s)[0])
    dt = m.cfg.dt
    mu = 0.5 * float(np.asarray(m.scene.block_fric))
    cap = mu * (9.8 * dt + 0.05) + 1e-4      # v_push_max=0.05 (solver)
    vx = [float(state.obj_vel[0, 0])]
    for _ in range(60):
        state = sub(state)
        vx.append(float(state.obj_vel[0, 0]))
    vx = np.asarray(vx)
    d = vx[:-1] - vx[1:]
    assert np.all(d >= -1e-4), "sliding block accelerated"
    assert np.all(d <= cap), (d.max(), cap)
    assert vx[-1] >= -1e-3, "friction reversed the motion"
    # friction genuinely acts while sliding
    sliding = vx[:-1] > 0.05
    assert np.all(d[sliding] >= 0.3 * mu * 9.8 * dt)


def test_passive_settling_energy_nonincrease():
    """Block dropped 3 cm: total mechanical energy never rises above its
    start by more than the clamped Baumgarte budget, and ends far below
    (zero restitution)."""
    m = core.build_model(CATALOG["pandaPush-v0"])
    state = _parked_state(m, seed=2)
    half_z = float(np.asarray(m.scene.block_half)[2])
    z0 = float(np.asarray(m.scene.plane_z)) + half_z + 0.03
    state = state.replace(
        obj_pos=state.obj_pos.at[0].set(
            jnp.asarray([0.0, 0.0, z0], jnp.float32)),
        obj_quat=state.obj_quat.at[0].set(
            jnp.asarray([0., 0., 0., 1.], jnp.float32)))
    sub = jax.jit(lambda s: physics.physics_substep(m.cfg, m.tree, m.arm,
                                                    m.scene, s)[0])
    mass = float(m.scene.block_mass)
    h = np.asarray(m.scene.block_half)
    I = mass / 3.0 * np.array([h[1] ** 2 + h[2] ** 2,
                               h[0] ** 2 + h[2] ** 2,
                               h[0] ** 2 + h[1] ** 2])

    def energy(s):
        v = np.asarray(s.obj_vel[0])
        w = np.asarray(s.obj_angvel[0])
        zz = float(s.obj_pos[0, 2])
        return (0.5 * mass * v @ v + 0.5 * w @ (I * w)
                + mass * 9.8 * zz)

    E0 = energy(state)
    Es = [E0]
    for _ in range(120):
        state = sub(state)
        Es.append(energy(state))
    Es = np.asarray(Es)
    assert Es.max() <= E0 + 5e-4, Es.max() - E0     # no energy injection
    assert Es[-1] <= E0 - 0.8 * mass * 9.8 * 0.03   # settled: PE dissipated
    assert abs(float(state.obj_vel[0, 2])) < 0.02   # at rest vertically


def test_long_play_rollout_penetration_bound():
    """200 random control steps (2400 substeps) on the full UR5 playroom:
    block corners never sink more than 1 cm below the plane, articulated
    joints stay inside limits, everything stays finite."""
    m = core.build_model(CATALOG["UR5PlayAbsRPY1Obj-v0"])
    state, _ = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(4))
    T = 200
    acts = jax.random.uniform(jax.random.PRNGKey(5),
                              (T, m.cfg.action_dim), jnp.float32, -0.4, 0.4)

    def body(s, a):
        s2 = core.step_physics_only(m, s, a)
        return s2, (s2.obj_pos[0], s2.obj_quat[0], s2.art_q)

    final, (ps, qs, arts) = jax.jit(
        lambda s, a: jax.lax.scan(body, s, a))(state, acts)
    ps, qs, arts = np.asarray(ps), np.asarray(qs), np.asarray(arts)
    assert np.all(np.isfinite(ps)) and np.all(np.isfinite(arts))
    corners = jax.vmap(lambda p, q: ct.box_corners(
        jnp.asarray(p), jnp.asarray(q), m.scene.block_half))(ps, qs)
    min_z = float(np.asarray(corners)[..., 2].min())
    plane = float(np.asarray(m.scene.plane_z))
    assert min_z > plane - 0.01, (min_z, plane)
    lo = np.asarray(m.scene.art_lower) - 1e-3
    hi = np.asarray(m.scene.art_upper) + 1e-3
    assert np.all(arts >= lo[None]) and np.all(arts <= hi[None])
    assert np.all(np.isfinite(np.asarray(final.q)))


def test_grasp_hold_endurance():
    """Pinch the block, lift, then HOLD for 100 control steps: no slip
    (> 1 cm sag) and no explosion (velocities bounded)."""
    from roboticsplayroompybullet_tpu.ops import kinematics as K

    m = core.build_model(CATALOG["pandaPick-v0"])
    state, obs = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(3))
    step = jax.jit(lambda s, a: core.step(m, s, a))
    rest = jnp.zeros(m.tree.n_dof, jnp.float32).at[:m.arm.n_arm].set(
        jnp.asarray(m.arm.rest_pose, jnp.float32))
    _, q0, _ = K.site_pose_and_jacobian(m.tree, rest, m.arm.ee_site)
    rpy = tuple(float(x) for x in np.asarray(sp.quat_to_euler(q0)))

    def go(st, pos, grip, n):
        a = jnp.asarray([*pos, *rpy, grip], jnp.float32)
        for _ in range(n):
            st, o, r, i = step(st, a)
        return st

    b = np.asarray(state.obj_pos[0])
    ee0 = np.asarray(obs["controllable_achieved_goal"])[:3]
    st = go(state, (ee0[0], ee0[1], 0.15), -1.0, 20)
    st = go(st, (b[0], b[1], 0.15), -1.0, 25)
    for zt in np.arange(0.12, b[2] + 0.005, -0.03):
        st = go(st, (b[0], b[1], zt), -1.0, 8)
    st = go(st, (b[0], b[1], b[2] + 0.008), -1.0, 20)
    st = go(st, (b[0], b[1], b[2] + 0.008), 1.0, 15)         # close
    st = go(st, (b[0], b[1], b[2] + 0.15), 1.0, 35)          # lift
    z_lift = float(st.obj_pos[0, 2])
    assert z_lift - b[2] > 0.05                              # grasp took
    hold = jnp.asarray([b[0], b[1], b[2] + 0.15, *rpy, 1.0], jnp.float32)

    def body(s, _):
        s2, o, r, i = core.step(m, s, jnp.asarray(hold))
        return s2, (s2.obj_pos[0, 2], jnp.max(jnp.abs(s2.obj_vel)))

    st, (zs, vmax) = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=100))(st)
    zs, vmax = np.asarray(zs), np.asarray(vmax)
    assert zs.min() > z_lift - 0.01, (zs.min(), z_lift)      # no slip
    assert vmax.max() < 2.0, vmax.max()                      # no explosion


# ---------------------------------------------------------------------------
# IK accuracy CDF (both arms) — quantified stats recorded in FIDELITY.md
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("env_id,iters", [("pandaPick-v0", 16),
                                          ("UR5Reach-v0", 24)])
def test_ik_accuracy_cdf(env_id, iters):
    """DLS IK accuracy in the THREE regimes the env actually exercises
    (measured CDFs recorded in FIDELITY.md):

      1. operating envelope, cold start — targets = FK of rest ± 0.5 rad
         (the reset_arm regime, environments.py:575-596): ≤2 mm /
         ≤0.01 rad @ p95.
      2. tracking — seed = true config ± 0.05 rad (the per-control-step
         regime: rate-limited targets near the current pose,
         environments.py:1013-1026): ≤1 cm @ p95, ≤5 cm max.
      3. whole-joint-space cold start — informational: median ≤5 mm, but
         ~10 % of targets sit in far IK branches the rest-pose-nullspace
         DLS won't cross (Bullet's one-shot IK has the same pathology —
         it is WHY the reference runs a shadow-client fixed point,
         inverseKinematics.py:10-14). No operating path does this."""
    from roboticsplayroompybullet_tpu.ops import kinematics as K

    m = core.build_model(CATALOG[env_id])
    tree, arm = m.tree, m.arm
    n_arm = arm.n_arm
    N = 64
    lo = jnp.asarray(tree.lower)[:n_arm]
    hi = jnp.asarray(tree.upper)[:n_arm]
    rest = jnp.zeros(tree.n_dof, jnp.float32).at[:n_arm].set(
        jnp.asarray(arm.rest_pose, jnp.float32))

    def errs(qs, seeds):
        qf = jax.vmap(lambda qa: rest.at[:n_arm].set(qa))(qs)
        tp, tq = jax.vmap(lambda q: K.fk_site(tree, q, arm.ee_site))(qf)
        sol = jax.vmap(lambda p, qt, s: K.ik_dls(
            tree, s, p, qt, rest, site=arm.ee_site, iters=iters,
            n_active=n_arm))(tp, tq, seeds)
        fp, fq = jax.vmap(lambda q: K.fk_site(tree, q, arm.ee_site))(sol)
        perr = np.asarray(jnp.linalg.norm(fp - tp, axis=-1))
        dots = np.abs(np.asarray(jnp.sum(fq * tq, axis=-1)))
        return perr, 2.0 * np.arccos(np.clip(dots, -1.0, 1.0))

    rest_seeds = jnp.tile(rest[None], (N, 1))

    # 1. operating envelope, cold start from rest
    q_op = jnp.clip(jnp.asarray(arm.rest_pose, jnp.float32)[None]
                    + jax.random.uniform(jax.random.PRNGKey(11),
                                         (N, n_arm), jnp.float32, -0.5, 0.5),
                    lo, hi)
    p1, r1 = errs(q_op, rest_seeds)
    assert np.quantile(p1, 0.95) < 2e-3, np.quantile(p1, 0.95)
    assert np.quantile(r1, 0.95) < 0.01, np.quantile(r1, 0.95)

    # 2. tracking: whole joint space, seed = truth ± 0.05 rad
    q_glob = jax.random.uniform(jax.random.PRNGKey(9), (N, n_arm),
                                jnp.float32, 0.15, 0.85) * (hi - lo) + lo
    seeds = jax.vmap(lambda qa: rest.at[:n_arm].set(qa))(q_glob)
    seeds = seeds.at[:, :n_arm].add(jax.random.uniform(
        jax.random.PRNGKey(33), (N, n_arm), jnp.float32, -0.05, 0.05))
    p2, _ = errs(q_glob, seeds)
    assert np.quantile(p2, 0.95) < 1e-2, np.quantile(p2, 0.95)
    assert p2.max() < 5e-2, p2.max()

    # 3. whole joint space, cold start: the far-branch tail is expected;
    # the typical target still lands
    p3, _ = errs(q_glob, rest_seeds)
    assert np.quantile(p3, 0.5) < 5e-3, np.quantile(p3, 0.5)
