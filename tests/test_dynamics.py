"""ABA forward-dynamics tests: analytic pendulum, energy behavior, servo."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticsplayroompybullet_tpu.models.kinetree import KineTree
from roboticsplayroompybullet_tpu.models import kinetree
from roboticsplayroompybullet_tpu.ops import dynamics as dyn


def _pendulum_tree(m=1.0, l=0.5, I_com=0.0):
    """1-DoF pendulum: revolute about world y at origin, COM at -z*l."""
    f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float32))
    return KineTree(
        pre_pos=f32([[0, 0, 0]]), pre_quat=f32([[0, 0, 0, 1]]),
        axis=f32([[0, 1, 0]]),
        lower=f32([-100.0]), upper=f32([100.0]), effort=f32([100.0]),
        max_velocity=f32([100.0]), damping=f32([0.0]),
        mass=f32([m]), com=f32([[0, 0, -l]]),
        inertia=f32(np.eye(3) * I_com),
        parent_arr=jnp.asarray(np.array([-1], dtype=np.int32)),
        site_pos=f32(np.zeros((0, 3))), site_quat=f32(np.zeros((0, 4))),
        base_pos=f32([0, 0, 0]), base_quat=f32([0, 0, 0, 1]),
        n_dof=1, parent=(-1,), jtype=(0,), site_parent=(), site_names=(),
        name="pendulum",
    )


def test_pendulum_analytic_acceleration():
    """qdd = -(m g l / I) sin(theta) with I = m l^2 (point mass)."""
    m, l, g = 1.3, 0.4, 9.8
    tree = _pendulum_tree(m, l)
    for theta in [0.0, 0.3, 1.0, -0.7]:
        res = dyn.aba(tree, jnp.array([theta], jnp.float32),
                      jnp.zeros(1), jnp.zeros(1))
        # theta measured from straight-down (com at -z when theta=0);
        # rotation about +y moves com toward +x: torque = -m g l sin(theta)
        expected = -(m * g * l * np.sin(theta)) / (m * l * l)
        np.testing.assert_allclose(float(res.qdd[0]), expected, rtol=1e-4,
                                   atol=1e-5)


def test_pendulum_energy_conservation():
    m, l = 1.0, 0.5
    tree = _pendulum_tree(m, l)
    dt = 1e-4

    def step(carry, _):
        q, qd = carry
        res = dyn.aba(tree, q, qd, jnp.zeros(1))
        qd = qd + dt * res.qdd
        q = q + dt * qd
        return (q, qd), None

    q0 = jnp.array([1.2], jnp.float32)
    (q1, qd1), _ = jax.lax.scan(step, (q0, jnp.zeros(1)), None, length=2000)

    def energy(q, qd):
        h = -l * np.cos(float(q[0]))
        return m * 9.8 * h + 0.5 * m * l * l * float(qd[0]) ** 2

    e0, e1 = energy(q0, jnp.zeros(1)), energy(q1, qd1)
    assert abs(e1 - e0) < 0.02 * abs(e0) + 1e-3, (e0, e1)


def test_double_pendulum_matches_lagrangian():
    """2-link planar pendulum vs explicit Lagrangian mass-matrix solution."""
    m1 = m2 = 1.0
    l1 = l2 = 0.3
    f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float32))
    tree = KineTree(
        pre_pos=f32([[0, 0, 0], [0, 0, -l1]]),
        pre_quat=f32([[0, 0, 0, 1], [0, 0, 0, 1]]),
        axis=f32([[0, 1, 0], [0, 1, 0]]),
        lower=f32([-100, -100]), upper=f32([100, 100]),
        effort=f32([100, 100]), max_velocity=f32([100, 100]),
        damping=f32([0, 0]),
        mass=f32([m1, m2]), com=f32([[0, 0, -l1], [0, 0, -l2]]),
        inertia=f32(np.zeros((2, 3, 3))),
        parent_arr=jnp.asarray(np.array([-1, 0], dtype=np.int32)),
        site_pos=f32(np.zeros((0, 3))), site_quat=f32(np.zeros((0, 4))),
        base_pos=f32([0, 0, 0]), base_quat=f32([0, 0, 0, 1]),
        n_dof=2, parent=(-1, 0), jtype=(0, 0), site_parent=(), site_names=(),
        name="dp",
    )
    g = 9.8
    rng = np.random.default_rng(3)
    for _ in range(3):
        t1, t2 = rng.uniform(-1, 1, 2)
        w1, w2 = rng.uniform(-1, 1, 2)
        res = dyn.aba(tree, f32([t1, t2]), f32([w1, w2]), jnp.zeros(2))
        # standard double-pendulum equations (absolute angle of link2 = t1+t2)
        a = (m1 + m2) * l1 * l1
        b = m2 * l1 * l2 * np.cos(t2)
        c = m2 * l2 * l2
        M = np.array([[a + c + 2 * b, c + b], [c + b, c]])
        h = m2 * l1 * l2 * np.sin(t2)
        C = np.array([-h * w2 * (2 * w1 + w2), h * w1 * w1])
        G = np.array([(m1 + m2) * g * l1 * np.sin(t1)
                      + m2 * g * l2 * np.sin(t1 + t2),
                      m2 * g * l2 * np.sin(t1 + t2)])
        qdd = np.linalg.solve(M, -(C + G))
        np.testing.assert_allclose(np.asarray(res.qdd), qdd, rtol=2e-3,
                                   atol=2e-3)


def test_aba_articulated_diag_positive():
    tree = kinetree.panda_tree()
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.uniform(-1, 1, tree.n_dof).astype(np.float32))
    res = dyn.aba(tree, q, jnp.zeros(tree.n_dof), jnp.zeros(tree.n_dof))
    assert np.all(np.asarray(res.D) > 0)


def test_servo_tracks_target():
    """Panda arm under the bullet-style servo should converge toward the
    target pose within ~0.5 s of simulated time (environments.py:1027-1029)."""
    tree = kinetree.panda_tree()
    dt = 1.0 / 300.0
    q0 = jnp.asarray(np.array([-0.6, 0.437, 0.217, -2.09, 1.1, 1.4, 1.3,
                               0.0, 0.0], dtype=np.float32))
    target = q0 + jnp.asarray(np.array([0.1, -0.1, 0.05, 0.1, -0.05, 0.05,
                                        0.1, 0.0, 0.0], dtype=np.float32))
    max_force = jnp.full((tree.n_dof,), 240.0)

    def substep(carry, _):
        q, qd = carry
        res = dyn.aba(tree, q, qd, jnp.zeros(tree.n_dof))
        qd_free = qd + dt * res.qdd
        qd_new = dyn.servo_velocity_impulse(q, qd_free, res.D, target,
                                            max_force, dt)
        q_new = q + dt * qd_new
        q_new, qd_new = dyn.joint_limit_clamp(tree, q_new, qd_new)
        return (q_new, qd_new), None

    (q, qd), _ = jax.lax.scan(substep, (q0, jnp.zeros(tree.n_dof)), None,
                              length=150)
    err = np.abs(np.asarray(q)[:7] - np.asarray(target)[:7])
    assert np.all(err < 0.02), err


def test_vmap_aba_consistency():
    """Batched ABA == loop of unbatched (vmap/pjit equivalence strategy)."""
    tree = kinetree.ur5e_tree()
    rng = np.random.default_rng(5)
    qs = rng.uniform(-1, 1, (4, tree.n_dof)).astype(np.float32)
    qds = rng.uniform(-1, 1, (4, tree.n_dof)).astype(np.float32)
    taus = rng.uniform(-1, 1, (4, tree.n_dof)).astype(np.float32)
    batched = jax.vmap(lambda q, qd, tau: dyn.aba(tree, q, qd, tau).qdd)(
        jnp.asarray(qs), jnp.asarray(qds), jnp.asarray(taus))
    for i in range(4):
        single = dyn.aba(tree, jnp.asarray(qs[i]), jnp.asarray(qds[i]),
                         jnp.asarray(taus[i])).qdd
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single),
                                   rtol=2e-4, atol=2e-4)
