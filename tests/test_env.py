"""End-to-end env tests: obs layouts, determinism, state injection, stepping.

Keep the number of DISTINCT env configs small — each one compiles its own
XLA program (slow on the 1-core CI host). Reach + play cover the layout
space; deeper physics behavior is exercised in test_physics.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import roboticsplayroompybullet_tpu as rp


@pytest.fixture(scope="module")
def reach():
    return rp.make("UR5Reach-v0", seed=0)


@pytest.fixture(scope="module")
def play():
    return rp.make("UR5PlayAbsRPY1Obj-v0", seed=0)


def test_catalog_complete():
    """All 19 live registrations of the reference exist
    (roboticsPlayroomPybullet/__init__.py:3-99 minus the dead pointMass3D)."""
    expected = {
        "pandaReach-v0", "pandaReach2D-v0", "pandaPush-v0", "pandaPick-v0",
        "pandaPlay-v0", "pandaPlay1Obj-v0", "pandaPlayRel1Obj-v0",
        "pandaPlayJoints-v0", "pandaPlayRelJoints1Obj-v0",
        "pandaPlayAbsJoints1Obj-v0", "pandaPlayAbsRPY1Obj-v0",
        "pandaPlayRelRPY1Obj-v0", "UR5Reach-v0", "UR5Play1Obj-v0",
        "UR5PlayRel1Obj-v0", "UR5PlayRelJoints1Obj-v0",
        "UR5PlayAbsJoints1Obj-v0", "UR5PlayAbsRPY1Obj-v0",
        "UR5PlayRelRPY1Obj-v0",
    }
    assert expected == set(rp.ENV_IDS)


def test_reach_obs_layout(reach):
    """UR5Reach: no objects, velocity on, no orientation
    (environments.py:804-839)."""
    obs = reach.reset()
    assert obs["obs_quat"].shape == (7,)      # pos3 + vel3 + grip1
    assert obs["achieved_goal"].shape == (3,)
    assert obs["desired_goal"].shape == (3,)
    assert obs["controllable_achieved_goal"].shape == (4,)
    assert obs["full_positional_state"].shape == (4,)
    assert obs["joints"].shape == (8,)
    assert obs["velocity"].shape == (6,)
    # ag == ee pos for reach
    np.testing.assert_allclose(obs["achieved_goal"],
                               obs["controllable_achieved_goal"][:3],
                               atol=1e-6)


def test_reach_reset_not_solved(reach):
    """reset loops until not already successful (environments.py:179-186)."""
    for _ in range(3):
        obs = reach.reset()
        r = reach.compute_reward(obs["achieved_goal"], obs["desired_goal"])
        assert float(r) <= -1.0 or float(r) < -0.05


def test_reach_step_returns(reach):
    obs = reach.reset()
    a = np.zeros(reach.action_space.shape, np.float32)
    obs, r, done, info = reach.step(a)
    assert done is False                       # environments.py:212
    assert "is_success" in info and "target_poses" in info
    assert info["target_poses"].shape == (6,)


def test_reach_moves_toward_command(reach):
    obs = reach.reset()
    start = obs["achieved_goal"].copy()
    target = start + np.array([0.0, 0.0, 0.08], np.float32)
    a = np.concatenate([target, [np.pi, 0, 0], [0.0]]).astype(np.float32)
    for _ in range(20):
        obs, r, d, i = reach.step(a)
    err = np.linalg.norm(obs["achieved_goal"] - target)
    assert err < 0.03, (start, target, obs["achieved_goal"])


def test_play_obs_layout(play):
    obs = play.reset()
    assert obs["obs_quat"].shape == (19,)      # 8 arm + 7 obj + 4 scalars
    assert obs["observation"].shape == (18,)   # quat→euler re-encode
    assert obs["achieved_goal"].shape == (11,)
    assert obs["desired_goal"].shape == (11,)
    assert obs["full_positional_state"].shape == (19,)
    # ag layout: block pos/quat then drawer/door/button/dial
    # (playRewardFunc.py:9-14); articulated elements start at defaults
    # except the button (sprung toward 0.03, scenes.py:238)
    ag = obs["achieved_goal"]
    assert abs(ag[7]) < 0.02     # drawer y ≈ 0
    assert abs(ag[8]) < 0.02     # door ≈ 0
    assert 0.0 <= ag[9] <= 0.035  # button near its sprung target
    quat = ag[3:7]
    np.testing.assert_allclose(np.linalg.norm(quat), 1.0, atol=1e-3)


def test_play_block_settles_on_table(play):
    obs = play.reset()
    a = np.concatenate([obs["controllable_achieved_goal"][:3] + [0, 0, 0.1],
                        [np.pi, 0, 0], [0.0]]).astype(np.float32)
    for _ in range(15):
        obs, r, d, i = play.step(a)
    z = obs["achieved_goal"][2]
    # table top at -0.025, block half-height 0.025 → resting center ≈ 0
    assert -0.02 < z < 0.02, z
    s = play.state
    assert np.abs(np.asarray(s.obj_vel)).max() < 0.1


def test_play_goal_is_perturbed_ag(play):
    """Play goal = achieved goal with ONE perturbed dim
    (environments.py:511-516)."""
    obs = play.reset()
    diff = np.abs(obs["desired_goal"] - obs["achieved_goal"])
    assert (diff > 1e-4).sum() <= 2   # one perturbed dim (quat may renorm)


def test_state_injection_roundtrip(play):
    """reset(o) restores arm + object state (environments.py:173, 542-556):
    obs layout quirk — object pos read from o[11:14]."""
    obs1 = play.reset()
    o = np.zeros(18, np.float32)
    o[0:3] = [0.0, 0.2, 0.1]          # arm target pos
    o[3:7] = [0, 0, 0, 1.0]           # arm orn
    o[11:14] = [0.1, 0.15, 0.0]       # object pos (index 11, use_orientation)
    o[14:18] = [0, 0, 0, 1.0]
    obs2 = play.reset(o=o)
    np.testing.assert_allclose(obs2["achieved_goal"][:3], o[11:14], atol=1e-3)
    np.testing.assert_allclose(obs2["controllable_achieved_goal"][:3],
                               o[0:3], atol=0.02)


def test_reset_replaces_out_of_bounds_objects():
    """The reset re-place loop (environments.py:536-539): after the
    100-substep settle, any object coordinate past env_upper_bound triggers
    a full re-place. Shrinks env_range_high.x to 0 while the object draw
    spans x∈(-0.1, 0.1), so ~half of single placements settle out of
    bounds; the looped reset must always end in bounds."""
    from dataclasses import replace
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.envs.config import CATALOG

    cfg = replace(CATALOG["pandaPush-v0"], env_range_high=(0.0, 0.18, -0.04))
    m = core.build_model(cfg)
    place = jax.jit(lambda st, k: core._place_and_settle(m, st, k))
    reset_objs = jax.jit(lambda st, k: core._reset_objects(m, st, k, None))
    st0 = jax.jit(lambda k: core._default_state(m, k))(jax.random.PRNGKey(0))

    saw_oob = False
    for seed in range(8):
        k = jax.random.PRNGKey(seed)
        single = place(st0, k)
        if bool(core._objects_oob(cfg, single)):
            saw_oob = True
            looped = reset_objs(st0, k)
            assert not bool(core._objects_oob(cfg, looped)), seed
            # the loop actually moved the object back in bounds
            assert float(looped.obj_pos[0, 0]) <= 0.0 + 1e-6
    assert saw_oob, "no seed in 0..7 settled out of bounds; widen the scan"


def test_determinism(reach):
    reach.seed(123)
    obs1 = reach.reset()
    a = np.array([0.1, 0.2, 0.1, np.pi, 0, 0, 0], np.float32)
    obs1b, r1, _, _ = reach.step(a)
    reach.seed(123)
    obs2 = reach.reset()
    obs2b, r2, _, _ = reach.step(a)
    np.testing.assert_allclose(obs1["obs_quat"], obs2["obs_quat"], atol=1e-6)
    np.testing.assert_allclose(obs1b["obs_quat"], obs2b["obs_quat"],
                               atol=1e-6)
    assert r1 == r2


def test_batched_env_matches_shapes():
    env = rp.make("UR5Reach-v0", batch_size=4, seed=0)
    obs = env.reset()
    assert obs["obs_quat"].shape == (4, 7)
    a = jnp.zeros((4, 7), jnp.float32)
    obs, r, done, info = env.step(a)
    assert r.shape == (4,)
    assert obs["achieved_goal"].shape == (4, 3)


def test_play_button_press():
    """Active manipulation: scripted descent onto the playroom button
    depresses it past the toggle threshold (updateToggles,
    environments.py:469-483: pressed when < 0.025; sprung rest 0.03).
    Regression guard for the interior-contact-normal fix."""
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core

    m = core.build_model(CATALOG["pandaPlayAbsRPY1Obj-v0"])
    state, obs = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(0))
    btn = np.asarray(m.scene.art_anchor[2])
    step = jax.jit(lambda s, a: core.step(m, s, a))
    rpy = (np.pi, 0.0, -np.pi / 2)   # feasible downward yaw at the button
    min_btn = 1.0
    for z, n in ((btn[2] + 0.15, 30), (btn[2] + 0.012, 40)):
        a = jnp.asarray([btn[0], btn[1], z, *rpy, 1.0], jnp.float32)
        for _ in range(n):
            state, obs, r, info = step(state, a)
            min_btn = min(min_btn,
                          float(np.asarray(obs["achieved_goal"])[9]))
    assert min_btn < 0.025, min_btn


def test_pick_grasp_and_lift():
    """Active manipulation: staged approach (up → over → slow descend),
    close, lift — the block must rise with the gripper (>5 cm). Exercises
    pad-block contact incl. deep-penetration normals end-to-end."""
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.ops import kinematics as K, spatial as sp

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
            st, obs, r, info = step(st, a)
        return st, obs

    b = np.asarray(state.obj_pos[0])
    ee0 = np.asarray(obs["controllable_achieved_goal"])[:3]
    st, obs = go(state, (ee0[0], ee0[1], 0.15), -1.0, 20)    # up
    st, obs = go(st, (b[0], b[1], 0.15), -1.0, 25)           # over
    for zt in np.arange(0.12, b[2] + 0.005, -0.03):          # slow descend
        st, obs = go(st, (b[0], b[1], zt), -1.0, 8)
    st, obs = go(st, (b[0], b[1], b[2] + 0.008), -1.0, 20)
    st, obs = go(st, (b[0], b[1], b[2] + 0.008), 1.0, 15)    # close
    z0 = float(np.asarray(st.obj_pos[0])[2])
    st, obs = go(st, (b[0], b[1], b[2] + 0.15), 1.0, 35)     # lift
    lifted = float(np.asarray(st.obj_pos[0])[2]) - z0
    assert lifted > 0.05, lifted


def test_play_drawer_opens():
    """Active manipulation: hook the drawer handle and pull along −y; the
    prismatic drawer state must open past the 0.025 success threshold
    (playRewardFunc.py:33)."""
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.ops import kinematics as K, spatial as sp

    m = core.build_model(CATALOG["pandaPlayAbsRPY1Obj-v0"])
    state, obs = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(0))
    step = jax.jit(lambda s, a: core.step(m, s, a))
    rest = jnp.zeros(m.tree.n_dof, jnp.float32).at[:m.arm.n_arm].set(
        jnp.asarray(m.arm.rest_pose, jnp.float32))
    _, q0, _ = K.site_pose_and_jacobian(m.tree, rest, m.arm.ee_site)
    rpy = tuple(float(x) for x in np.asarray(sp.quat_to_euler(q0)))
    handle = np.asarray(m.scene.art_anchor[0]) + \
        np.asarray(m.scene.art_boxes_pos[0, 5])

    def go(st, pos, grip, n):
        a = jnp.asarray([*pos, *rpy, grip], jnp.float32)
        for _ in range(n):
            st, obs, r, info = step(st, a)
        return st, obs

    ee0 = np.asarray(obs["controllable_achieved_goal"])[:3]
    st, obs = go(state, (ee0[0], ee0[1], 0.15), -1.0, 20)
    st, obs = go(st, (handle[0], handle[1] - 0.01, 0.15), -1.0, 25)
    for zt in np.arange(0.12, handle[2] + 0.01, -0.03):
        st, obs = go(st, (handle[0], handle[1] - 0.01, zt), -1.0, 8)
    st, obs = go(st, (handle[0], handle[1] - 0.01, handle[2] + 0.01),
                 -1.0, 20)
    st, obs = go(st, (handle[0], handle[1] - 0.01, handle[2] + 0.01),
                 1.0, 15)
    st, obs = go(st, (handle[0], handle[1] - 0.15, handle[2] + 0.01),
                 1.0, 40)
    assert float(st.art_q[0]) < -0.03, float(st.art_q[0])


def test_play_door_slides():
    """Active manipulation: sweep the fist through the door handle; the
    prismatic door state must displace past the 0.04 success threshold
    (playRewardFunc.py:40-41)."""
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.ops import kinematics as K, spatial as sp

    m = core.build_model(CATALOG["pandaPlayAbsRPY1Obj-v0"])
    state, obs = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(0))
    step = jax.jit(lambda s, a: core.step(m, s, a))
    rest = jnp.zeros(m.tree.n_dof, jnp.float32).at[:m.arm.n_arm].set(
        jnp.asarray(m.arm.rest_pose, jnp.float32))
    _, q0, _ = K.site_pose_and_jacobian(m.tree, rest, m.arm.ee_site)
    rpy = tuple(float(x) for x in np.asarray(sp.quat_to_euler(q0)))
    handle = np.asarray(m.scene.art_anchor[1]) + \
        np.asarray(m.scene.art_boxes_pos[1, 1])

    def go(st, pos, grip, n):
        a = jnp.asarray([*pos, *rpy, grip], jnp.float32)
        for _ in range(n):
            st, obs, r, info = step(st, a)
        return st, obs

    ee0 = np.asarray(obs["controllable_achieved_goal"])[:3]
    st, obs = go(state, (ee0[0], ee0[1], 0.16), -1.0, 20)
    st, obs = go(st, (handle[0] - 0.05, handle[1], handle[2]), 1.0, 35)
    st, obs = go(st, (handle[0] + 0.12, handle[1], handle[2]), 1.0, 40)
    assert abs(float(st.art_q[1])) > 0.04, float(st.art_q[1])


def test_play_dial_spins():
    """Active manipulation: sweep the fist across the dial paddle's top
    edge (center push has no moment arm — the paddle is centered on the
    revolute anchor); the dial must rotate past the 0.3 success threshold
    in the mapped 0..1 space (playRewardFunc.py:55, scenes.py:342-343)."""
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.ops import kinematics as K, spatial as sp

    m = core.build_model(CATALOG["pandaPlayAbsRPY1Obj-v0"])
    state, obs = jax.jit(lambda k: core.reset(m, k))(jax.random.PRNGKey(0))
    step = jax.jit(lambda s, a: core.step(m, s, a))
    rest = jnp.zeros(m.tree.n_dof, jnp.float32).at[:m.arm.n_arm].set(
        jnp.asarray(m.arm.rest_pose, jnp.float32))
    _, q0, _ = K.site_pose_and_jacobian(m.tree, rest, m.arm.ee_site)
    rpy = tuple(float(x) for x in np.asarray(sp.quat_to_euler(q0)))
    anchor = np.asarray(m.scene.art_anchor[3])

    def go(st, pos, grip, n):
        a = jnp.asarray([*pos, *rpy, grip], jnp.float32)
        for _ in range(n):
            st, obs, r, info = step(st, a)
        return st, obs

    ee0 = np.asarray(obs["controllable_achieved_goal"])[:3]
    st, obs = go(state, (ee0[0], ee0[1], 0.16), 1.0, 20)
    st, obs = go(st, (anchor[0] - 0.08, anchor[1], anchor[2] + 0.025),
                 1.0, 35)
    st, obs = go(st, (anchor[0] + 0.08, anchor[1], anchor[2] + 0.025),
                 1.0, 40)
    mapped = (float(st.art_q[3]) % 2.0) * np.pi / (2.2 * np.pi)
    assert mapped > 0.3, (float(st.art_q[3]), mapped)
