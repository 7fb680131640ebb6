"""Tools round-trips: teleop bridge protocol + distributed-launch harness."""
import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_teleop_bridge_round_trip():
    """Scripted driver ↔ bridge: reset → step → goal injection → state
    injection reset — the CPU-mirror surface replacing the reference's VR
    SHARED_MEMORY attach (environments.py:252-267)."""
    import teleop_bridge as tb

    b = tb.Bridge("UR5Reach-v0", seed=0)
    r = b.handle({"cmd": "reset"})
    assert r["ok"] and "obs_quat" in r["obs"]
    obs0 = np.asarray(r["obs"]["obs_quat"], np.float32)

    a = [0.0] * 7
    r = b.handle({"cmd": "step", "action": a})
    assert r["ok"] and isinstance(r["reward"], float)
    assert r["done"] is False
    assert "is_success" in r["info"]

    g = [0.05, 0.1, 0.05]
    r = b.handle({"cmd": "goal", "goal": g})
    assert r["ok"]
    np.testing.assert_allclose(r["goal"], g, atol=1e-6)

    # state injection: reset(o) restores from an obs vector
    r = b.handle({"cmd": "reset", "o": obs0.tolist()})
    assert r["ok"]
    np.testing.assert_allclose(
        np.asarray(r["obs"]["obs_quat"])[:3], obs0[:3], atol=5e-2)

    r = b.handle({"cmd": "state"})
    assert r["ok"] and r["obs"] is not None
    assert b.handle({"cmd": "nope"})["ok"] is False
    assert b.handle({"cmd": "close"})["closed"] is True


def test_teleop_bridge_serve_loop():
    """serve(): newline-JSON in, newline-JSON out, exits on close."""
    import io
    import teleop_bridge as tb

    b = tb.Bridge("UR5Reach-v0", seed=1)
    lines = [json.dumps({"cmd": "reset"}),
             json.dumps({"cmd": "step", "action": [0.0] * 7}),
             "not json",
             json.dumps({"cmd": "close"}),
             json.dumps({"cmd": "reset"})]     # after close: unreached
    out = io.StringIO()
    tb.serve(b, io.StringIO("\n".join(lines) + "\n"), out)
    resp = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(resp) == 4                      # close stopped the loop
    assert resp[0]["ok"] and resp[1]["ok"]
    assert resp[2]["ok"] is False              # bad json reported
    assert resp[3]["closed"]


def test_launch_distributed_restart_resumes(tmp_path):
    """Abort-and-restart: run 2 steps (checkpoint every step), relaunch
    with a higher step target — the second run must RESUME from the
    checkpoint, not restart from zero (SURVEY.md §5 failure-detection
    row)."""
    import launch_distributed as ld

    ck = str(tmp_path / "mpc_ckpt.npz")
    # 2-device mesh / pop=256: the smallest shape that still exercises the
    # sharded planner's collectives. 1 CPU core time-shares the virtual
    # devices, so per-device work must stay well under the (raised, see
    # conftest) XLA:CPU collective rendezvous timeout.
    argv = ["--steps", "2", "--ckpt", ck, "--ckpt-every", "1",
            "--pop", "256", "--horizon", "2", "--iters", "1", "--devices",
            "2", "--block-envs", "128", "--dryrun", "--env", "pandaPick-v0"]
    out1 = ld.run_loop(ld.parse_args(argv))
    assert out1["start"] == 0 and out1["steps_run"] == 2
    assert os.path.exists(ck)

    argv2 = argv.copy()
    argv2[1] = "4"
    out2 = ld.run_loop(ld.parse_args(argv2))
    assert out2["start"] == 2                  # resumed, not restarted
    assert out2["steps_run"] == 2
