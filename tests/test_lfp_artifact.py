"""Pin floors under the committed LfP capability artifact (LFP_EVAL.json).

Produced by the full chain on the real chip:
    tools/collect_play.py  (>=1024 batched play episodes, the structured
                            play actor — learn/play_policy.py)
    tools/train_lfp.py     (goal-conditioned BC over relabelled windows,
                            in-RAM vectorized sampler)
    tools/eval_lfp.py      (closed-loop window-goal replay vs the same
                            play process)

The contract (VERDICT r4 item 5): window-goal SUCCESS RATE — EE within
5 cm of the goal arm position AND the reference's all-or-nothing play
threshold test on the 11-D scene part (playRewardFunc.py:16-77) — must be
at least 3x the play-process baseline and >=0.15 absolute. Distance
ratios are kept as secondary floors. This is the capability claim of the
learn/ stack (the reference exists to feed learning_from_play, reference
README.md:2-10) — loss-goes-down alone (tests/test_lfp.py) shows nothing.
"""
import json
import os

import pytest

pytestmark = pytest.mark.smoke

PATH = os.path.join(os.path.dirname(__file__), "..", "LFP_EVAL.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(PATH):
        pytest.skip("LFP_EVAL.json missing: run the collect/train/eval "
                    "chain (tools/eval_lfp.py) and commit the artifact")
    with open(PATH) as f:
        return json.load(f)


def test_lfp_artifact_provenance(artifact):
    meta = artifact["meta"]
    assert meta["episodes"] >= 64, meta
    assert meta["window"] >= 8, meta
    assert meta.get("actor") == "play_policy.make_play_actor", meta


def test_lfp_window_goal_success(artifact):
    """The headline capability floor: policy success >= 0.15 absolute and
    >= 3x the play-process baseline at window goals."""
    pol = artifact["policy"]["success_rate_any"]
    rnd = artifact["random"]["success_rate_any"]
    assert pol >= 0.15, (
        f"policy window-goal success {pol:.3f} < 0.15 absolute floor")
    assert pol >= 3.0 * rnd, (
        f"policy success {pol:.3f} < 3x baseline {rnd:.3f}")


def test_lfp_policy_beats_random(artifact):
    ratio = artifact["final_dist_ratio_policy_over_random"]
    assert ratio <= 0.85, (
        f"trained policy final-goal distance is {ratio:.3f}x random — "
        "the BC policy is not beating the baseline")
    # the arm-pose part of the goal must also be tracked better than
    # random (meters, interpretable): floor at 0.95x
    ee_ratio = (artifact["policy"]["final_ee_dist_mean_m"]
                / max(artifact["random"]["final_ee_dist_mean_m"], 1e-9))
    assert ee_ratio <= 0.95, artifact
