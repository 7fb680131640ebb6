"""Pin floors under the committed LfP capability artifact (LFP_EVAL.json).

Produced by the full chain on the real chip:
    tools/collect_play.py  (>=512 batched play episodes, random policy)
    tools/train_lfp.py     (goal-conditioned BC over relabelled windows)
    tools/eval_lfp.py      (closed-loop window-goal replay vs random)

The contract: the trained policy's mean final achieved-goal distance to
the hindsight window goal must be meaningfully below the random-action
baseline rolled from the SAME injected start states and goals. This is
the capability claim of the learn/ stack (the reference exists to feed
learning_from_play, reference README.md:2-10) — loss-goes-down alone
(tests/test_lfp.py) does not show the policy learned anything usable.

The floor (ratio <= 0.85) is generous vs the measured value in EVAL.md so
seed/tunnel variance doesn't flake it; a policy no better than random
scores ~1.0.
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


def test_lfp_policy_beats_random(artifact):
    # measured (LFP_EVAL.json, real chip): ratio 0.79, EE 0.394 vs 0.474 m
    ratio = artifact["final_dist_ratio_policy_over_random"]
    assert ratio <= 0.85, (
        f"trained policy final-goal distance is {ratio:.3f}x random — "
        "the BC policy is not beating the baseline")
    # the arm-pose part of the goal must also be tracked better than
    # random (meters, interpretable): floor at 0.95x
    ee_ratio = (artifact["policy"]["final_ee_dist_mean_m"]
                / max(artifact["random"]["final_ee_dist_mean_m"], 1e-9))
    assert ee_ratio <= 0.95, artifact
