"""Pin the committed scaling artifact (SCALING.json / SCALING.md).

Produced by `python tools/scaling.py --devices 1 2 4 8 --out SCALING.json`
on the virtual 8-device CPU mesh (the real-chip batch-saturation curve is
re-measured into every BENCH_r*.json by bench.py). On a 1-core host
per-device efficiency falls ~1/N by construction; the contract worth
pinning is that the sharded program runs at every mesh size and TOTAL
throughput is conserved — a collective deadlock, sharding-induced
recompile, or data-movement pathology would crater it.
"""
import json
import os

import pytest

pytestmark = pytest.mark.smoke

PATH = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(PATH):
        pytest.skip("SCALING.json missing: run tools/scaling.py")
    with open(PATH) as f:
        return json.load(f)


def test_scaling_artifact_shape(artifact):
    assert artifact["meta"]["weak_scaling"] is True
    rows = artifact["rows"]
    assert [r["devices"] for r in rows] == [1, 2, 4, 8], rows
    # 2-D dcn x env mesh actually exercised at 8 devices
    assert rows[-1]["mesh"] == {"dcn": 2, "env": 4}, rows[-1]
    for r in rows:
        assert r["batch"] == 64 * r["devices"], r


def test_total_throughput_conserved(artifact):
    rows = artifact["rows"]
    base = rows[0]["rollouts_per_s"]
    for r in rows[1:]:
        ratio = r["rollouts_per_s"] / base
        assert ratio >= 0.5, (
            f"{r['devices']}-device total throughput collapsed to "
            f"{ratio:.2f}x the single-device rate — sharding pathology")
