"""Native episode log: roundtrip, index, windows; numpy fallback."""
import numpy as np
import pytest

from roboticsplayroompybullet_tpu.utils.episodelog import (
    EpisodeWriter, EpisodeReader, _load_lib)


pytestmark = pytest.mark.smoke

FIELDS = {"obs": 5, "act": 3}


def _write(path, n_eps=3, rng=None):
    rng = rng or np.random.default_rng(0)
    eps = []
    with EpisodeWriter(path, FIELDS) as w:
        for e in range(n_eps):
            w.begin_episode()
            T = 10 + 5 * e
            data = {k: rng.normal(size=(T, d)).astype(np.float32)
                    for k, d in FIELDS.items()}
            w.append_batch(data)
            eps.append(data)
            w.end_episode()
    return eps


def test_native_lib_builds():
    assert _load_lib() is not None, "native episodelog failed to build"


def test_roundtrip(tmp_path):
    p = str(tmp_path / "a.elog")
    eps = _write(p)
    with EpisodeReader(p, fields=list(FIELDS)) as r:
        assert r.n_episodes == 3
        assert [r.episode_len(i) for i in range(3)] == [10, 15, 20]
        for e in range(3):
            for k in FIELDS:
                np.testing.assert_array_equal(r.read(e, k), eps[e][k])


def test_multi_batch_episode(tmp_path):
    p = str(tmp_path / "b.elog")
    rng = np.random.default_rng(1)
    parts = [
        {k: rng.normal(size=(4, d)).astype(np.float32)
         for k, d in FIELDS.items()} for _ in range(3)]
    with EpisodeWriter(p, FIELDS) as w:
        w.begin_episode()
        for part in parts:
            w.append_batch(part)
        w.end_episode()
    with EpisodeReader(p, fields=list(FIELDS)) as r:
        assert r.episode_len(0) == 12
        np.testing.assert_array_equal(
            r.read(0, "obs"), np.concatenate([x["obs"] for x in parts]))


def test_sample_windows(tmp_path):
    p = str(tmp_path / "c.elog")
    _write(p)
    with EpisodeReader(p, fields=list(FIELDS)) as r:
        w = r.sample_windows(np.random.default_rng(2), batch=8, window=6,
                             field="obs")
        assert w.shape == (8, 6, 5)
        assert np.all(np.isfinite(w))
