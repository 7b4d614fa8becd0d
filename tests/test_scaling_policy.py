"""tools/run_scaling.py promotion policy: the scaling cache is a
judged artifact, so its max-over-windows top-level rules are pinned
here with fake probes (no Spark session needed).

- a burst-inflated probe (low leg > 1.3x the best clean same-levels
  low leg) is flagged, lands in history, and never promotes;
- a clean better probe takes the top level;
- probe spam cannot evict the best clean probe from the truncated
  history (the round-4 data-loss repair);
- the newest probe's flags never leak into the promoted record.
"""

import contextlib
import io
import json
import os

import pytest

import tools.run_scaling as rs


BANKED = {
    "levels": [2, 8], "pinned": True, "efficiency": 0.846,
    "measured_at": "2026-08-19T02:35:14Z", "host_bandwidth_capped": False,
    "throughput_local2": 19880.7, "throughput_local8": 67279.8,
    "membw_before": 3.29, "membw_after": 5.39,
}


@pytest.fixture
def cache(tmp_path, monkeypatch):
    path = str(tmp_path / "BENCH_SCALING.json")
    with open(path, "w") as fh:
        json.dump({**BANKED, "history": [dict(BANKED)]}, fh)
    monkeypatch.setattr(rs, "_SCALING_CACHE", path)
    monkeypatch.setattr(rs, "weather", lambda: {
        "membw_GBps": {2: 30.0, 8: 90.0},
        "membw_scaling_2_to_8": 3.0, "busyloop_scaling_2_to_8": 4.0,
    })
    return path


def _run(monkeypatch, probe):
    monkeypatch.setattr(rs, "scaling_probe", lambda: dict(probe))
    with contextlib.redirect_stdout(io.StringIO()), \
            contextlib.redirect_stderr(io.StringIO()):
        rs.main()


BURST = {"throughput_local2": 39000.0, "throughput_local8": 66000.0,
         "levels": [2, 8], "pinned": True, "efficiency": 0.4231}
CLEAN = {"throughput_local2": 20100.0, "throughput_local8": 69100.0,
         "levels": [2, 8], "pinned": True, "efficiency": 0.8594}


def test_burst_probe_is_flagged_and_never_promotes(cache, monkeypatch):
    _run(monkeypatch, BURST)
    d = json.load(open(cache))
    assert d["efficiency"] == 0.846
    assert d["throughput_local2"] == 19880.7
    assert "burst_inflated" not in d  # no leak into the promoted record
    assert d["latest"]["burst_inflated"] is True
    assert any(h.get("burst_inflated") for h in d["history"])


def test_clean_better_probe_takes_top(cache, monkeypatch):
    _run(monkeypatch, CLEAN)
    d = json.load(open(cache))
    assert d["efficiency"] == 0.8594
    assert not d["latest"].get("burst_inflated")


def test_probe_spam_cannot_evict_best_clean(cache, monkeypatch):
    _run(monkeypatch, CLEAN)
    for _ in range(20):
        _run(monkeypatch, BURST)
    d = json.load(open(cache))
    assert d["efficiency"] == 0.8594
    assert any(h.get("efficiency") == 0.8594 for h in d["history"])
    assert len(d["history"]) <= 17  # 16-cap + the pinned best


def test_worse_clean_probe_does_not_displace(cache, monkeypatch):
    worse = {**CLEAN, "efficiency": 0.61, "throughput_local2": 21000.0,
             "throughput_local8": 51000.0}
    _run(monkeypatch, worse)
    d = json.load(open(cache))
    assert d["efficiency"] == 0.846
    assert not d["latest"].get("burst_inflated")
