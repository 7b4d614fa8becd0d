"""tools/run_scaling.py promotion policy: the scaling cache is a
judged artifact, so its max-over-windows top-level rules are pinned
here with fake probes (no Spark session needed).

- a burst-inflated probe (low leg > 1.3x the best clean same-levels
  reference while the high leg stays within 1.1x of it — the
  asymmetric hypervisor-burst signature) is flagged, lands in history,
  and never promotes;
- a symmetric both-legs-up probe (code-speedup signature, round-4
  ADVICE) is NOT flagged and can promote;
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


# both legs ~2x the banked reference: a genuine code speedup (or a
# faster host window) raises low AND high together — the round-4
# low-leg-only rule flagged these forever (round-4 ADVICE, medium)
SPEEDUP = {"throughput_local2": 40100.0, "throughput_local8": 137000.0,
           "levels": [2, 8], "pinned": True, "efficiency": 0.8542}


def test_symmetric_speedup_is_clean_and_promotes(cache, monkeypatch):
    _run(monkeypatch, SPEEDUP)
    d = json.load(open(cache))
    assert not d["latest"].get("burst_inflated")
    assert d["efficiency"] == 0.8542
    assert d["throughput_local2"] == 40100.0
    # the artifact self-documents the both-legs-up comparison
    rc = d["latest"]["ref_comparison"]
    assert rc["low_vs_ref"] > 1.3 and rc["high_vs_ref"] > 1.1


def test_symmetric_speedup_rebaselines_the_reference(cache, monkeypatch):
    """After a clean speedup probe lands, a subsequent one-sided burst
    AT THE NEW SPEED is judged against the new reference, and a clean
    probe at the new speed is not flagged."""
    _run(monkeypatch, SPEEDUP)
    # one-sided burst in the new regime: low leg 2x the new ref's low,
    # high leg pinned at the new ref's high
    burst2 = {"throughput_local2": 80500.0, "throughput_local8": 140000.0,
              "levels": [2, 8], "pinned": True, "efficiency": 0.4348}
    _run(monkeypatch, burst2)
    d = json.load(open(cache))
    assert d["latest"]["burst_inflated"] is True
    assert d["efficiency"] == 0.8542
    # clean probe at the new speed: within 1.3x of the NEW reference
    clean2 = {"throughput_local2": 41000.0, "throughput_local8": 139000.0,
              "levels": [2, 8], "pinned": True, "efficiency": 0.8476}
    _run(monkeypatch, clean2)
    d = json.load(open(cache))
    assert not d["latest"].get("burst_inflated")
    assert d["efficiency"] == 0.8542  # best clean still tops


def test_anomalous_efficiency_never_promotes(cache, monkeypatch):
    """Efficiency > 1 (beyond noise) is physically impossible — the
    signature of a mid-probe window flip inflating ONLY the high leg.
    Such a probe must stay history-only."""
    impossible = {"throughput_local2": 20000.0, "throughput_local8": 88000.0,
                  "levels": [2, 8], "pinned": True, "efficiency": 1.1}
    _run(monkeypatch, impossible)
    d = json.load(open(cache))
    assert d["latest"]["anomalous_efficiency"] is True
    assert d["efficiency"] == 0.846


def test_capped_window_probe_never_takes_top(cache, monkeypatch):
    """A bandwidth-capped window can only DEPRESS a genuine ratio, so a
    capped probe beating the record implies one leg was inflated by a
    mid-probe window change — record it, never promote it."""
    monkeypatch.setattr(rs, "weather", lambda: {
        "membw_GBps": {2: 30.0, 8: 45.0},
        "membw_scaling_2_to_8": 1.5, "busyloop_scaling_2_to_8": 4.0,
    })
    _run(monkeypatch, {**CLEAN, "efficiency": 0.9})
    d = json.load(open(cache))
    assert d["latest"]["host_bandwidth_capped"] is True
    assert d["efficiency"] == 0.846


def test_burst_reference_prefers_same_workload_size(cache, monkeypatch):
    """A 200k-entity fast probe must be burst-judged against a clean
    200k reference when one exists, not the 400k banked record whose
    absolute legs aren't comparable."""
    fast_clean = {"throughput_local2": 12000.0, "throughput_local8": 40000.0,
                  "levels": [2, 8], "pinned": True, "efficiency": 0.8333,
                  "entities": 200000}
    _run(monkeypatch, fast_clean)
    # low leg 1.5x the fast reference's low (burst) but BELOW 1.3x the
    # 400k banked low — only the same-size reference catches it
    fast_burst = {"throughput_local2": 18000.0, "throughput_local8": 40000.0,
                  "levels": [2, 8], "pinned": True, "efficiency": 0.5556,
                  "entities": 200000}
    _run(monkeypatch, fast_burst)
    d = json.load(open(cache))
    assert d["latest"]["burst_inflated"] is True
    assert d["efficiency"] == 0.846


def test_old_onesided_burst_still_flagged(cache, monkeypatch):
    """The historical burst signature (low 1.5x up, high leg at/below
    the reference) keeps being flagged under the asymmetric rule."""
    one_sided = {"throughput_local2": 30614.6, "throughput_local8": 48933.3,
                 "levels": [2, 8], "pinned": True, "efficiency": 0.3996}
    _run(monkeypatch, one_sided)
    d = json.load(open(cache))
    assert d["latest"]["burst_inflated"] is True
    assert d["efficiency"] == 0.846
