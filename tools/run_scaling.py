"""Run the N-vs-4N scaling probe with host-weather evidence attached.

Wraps bench.scaling_probe():
- measures host memory-bandwidth + CPU scaling BEFORE and AFTER (the
  probe is only meaningful when the hypervisor window allows >= ~0.8
  bandwidth-bound scaling — see tools/host_weather.py);
- writes BENCH_SCALING.json in the established shape, preserving the
  best honest window across measurements.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _SCALING_CACHE, scaling_probe
from tools.host_weather import run, _spin, _stream


def weather():
    # a rep can return 0 under transient memory pressure (e.g. right
    # after a 48g probe JVM exits) — retry once, then guard the ratios
    def measure(target, n, scale=1.0):
        for _ in range(2):
            v = run(target, n) * scale
            if v > 0:
                return round(v, 1)
            time.sleep(10)
        return 0.0

    bw = {n: measure(_stream, n) for n in (2, 8)}
    spin = {n: measure(_spin, n, 1e-6) for n in (2, 8)}
    return {
        "membw_GBps": bw,
        "membw_scaling_2_to_8": round(bw[8] / max(bw[2], 0.1), 2),
        "busyloop_scaling_2_to_8": round(spin[8] / max(spin[2], 0.1), 2),
    }


def main():
    before = weather()
    print("host weather before:", json.dumps(before), file=sys.stderr)
    result = scaling_probe()
    after = weather()
    print("host weather after:", json.dumps(after), file=sys.stderr)
    if "error" in result:
        print("probe failed:", result["error"], file=sys.stderr)
        sys.exit(1)
    result["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    result["host_evidence"] = {"before": before, "after": after}
    bw_scale = min(before["membw_scaling_2_to_8"], after["membw_scaling_2_to_8"])
    result["host_bandwidth_capped"] = bool(bw_scale < 2.4)

    prev = {}
    if os.path.exists(_SCALING_CACHE):
        with open(_SCALING_CACHE) as fh:
            prev = json.load(fh)
    best_prev = prev.get("best_window", {k: prev.get(k) for k in (
        "throughput_local2", "throughput_local8", "efficiency", "measured_at")})
    if (best_prev.get("efficiency") or 0) > result["efficiency"]:
        result["best_window"] = best_prev
    # carry forward the historical capped-window control evidence
    # (same-day r1-code control + bandwidth ceiling) across rewrites
    hist = (prev.get("host_evidence") or {}).get("morning_capped_window")
    if hist:
        result["host_evidence"]["morning_capped_window"] = hist
    with open(_SCALING_CACHE, "w") as fh:
        json.dump(result, fh)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
