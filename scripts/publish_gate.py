#!/usr/bin/env python3
"""Refuse to publish a degraded-box bench artifact (round 12, VERDICT
r11 ask #6): two consecutive rounds published round-head artifacts
measured in calib-degraded windows, making cross-round comparison need
manual normalization. This gate is the protocol's one-line check:

  python3 scripts/publish_gate.py <bench.json> && <merge/commit it>

Exit 0  = artifact is publishable (calib_s <= 1.5x the 0.55 s healthy
          reference, matching graft.Bench.CalibRefSec/DegradedFactor —
          the artifact carries both as calib_ref_s/degraded).
Exit 1  = degraded window: re-run the bench after graft.tools.CalibProbe
          reports healthy, or publish anyway ONLY with an explicit
          annotation in the round notes (say so in COVERAGE.md).
Exit 2  = artifact unreadable / missing calib fields (filtered
          SPARK_GRAFT_ONLY runs skip the probe and record -1; those are
          backfill inputs for bench_merge.py, not round-head artifacts).
"""
import json
import sys


def main():
    path = sys.argv[1]
    try:
        d = json.load(open(path))
    except Exception as e:
        print(f"publish_gate: cannot read {path}: {e}")
        return 2
    calib = d.get("calib_s")
    ref = d.get("calib_ref_s", 0.55)
    if calib is None or calib <= 0:
        print(f"publish_gate: {path} has no calibration probe "
              f"(calib_s={calib}) — not a round-head artifact")
        return 2
    degraded = calib > ref * 1.5
    verdict = "DEGRADED — do not publish" if degraded else "healthy"
    print(f"publish_gate: calib_s={calib} ref={ref} "
          f"ratio={calib / ref:.2f} -> {verdict}")
    return 1 if degraded else 0


if __name__ == "__main__":
    sys.exit(main())
