#!/usr/bin/env python3
"""Min-merge a targeted (SPARK_GRAFT_ONLY) Bench artifact into a
full-suite one — the bench's own min-of-reps protocol extended across
runs: cold/hot per query become the min of the two artifacts, rep
counts add, and the merged artifact records which queries were
re-measured (`remeasured` field, deduplicated across repeated merges).
Used for (a) the scale-up audit when a mid-run interference window
hits a corpus with no sf-matched prior, and (b) backfilling hot-rep
holes a degraded-box round-head run left in BENCH_FULL.json
(VERDICT r10 ask #1b).

All aggregate/metadata fields are RECOMPUTED from the merged maps
(round 11, ADVICE r10): n_completed, failed, skipped track the merged
success state (success in either run wins, matching min-merge
semantics); min_hot_reps is taken over completed queries only, so a
skipped query's 0 reps cannot zero the suite floor; hot_total follows
Bench's partial-coverage rule (null unless every completed query has
>= 1 hot rep) with n_hot_covered emitted alongside; outliers_requeued
is the deduplicated union.

Usage: python3 scripts/bench_merge.py <full.json> <add.json>
Rewrites <full.json> in place.
"""
import json
import sys


def _measured(v):
    """True when v is a real measurement. The artifact's not-run
    sentinel is -1 (never 0), so a legitimate time that rounds to
    0.000 must still count as measured (ADVICE r11)."""
    return v is not None and v > -0.5


def _dedup(seq):
    seen = set()
    out = []
    for x in seq:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def selftest():
    """Pin the merge rule (VERDICT r12 #3): best-of calib_s, degraded
    only when ALL sources were degraded, merged_from provenance list.
    Run via `python3 scripts/bench_merge.py --selftest` (wired into the
    ScalaTest suite by BenchArtifactSpec)."""
    import copy, os, tempfile
    base = {
        "sf": "sfX", "queries": {"a": 2.0, "b": 3.0},
        "queries_hot": {"a": 1.0, "b": 2.0}, "hot_reps": {"a": 1, "b": 1},
        "order": ["a", "b"], "core_queries": [], "failed": [],
        "calib_s": 0.95, "degraded": True,
    }
    add = copy.deepcopy(base)
    add["queries"] = {"a": 1.5}
    add["queries_hot"] = {"a": 0.8}
    add["hot_reps"] = {"a": 2}
    add["order"] = ["a"]
    add["calib_s"] = 0.56
    add["degraded"] = False
    d = tempfile.mkdtemp()
    fp, ap = os.path.join(d, "full.json"), os.path.join(d, "add.json")
    json.dump(base, open(fp, "w")); json.dump(add, open(ap, "w"))
    sys.argv = ["bench_merge.py", fp, ap]
    main()
    m = json.load(open(fp))
    assert m["calib_s"] == 0.56, m["calib_s"]          # best-of
    assert m["degraded"] is False, m["degraded"]       # any healthy source
    assert m["merged_from"][-1]["path"] == ap
    assert m["merged_from"][-1]["calib_s"] == 0.56
    assert m["queries"]["a"] == 1.5 and m["queries"]["b"] == 3.0
    assert m["queries_hot"]["a"] == 0.8
    # degraded stays True only when the add is ALSO degraded
    json.dump(dict(base, degraded=True, calib_s=0.9), open(fp, "w"))
    json.dump(dict(add, degraded=True, calib_s=0.99), open(ap, "w"))
    sys.argv = ["bench_merge.py", fp, ap]
    main()
    m = json.load(open(fp))
    assert m["degraded"] is True and m["calib_s"] == 0.9, (
        m["degraded"], m["calib_s"])
    # a probe-less filtered add (calib_s -1, vacuous degraded=false)
    # must not launder the prior's degraded flag or its calib_s
    json.dump(dict(base, degraded=True, calib_s=0.9), open(fp, "w"))
    json.dump(dict(add, degraded=False, calib_s=-1), open(ap, "w"))
    sys.argv = ["bench_merge.py", fp, ap]
    main()
    m = json.load(open(fp))
    assert m["degraded"] is True and m["calib_s"] == 0.9, (
        m["degraded"], m["calib_s"])
    # the mirror (ADVICE r13): a probe-less PRIOR (calib_s -1, vacuous
    # degraded=false) merged with a degraded add — the only real probe
    # was degraded, so the merged flag must be degraded=True and the
    # calib must be the add's, not laundered through the prior.
    json.dump(dict(base, degraded=False, calib_s=-1), open(fp, "w"))
    json.dump(dict(add, degraded=True, calib_s=0.9), open(ap, "w"))
    sys.argv = ["bench_merge.py", fp, ap]
    main()
    m = json.load(open(fp))
    assert m["degraded"] is True and m["calib_s"] == 0.9, (
        m["degraded"], m["calib_s"])
    print("bench_merge selftest OK")


def main():
    full_path, add_path = sys.argv[1], sys.argv[2]
    full = json.load(open(full_path))
    add = json.load(open(add_path))
    assert full["sf"] == add["sf"], (full["sf"], add["sf"])
    remeasured = []
    for q, cold in add["queries"].items():
        if not _measured(cold):
            continue
        remeasured.append(q)
        if not _measured(full["queries"].get(q, -1)):
            full["queries"][q] = cold
        else:
            full["queries"][q] = min(full["queries"][q], cold)
        ah = add["queries_hot"].get(q, -1)
        fh = full["queries_hot"].get(q, -1)
        if _measured(ah):
            full["queries_hot"][q] = (
                ah if not _measured(fh) else min(fh, ah))
        full["hot_reps"][q] = (full["hot_reps"].get(q, 0) or 0) + (
            add["hot_reps"].get(q, 0) or 0)
    # recompute every aggregate/metadata field from the merged maps
    completed = {q for q, v in full["queries"].items() if _measured(v)}
    # queries registered after the prior was written join the order
    # (otherwise they'd be invisible to the skipped computation)
    order = full.get("order") or sorted(full["queries"])
    order = order + [q for q in (add.get("order") or sorted(add["queries"]))
                     if q not in set(order)]
    full["order"] = order
    full["value"] = round(sum(full["queries"][q] for q in completed), 3)
    hot_covered = {
        q for q in completed if _measured(full["queries_hot"].get(q, -1))}
    full["n_hot_covered"] = len(hot_covered)
    full["hot_total"] = (
        round(sum(full["queries_hot"][q] for q in hot_covered), 3)
        if hot_covered == completed else None)
    full["core_hot"] = round(sum(
        full["queries_hot"][q]
        for q in hot_covered if q in set(full.get("core_queries", []))), 3)
    full["n_completed"] = len(completed)
    # the registry can have grown since the prior full run was taken:
    # the merged artifact's query universe is the merged map itself
    full["n_queries"] = len(full["queries"])
    # success in either run wins: a query measured by the add run leaves
    # the failed/skipped lists; one failing in BOTH runs stays failed
    add_failed = set(add.get("failed", []))
    full["failed"] = sorted(
        (set(full.get("failed", [])) | add_failed) - completed)
    full["skipped"] = [
        q for q in order if q not in completed and q not in set(full["failed"])]
    full["min_hot_reps"] = min(
        (full["hot_reps"].get(q, 0) or 0) for q in completed) if completed else 0
    full["outliers_requeued"] = _dedup(
        full.get("outliers_requeued", []) + add.get("outliers_requeued", []))
    full["remeasured"] = _dedup(full.get("remeasured", []) + sorted(remeasured))
    # Honest merged provenance (VERDICT r12 #3): the merged artifact
    # holds per-query MINIMA, so its headline calibration is the BEST
    # window any value came from, and it is degraded only if EVERY
    # source was. The old behavior kept the last add's fields, which
    # made a best-known-state artifact read as a degraded run.
    # capture the prior's calib BEFORE the min() overwrite: the flags
    # gate below must see each source's ORIGINAL probe state, or a
    # probe-less prior (calib_s=-1, vacuous degraded=false) inherits the
    # add's calib and its stale degraded=false masks a degraded add
    # (ADVICE r13 — the mirror of the probe-less-add case).
    prior_calib = full.get("calib_s")
    calibs = [c for c in (prior_calib, add.get("calib_s"))
              if isinstance(c, (int, float)) and c > 0]  # -1 = probe not run
    if calibs:
        full["calib_s"] = min(calibs)
    # degraded = AND over sources whose probe actually ran: a filtered
    # (SPARK_GRAFT_ONLY) add skips the probe and writes degraded=false
    # vacuously — it must not launder the flag off a degraded prior,
    # nor may a probe-less prior launder a degraded add.
    flags = [bool(d.get("degraded", False))
             for d, c in ((full, prior_calib), (add, add.get("calib_s")))
             if isinstance(c, (int, float)) and c > 0]
    full["degraded"] = all(flags) if flags else False
    full["merged_from"] = full.get("merged_from", []) + [
        {"path": add_path, "calib_s": add.get("calib_s"),
         "degraded": add.get("degraded"), "n": len(remeasured)}]
    json.dump(full, open(full_path, "w"), indent=None, sort_keys=False)
    print(f"merged {len(remeasured)} queries from {add_path} into {full_path}; "
          f"n_hot_covered={full['n_hot_covered']}/{len(completed)} "
          f"hot_total={full['hot_total']}")


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
    else:
        main()
