#!/usr/bin/env python3
"""Min-merge a targeted (SPARK_GRAFT_ONLY) Bench artifact into a
full-suite one — the bench's own min-of-reps protocol extended across
runs: cold/hot per query become the min of the two artifacts, rep
counts add, and the merged artifact records which queries were
re-measured (`remeasured` field). Used by the scale-up audit when a
mid-run interference window hits a corpus that has no sf-matched
prior reference for the bench's self-healing outlier rule (the first
bench on a freshly derived ScaleUp corpus is definitionally
prior-less).

Usage: python3 scripts/bench_merge.py <full.json> <add.json>
Rewrites <full.json> in place.
"""
import json
import sys


def main():
    full_path, add_path = sys.argv[1], sys.argv[2]
    full = json.load(open(full_path))
    add = json.load(open(add_path))
    assert full["sf"] == add["sf"], (full["sf"], add["sf"])
    remeasured = []
    for q, cold in add["queries"].items():
        if cold is None or cold <= 0:
            continue
        remeasured.append(q)
        if full["queries"].get(q, -1) <= 0:
            full["queries"][q] = cold
        else:
            full["queries"][q] = min(full["queries"][q], cold)
        ah = add["queries_hot"].get(q, -1)
        fh = full["queries_hot"].get(q, -1)
        if ah and ah > 0:
            full["queries_hot"][q] = ah if (not fh or fh <= 0) else min(fh, ah)
        full["hot_reps"][q] = (full["hot_reps"].get(q, 0) or 0) + (
            add["hot_reps"].get(q, 0) or 0)
    # recompute the aggregate fields over the merged maps
    full["value"] = round(sum(v for v in full["queries"].values() if v > 0), 3)
    full["hot_total"] = round(
        sum(v for v in full["queries_hot"].values() if v > 0), 3)
    full["core_hot"] = round(sum(
        v for q, v in full["queries_hot"].items()
        if v > 0 and q in set(full.get("core_queries", []))), 3)
    full["min_hot_reps"] = min(full["hot_reps"].values())
    full.setdefault("remeasured", []).extend(sorted(remeasured))
    json.dump(full, open(full_path, "w"), indent=None, sort_keys=False)
    print(f"merged {len(remeasured)} queries from {add_path} into {full_path}: "
          f"{remeasured}")


if __name__ == "__main__":
    main()
