#!/usr/bin/env python3
"""Assemble SCALEUP_rNN.json from two Bench artifacts (the small-side
corpus and a ScaleUp-derived factor-N corpus) plus a parity map from
scripts/scaleup_parity.py.

Usage:
  python3 scripts/scaleup_report.py <small_bench.json> <big_bench.json> \
      <parity.json> <out.json> [factor] [round]

The scaling exponent is log(T_big/T_small)/log(factor) on the HOT
statistic (compute path; cold includes one-time artifact builds and
JVM effects) and is also reported for cold. Exponent 1.0 = linear.

Round 9 note: field names carry the measured sides explicitly
(`small_*` / `big_*` plus the `sf` dirs at top level) — the r8 names
(sf01/sf1) stopped being accurate once the factor-100 corpus arrived.
"""
import json, math, sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    parity = json.load(open(sys.argv[3]))
    parity_notes = {}
    if "parity" in parity and isinstance(parity["parity"], dict):
        parity_notes = parity.get("notes", {})
        parity = parity["parity"]
    out_path = sys.argv[4]
    factor = float(sys.argv[5]) if len(sys.argv) > 5 else 10.0
    rnd = int(sys.argv[6]) if len(sys.argv) > 6 else 9

    queries = {}
    for name in sorted(set(a["queries"]) | set(b["queries"])):
        sc, sh = a["queries"].get(name, -1), a["queries_hot"].get(name, -1)
        bc, bh = b["queries"].get(name, -1), b["queries_hot"].get(name, -1)

        def expo(small, big):
            if small and big and small > 0 and big > 0:
                return round(math.log(big / small) / math.log(factor), 3)
            return None

        queries[name] = {
            "small_cold_s": sc, "small_hot_s": sh,
            "big_cold_s": bc, "big_hot_s": bh,
            "exponent_cold": expo(sc, bc),
            "exponent_hot": expo(sh, bh),
            "parity": parity.get(name, "not_checked"),
        }
        # Round 12 (VERDICT r11 ask #3): a hot time above the SAME
        # run's cold min is physically impossible as a steady-state
        # measurement (hot reps re-run the cold plan with warm JIT/page
        # cache; min-of-reps can only go DOWN from a clean cold) — it
        # means every hot rep landed in an interference window. Flag
        # it, null the exponent, and keep it out of exponent_hot_max;
        # re-measure via SPARK_GRAFT_ONLY backfill instead of
        # publishing it as a headline.
        # Round 13 (VERDICT r12 #4): noise floor — only flag when the
        # inversion exceeds max(50 ms, 5% of cold). Millisecond-scale
        # inversions on sub-second queries are scheduler jitter, not
        # interference (text_pii_scrub flagged on a 2 ms delta in r12).
        if sh > 0 and bh > 0 and bc > 0 and bh > bc + max(0.05, 0.05 * bc):
            queries[name]["hot_flag"] = "interference"
            queries[name]["exponent_hot"] = None
        if name in parity_notes:
            queries[name]["parity_note"] = parity_notes[name]

    report = {
        "round": rnd,
        "factor": factor,
        "small_sf": a.get("sf"),
        "big_sf": b.get("sf"),
        "method": (
            "factor-N corpus derived by graft.tools.ScaleUp: key shifts + "
            "per-replica KEYED ALPHABET PERMUTATION of text (r9 — "
            "splitmix64-seeded Fisher-Yates letter/digit bijections, "
            "pairwise agreement <= 6 letters / 3 digits for replicas "
            "0..99, so within-replica n-gram/MinHash/SimHash similarity "
            "structure is preserved exactly and cross-replica shingle "
            "collisions are fixed-point-starved; scripts/scaleup_perm.py "
            "is the pinned bit-exact Python twin) + per-replica signed "
            "coordinate rotation of embeddings (orthogonal: within-replica "
            "cosines preserved; cross-replica cosines Gaussian-suppressed "
            "with a REAL tail above low thresholds — the scaled corpus "
            "carries genuine cross-replica near-dups like an iid-grown "
            "one); relational tables share one key stride per FK family "
            "(N disjoint relational + graph copies, orderkey%8 subset "
            "density preserved); events give N disjoint user populations "
            "with identical temporal structure. Parity = direct DuckDB "
            "replay where feasible; construction-based replica oracles "
            "where the replica argument is sound (text shingles; "
            "embeddings at 0.8); constructed-cluster composed replay for "
            "the split-dependent pipeline queries (r9); exact-numpy "
            "verify + within-replica inclusion for dedup_embedding beyond "
            "factor 10 (r9); grid-vs-LSH twin equality for "
            "dedup_embedding_ann; independent recomputations (numpy kNN, "
            "inverted-index incremental, union-find components/clusters)."
        ),
        "hot_protocol": "min_of_reps",
        "note": (
            "exponent = log(T_big/T_small)/log(factor); 1.0 is linear. "
            "Cold includes one-time artifact builds (IVF/graph-edge/"
            "cluster models) and is reported for completeness; hot is the "
            "serving path the exponent argument is about. Interference "
            "rule: big_hot > big_cold_min flags only when the delta "
            "exceeds max(50 ms, 5% of cold) — smaller inversions are "
            "scheduler noise, not an interference window (r13)."
        ),
        "parity_counts": {
            v: sum(1 for q in queries.values() if q["parity"] == v)
            for v in sorted({q["parity"] for q in queries.values()})},
        "exponent_hot_max": max(
            (q["exponent_hot"] for q in queries.values()
             if q["exponent_hot"] is not None), default=None),
        "interference_hot": sorted(
            n for n, q in queries.items()
            if q.get("hot_flag") == "interference"),
        "queries": queries,
    }
    # hand-authored narrative fields (*_note beyond the generated
    # "note") survive regeneration — the round-12 incremental flow
    # regenerates this artifact after every backfill, and losing the
    # curated context is the same artifact-clobber class as the
    # BENCH_FULL overwrite (VERDICT r11 #1)
    try:
        with open(out_path) as f:
            prev = json.load(f)
        for k, v in prev.items():
            if k.endswith("_note") and k not in report:
                report[k] = v
    except (OSError, ValueError):
        pass
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=False)
    print(f"wrote {out_path}")
    for n, q in queries.items():
        flag = "  INTERFERENCE(hot>cold-min)" if q.get("hot_flag") else ""
        print(f"{n:28s} hot {q['small_hot_s']:>8} -> {q['big_hot_s']:>8} "
              f"exp {q['exponent_hot']}  parity={q['parity']}{flag}")


if __name__ == "__main__":
    main()
