#!/usr/bin/env python3
"""Assemble SCALEUP_rNN.json from two Bench artifacts (sf0.1 and the
ScaleUp-derived factor-10 corpus) plus a parity map produced by
scripts/check.py runs against the scaled corpus.

Usage:
  python3 scripts/scaleup_report.py <sf01_bench.json> <sf1_bench.json> \
      <parity.json> <out.json> [factor]

The scaling exponent is log(T_big/T_small)/log(factor) on the HOT
statistic (compute path; cold includes one-time artifact builds and
JVM effects) and is also reported for cold. Exponent 1.0 = linear.
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

    queries = {}
    for name in sorted(set(a["queries"]) | set(b["queries"])):
        sc, sh = a["queries"].get(name, -1), a["queries_hot"].get(name, -1)
        bc, bh = b["queries"].get(name, -1), b["queries_hot"].get(name, -1)

        def expo(small, big):
            if small and big and small > 0 and big > 0:
                return round(math.log(big / small) / math.log(factor), 3)
            return None

        queries[name] = {
            "sf01_cold_s": sc, "sf01_hot_s": sh,
            "sf1_cold_s": bc, "sf1_hot_s": bh,
            "exponent_cold": expo(sc, bc),
            "exponent_hot": expo(sh, bh),
            "parity": parity.get(name, "not_checked"),
        }
        if name in parity_notes:
            queries[name]["parity_note"] = parity_notes[name]

    report = {
        "round": 8,
        "factor": factor,
        "method": (
            "factor-10 corpus derived from sf0.1 by graft.tools.ScaleUp: "
            "key shifts + per-replica Caesar text rotation (character "
            "bijection: within-replica n-gram/MinHash/SimHash similarity "
            "structure preserved exactly, cross-replica shingles disjoint) "
            "+ per-replica signed coordinate rotation of embeddings "
            "(orthogonal: within-replica cosines preserved; cross-replica "
            "cosines Gaussian-suppressed but with a real tail above low "
            "thresholds, so the corpus carries genuine cross-replica "
            "near-dups like an iid-grown one); lineitem/orders/customer/"
            "supplier/part key "
            "shifts share one stride per key family so every FK joins "
            "within its replica (10 disjoint relational + graph copies, "
            "orderkey%8 subset density preserved); events key shifts give "
            "10 disjoint user populations with identical temporal "
            "structure. Parity = the DuckDB oracle gate (scripts/check.py) "
            "replayed on the scaled corpus where the oracle is feasible "
            "(incl. a long-budget brute-force replay of dedup_embedding), "
            "construction-based replica oracles (scripts/scaleup_parity.py) "
            "for quadratic oracles where the replica argument is sound "
            "(text shingles: deterministic disjointness; embeddings at the "
            "0.8 threshold), fixture-replica checks for the golden-chunks "
            "queries (ids shifted, text Caesar-rotated, totals "
            "re-aggregated), grid-twin equality for dedup_embedding_ann, "
            "and an independent union-find recomputation for dedup_cluster."
        ),
        "hot_protocol": "min_of_reps",
        "note": (
            "exponent = log(T_sf1/T_sf0.1)/log(10); 1.0 is linear. Cold "
            "includes one-time artifact builds (IVF/graph-edge/cluster "
            "models) and is reported for completeness; hot is the serving "
            "path the exponent argument is about."
        ),
        "parity_counts": {
            v: sum(1 for q in queries.values() if q["parity"] == v)
            for v in sorted({q["parity"] for q in queries.values()})},
        "exponent_hot_max": max(
            (q["exponent_hot"] for q in queries.values()
             if q["exponent_hot"] is not None), default=None),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=False)
    print(f"wrote {out_path}")
    for n, q in queries.items():
        print(f"{n:28s} hot {q['sf01_hot_s']:>8} -> {q['sf1_hot_s']:>8} "
              f"exp {q['exponent_hot']}  parity={q['parity']}")


if __name__ == "__main__":
    main()
