#!/usr/bin/env python3
"""Scale-aware parity gate for the ScaleUp-derived corpus.

The standard gate (scripts/check.py) replays every DuckDB oracle on the
scaled corpus, but a handful of oracles are deliberately brute-force
all-pairs relations (docs x docs shingle Jaccard, embeddings x
embeddings cosine) that are valid only at verification scale: at
factor 10 (50k docs -> 1.25e9 pairs, 20k vectors -> 2e8 64-dim dots)
DuckDB cannot finish them in useful time. For THOSE, this script uses a
construction-based oracle instead: graft.tools.ScaleUp builds the
scaled corpus as 10 key-shifted replicas whose payload transform is a
character bijection (text) / signed coordinate permutation
(embeddings), so

  * within-replica n-gram shingle sets map bijectively -> every
    within-replica Jaccard is EXACTLY the sf0.1 value;
  * within-replica cosines equal the sf0.1 values up to float
    summation order (compared with tolerance 2e-6 after the oracles'
    round-to-6);
  * cross-replica TEXT pairs are impossible above threshold
    (deterministically disjoint shingle alphabets). Cross-replica
    COSINES, however, are only Gaussian-suppressed (the signed
    rotation is orthogonal; clustered vectors put ~8e-5 of the 2e8
    cross pairs above 0.45 — measured), so the replica argument
    holds for embeddings only at the 0.8 threshold; the exhaustive
    0.45 family is verified by direct replay / grid-twin equality /
    union-find recomputation instead (see REPLICA_EQUIVARIANT,
    DIRECT_RETRY, TWIN_OF, UNION_FIND).

Hence the TRUE pair relation at sf1 is exactly the sf0.1 oracle
relation replicated 10x with ids shifted by k*stride — computable from
the (feasible) sf0.1 oracle. Queries whose scaled truth is NOT a
replica union (hash-bucket corpus/batch splits, data-dependent k-means
clusterings) are honestly reported as oracle_infeasible_at_scale.

Usage:
  python3 scripts/scaleup_parity.py <sf1Dir> <sf1VerifyDir> <sf01Dir> \
      <out.json> [perQueryTimeoutSec]

Set SCALEUP_FACTOR (default 10) to the corpus's replication factor; the
replica oracles and the SUM-TOTAL scalings all key off it.

Parity labels emitted:
  pass / fail            — scripts/check.py verdict on the scaled corpus
  oracle_timeout         — oracle exceeded the per-query budget
  replica_pass / replica_fail — construction-based oracle verdict
  oracle_infeasible_at_scale  — quadratic oracle, no replica argument
"""
import json
import os
import subprocess
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaleup_perm import permute_text  # noqa: E402  (ScaleUp's text twin)

FACTOR = int(os.environ.get("SCALEUP_FACTOR", "10"))

# All-pairs oracle markers (see ext/Dedup.scala shingleCteSql /
# embeddingPairsSql): any oracle containing one of these is quadratic
# in the scaled table and skips the direct DuckDB replay.
QUADRATIC_MARKERS = ("JOIN sh b", "e a JOIN e b")

# Quadratic-oracle queries whose sf1 truth IS the replicated sf0.1
# oracle (replica-equivariant; see module docstring). TEXT transforms
# (keyed bijections) give cross-replica shingle disjointness, so
# the text families qualify. The EMBEDDING transform is an orthogonal
# signed rotation, and for clustered embeddings cross-replica cosines
# are Gaussian-tailed (measured ~8e-5 of the 2e8 cross pairs exceed
# 0.45 — thousands of true pairs the replica construction would
# wrongly exclude), so the replica argument is only sound at the HI
# threshold (0.8: tail ~1e-10). The exhaustive-0.45 embedding family
# is verified by stronger means below: dedup_embedding by a direct
# (long-budget) DuckDB replay, dedup_embedding_ann by equality with
# the exact grid's own sf1 dump, dedup_cluster by an independent
# union-find recomputation over the sf1 pair dump.
REPLICA_EQUIVARIANT = {
    "dedup_minhash": ("doc",),
    "dedup_ngram": ("doc",),
    # containment is a ratio of shingle-set sizes, both preserved by the
    # per-replica alphabet bijection; cross-replica pairs are impossible
    # above threshold (disjoint shingle alphabets) — same argument as
    # the Jaccard tiers above, direction notwithstanding
    "dedup_containment": ("doc",),
    "dedup_simhash": ("doc",),
}
ID_COLS = {"doc": ("doc_id", "doc_a", "doc_b", "cluster", "cluster_id"),
           "vec": ("vec_id", "vec_a", "vec_b")}

# Quadratic queries verified by construction-independent means.
DIRECT_RETRY = {"dedup_embedding"}           # brute-force oracle, big budget
TWIN_OF = {"dedup_embedding_ann": "dedup_embedding"}  # contract: same relation
UNION_FIND = {"dedup_cluster": "dedup_minhash"}       # CC over the pair dump
# independent numpy/pandas replays
# _ann_hi left REPLICA_EQUIVARIANT in round 14: the in-gate planted
# twins (corpus + sign-flip twins of the 4 globally-smallest ids) are
# NOT per-replica, so replica equality no longer models the big-corpus
# relation; annhi_planted_check recomputes the derived relation instead.
RECOMPUTE = {"sim_knn", "dedup_sorted_nbhd", "dedup_incremental",
             "dedup_embedding_ann_hi"}

# Round 9 (VERDICT r8 #3): the split-dependent pipeline queries. Their
# ONLY scale-infeasible sub-relation is the embedded dedup_cluster
# recursive CTE; every other tier (quality features, logreg scores,
# sha256 exact-dedup, the polyhash bucket walk) is LINEAR and replays
# directly at sf1. The composed oracle:
#   1. CONSTRUCT the expected sf1 clusters by replicating the sf0.1
#      dedup_cluster replay (doc_id and cluster_id shift by k*stride;
#      sizes invariant — minhash pairs never cross replicas, so
#      components replicate exactly);
#   2. cross-check that construction against the sf1 dedup_cluster
#      dump (itself union-find-verified in this same artifact — two
#      independent derivations of the same labeling);
#   3. substitute the constructed relation for the verbatim embedded
#      cluster subquery and replay the WHOLE composed oracle against
#      the sf1 corpus in DuckDB.
COMPOSED_VIA_CLUSTER = {"pipeline_prep", "pipeline_survivor", "pipeline_holdout"}

# Labels that stay infeasible, with the reason recorded in the artifact.
# (round 9: the three pipeline_* entries moved to COMPOSED_VIA_CLUSTER.)
INFEASIBLE_NOTES = {
    "dedup_incremental": (
        "the bucketed old-batch x new-batch shingle join is DuckDB-"
        "infeasible at factor 10 (exceeds a 2400 s budget); its shingle-"
        "Jaccard tier is independently confirmed at sf1 via dedup_minhash "
        "(replica) and dedup_sorted_nbhd (recompute), and the bucket-split "
        "logic is direct-gate-verified at sf0.01"),
}


def graph_components_recompute(sf1_dir, sf1_verify):
    """graph_components' oracle OOMs DuckDB at factor 10 (the recursive
    reach CTE materializes nodes x labels for a ~20k-node component).
    The EDGE relation is cheap; only the closure explodes — so extract
    the edges in DuckDB and do the closure with a Python union-find,
    then recompute per-component node/edge counts.
    """
    c2 = duckdb.connect()
    edges = c2.sql(f"""
        WITH li AS (SELECT l_orderkey, l_partkey
                    FROM read_parquet('{sf1_dir}/lineitem.parquet')
                    WHERE l_orderkey % 8 = 0)
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey != b.l_partkey""").df()
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for s, d in edges[["src", "dst"]].itertuples(index=False):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    comp = {n: find(int(n)) for n in set(edges["src"].astype("int64"))}
    n_nodes, n_dir_edges = {}, {}
    for n, c in comp.items():
        n_nodes[c] = n_nodes.get(c, 0) + 1
    for s in edges["src"].astype("int64"):
        c = comp[int(s)]
        n_dir_edges[c] = n_dir_edges.get(c, 0) + 1
    exp = pd.DataFrame(
        [(c, n_nodes[c], n_dir_edges[c] // 2) for c in sorted(n_nodes)],
        columns=["component_id", "n_nodes", "n_edges"])
    act = pd.read_parquet(f"{sf1_verify}/graph_components")
    verdict, note = compare_frames(exp, act, ["component_id"], len(exp))
    if verdict == "replica_pass":
        return "recomputed_pass", (f"DuckDB edge extraction + python "
                                   f"union-find closure: {len(exp)} "
                                   f"components match")
    return "recomputed_fail", f"union-find closure: {note}"


def incremental_recompute_check(sf1_dir, sf1_verify):
    """dedup_incremental's old-batch x new-batch shingle join exceeds
    any realistic DuckDB budget at factor 10, but an inverted-index
    replay is cheap: postings (doc, shingle) for old and new batches,
    merged on the shingle id, give the exact |A∩B| for every pair
    sharing at least one shingle (a 0.8-Jaccard pair shares ~90% of
    its shingles, so no qualifying pair can be missed), and set sizes
    complete the exact Jaccard. Bucket split replays the oracle's
    polynomial string hash of the doc id.
    """
    import re
    docs = pd.read_parquet(f"{sf1_dir}/documents.parquet")[["doc_id", "text"]]

    def bucket(doc_id):
        h = 0
        for ch in str(doc_id):
            h = (h * 31 + ord(ch)) % 1000000007
        return h % 10

    def shingles(t):
        w = re.split(" +", t)
        if len(w) >= 3:
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return {t}

    size, is_new, post_doc, post_sh = {}, {}, [], []
    sid = {}
    for doc_id, text in docs.itertuples(index=False):
        d = int(doc_id)
        s = shingles(text)
        size[d] = len(s)
        is_new[d] = bucket(d) >= 8
        for sh in s:
            post_doc.append(d)
            post_sh.append(sid.setdefault(sh, len(sid)))
    post = pd.DataFrame({"doc": post_doc, "sh": post_sh})
    newf = post["doc"].map(is_new)
    old_p = post[~newf]
    new_p = post[newf]
    m = old_p.merge(new_p, on="sh", suffixes=("_old", "_new"))
    counts = m.groupby(["doc_old", "doc_new"]).size().reset_index(name="c")
    counts["jaccard"] = counts["c"] / (
        counts["doc_old"].map(size) + counts["doc_new"].map(size) - counts["c"])
    exp = (counts[counts["jaccard"] >= 0.8]
           .rename(columns={"doc_old": "old_doc", "doc_new": "new_doc"})
           [["old_doc", "new_doc", "jaccard"]].reset_index(drop=True))
    act = pd.read_parquet(f"{sf1_verify}/dedup_incremental")
    verdict, note = compare_frames(exp, act, ["old_doc", "new_doc"], len(exp))
    if verdict == "replica_pass":
        return "recomputed_pass", (f"inverted-index old x new Jaccard "
                                   f"replay: {len(exp)} rows match")
    return "recomputed_fail", f"inverted-index replay: {note}"


def knn_recompute_check(sf1_dir, sf1_verify):
    """Independent brute-force kNN in numpy (BLAS) against the Spark
    dump: cosine over all pairs, rounded to 6 dp like the oracle,
    rank by (cos desc, nbr asc), top 3.
    """
    emb = pd.read_parquet(f"{sf1_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(M, axis=1)
    ok = nrm != 0
    Mn = M[ok] / nrm[ok, None]
    okIds = ids[ok]
    k, m = 3, 64  # top-k after rounding, from a raw-top-m shortlist
    rows = []
    B = 2048
    for s in range(0, len(okIds), B):
        sims = Mn[s:s + B] @ Mn.T  # (b, n)
        for j in range(sims.shape[0]):
            i = s + j
            row = sims[j].copy()
            row[i] = -np.inf  # exclude self
            top = np.argpartition(-row, m)[:m]
            cand = sorted(
                ((-round(float(row[t]), 6), int(okIds[t])) for t in top))
            # tie safety: ranking is (rounded cos desc, nbr asc) over ALL
            # neighbors; the raw-top-m shortlist is only valid if rank k's
            # rounded cos strictly beats the shortlist's weakest rounded
            # value (rounding is monotone, so nothing outside can tie in).
            # Otherwise fall back to the full row for this query vector.
            if -cand[k - 1][0] <= round(float(np.min(row[top])), 6):
                cand = sorted(
                    (-round(float(row[t]), 6), int(okIds[t]))
                    for t in range(len(okIds)) if t != i)
            for rn, (negc, nbr) in enumerate(cand[:k], start=1):
                rows.append((int(okIds[i]), rn, nbr, -negc))
    exp = pd.DataFrame(rows, columns=["vec_id", "rn", "nbr", "cos_sim"])
    act = pd.read_parquet(f"{sf1_verify}/sim_knn")
    verdict, note = compare_frames(exp, act, ["vec_id", "rn"], len(exp))
    if verdict == "replica_pass":
        return "recomputed_pass", f"numpy brute-force kNN: {len(exp)} rows match"
    return "recomputed_fail", f"numpy brute-force kNN: {note}"


def annhi_planted_check(sf1_dir, sf1_verify):
    """dedup_embedding_ann_hi after round 14's in-gate planted twins.

    The query (and its oracle) run over corpus + K sign-flip twins of
    the K globally-smallest vec_ids, so the replica argument breaks
    (the big corpus plants K pairs TOTAL, not K per replica). Replaced
    by a two-sided recompute on the big corpus itself:

    SOUNDNESS — reconstruct the derived corpus (numpy; the twin is a
    bit-exact copy/sign-flip, and the argmin-of-exact-squares pick is
    the same first-min rule) and recompute the exact cosine of EVERY
    dumped pair: all must clear the 0.8 threshold and match the dumped
    6-dp value.

    COMPLETENESS — every planted (host, host + stride) pair must be
    in the dump (cos >= 1 - 2/dim = 0.96875 by construction, far above
    the banding's 1e-2 miss envelope at 0.8; the deterministic planes
    make recovery a fixed fact, not a probabilistic one).
    """
    K = 4
    emb = pd.read_parquet(f"{sf1_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy().astype("int64")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    stride = int(ids.max()) + 1
    order = np.argsort(ids)[:K]
    vecs = {int(ids[i]): M[i] for i in range(len(ids))}
    for i in order:
        v = M[i].copy()
        sq = v.astype(np.float64) * v.astype(np.float64)
        j = int(np.argmin(sq))  # first min on ties, like the Scala loop
        v[j] = -v[j]
        vecs[int(ids[i]) + stride] = v
    act = pd.read_parquet(f"{sf1_verify}/dedup_embedding_ann_hi")
    n_bad = 0
    for va, vb, c in act[[act.columns[0], act.columns[1],
                          act.columns[2]]].itertuples(index=False):
        x = vecs[int(va)].astype(np.float64)
        y = vecs[int(vb)].astype(np.float64)
        cs = float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))
        if round(cs, 6) < 0.8 - 2e-6 or abs(cs - float(c)) > 2e-6:
            n_bad += 1
    found = set(zip(act[act.columns[0]].astype("int64"),
                    act[act.columns[1]].astype("int64")))
    missing = [(int(ids[i]), int(ids[i]) + stride) for i in order
               if (int(ids[i]), int(ids[i]) + stride) not in found]
    if n_bad or missing:
        return ("recomputed_fail",
                f"{n_bad}/{len(act)} dumped pairs fail the exact cosine; "
                f"planted pairs missing: {missing}")
    return ("recomputed_pass",
            f"{len(act)} dumped pairs sound (exact numpy cosine); "
            f"{K}/{K} planted sign-flip twins recovered (stride {stride})")


def ivf_recompute_check(sf1_dir, sf1_verify):
    """Independent numpy replay of the ENTIRE sim_ivf pipeline —
    strided seeds, 3 fixed-point Lloyd iterations, final assignment,
    4-probe candidate join, rounded-cosine top-10.

    Exists for the factor-1000 audit (r13): the direct DuckDB replay
    of the Lloyd-unrolled CTE chain spilled past the box's 79 GB free
    disk at 500k vectors ("No space left on device"), so the direct
    route is honestly infeasible there; this recompute is the same
    class of oracle as knn_recompute_check (BLAS + exact integer
    sums). The per-cluster sums are int64 fixed-point (floor(x*2^20))
    — order-independent, so they match Spark bit-for-bit; distance
    argmins use BLAS with a near-tie exact-sequential recheck so a
    pairwise-summation ulp can never silently flip an assignment.
    """
    emb = pd.read_parquet(f"{sf1_dir}/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n = len(ids)
    k = int(min(65536, max(8, (n + 999) // 1000)))
    stride = max(1, n // k)
    seed_rows = np.where(ids % stride == 0)[0][:k]
    cents = M[seed_rows].copy()
    q20 = np.floor(M * 1048576.0).astype(np.int64)

    def seq_dist(v, c):  # Spark's exact left-to-right accumulation
        d = 0.0
        for i in range(len(v)):
            diff = v[i] - c[i]
            d += diff * diff
        return d

    def assign(cs):
        # d^2 = |v|^2 - 2 v.c + |c|^2 (BLAS); near-ties recheck exact
        d2 = (np.sum(M * M, axis=1)[:, None] - 2.0 * (M @ cs.T)
              + np.sum(cs * cs, axis=1)[None, :])
        order = np.argsort(d2, axis=1, kind="stable")
        best, second = order[:, 0], order[:, 1]
        bd = d2[np.arange(n), best]
        sd = d2[np.arange(n), second]
        out = best.copy()
        for i in np.where(sd - bd <= 1e-9 * np.maximum(1.0, np.abs(bd)))[0]:
            ds = [(seq_dist(M[i], cs[c]), c) for c in range(len(cs))]
            out[i] = min(ds)[1]
        return out

    for _ in range(3):
        a = assign(cents)
        counts = np.bincount(a, minlength=k)
        sums = np.zeros((k, M.shape[1]), dtype=np.int64)
        np.add.at(sums, a, q20)
        nz = counts > 0
        cents[nz] = sums[nz] / (1048576.0 * counts[nz, None])
    a = assign(cents)

    # probes: 4 nearest lists per query, ties (d asc, c asc)
    qrows = np.where(ids < 5)[0]
    nrm = np.linalg.norm(M, axis=1)
    rows = []
    for qi in qrows:
        d2 = np.array([seq_dist(M[qi], cents[c]) for c in range(k)])
        probe = sorted(range(k), key=lambda c: (d2[c], c))[:4]
        cand = np.where(np.isin(a, probe))[0]
        cand = cand[ids[cand] != ids[qi]]
        cos = np.round((M[cand] @ M[qi]) / (nrm[cand] * nrm[qi]), 6)
        ranked = sorted(zip(-cos, ids[cand]))[:10]
        for rn, (negc, cid) in enumerate(ranked, start=1):
            rows.append((int(ids[qi]), rn, int(cid), float(-negc)))
    exp = pd.DataFrame(rows, columns=["q_id", "rn", "c_id", "cos_sim"])
    act = pd.read_parquet(f"{sf1_verify}/sim_ivf")
    verdict, note = compare_frames(exp, act, ["q_id", "rn"], len(exp))
    if verdict == "replica_pass":
        return "recomputed_pass", (
            f"numpy IVF replay (k={k}, fixed-point Lloyd): {len(exp)} rows match")
    return "recomputed_fail", f"numpy IVF replay: {note}"


def sorted_nbhd_recompute_check(sf1_dir, sf1_verify):
    """Independent pandas/python replay of the sorted-neighborhood
    join: normalized 64-char key, 8-char block, rank window w=5,
    candidates verified with exact word-3-gram Jaccard >= 0.8 (the
    oracle's shingle definition).
    """
    import re
    docs = pd.read_parquet(f"{sf1_dir}/documents.parquet")[["doc_id", "text"]]
    docs["snkey"] = docs["text"].map(
        lambda t: re.sub(r"[^a-z0-9]", "", t.lower())[:64])
    docs["block"] = docs["snkey"].str[:8]
    docs = docs.sort_values(["block", "snkey", "doc_id"]).reset_index(drop=True)
    cands = set()
    for _, grp in docs.groupby("block", sort=False):
        g = grp["doc_id"].to_numpy()
        for d in range(1, 5):
            for a, b in zip(g[:-d], g[d:]):
                cands.add((min(int(a), int(b)), max(int(a), int(b))))
    text_of = dict(zip(docs["doc_id"].astype("int64"), docs["text"]))

    def shingles(t):
        w = re.split(" +", t)
        if len(w) >= 3:
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return {t}

    sh = {}
    rows = []
    for a, b in sorted(cands):
        sa = sh.get(a)
        if sa is None:
            sa = sh[a] = shingles(text_of[a])
        sb = sh.get(b)
        if sb is None:
            sb = sh[b] = shingles(text_of[b])
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= 0.8:
            rows.append((a, b, j))
    exp = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
    act = pd.read_parquet(f"{sf1_verify}/dedup_sorted_nbhd")
    verdict, note = compare_frames(exp, act, ["doc_a", "doc_b"], len(exp))
    if verdict == "replica_pass":
        return "recomputed_pass", (f"pandas sorted-neighborhood replay: "
                                   f"{len(exp)} rows match")
    return "recomputed_fail", f"pandas sorted-neighborhood replay: {note}"


def union_find_check(sf1_verify, name, pair_query):
    """Independently recompute dedup_cluster's labeling: union-find
    (path compression) over the sf1 pair dump, label = component min,
    sizes by count — checked against the Spark min-label-propagation
    output. Valid with NO replica assumption.
    """
    pairs = pd.read_parquet(f"{sf1_verify}/{pair_query}")[["doc_a", "doc_b"]]
    act = pd.read_parquet(f"{sf1_verify}/{name}")
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs.itertuples(index=False):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs["doc_a"].astype("int64"))
                   | set(pairs["doc_b"].astype("int64")))
    lbl = {n: find(n) for n in nodes}
    sizes = pd.Series(list(lbl.values())).value_counts().to_dict()
    exp = pd.DataFrame({
        "doc_id": nodes,
        "cluster_id": [lbl[n] for n in nodes],
        "cluster_size": [sizes[lbl[n]] for n in nodes]})
    verdict, note = compare_frames(exp, act, ["doc_id"], len(exp))
    if verdict == "replica_pass":
        return "recomputed_pass", (f"union-find over {pair_query} sf1 dump: "
                                   f"{len(exp)} rows match")
    return "recomputed_fail", f"union-find over {pair_query} sf1 dump: {note}"

def embedding_pairs_check(con, sf1_dir, sf1_verify, sf01_dir):
    """dedup_embedding at factors where the all-pairs DuckDB replay is
    out of reach (n^2 = 4e10 dots at factor 100). Two-sided check:

    SOUNDNESS — recompute the exact cosine for EVERY pair in the
    scaled dump with numpy and require >= threshold (no false
    positives possible, each candidate is exactly verified — this
    re-verifies that claim independently).

    RECALL FLOOR — the signed-rotation transform is orthogonal, so
    within-replica cosines equal the sf-small values exactly: every
    sf-small oracle pair, shifted into each replica, MUST appear in
    the scaled dump. Cross-replica pairs are genuine extras (the
    Gaussian tail is real data, not noise) and are NOT bounded here;
    exhaustiveness evidence for them is the grid-vs-LSH twin equality
    (TWIN_OF), two independent algorithms agreeing on the relation.
    """
    emb = pd.read_parquet(f"{sf1_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(M, axis=1)
    nrm[nrm == 0] = 1.0
    Mn = M / nrm[:, None]
    idx = {int(v): i for i, v in enumerate(ids)}
    act = pd.read_parquet(f"{sf1_verify}/dedup_embedding")
    a = act["vec_a"].astype("int64").map(idx).to_numpy()
    b = act["vec_b"].astype("int64").map(idx).to_numpy()
    cos = np.einsum("ij,ij->i", Mn[a], Mn[b])
    # oracle rounds to 6 dp; allow float-order noise at the boundary
    n_bad = int(np.sum(np.round(cos, 6) < 0.45 - 2e-6))
    if n_bad:
        return ("recomputed_fail",
                f"{n_bad}/{len(act)} dumped pairs fail exact cosine >= 0.45")
    dump_cos = dict(zip(zip(act["vec_a"].astype("int64"),
                            act["vec_b"].astype("int64")),
                        act[act.columns[2]].astype(float)))
    small = con.sql(
        "SELECT vec_a, vec_b, cos_sim FROM (" + ORACLE_CACHE["dedup_embedding"]
        + ")").df()
    stride = stride_of(con, sf01_dir, "vec")
    n_missing = 0
    n_cos_off = 0
    for va, vb, c in small.itertuples(index=False):
        for k in range(FACTOR):
            key = (int(va) + k * stride, int(vb) + k * stride)
            got = dump_cos.get(key)
            if got is None:
                n_missing += 1
            elif abs(got - float(c)) > 2e-6:
                n_cos_off += 1
    if n_missing or n_cos_off:
        return ("recomputed_fail",
                f"within-replica recall floor violated: {n_missing} missing, "
                f"{n_cos_off} cosine-mismatched of {len(small) * FACTOR}")
    n_within = len(small) * FACTOR
    return ("recomputed_pass",
            f"exact numpy verify of all {len(act)} dumped pairs + "
            f"within-replica inclusion ({n_within} constructed pairs all "
            f"present, cosines equal to 2e-6); {len(act) - n_within} "
            f"genuine cross-replica pairs exhaustiveness-covered by the "
            f"grid-vs-LSH twin")


ORACLE_CACHE = {}


_COMPOSED_CACHE = {}


def composed_cluster_check(con, name, oracle, sf1_dir, sf1_verify, sf01_dir):
    """See COMPOSED_VIA_CLUSTER. `con` holds the sf0.1 views."""
    sub = "(" + oracle["dedup_cluster"] + ")"
    if sub not in oracle[name]:
        return ("replica_fail",
                "dedup_cluster subquery no longer embedded verbatim — "
                "update the composed-oracle substitution")
    if "clusters" not in _COMPOSED_CACHE:
        small = con.sql(oracle["dedup_cluster"]).df()
        stride = stride_of(con, sf01_dir, "doc")
        reps = []
        for k in range(FACTOR):
            r = small.copy()
            r["doc_id"] = r["doc_id"] + k * stride
            r["cluster_id"] = r["cluster_id"] + k * stride
            reps.append(r)
        exp_clus = pd.concat(reps, ignore_index=True)
        act_clus = pd.read_parquet(f"{sf1_verify}/dedup_cluster")
        verdict, note = compare_frames(exp_clus, act_clus, ["doc_id"], len(small))
        _COMPOSED_CACHE["clusters"] = exp_clus
        _COMPOSED_CACHE["cluster_verdict"] = (verdict, note)
    verdict, note = _COMPOSED_CACHE["cluster_verdict"]
    if verdict != "replica_pass":
        return "replica_fail", f"constructed clusters != sf1 dump: {note}"
    con1 = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con1.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                 f"read_parquet('{sf1_dir}/{t}.parquet')")
    clus_df = _COMPOSED_CACHE["clusters"][["doc_id", "cluster_id"]]
    con1.register("clus_constructed", clus_df)
    sql1 = oracle[name].replace(
        sub, "(SELECT doc_id, cluster_id FROM clus_constructed)")
    exp = con1.sql(sql1).df()
    act = pd.read_parquet(f"{sf1_verify}/{name}")
    key = [c for c in ("doc_id", "family_id", "source") if c in exp.columns]
    verdict, note = compare_frames(exp, act, key, len(exp) // FACTOR)
    if verdict == "replica_pass":
        return "replica_pass", (
            f"constructed-cluster composed replay at sf1: {len(exp)} rows "
            f"(clusters replica-constructed + cross-checked vs the "
            f"union-find-verified sf1 dump; linear tiers replayed directly)")
    return "replica_fail", note


# Golden-fixture queries: their oracles join fixtures/golden_chunks*.parquet
# on an exact (corpus_docs, corpus_chars) key, so the direct replay matches
# NOTHING on a scaled corpus (empty fixture slice -> a lone rollup row).
# But the ScaleUp text transform (tools/ScaleUp.permuteText, r9's keyed
# alphabet permutation — scaleup_perm.py is its pinned twin) is length-
# and separator-preserving, so the recursive splitter's chunk boundaries
# are replica-invariant: the sf1 truth is the sf0.1 oracle relation with
# doc ids shifted, text columns permuted per replica, and any SUM TOTAL
# row re-aggregated across the FACTOR replicas.
FIXTURE_QUERIES = {
    "doc_chunks": {"shift": ["doc_id"], "rot": ["norm_text"]},
    "doc_chunks_overlap": {"shift": ["doc_id"], "rot": ["norm_text"]},
    "sql_chunk_split": {"shift": ["doc_id"], "rot": ["chunk"]},
    "doc_chunk_stats": "stats",
    "doc_report": "report",
}


def compare_frames(exp, act, key_cols, n_small):
    """Column-sorted, key-sorted exact compare (floats at 2e-6)."""
    if sorted(exp.columns) != sorted(act.columns):
        return "replica_fail", f"columns {list(exp.columns)} vs {list(act.columns)}"
    exp = exp.reindex(sorted(exp.columns), axis=1)
    act = act.reindex(sorted(act.columns), axis=1)
    if len(exp) != len(act):
        return "replica_fail", f"rows exp={len(exp)} act={len(act)}"
    key = [c for c in exp.columns if c in key_cols] or list(exp.columns)
    exp = exp.sort_values(key).reset_index(drop=True)
    act = act.sort_values(key).reset_index(drop=True)
    for c in exp.columns:
        e, a = exp[c], act[c]
        if np.issubdtype(e.dtype, np.floating) or np.issubdtype(a.dtype, np.floating):
            bad = ~np.isclose(e.astype(float), a.astype(float),
                              rtol=0, atol=2e-6, equal_nan=True)
        else:
            bad = e.astype(str).values != a.astype(str).values
        n_bad = int(np.sum(bad))
        if n_bad:
            i = int(np.argmax(bad))
            return "replica_fail", (f"col {c}: {n_bad} diffs, first at row {i}: "
                                    f"exp={e.iloc[i]} act={a.iloc[i]}")
    return "replica_pass", f"{len(exp)} rows = {FACTOR}x{n_small}"


def fixture_replica_check(con, name, sql, spec, sf1_verify, sf01_dir):
    small = con.sql(sql).df()
    stride = stride_of(con, sf01_dir, "doc")
    act = pd.read_parquet(f"{sf1_verify}/{name}")
    if isinstance(spec, dict):
        reps = []
        for k in range(FACTOR):
            r = small.copy()
            for c in spec["shift"]:
                r[c] = r[c] + k * stride
            for c in spec["rot"]:
                r[c] = r[c].map(lambda s, kk=k: permute_text(s, kk))
            reps.append(r)
        exp = pd.concat(reps, ignore_index=True)
        return compare_frames(exp, act, spec["shift"], len(small))
    # stats/report shapes: per-doc rows keyed by a stringified doc id plus
    # one 'SUM TOTAL' rollup row; numeric (or '{:,}'-formatted) quantities
    # are rotation-invariant, so replicas copy them and the TOTAL row is
    # the original total scaled by FACTOR.
    key_col = "path" if spec == "stats" else "Filename"
    per_doc = small[small[key_col] != "SUM TOTAL"]
    total = small[small[key_col] == "SUM TOTAL"]
    if len(total) != 1:
        return "replica_fail", "no SUM TOTAL row in the sf0.1 oracle output"
    reps = []
    for k in range(FACTOR):
        r = per_doc.copy()
        r[key_col] = (r[key_col].astype("int64") + k * stride).astype(str)
        reps.append(r)
    t = total.copy()
    if spec == "stats":
        for c in ("pages", "chunks", "file_size", "text_size", "unmapped_fonts"):
            t[c] = t[c] * FACTOR  # ratio is a quotient: invariant
    else:
        for c in ("Pages", "Chunks", "File Size", "Text Size"):
            t[c] = t[c].map(lambda s: f"{int(str(s).replace(',', '')) * FACTOR:,}")
        # 'Ratio' quotient and 'Unmapped Fonts' ('0') are invariant
    exp = pd.concat(reps + [t], ignore_index=True)
    return compare_frames(exp, act, [key_col], len(small))


def stride_of(con, sf01_dir, kind):
    tbl, col = (("documents", "doc_id") if kind == "doc"
                else ("embeddings", "vec_id"))
    return con.sql(
        f"SELECT max({col}) + 1 FROM "
        f"read_parquet('{sf01_dir}/{tbl}.parquet')").fetchone()[0]


def replica_check(con, name, sql, kinds, sf1_verify, sf01_dir):
    small = con.sql(sql).df()
    shift_cols = [c for k in kinds for c in ID_COLS[k] if c in small.columns]
    strides = {c: stride_of(con, sf01_dir, k)
               for k in kinds for c in ID_COLS[k] if c in small.columns}
    reps = []
    for k in range(FACTOR):
        r = small.copy()
        for c in shift_cols:
            r[c] = r[c] + k * strides[c]
        reps.append(r)
    exp = pd.concat(reps, ignore_index=True)
    act = pd.read_parquet(f"{sf1_verify}/{name}")
    return compare_frames(exp, act, shift_cols, len(small))


def main():
    sf1_dir, sf1_verify, sf01_dir, out_path = sys.argv[1:5]
    per_q_timeout = int(sys.argv[5]) if len(sys.argv) > 5 else 300
    oracle = json.load(open(f"{sf1_verify}/oracle_sql.json"))
    ORACLE_CACHE.update(oracle)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf01_dir}/{t}.parquet')")

    # Incremental mode: extra args after the timeout are query names —
    # process only those and MERGE into an existing out_path artifact
    # (re-checks after a fix or with a bigger budget, without redoing
    # the whole sweep).
    only = set(sys.argv[6:])
    parity, notes = {}, {}
    if only:
        try:
            prev = json.load(open(out_path))
            parity, notes = prev.get("parity", {}), prev.get("notes", {})
        except (OSError, ValueError):
            pass

    def selected(names):
        return [n for n in names if not only or n in only]

    quadratic = {n for n, sql in oracle.items()
                 if any(m in sql for m in QUADRATIC_MARKERS)}
    fixture = set(FIXTURE_QUERIES) & set(oracle)
    feasible = sorted(set(oracle) - quadratic - fixture)
    print(f"[parity] {len(feasible)} direct, {len(quadratic)} quadratic "
          f"({sorted(quadratic)}), {len(fixture)} fixture-gated "
          f"({sorted(fixture)})")

    recompute_fns = {
        "graph_components": graph_components_recompute,
        "sim_knn": knn_recompute_check,
        "dedup_sorted_nbhd": sorted_nbhd_recompute_check,
        "dedup_incremental": incremental_recompute_check,
        "dedup_embedding_ann_hi": annhi_planted_check,
    }
    if FACTOR >= 1000:
        # the Lloyd-unrolled DuckDB chain spills past the box's free
        # disk at 500k vectors (r13, measured) — recompute instead
        recompute_fns["sim_ivf"] = ivf_recompute_check

    for name in selected(feasible):
        if name in recompute_fns:
            verdict, note = recompute_fns[name](sf1_dir, sf1_verify)
            parity[name], notes[name] = verdict, note
            print(f"[parity] {name}: {verdict}  {note}")
            continue
        try:
            proc = subprocess.run(
                [sys.executable, "scripts/check.py", sf1_dir, sf1_verify, name],
                capture_output=True, text=True, timeout=per_q_timeout)
            verdict = "pass" if f"PASS {name}" in proc.stdout else "fail"
            if verdict == "fail":
                notes[name] = "\n".join(proc.stdout.splitlines()[:4])
        except subprocess.TimeoutExpired:
            verdict = "oracle_timeout"
            notes[name] = f"direct replay exceeded {per_q_timeout}s in DuckDB"
            if name in INFEASIBLE_NOTES:
                notes[name] += "; " + INFEASIBLE_NOTES[name]
        parity[name] = verdict
        print(f"[parity] {name}: {verdict}")

    for name in selected(sorted(quadratic)):
        if name in REPLICA_EQUIVARIANT:
            verdict, note = replica_check(
                con, name, oracle[name], REPLICA_EQUIVARIANT[name],
                sf1_verify, sf01_dir)
            parity[name], notes[name] = verdict, note
        elif name in DIRECT_RETRY:
            if FACTOR > 10:
                # the all-pairs replay is out of reach beyond factor 10:
                # exact-verify the dump + within-replica inclusion instead
                verdict, note = embedding_pairs_check(
                    con, sf1_dir, sf1_verify, sf01_dir)
                parity[name], notes[name] = verdict, note
                print(f"[parity] {name}: {verdict}  {note}")
                continue
            try:
                proc = subprocess.run(
                    [sys.executable, "scripts/check.py", sf1_dir, sf1_verify,
                     name],
                    capture_output=True, text=True, timeout=per_q_timeout)
                parity[name] = ("pass" if f"PASS {name}" in proc.stdout
                                else "fail")
                notes[name] = "direct brute-force replay at sf1"
                if parity[name] == "fail":
                    notes[name] += "\n" + "\n".join(
                        proc.stdout.splitlines()[:4])
            except subprocess.TimeoutExpired:
                parity[name] = "oracle_timeout"
        elif name in TWIN_OF:
            twin = TWIN_OF[name]
            a = pd.read_parquet(f"{sf1_verify}/{name}")
            b = pd.read_parquet(f"{sf1_verify}/{twin}")
            verdict, note = compare_frames(a, b, list(a.columns), len(b))
            if verdict == "replica_pass":
                parity[name] = "twin_pass"
                notes[name] = (f"exhaustiveness vs the exact grid: equal to "
                               f"the {twin} sf1 dump, {len(b)} rows")
            else:
                parity[name] = "twin_fail"
                notes[name] = (f"exhaustiveness vs the exact grid "
                               f"({twin} sf1 dump): {note}")
        elif name in UNION_FIND:
            verdict, note = union_find_check(sf1_verify, name, UNION_FIND[name])
            parity[name], notes[name] = verdict, note
        elif name in RECOMPUTE:
            verdict, note = recompute_fns[name](sf1_dir, sf1_verify)
            parity[name], notes[name] = verdict, note
        elif name in COMPOSED_VIA_CLUSTER:
            verdict, note = composed_cluster_check(
                con, name, oracle, sf1_dir, sf1_verify, sf01_dir)
            parity[name], notes[name] = verdict, note
        else:
            parity[name] = "oracle_infeasible_at_scale"
            if name in INFEASIBLE_NOTES:
                notes[name] = INFEASIBLE_NOTES[name]
        print(f"[parity] {name}: {parity[name]}  {notes.get(name, '')}")

    for name in selected(sorted(fixture)):
        verdict, note = fixture_replica_check(
            con, name, oracle[name], FIXTURE_QUERIES[name],
            sf1_verify, sf01_dir)
        parity[name], notes[name] = verdict, note
        print(f"[parity] {name}: {verdict}  {note}")

    with open(out_path, "w") as f:
        json.dump({"parity": parity, "notes": notes}, f, indent=1,
                  sort_keys=True)
    counts = pd.Series(list(parity.values())).value_counts().to_dict()
    print(f"[parity] wrote {out_path}: {counts}")


if __name__ == "__main__":
    main()
