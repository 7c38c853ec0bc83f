package graft.tools

import org.apache.spark.sql.SparkSession

/** Pair-count curve for `dedup_embedding_ann` across the scale audit's
  * decades (round 14, VERDICT r13 ask #3 — "explain the f1000 ANN
  * superlinearity").
  *
  * The premise of the ask was that the query's cost is banded-LSH
  * candidate generation, whose pair count should be linear at constant
  * dup density — making the measured f1000 hot exponent 1.054 look
  * like unexplained superlinearity. The premise does not hold on this
  * path: at the 0.45 exhaustive threshold the CLOSED-FORM tier rule
  * (`Dedup.dedupEmbeddingAnnOn`: B·2⁻ʷ·C_join ≥ 1 for every
  * 0.45-envelope geometry) delegates to the exact block-grid kernel at
  * EVERY corpus size — `tools.AnnGateRecheck` records
  * `grid_delegated:true` at all gate SFs, and this tool re-asserts the
  * rule at each measured n. No banding runs; there are no buckets
  * whose occupancy could grow.
  *
  * The honest cost class is therefore the spec-pinned QUADRATIC
  * contract: pairs scored = C(n,2) exactly —
  *
  *   sf0.01  n=500      1.25e5  pairs
  *   sf1     n=50 000   1.25e9  pairs   (×10⁴ per two decades)
  *   sf10    n=500 000  1.25e11 pairs
  *
  * so the PAIR-WORK exponent is exactly 2.0 per decade. The measured
  * TIME exponent ≈1.05 over sf0.01→sf10 is the quadratic kernel
  * emerging from under fixed per-job cost, not a superlinear candidate
  * stream: at n=500 the kernel does ~1 ms of pair scoring inside a
  * ~0.5 s job (overhead-dominated), while at n=500k the kernel IS the
  * measurement. This tool prints the per-SF closed-form pair count,
  * the measured wall time of one grid pass, and the implied pair
  * throughput — the throughput converging to a constant at the large
  * SFs is the evidence that closes the ask (a genuinely superlinear
  * per-pair mechanism would show FALLING throughput with n).
  *
  * Usage: runMain graft.tools.AnnPairCurve <sfDir> [<sfDir> ...]
  * Prints one JSON line per dir.
  */
object AnnPairCurve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-ann-pair-curve")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val n = graft.sources.Tables.table(spark, dir, "embeddings").count()
      val pairs = n * (n - 1) / 2
      // the tier rule the delegation rests on, re-asserted at this n
      val (w, b) = graft.ext.Dedup.gateAnnGeometry(n)
      val gridDelegated =
        b * math.pow(0.5, w) * graft.ext.Dedup.JoinRowCostVsKernel >= 1.0
      val t0 = System.nanoTime()
      val rows = graft.ext.Dedup.dedupEmbeddingAnn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val thr = pairs / sec
      println(
        s"""{"check":"ann_pair_curve","sf":"$dir","n":$n,"pairs":$pairs,""" +
          s""""envelope_geometry":{"width":$w,"bands":$b},""" +
          s""""grid_delegated":$gridDelegated,"result_rows":$rows,""" +
          s""""grid_pass_s":${f"$sec%.2f"},""" +
          s""""pairs_per_s":${f"$thr%.3e"}}""")
    }
    spark.stop()
  }
}
