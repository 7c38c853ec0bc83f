package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet reader, shuffle paths) so the
    // first timed query is not charged JVM/session initialization.
    spark.range(0, 1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Timing protocol (contention-hardened, VERDICT r2 task 6): the
    // cold run carries one-time plan analysis + whole-stage codegen
    // compilation; `hot` is the MEDIAN of three further runs, so a
    // single interference spike (another process stealing the box, as
    // happened to the r2 driver bench) cannot inflate a query's
    // reported time. Run order is emitted so any residual
    // interference is diagnosable against the sequence.
    // optional comma-separated query filter: profile one query's cold
    // path in a fresh JVM without the 70-query warm-up ahead of it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      def timed(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (cold, okCold) = timed()
      val hots = if (okCold) Seq.fill(3)(timed()) else Seq.empty
      val okHot = okCold && hots.forall(_._2)
      val hot = if (okHot) hots.map(_._1).sorted.apply(1) else -1.0
      (name, cold, hot, okCold && okHot)
    }
    // failed queries are reported as -1 and excluded from the totals —
    // a crash must never read as a fast run
    def jsonMap(pick: ((String, Double, Double, Boolean)) => Double): String =
      results.map { case r @ (k, _, _, ok) =>
        s"\"" + k + "\":" + (if (ok) pick(r) else -1.0)
      }.mkString("{", ",", "}")
    val total = results.collect { case (_, c, _, true) => c }.sum
    val hotTotal = results.collect { case (_, _, h, true) => h }.sum
    val failed = results.collect { case (k, _, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val order = results.map(r => s"\"${r._1}\"").mkString("[", ",", "]")
    // Queries whose hot runs serve a build-once memo (IVF centroid
    // model, cluster labeling) rather than recomputing: their hot
    // numbers are SERVE time, not compute time — tagged so readers
    // don't compare them against recomputing queries (ADVICE r3).
    val memoized = Seq("sim_ivf", "sim_pq", "dedup_cluster", "pipeline_prep",
      "graph_pagerank", "graph_triangles", "graph_jaccard", "graph_bfs",
      "graph_components", "pipeline_holdout", "dedup_semantic", "text_rank",
      "text_bpe", "text_bpe_encode")
      .filter(SparkEntry.queries.contains).map(q => s"\"$q\"")
      .mkString("[", ",", "]")
    // The reference-semantics subset (the document pipeline — the
    // workload BASELINE.md's 22.63 s wall actually measures). The
    // suite keeps growing with extension operators, so the all-query
    // totals creep against the fixed baseline by construction
    // (VERDICT r3 noted this); core_hot is the like-for-like number.
    val coreSet = Set("doc_chunk_stats", "doc_chunks", "doc_chunks_overlap",
      "chunk_fixed", "chunk_multipage", "doc_stats_fixed", "doc_normalize",
      "multi_root", "doc_report", "sql_chunk_split")
    val coreHot = results.collect {
      case (k, _, h, true) if coreSet(k) => h
    }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","hot_total":$hotTotal,""" +
      s""""queries":${jsonMap(_._2)},"queries_hot":${jsonMap(_._3)},""" +
      s""""hot_protocol":"median_of_3","order":$order,""" +
      s""""core_hot":$coreHot,"core_queries":${coreSet.toSeq.sorted.map(q => s"\"$q\"").mkString("[", ",", "]")},""" +
      s""""memoized_hot":$memoized,"failed":$failed,"sf":"$sfDir"}"""
    // The driver tail-grabs the LAST 2000 chars of sbt stdout (every
    // BENCH_r*.json so far has tail_len=2000 and parsed:null — the
    // full one-line JSON never fit). Print a compact line sized to
    // survive that window: 2-dp values, and if the query map still
    // overflows the budget, drop the CHEAPEST queries first (the
    // expensive ones are the ones worth reading) with an explicit
    // omitted count. The complete JSON goes to files.
    // Locale.ROOT: the f-interpolator uses the default locale, and a
    // decimal-comma locale would print malformed JSON
    def r2(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val budget = 1800 // 2000 minus sbt's trailing "[success] ..." line
    def compact(keep: Int): String = {
      val kept = results.sortBy { case (_, c, _, ok) => if (ok) -c else 1.0 }
        .take(keep)
      val qs = kept.map { case (k, c, _, ok) =>
        s"\"$k\":${if (ok) r2(c) else "-1"}"
      }.mkString("{", ",", "}")
      val omitted = results.size - kept.size
      s"""{"metric":"total","value":${r2(total)},"unit":"sec",""" +
        s""""hot_total":${r2(hotTotal)},"core_hot":${r2(coreHot)},""" +
        s""""n_queries":${results.size},"omitted_fast":$omitted,""" +
        s""""failed":$failed,"full":"BENCH_FULL.json",""" +
        s""""queries":$qs,"sf":"$sfDir"}"""
    }
    val line = Iterator.range(results.size, -1, -1).map(compact)
      .find(_.length <= budget).getOrElse(compact(0))
    println(line)
    // The file copies are the always-parseable round artifacts:
    // target/ is gitignored, so also write a repo-root copy that the
    // driver's end-of-round commit captures. A SPARK_GRAFT_ONLY
    // filtered run must not clobber the full-suite artifact.
    val artifacts =
      if (only.isEmpty) Seq("target/bench.json", "BENCH_FULL.json")
      else Seq("target/bench.json")
    for (p <- artifacts) {
      try {
        val out = java.nio.file.Paths.get(p)
        Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(out, json.getBytes("UTF-8"))
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.stop()
  }
}
