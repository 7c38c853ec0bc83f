package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-up corpus generator for the sf1.0 audit: derives a
  * factor-N corpus from an existing sf directory so the heavy
  * queries' scaling exponents can be MEASURED, not argued from plan
  * inspection. Usage:
  *
  *   runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  *
  * Replica 0 is the source verbatim; replica k ≥ 1 shifts every key
  * by k·stride (strides preserve the residue classes queries filter
  * on — the lineitem order stride stays a multiple of 8 for the
  * graph family's `l_orderkey % 8` subset) and applies a
  * STRUCTURE-PRESERVING, CROSS-REPLICA-DECORRELATING transform to
  * the payload:
  *
  *   - `documents.text`: per-replica Caesar rotation over letters and
  *     digits. A character bijection preserves length, shingle-set
  *     cardinality, and every within-replica similarity relation
  *     (n-gram Jaccard, MinHash, SimHash bands, winnowing) EXACTLY,
  *     while making cross-replica shingles disjoint — so near-dup
  *     density grows linearly with the corpus instead of every
  *     replica pair colliding.
  *   - `embeddings.embedding`: per-replica signed coordinate
  *     rotation (rotate indices by k·23 mod dim, flip deterministic
  *     signs). A signed permutation is orthogonal: within-replica
  *     cosines are bit-identical to the source; cross-replica
  *     cosines are pseudo-random and CONCENTRATE near 0 (1/√64
  *     scale) but are only Gaussian-suppressed, not zero — with
  *     clustered vectors the tail above a LOW threshold is real
  *     (measured at factor 10: ~8e-5 of the 2e8 cross pairs exceed
  *     cos 0.45, i.e. thousands of genuine cross-replica near-dups,
  *     matching how an iid-grown corpus behaves). Replica-union
  *     oracles for embeddings are therefore sound only at high
  *     thresholds (0.8: tail ~1e-10); the scale-up parity gate
  *     verifies the exhaustive low-threshold family by direct
  *     replay / twin-equality / union-find instead
  *     (scripts/scaleup_parity.py).
  *   - `lineitem`/`orders`/`customer`/`supplier`/`part`: pure key
  *     shifts with one shared stride per key family, so every FK
  *     joins within its replica and nothing dangles — N disjoint
  *     copies of the relational schema (and of the co-occurrence
  *     graph: the expected linear-growth regime for joins and the
  *     graph family). `nation`/`region` stay fixed like real TPC-H
  *     bounded dims.
  *   - `events`: event/user key shifts — N disjoint user populations
  *     with identical temporal structure, an honest factor-N
  *     workload for sessionization, per-user windows, and streaming
  *     replay.
  *
  * Everything is written as ONE parquet file per table (the DuckDB
  * gate reads `<dir>/<table>.parquet` as a file), and the untouched
  * tables are byte-copied so the directory is a complete corpus.
  * Deterministic end-to-end: same (src, factor) ⟹ same bytes ⟹ same
  * Tables.fingerprint, so artifact memos behave exactly as on a real
  * corpus.
  */
object ScaleUp {

  def caesar(s: String, k: Int): String =
    if (k == 0) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        sb += (
          if (c >= 'a' && c <= 'z') ('a' + (c - 'a' + k) % 26).toChar
          else if (c >= 'A' && c <= 'Z') ('A' + (c - 'A' + k) % 26).toChar
          else if (c >= '0' && c <= '9') ('0' + (c - '0' + k) % 10).toChar
          else c)
        i += 1
      }
      sb.toString
    }

  /** Signed rotation: out(i) = sign(k,i) · in((i + 23k) mod d). */
  def rotateSigned(v: Array[Float], k: Int): Array[Float] =
    if (k == 0) v
    else {
      val d = v.length
      val out = new Array[Float](d)
      var i = 0
      while (i < d) {
        val s = if ((((i + 1L) * (2L * k + 1L) * 2654435761L >>> 16) & 1L) == 0L) 1f else -1f
        out(i) = s * v((i + 23 * k) % d)
        i += 1
      }
      out
    }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args(2).toInt
    // Cap at 10: the cross-replica-disjoint-shingles property needs the
    // per-replica Caesar rotations PAIRWISE distinct on both alphabets —
    // letter rotations collide at k ≡ k' (mod 26) and digit rotations at
    // k ≡ k' (mod 10), so k = 0..9 is the largest factor where every
    // replica pair differs on letters AND digits. Larger factors would
    // silently merge replica shingle sets (e.g. replica 10's digits =
    // replica 0's) and break the linear near-dup-growth regime the
    // scaling-exponent report relies on.
    require(factor >= 1 && factor <= 10, s"bad factor $factor (max 10, see comment)")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-scaleup")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    /** Write df as the single file `<out>/<table>.parquet`. */
    def writeOne(df: org.apache.spark.sql.DataFrame, table: String): Unit = {
      val tmp = s"$out/_tmp_$table"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$out/$table.parquet")
      java.nio.file.Files.deleteIfExists(dst)
      java.nio.file.Files.move(part.toPath, dst)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      println(s"[scaleup] wrote $table.parquet")
    }

    // A partial corpus must scale what it has, not crash on what it
    // lacks — every table is guarded (and the relational strides
    // below are lazy so an absent table never forces a read of
    // another absent one).
    def has(table: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$src/$table.parquet"))

    // documents: id shift + per-replica Caesar payload
    if (has("documents")) {
      val docStride = spark.read.parquet(s"$src/documents.parquet")
        .agg(org.apache.spark.sql.functions.max("doc_id")).as[Long].head() + 1
      writeOne(
        spark.read.parquet(s"$src/documents.parquet")
          .as[(Long, String, String, String, Long)]
          .flatMap { case (id, text, lang, source, n) =>
            (0 until factor).iterator.map(k =>
              (id + k * docStride, caesar(text, k), lang, source, n))
          }.toDF("doc_id", "text", "lang", "source", "n_chars"),
        "documents")
    } else println("[scaleup] skip documents (absent)")

    // embeddings: id shift + signed rotation
    if (has("embeddings")) {
      val vecStride = spark.read.parquet(s"$src/embeddings.parquet")
        .agg(org.apache.spark.sql.functions.max("vec_id")).as[Long].head() + 1
      writeOne(
        spark.read.parquet(s"$src/embeddings.parquet")
          .as[(Long, Array[Float], Int)]
          .flatMap { case (id, emb, label) =>
            (0 until factor).iterator.map(k =>
              (id + k * vecStride, rotateSigned(emb, k), label))
          }.toDF("vec_id", "embedding", "label"),
        "embeddings")
    } else println("[scaleup] skip embeddings (absent)")

    // Relational fact + dim replication: pure key shifts with ONE
    // stride per key FAMILY, computed from the dimension (key-superset)
    // table and applied identically on both sides of every FK — so
    // replica k's lineitem joins replica k's orders/part/supplier and
    // NOTHING dangles (a verbatim-copied orders would leave replicas
    // 1..9 of lineitem unmatched and silently deflate every join
    // query's scaled workload). The order stride is rounded up to a
    // multiple of 8 so the `l_orderkey % 8` graph subset keeps its
    // exact density in every replica. nation/region stay fixed —
    // bounded dims, exactly how real TPC-H scaling treats them.
    import org.apache.spark.sql.functions._
    val reps = spark.range(0, factor).toDF("k")

    def maxKey(table: String, col0: String): Long =
      Option(spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col0)).head().get(0))
        .map(_.asInstanceOf[Number].longValue).getOrElse(-1L)

    lazy val ordStride = ((maxKey("orders", "o_orderkey") + 8) / 8) * 8
    lazy val custStride = maxKey("customer", "c_custkey") + 1
    lazy val suppStride = maxKey("supplier", "s_suppkey") + 1
    lazy val partStride = maxKey("part", "p_partkey") + 1

    /** Replicate `table` factor times, shifting each (col -> stride)
      * key by k*stride and keeping every other column verbatim.
      * Missing tables are skipped (partial corpus dirs are legal). */
    // `shifts` is by-name so an absent table never forces the lazy
    // strides (which read OTHER tables that may also be absent)
    def replicate(table: String, shifts: => Seq[(String, Long)]): Unit = {
      if (!has(table)) { println(s"[scaleup] skip $table (absent)"); return }
      val df = spark.read.parquet(s"$src/$table.parquet")
      val shiftMap = shifts.toMap
      writeOne(
        df.crossJoin(broadcast(reps))
          .select(df.columns.map { c =>
            shiftMap.get(c) match {
              case Some(stride) => (col(c) + col("k") * stride).as(c)
              case None => col(c)
            }
          }.toIndexedSeq: _*),
        table)
    }

    replicate("lineitem", Seq("l_orderkey" -> ordStride,
      "l_partkey" -> partStride, "l_suppkey" -> suppStride))
    replicate("orders", Seq("o_orderkey" -> ordStride, "o_custkey" -> custStride))
    replicate("customer", Seq("c_custkey" -> custStride))
    replicate("supplier", Seq("s_suppkey" -> suppStride))
    replicate("part", Seq("p_partkey" -> partStride))

    // events: replicate into factor DISJOINT user populations with
    // identical temporal structure (ts/event_type/value/props kept) —
    // sessionization, per-user windows, and watermarked streaming
    // replay all see an honest factor-x workload, while calendar-grain
    // relations (day/week rows) stay calendar-bounded as they would in
    // a genuinely larger deployment.
    replicate("events", Seq(
      "event_id" -> (maxKey("events", "event_id") + 1),
      "user_id" -> (maxKey("events", "user_id") + 1)))

    // remaining tables: verbatim byte copies (complete corpus dir)
    for (t <- Seq("region", "nation")) {
      val s = java.nio.file.Paths.get(s"$src/$t.parquet")
      val d = java.nio.file.Paths.get(s"$out/$t.parquet")
      if (java.nio.file.Files.exists(s)) {
        java.nio.file.Files.copy(s, d,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        println(s"[scaleup] copied $t.parquet")
      }
    }
    println(s"[scaleup] done: $out (factor $factor)")
    spark.stop()
  }
}
