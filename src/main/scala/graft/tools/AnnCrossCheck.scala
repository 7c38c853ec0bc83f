package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Dev-time recall audit for the banded-LSH embedding-dedup tier:
  * asserts [[Dedup.dedupEmbeddingAnn]] reproduces the exact all-pairs
  * relation of [[Dedup.dedupEmbedding]] on every given corpus. The
  * hash-derived planes are deterministic, so a pass here is a
  * permanent property of (corpus, plane family, band count), not a
  * sampled probability — this is how the 64-band gate geometry was
  * validated against the barely-above-threshold pairs (cos ≈ 0.4501)
  * the testdata carries. Also audits [[Dedup.dedupEmbeddingAnnHi]]
  * against the exact relation filtered to its 0.8 threshold.
  *
  * Usage: `runMain graft.tools.AnnCrossCheck <sfDir>...`
  */
object AnnCrossCheck {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-ann-crosscheck")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try {
      var failed = false
      for (dir <- args) {
        val t0 = System.nanoTime()
        val ann = Dedup.dedupEmbeddingAnn(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val tAnn = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val exact = Dedup.dedupEmbedding(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val tExact = (System.nanoTime() - t1) / 1e9
        val missed = exact -- ann
        val extra = ann -- exact
        // the production-threshold variant vs the exact relation
        // filtered to its threshold (exact@0.45 ⊇ exact@0.8)
        val t2 = System.nanoTime()
        val hi = Dedup.dedupEmbeddingAnnHi(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val tHi = (System.nanoTime() - t2) / 1e9
        // the hi gate query runs over corpus ∪ planted twins (r14),
        // so its exact reference is the grid kernel over the SAME
        // derived relation at 0.8
        val base = graft.sources.Tables.table(spark, dir, "embeddings")
          .select(org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding"))
        val exactHi = Dedup
          .dedupEmbeddingGridOn(base.unionByName(Dedup.plantedHiTwins(base)), 0.8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val missedHi = exactHi -- hi
        val extraHi = hi -- exactHi
        println(f"$dir: pairs=${exact.size} ann=${ann.size} " +
          f"missed=${missed.size} extra=${extra.size} " +
          f"hi_pairs=${exactHi.size} hi=${hi.size} " +
          f"hi_missed=${missedHi.size} hi_extra=${extraHi.size} " +
          f"ann=${tAnn}%.2fs exact=${tExact}%.2fs hi=${tHi}%.2fs")
        if (missed.nonEmpty) println(s"  MISSED: ${missed.toSeq.sorted.take(20)}")
        if (extra.nonEmpty) println(s"  EXTRA: ${extra.toSeq.sorted.take(20)}")
        if (missedHi.nonEmpty) println(s"  HI MISSED: ${missedHi.toSeq.sorted.take(20)}")
        if (extraHi.nonEmpty) println(s"  HI EXTRA: ${extraHi.toSeq.sorted.take(20)}")
        if (missed.nonEmpty || extra.nonEmpty ||
          missedHi.nonEmpty || extraHi.nonEmpty) failed = true
      }
      if (failed) { println("ANN CROSS-CHECK FAILED"); sys.exit(1) }
      else println("ANN CROSS-CHECK OK")
    } finally spark.stop()
  }
}
