package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Dev-time recall audit for the banded-LSH embedding-dedup tier:
  * asserts [[Dedup.dedupEmbeddingAnn]] reproduces the exact all-pairs
  * relation of [[Dedup.dedupEmbedding]] on every given corpus. The
  * hash-derived planes are deterministic, so a pass here is a
  * permanent property of (corpus, plane family, band count), not a
  * sampled probability — this is how the AnnBands=64 width was
  * validated against the barely-above-threshold pairs (cos ≈ 0.4501)
  * the testdata carries.
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
        println(f"$dir: pairs=${exact.size} ann=${ann.size} " +
          f"missed=${missed.size} extra=${extra.size} ann=${tAnn}%.2fs exact=${tExact}%.2fs")
        if (missed.nonEmpty) println(s"  MISSED: ${missed.toSeq.sorted.take(20)}")
        if (extra.nonEmpty) println(s"  EXTRA: ${extra.toSeq.sorted.take(20)}")
        if (missed.nonEmpty || extra.nonEmpty) failed = true
      }
      if (failed) { println("ANN CROSS-CHECK FAILED"); sys.exit(1) }
      else println("ANN CROSS-CHECK OK")
    } finally spark.stop()
  }
}
