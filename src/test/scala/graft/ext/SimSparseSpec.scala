package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Semantics pins for the sparse-cosine inverted-index join. */
class SimSparseSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sparse-corpus").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'a' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("simSparse: identical docs score 1.0 and rank first; disjoint never pair") {
    val dir = corpus(Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta different tokens here"),
      (4L, "zeta eta theta iota kappa")))
    val rows = Similarity.simSparse(spark, dir).collect()
    assert(rows.head.getLong(1) == 1L && rows.head.getLong(2) == 2L)
    assert(rows.head.getDouble(4) == 1.0)
    val pairs = rows.map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L },
      "term-disjoint doc must pair with nothing")
  }

  test("simSparse: a term over the df cap contributes no pairs") {
    // "stop" appears in 52 docs (> cap 50); docs 100 and 101 share
    // ONLY that term -> they must not pair. Docs 100/101 each carry
    // a private rare term so they stay in the pruned space.
    val fillers = (0 until 50).map(i => (i.toLong, s"stop filler$i"))
    val dir = corpus(fillers ++ Seq(
      (100L, "stop rareword100"),
      (101L, "stop rareword101")))
    val rows = Similarity.simSparse(spark, dir).collect()
    val pairs = rows.map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(!pairs.contains((100L, 101L)),
      "stopword-only co-occurrence must be pruned by the df cap")
  }
}
