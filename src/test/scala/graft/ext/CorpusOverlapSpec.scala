package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Semantics pins for the MinHash corpus-overlap estimator (the
  * oracle gate carries bit-equality of every min; this pins the
  * estimator's endpoints and its tracking of the exact tier on
  * corpora with constructed overlap).
  */
class CorpusOverlapSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ov-corpus").toString
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // distinct sentences -> disjoint word-3-gram shingle sets
  private def sentence(seed: Int): String =
    (0 until 12).map(i => s"w${seed}x$i").mkString(" ")

  test("corpusOverlap: identical sources estimate 1.0, disjoint estimate 0.0") {
    val shared = (0 until 8).map(sentence).mkString(" ")
    val dir = corpus(Seq(
      (1L, shared, "a"), (2L, shared, "b"),
      (3L, (100 until 108).map(sentence).mkString(" "), "c")))
    val rows = CorpusOverlap(spark, dir)
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = byPair(("a", "b"))
    assert(ab.getLong(4) == ab.getLong(2), "identical sets must fully intersect")
    assert(ab.getLong(6) == 1000000L, "est_ppm must be exactly 1e6 on equal sets")
    assert(ab.getLong(7) == 1000000L)
    for (p <- Seq(("a", "c"), ("b", "c"))) {
      val r = byPair(p)
      assert(r.getLong(4) == 0L && r.getLong(6) == 0L && r.getLong(7) == 0L,
        s"disjoint pair $p must be zero everywhere")
    }
  }

  test("corpusOverlap: the estimate tracks the exact Jaccard on partial overlap") {
    // a and b share half their sentences -> exact J ~ 1/3
    val common = (0 until 10).map(sentence).mkString(" ")
    val dir = corpus(Seq(
      (1L, common + " " + (200 until 210).map(sentence).mkString(" "), "a"),
      (2L, common + " " + (300 until 310).map(sentence).mkString(" "), "b")))
    val r = CorpusOverlap(spark, dir).head
    val exact = r.getLong(7) / 1e6
    val est = r.getLong(6) / 1e6
    assert(exact > 0.2 && exact < 0.5, s"construction broken: exact=$exact")
    // k=32 perms: sd ~ sqrt(J(1-J)/32) ~ 0.08; allow 4 sd
    assert(math.abs(est - exact) < 0.33, s"estimate off: est=$est exact=$exact")
  }

  private def CorpusOverlap(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Dedup.corpusOverlap(spark, dir).collect()
}
