package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Semantics pins for sorted-neighborhood dedup: the window finds
  * prefix-adjacent near-dups and — by design — misses pairs pushed
  * further than w−1 apart in the sort order. The oracle gate carries
  * hash equality; this fixes the recall boundary on construction.
  */
class SortedNeighborhoodSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sn-corpus").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'a' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // every doc shares this >64-normalized-char prefix, so all land in
  // one block with identical snkey -> sort order falls to doc_id
  private val prefix =
    "communal preamble paragraph shared across every document in this block entirely"

  private def tail(seed: Int): String =
    (0 until 30).map(i => s"tail${seed}word$i").mkString(" ")

  test("dedupSortedNeighborhood: adjacent near-dups found, far ones missed") {
    val base = tail(0)
    val variant = base.split(" ").updated(15, "CHANGED").mkString(" ")
    // ids 1 and 3: rank distance 2 (within w-1=4) -> found
    // ids 10 and 16: same near-dup content but 5 fillers between
    //   -> rank distance 6 > 4 -> missed BY DESIGN
    val far = tail(9)
    val farVariant = far.split(" ").updated(15, "ALTERED").mkString(" ")
    val dir = corpus(Seq(
      (1L, s"$prefix $base"),
      (2L, s"$prefix ${tail(1)}"),
      (3L, s"$prefix $variant"),
      (10L, s"$prefix $far"),
      (11L, s"$prefix ${tail(2)}"),
      (12L, s"$prefix ${tail(3)}"),
      (13L, s"$prefix ${tail(4)}"),
      (14L, s"$prefix ${tail(5)}"),
      (15L, s"$prefix ${tail(6)}"),
      (16L, s"$prefix $farVariant")))
    val pairs = Dedup.dedupSortedNeighborhood(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), "adjacent near-dup pair must be found")
    assert(!pairs.contains((10L, 16L)),
      "pair beyond the w-1 neighborhood must be out of scope")
    // sanity: the missed pair IS a true near-dup (the exact tier
    // would keep it) — the miss is the window, not the verify
    val sa = Dedup.shingleSet(s"$prefix ${tail(9)}").toSet
    val sb = Dedup.shingleSet(
      s"$prefix ${tail(9).split(" ").updated(15, "ALTERED").mkString(" ")}").toSet
    val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(j >= 0.8, s"construction broken: true jaccard $j < 0.8")
  }
}
