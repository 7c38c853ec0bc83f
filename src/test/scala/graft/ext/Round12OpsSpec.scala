package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-12 additions: segment-level keep-first dedup (CCNet-style),
  * content-defined chunking with cross-doc chunk dedup, and
  * DSIR-style hashed-feature importance weighting. The oracle gate
  * carries the hash-equality check; these pin the semantics on
  * crafted corpora and independent local replays.
  */
class Round12OpsSpec extends AnyFunSuite with SparkTestBase {

  private val P = 1000000007L

  /** Independent re-implementation of the shared portable fold. */
  private def polyHash(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(c => h = (h * 31L + c) % P)
    h
  }

  /** Crafted documents table with a controllable lang column. */
  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r12-corpus").toString
    rows.toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'src1' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def wordsBlock(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("dedupLines: keep-first across docs, aligned repeats die, " +
    "misaligned repeats survive") {
    // doc0: 20 unique words = 2 segments, both first occurrences.
    // doc1: segment 0 REPEATS doc0's segment 0 verbatim (removed),
    //       segment 1 unique (kept).
    // doc2: identical text to doc0 — both segments removed.
    // doc3: doc0's segment 0 shifted by one word — 10-word windows no
    //       longer align, so nothing matches (the documented offset
    //       sensitivity of fixed-window CCNet-style hashing).
    val a = wordsBlock("alpha", 10)
    val b = wordsBlock("beta", 10)
    val dir = corpus(Seq(
      (0L, s"$a $b", "en"),
      (1L, s"$a ${wordsBlock("gamma", 10)}", "en"),
      (2L, s"$a $b", "en"),
      (3L, s"shift $a ${wordsBlock("delta", 9)}", "en")))
    val rows = Dedup.dedupLines(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows(0L) == ((2L, 2L, 0L, 20L)))
    assert(rows(1L) == ((2L, 1L, 1L, 10L)))
    assert(rows(2L) == ((2L, 0L, 2L, 0L)))
    assert(rows(3L) == ((2L, 2L, 0L, 20L)))
  }

  test("dedupLines: corpus-wide kept mass equals the distinct-segment census") {
    // every distinct segment key is kept exactly once corpus-wide
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.dedupLines(spark, dir)
    val kept = out.agg(sum("n_kept")).head().getLong(0)
    val segs = out.agg(sum("n_segs")).head().getLong(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val allSegs = docs.flatMap { case (_, t) =>
      t.split(" +").filter(_.nonEmpty).grouped(10).map(_.mkString(" "))
    }
    assert(segs == allSegs.length)
    assert(kept == allSegs.map(polyHash).distinct.length)
  }

  test("cdcChunks: chunks reassemble the document and hashes are the " +
    "plain fold of each chunk") {
    val rnd = new scala.util.Random(5)
    val text = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val chunks = TextAnalysis.cdcChunks(text)
    assert(chunks.map(_._2).sum == text.length)
    assert(chunks.map(_._1).toSeq == (1L to chunks.length).toSeq)
    var off = 0
    for ((_, len, h) <- chunks) {
      assert(h == polyHash(text.substring(off, off + len.toInt)))
      off += len.toInt
    }
    assert(chunks.length > 2, "fixture long enough to cut")
  }

  test("cdcChunks: boundaries are content-defined — a prefix edit " +
    "shifts at most the chunks before the first surviving boundary") {
    val rnd = new scala.util.Random(9)
    val t1 = (0 until 800).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val t2 = "INSERTED PREFIX " + t1
    def cutsOf(t: String): Seq[Long] =
      TextAnalysis.cdcChunks(t).map(_._2).scanLeft(0L)(_ + _).tail
    val c1 = cutsOf(t1)
    assert(c1.length > 3, "fixture must produce several boundaries")
    val b1 = c1.head // first boundary of t1 (window fully inside t1)
    val k = t2.length - t1.length
    // every t1 boundary reappears k chars later in t2 (the window
    // content is identical); t2 may only ADD boundaries near the seam
    val c2 = cutsOf(t2).toSet
    for (b <- c1.dropRight(1)) // last cut is the doc end, not a hash cut
      assert(c2.contains(b + k), s"boundary $b must survive the edit")
    // and the chunk hash sequence after the first shared boundary is
    // identical — the dedup-friendliness CDC exists for
    val tail1 = TextAnalysis.cdcChunks(t1)
      .dropWhile(c => cutsOf(t1)(c._1.toInt - 1) <= b1).map(c => (c._2, c._3))
    val tail2 = TextAnalysis.cdcChunks(t2)
      .dropWhile(c => cutsOf(t2)(c._1.toInt - 1) <= b1 + k).map(c => (c._2, c._3))
    assert(tail1.nonEmpty && tail1.toSeq == tail2.toSeq)
  }

  test("textCdc: per-doc census reconciles with a local kernel replay " +
    "and shared chunks are symmetric") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.textCdc(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val local = docs.map { case (id, t) => id -> TextAnalysis.cdcChunks(t) }
    val census = local.flatMap { case (id, cs) =>
      cs.map(c => ((c._3, c._2), id))
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    for ((id, cs) <- local) {
      val (nChunks, maxLen, nShared) = rows(id)
      assert(nChunks == cs.length)
      assert(maxLen == cs.map(_._2).max)
      assert(nShared == cs.count(c => census((c._3, c._2)) > 1))
    }
  }

  test("pipelineDsir: full local integer replay matches, and the " +
    "relative cut separates a vocab-skewed corpus correctly") {
    // crafted corpus with REAL vocabulary separation: target docs
    // lean on 'spark'-ish words, source docs on 'duck'-ish words,
    // one mixed doc sits near the boundary
    val dir = corpus(Seq(
      (0L, "spark scala jvm spark scala jvm spark scala", "en"),
      (1L, "spark scala jvm executor shuffle spark scala jvm", "en"),
      (2L, "duck goose swan duck goose swan duck goose", "fr"),
      (3L, "duck goose swan pond river duck goose swan", "zh"),
      (4L, "spark duck scala goose jvm swan executor pond", "es")))
    val got = PipelineOps.pipelineDsir(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // independent local replay, integers end to end
    val docs = Seq(
      (0L, "spark scala jvm spark scala jvm spark scala", "en"),
      (1L, "spark scala jvm executor shuffle spark scala jvm", "en"),
      (2L, "duck goose swan duck goose swan duck goose", "fr"),
      (3L, "duck goose swan pond river duck goose swan", "zh"),
      (4L, "spark duck scala goose jvm swan executor pond", "es"))
    val toks = docs.flatMap { case (id, t, lang) =>
      t.split(" +").filter(_.nonEmpty).map(w => (id, lang, polyHash(w) % 1024L))
    }
    val byBucket = toks.groupBy(_._3).view.mapValues { xs =>
      val tb = xs.count(_._2 == "en").toLong
      val sb = xs.count(_._2 != "en").toLong
      (tb + 1L) * 1000000L / (sb + 1L)
    }.toMap
    val perDoc = docs.map { case (id, t, lang) =>
      val ws = t.split(" +").filter(_.nonEmpty)
      val score = ws.map(w => byBucket(polyHash(w) % 1024L)).sum
      (id, lang, ws.length.toLong, score, score / ws.length)
    }
    val mean = perDoc.map(_._4).sum / perDoc.map(_._3).sum
    val want = perDoc.map { case (id, lang, n, s, spt) =>
      (id, lang, n, s, spt, spt >= mean)
    }
    assert(got.sortBy(_._1).toSeq == want)
    // the cut lands where the vocabulary says it should
    val sel = got.map(r => r._1 -> r._6).toMap
    assert(sel(0L) && sel(1L), "target-vocab docs selected")
    assert(!sel(2L) && !sel(3L), "source-vocab docs rejected")
  }

  test("textZipf: integer replay matches and a planted 1/rank corpus " +
    "has zero deviation") {
    // crafted corpus whose term frequencies are EXACTLY freq1/rank:
    // 12/6/4/3 occurrences of w1..w4 (12/k integral for k = 1..4)
    val dir = corpus(Seq(
      (0L, (Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++ Seq.fill(4)("w3") ++
        Seq.fill(3)("w4")).mkString(" "), "en")))
    val got = TextAnalysis.textZipf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "w1", 12L, 12L, 0L), (2L, "w2", 6L, 6L, 0L),
      (3L, "w3", 4L, 4L, 0L), (4L, "w4", 3L, 3L, 0L)))
    // independent replay on the real corpus: top-20 by (freq desc,
    // term asc), prediction freq1/rank, deviation in ppm — integers
    val real = "/root/testdata/sf0.001"
    val docsRows = spark.read.parquet(s"$real/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    for (t <- docsRows; w <- t.split(" +") if w.nonEmpty)
      freq(w) = freq.getOrElse(w, 0L) + 1L
    val top = freq.toSeq.sortBy { case (w, n) => (-n, w) }.take(20)
    val f1 = top.head._2
    val want = top.zipWithIndex.map { case ((w, n), i) =>
      val rank = i + 1L
      (rank, w, n, f1 / rank, math.abs(n - f1 / rank) * 1000000L / f1)
    }
    val gotReal = TextAnalysis.textZipf(spark, real).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(gotReal.toSeq == want)
  }
}
