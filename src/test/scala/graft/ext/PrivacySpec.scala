package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Privacy-audit semantics on crafted corpora (the oracle gate
  * carries the hash-equality check at sf scale).
  */
class PrivacySpec extends AnyFunSuite with SparkTestBase {

  /** Crafted documents table: (doc_id, lang, source, n_chars). Text
    * is padding of the declared length so n_chars stays honest.
    */
  private def corpus(rows: Seq[(Long, String, String, Int)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("priv-corpus").toString
    rows.map { case (id, lang, src, n) => (id, "x" * n, lang, src, n.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("privacyKanon: classes below k flagged, class sizes exact") {
    // QI = (lang, source, n_chars div 256): 6 docs in one class,
    // 2 in another, 1 unique
    val dir = corpus(
      (1L to 6L).map(i => (i, "en", "web", 100)) ++
        Seq((7L, "en", "web", 300), (8L, "en", "web", 310),
          (9L, "fr", "books", 100)))
    val out = Privacy.privacyKanon(spark, dir).collect()
    assert(out.length === 3)
    val bySize = out.map(r =>
      ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getBoolean(4)))).toMap
    assert(bySize(("en", "web", 0L)) === ((6L, false)))
    assert(bySize(("en", "web", 1L)) === ((2L, true)))
    assert(bySize(("fr", "books", 0L)) === ((1L, true)))
  }

  test("privacyRisk: bands partition the corpus; shares sum to ~1e6") {
    val dir = corpus(
      (1L to 25L).map(i => (i, "en", "web", 100)) ++ // 4_large (25)
        (26L to 31L).map(i => (i, "en", "books", 100)) ++ // 3_medium (6)
        Seq((32L, "fr", "web", 100), (33L, "fr", "web", 120), // 2_small (2)
          (34L, "de", "web", 100))) // 1_unique
    val out = Privacy.privacyRisk(spark, dir).collect()
    val byBand = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byBand.keySet ===
      Set("1_unique", "2_small", "3_medium", "4_large"))
    assert(byBand("1_unique") === ((1L, 1L, 1000000L / 34, 1000000L)))
    assert(byBand("2_small")._2 === 2L)
    assert(byBand("2_small")._4 === 500000L)
    assert(byBand("3_medium") === ((1L, 6L, 6L * 1000000L / 34, 1000000L / 6)))
    assert(byBand("4_large")._2 === 25L)
    // every document lands in exactly one band
    assert(out.map(_.getLong(2)).sum === 34L)
    // integer-floor shares can undershoot 1e6 by at most #bands
    val shares = out.map(_.getLong(3)).sum
    assert(shares <= 1000000L && shares > 1000000L - 4)
  }

  test("pipelineSurvivor: argmax-quality survivor matches an " +
    "independent recomputation; gain never negative") {
    val dir = "/root/testdata/sf0.001"
    val scores = TextAnalysis.qualityLogreg(spark, dir).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1000000))
      .toMap
    val fam = Dedup.dedupCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = scores.keys.groupBy(id => fam.getOrElse(id, id)).map {
      case (f, ids) =>
        val best = ids.maxBy(id => (scores(id), -id))
        val minId = ids.min
        f -> (ids.size.toLong, best, scores(best),
          minId, scores(best) - scores(minId))
    }
    val out = PipelineOps.pipelineSurvivor(spark, dir).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val e = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) === e, s"family ${r.getLong(0)}")
      assert(r.getLong(5) >= 0, "quality gain must be non-negative")
    }
    // the operator is only interesting if some family's best copy is
    // NOT the min-id member on this corpus
    assert(out.exists(r => r.getLong(2) != r.getLong(4)),
      "corpus has no family where quality-aware differs from min-id")
  }

  test("chunkTokenBudget: greedy packing matches an independent " +
    "BPE + first-fit recomputation") {
    val dir = "/root/testdata/sf0.001"
    val merges = TextAnalysis.textBpe(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    def wordTokens(w: String): Long = {
      var syms = w.split("").filter(_.nonEmpty).toVector
      for ((a, b) <- merges) syms = applyMerge(syms, a, b)
      syms.size.toLong
    }
    val budget = 64L
    val expected = spark.read
      .parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .flatMap { r =>
        val ws = r.getString(1).split(" +", -1)
          .filter(w => w.nonEmpty && !w.contains('\u001F'))
        if (ws.isEmpty) None
        else {
          val toks = ws.map(wordTokens)
          var nc = 0L; var cur = 0L; var mx = 0L
          toks.foreach { t =>
            if (nc == 0 || cur + t > budget) { nc += 1; cur = t }
            else cur += t
            mx = math.max(mx, cur)
          }
          val tot = toks.sum
          Some(r.getLong(0) ->
            (ws.length.toLong, tot, nc, mx, tot * 1000000L / (nc * budget)))
        }
      }.toMap
    val out = TextAnalysis.chunkTokenBudget(spark, dir).collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) === expected(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    // the budget must actually bind on this corpus
    assert(out.exists(_.getLong(3) > 1), "no doc needed more than one chunk")
  }

  test("qualityCascade: first failing rule wins; keep iff pass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("casc-corpus").toString
    val longSpam = Seq.fill(60)("spam spam").mkString(" ") // ~539 chars, one bigram
    val natural = ("the cat sat on the mat and looked at the dog " +
      "while a bird flew over the quiet garden in the late afternoon ") * 3
    Seq(
      (1L, "tiny doc", "en", "s"),           // < 200 chars -> too_short
      (2L, longSpam, "en", "s"),             // long + repeated -> repetition
      (3L, natural, "en", "s"))              // stopword-rich long -> pass
      .toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.qualityCascade(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(4), r.getBoolean(5))).toMap
    assert(out(1L) === (("too_short", false)))
    // doc 2 is ALSO low-quality by the learned scorer, but repetition
    // fires first - the attribution order is the contract
    assert(out(2L) === (("repetition", false)))
    assert(out(3L) === (("pass", true)))
    // components agree with the registered operators on real data
    val rdir = "/root/testdata/sf0.001"
    val casc = TextAnalysis.qualityCascade(spark, rdir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getString(4))).toMap
    val lr = TextAnalysis.qualityLogreg(spark, rdir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    casc.foreach { case (id, (nChars, score, bigram, reason)) =>
      assert(score === lr(id), s"doc $id score drifted from quality_logreg")
      val expected =
        if (nChars < 200) "too_short"
        else if (bigram > 0.08) "repetition"
        else if (score < 0.5) "low_quality"
        else "pass"
      assert(reason === expected, s"doc $id")
    }
  }

  test("dqProfile: metrics recompute from a direct scan") {
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val out = Relational.dqProfile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(out.keySet === Set("doc_id", "lang", "source", "n_chars"))
    val n = d.count()
    for ((c, (filled, nulls, distinct, mn, mx)) <- out) {
      assert(filled + nulls === n, c)
      assert(distinct ===
        d.select(c).filter(d(c).isNotNull).distinct().count(), c)
      import org.apache.spark.sql.functions.{min => mnF, max => mxF, col}
      val Array(em, ex) = d.agg(mnF(col(c)).cast("string"),
        mxF(col(c)).cast("string")).collect().head.toSeq.toArray
      assert(mn === em && mx === ex, c)
    }
  }

  test("textFertility: ppm ratios recompute from the rollup and " +
    "n_tokens never exceeds n_chars") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.textFertility(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (words, chars, toks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(toks >= words, "a word is at least one token")
      assert(toks <= chars, "a token is at least one char")
      assert(r.getLong(4) === toks * 1000000L / words)
      assert(r.getLong(5) === chars * 1000000L / toks)
    }
  }
}
