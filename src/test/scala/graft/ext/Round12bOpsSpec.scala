package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-12 second batch: l-diversity, syllable readability, CUSUM
  * changepoint, containment join, k-core peeling. The oracle gate
  * carries the hash-equality check; these pin the semantics on
  * crafted corpora and independent local replays.
  */
class Round12bOpsSpec extends AnyFunSuite with SparkTestBase {

  /** Crafted documents table with controllable lang AND source. */
  private def corpus(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r12b-corpus").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("privacyLdiv: homogeneous class flagged, diverse class passes, " +
    "shares are exact ppm") {
    // en bucket 0: three sources 2/1/1 -> l-diverse, top share 500000
    // fr bucket 0: one source x4   -> NOT l-diverse, top share 1000000
    val dir = corpus(Seq(
      (0L, "a b", "en", "s1"), (1L, "c d", "en", "s1"),
      (2L, "e f", "en", "s2"), (3L, "g h", "en", "s3"),
      (4L, "i j", "fr", "s1"), (5L, "k l", "fr", "s1"),
      (6L, "m n", "fr", "s1"), (7L, "o p", "fr", "s1")))
    val got = Privacy.privacyLdiv(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("en", 0L, 4L, 3L, 500000L, true),
      ("fr", 0L, 4L, 1L, 1000000L, false)))
  }

  test("privacyLdiv: class sizes reconcile with privacyKanon's classes " +
    "summed over the sensitive attribute") {
    val dir = "/root/testdata/sf0.001"
    // kanon classes are (lang, source, len_bucket); ldiv classes are
    // (lang, len_bucket) — the roll-up must conserve mass and count
    val kanon = Privacy.privacyKanon(spark, dir)
      .groupBy("lang", "len_bucket")
      .agg(sum("class_size").as("cs"), count(lit(1)).as("ns"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val ldiv = Privacy.privacyLdiv(spark, dir).collect()
    assert(ldiv.nonEmpty)
    for (r <- ldiv) {
      val key = (r.getString(0), r.getLong(1))
      assert(kanon(key) == ((r.getLong(2), r.getLong(3))))
    }
  }

  private def sylOf(w: String): Int =
    "[aeiouy]+".r.findAllIn(w).length

  test("textReadability: hand-computed syllable integers on a crafted doc") {
    // banana=3 vowel groups (poly), tree=1, sky=1 -> w=4 s=8 p=2
    val dir = corpus(Seq((0L, "banana banana tree sky", "en", "s1")))
    val got = TextAnalysis.textReadability(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val fre = 206835L - (84600L * 8 / 4) - (1015L * 4 / 1)
    assert(got.toSeq == Seq(("en", "s1", 1L, 4L, 8L, 500000L, fre)))
  }

  test("textReadability: full integer replay on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(d => (d._1, d._2)).view.mapValues { ds =>
      val ws = ds.flatMap(_._3.split(" +").filter(_.nonEmpty))
      val nd = ds.size.toLong
      val w = ws.length.toLong
      val s = ws.map(sylOf(_).toLong).sum
      val p = ws.count(sylOf(_) >= 3).toLong
      (nd, w, s, p * 1000000L / w,
        206835L - (84600L * s / w) - (1015L * w / nd))
    }.toMap
    val got = TextAnalysis.textReadability(spark, dir).collect()
    assert(got.length == want.size)
    for (r <- got) {
      val k = (r.getString(0), r.getString(1))
      assert(want(k) == ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))), s"slice $k")
    }
  }

  /** Crafted events table (ts seconds ascending, unique event ids). */
  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r12b-events").toString
    rows.toDF("event_id", "sec", "event_type", "value")
      .selectExpr("event_id", "timestamp_seconds(sec) AS ts",
        "event_id % 7 AS user_id", "event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("tsChangepoint: a planted level shift is located exactly") {
    // 20 events at 1.00 then 20 at 9.00: mean 5.00, |CUSUM| peaks at
    // the shift -> s_20 = n*cum_20 - 20*total = 40*2000 - 20*20000
    val rows = (1 to 40).map { i =>
      (i.toLong, i.toLong * 60, "x", if (i <= 20) 1.00 else 9.00)
    }
    val dir = eventsDir(rows)
    val got = TimeSeries.tsChangepoint(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "x")
    assert(r.getLong(1) == 40L) // n
    assert(r.getLong(2) == 20000L) // total cents
    assert(r.getLong(3) == 20L) // cp position = the shift point
    assert(r.getLong(4) == 20L * 60 * 1000000000L) // cp ts_ns
    assert(r.getLong(5) == 320000L) // |40*2000 - 20*20000|
  }

  test("tsChangepoint: integer replay on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), col("ts_ns"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).view.mapValues { xs =>
      val sorted = xs.sortBy(x => (x._2, x._3))
      val n = sorted.length.toLong
      val total = sorted.map(_._4).sum
      var cum = 0L
      val scored = sorted.zipWithIndex.map { case (x, i0) =>
        cum += x._4
        val i = i0 + 1L
        (math.abs(n * cum - i * total), x._2, x._3, i)
      }
      val best = scored.minBy(s => (-s._1, s._2, s._3))
      (n, total, best._4, best._2, best._1)
    }.toMap
    val got = TimeSeries.tsChangepoint(spark, dir).collect()
    assert(got.length == want.size)
    for (r <- got)
      assert(want(r.getString(0)) == ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))), r.getString(0))
  }

  test("dedupContainment: a prefix excerpt is found directionally") {
    val a = (0 until 20).map(i => s"w$i").mkString(" ")
    val b = a + " " + (0 until 30).map(i => s"x$i").mkString(" ")
    val c = (0 until 20).map(i => s"y$i").mkString(" ")
    val dir = corpus(Seq(
      (0L, a, "en", "s1"), (1L, b, "en", "s1"), (2L, c, "en", "s1")))
    val got = Dedup.dedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // A's 18 shingles all sit inside B (A is a verbatim prefix);
    // B is NOT 80% inside A; C matches nothing
    assert(got.toSeq == Seq((0L, 1L, 1.0)))
  }

  test("dedupContainment: prefix-filtered result == brute force on the " +
    "real corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Dedup.shingleSet(r.getString(1)).toSet))
    val want = (for {
      (ia, sa) <- docs
      (ib, sb) <- docs
      if ia != ib
      inter = (sa & sb).size
      c = inter.toDouble / sa.size
      if c >= 0.8
    } yield (ia, ib, c)).sortBy(p => (p._1, p._2))
    val got = Dedup.dedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == want.toSeq)
  }

  /** Crafted events with explicit user ids. */
  private def eventsDirU(
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r12b-eventsu").toString
    rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .selectExpr("event_id", "timestamp_seconds(sec) AS ts", "user_id",
        "event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("tsHolt: integer replay on the real corpus and a ramp trends up") {
    // planted linear ramp: value t dollars on day t -> positive trend,
    // forecast above level
    val ramp = (1 to 30).map(i =>
      (i.toLong, i.toLong * 86400 + 60, "x", i.toDouble))
    val r = TimeSeries.tsHolt(spark, eventsDir(ramp)).collect().head
    assert(r.getLong(4) > 0, "trend must be positive on a ramp")
    assert(r.getLong(5) == r.getLong(3) + 7 * r.getLong(4))
    // full integer replay of the fold on the real corpus
    val dir = "/root/testdata/sf0.001"
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("d"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("c"))
    val byType = TimeSeries.tsHolt(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val pts = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("d"), col("c")))).as("p"))
      .collect()
    assert(pts.nonEmpty && byType.size == pts.length)
    for (row <- pts) {
      val xs = row.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1)))
      var l = xs.head._2; var b = 0L
      for ((_, x) <- xs.tail) {
        val l2 = (x + l + b) / 2
        b = (l2 - l + b) / 2
        l = l2
      }
      assert(byType(row.getString(0)) ==
        ((xs.length.toLong, xs.last._1, l, b, l + 7 * b)), row.getString(0))
    }
  }

  test("tsOhlc: open/close pinned by (ts, event_id), extremes exact") {
    // one day, out-of-order values; two events share the last second
    // so the event_id pins which is 'close'
    val dir = eventsDir(Seq(
      (1L, 100L, "x", 5.00), (2L, 50L, "x", 9.00),
      (3L, 200L, "x", 1.00), (4L, 200L, "x", 7.00)))
    val r = TimeSeries.tsOhlc(spark, dir).collect()
    assert(r.length == 1)
    assert((r.head.getLong(2), r.head.getLong(3), r.head.getLong(4),
      r.head.getLong(5), r.head.getLong(6)) ==
      ((4L, 900L, 900L, 100L, 700L)))
  }

  test("intervalSweep: planted overlaps, touching spans, and the " +
    "pair-count identity on the real corpus") {
    // day 0: A spans [60,120], B [90,180] (overlaps A), C [300,360]
    // (disjoint), D is a single event AT A's last second (touching ->
    // closed semantics counts it)
    val dir = eventsDirU(Seq(
      (1L, 60L, 1L, "x", 1.0), (2L, 120L, 1L, "x", 1.0),
      (3L, 90L, 2L, "x", 1.0), (4L, 180L, 2L, "x", 1.0),
      (5L, 300L, 3L, "x", 1.0), (6L, 360L, 3L, "x", 1.0),
      (7L, 120L, 4L, "x", 1.0)))
    val r = TimeSeries.intervalSweep(spark, dir).collect()
    assert(r.length == 1)
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getLong(3)) ==
      ((4L, 3L, 3L)),
      "4 intervals, peak A+B+D at t=120, pairs (A,B) (A,D) (B,D)")
    // real corpus: n_overlap_pairs must equal the brute-force count
    val real = "/root/testdata/sf0.001"
    val iv = graft.sources.Tables.events(spark, real)
      .groupBy(col("user_id"), expr("ts_ns div 86400000000000").as("d"))
      .agg(min(col("ts_ns")).as("s"), (max(col("ts_ns")) + 1).as("e"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = iv.groupBy(_._1).view.mapValues { xs =>
      val a = xs.toIndexedSeq
      var p = 0L
      for (i <- a.indices; j <- 0 until i)
        if (a(i)._2 < a(j)._3 && a(j)._2 < a(i)._3) p += 1
      p
    }.toMap
    val got = TimeSeries.intervalSweep(spark, real).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.nonEmpty && got == want)
  }

  test("tsSeasonal: indexes average to ~1000 and replay as integers") {
    val dir = "/root/testdata/sf0.001"
    val rows = TimeSeries.tsSeasonal(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    for ((ty, grp) <- rows.groupBy(_._1)) {
      val totalDays = grp.map(_._3).sum
      val totalCents = grp.map(_._4).sum
      for ((_, dow, nd, c, idx) <- grp) {
        assert(idx == c * totalDays * 1000L / (nd * totalCents),
          s"$ty dow $dow")
      }
      // the days-weighted mean of the index is 1000 up to floor loss
      val wmean = grp.map(g => g._3 * g._5).sum / totalDays
      assert(math.abs(wmean - 1000L) <= 7, s"$ty weighted mean $wmean")
    }
  }

  test("qualityGopher: rule columns replay as integers and both " +
    "outcomes occur on the real corpus") {
    // crafted: doc0 passes all rules; doc1 too few words; doc2 has
    // words but no stopwords
    val many = (0 until 30).map(i => s"word$i").mkString(" ")
    val dir = corpus(Seq(
      (0L, s"the a $many", "en", "s1"),
      (1L, "the a tiny", "en", "s1"),
      (2L, many, "en", "s1")))
    val got = TextAnalysis.qualityGopher(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    assert(got(0L)._5 && !got(1L)._5 && !got(2L)._5)
    assert(got(1L)._1 == 3L && got(1L)._3 == 2L)
    assert(got(2L)._3 == 0L)
    // integer replay of every column on the real corpus
    val real = "/root/testdata/sf0.001"
    val stop = Set("the", "a", "and", "of", "to", "in", "is", "on",
      "for", "with")
    val docs = spark.read.parquet(s"$real/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val gotReal = TextAnalysis.qualityGopher(spark, real).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    var passes = 0
    for ((id, t) <- docs) {
      val ws = t.split(" +").filter(_.nonEmpty)
      val w = ws.length.toLong
      val letters = t.count(_ != ' ').toLong
      val mwl = letters * 1000L / w
      val ns = ws.count(stop).toLong
      val ap = ws.count(_.exists(_.isLetter)).toLong * 1000000L / w
      val pass = w >= 25 && w <= 100000 && mwl >= 3000 && mwl <= 10000 &&
        ns >= 2 && ap >= 800000
      assert(gotReal(id) == ((w, mwl, ns, ap, pass)), s"doc $id")
      if (pass) passes += 1
    }
    assert(passes > 0 && passes < docs.length, "both outcomes occur")
  }

  test("sampleKcenter: greedy selection replays locally and the " +
    "coverage radius is non-increasing") {
    import spark.implicits._
    // crafted 2-D geometry, 10 vectors
    val pts = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 0f)), (3L, Seq(0f, 10f)),
      (4L, Seq(10f, 10f)), (5L, Seq(1f, 1f)), (6L, Seq(5f, 5f)),
      (7L, Seq(2f, 0f)), (8L, Seq(0f, 2f)), (9L, Seq(9f, 9f)),
      (10L, Seq(5f, 0f)))
    val dir = java.nio.file.Files.createTempDirectory("r12b-emb").toString
    pts.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.sampleKcenter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent greedy replay with the same 2^20 quantization
    val S = 1048576L
    val q = pts.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * S).toLong)
    }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var centers = Vector((1L, 0L))
    while (centers.length < 8) {
      val best = q.keys.toSeq.map { id =>
        (id, centers.map(c => d2(q(id), q(c._1))).min)
      }.maxBy { case (id, d) => (d, -id) }
      centers :+= best
    }
    assert(got.toSeq == centers.zipWithIndex.map { case ((id, d), i) =>
      (i + 1L, id, d)
    })
    // real corpus: radius curve non-increasing past the seed
    val real = Similarity.sampleKcenter(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(2)).drop(1)
    assert(real.nonEmpty && real.zip(real.tail).forall(p => p._1 >= p._2))
  }

  test("sampleKcenter: a corpus with fewer distinct vectors than k " +
    "fails loudly instead of duplicating centers") {
    import spark.implicits._
    // 3 distinct vectors padded with exact duplicates: the greedy
    // exhausts distinct points before k=8 and must refuse
    val pts = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 0f)), (3L, Seq(0f, 10f)),
      (4L, Seq(0f, 0f)), (5L, Seq(10f, 0f)), (6L, Seq(0f, 10f)),
      (7L, Seq(0f, 0f)), (8L, Seq(10f, 0f)), (9L, Seq(0f, 10f)))
    val dir = java.nio.file.Files.createTempDirectory("r12b-embdup").toString
    pts.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Similarity.sampleKcenter(spark, dir).collect()
    }
    assert(e.getMessage.contains("fewer than"))
  }

  test("graphKtruss: membership and support equal an independent " +
    "local edge peel to fixpoint") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e0 = li.toSeq.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    def peel(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val nbr = (es.toSeq ++ es.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      es.iterator.map { case (a, b) =>
        (a, b) -> (nbr(a) & nbr(b)).size.toLong
      }.toMap
    }
    var cur = e0
    var stable = false
    while (!stable) {
      val next = peel(cur).filter(_._2 >= 3).keySet
      stable = next == cur
      cur = next
    }
    val want = peel(cur).filter(_._2 >= 3)
    val got = Graph.graphKtruss(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got.keySet != e0, "peeling must remove edges")
    assert(got == want)
  }

  test("streamOhlc: converged bar state == the batch ts_ohlc relation") {
    val dir = "/root/testdata/sf0.001"
    val batch = TimeSeries.tsOhlc(spark, dir).collect().map(_.toSeq)
    val stream = graft.streaming.EventStreams.streamOhlc(spark, dir)
      .collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.toSeq == batch.toSeq)
  }

  test("streamAnomaly: converged streaming state + batch finisher == " +
    "the batch twin") {
    val dir = "/root/testdata/sf0.001"
    val batch = Relational.eventAnomaly(spark, dir).collect().map(_.toSeq)
    val stream = graft.streaming.EventStreams.streamAnomaly(spark, dir)
      .collect().map(_.toSeq)
    assert(stream.nonEmpty && stream.toSeq == batch.toSeq)
  }

  test("privacyTclose: exact TVD on a crafted skew and the closed-form " +
    "absent-source term") {
    // global source distribution: s1 x6, s2 x2 (N=8).
    // en class (n=4): all s1 -> p_class = (1, 0), p_glob = (.75, .25),
    //   TVD = 1/2 (|1-.75| + |0-.25|) = 0.25 -> 250000 ppm (s2 ABSENT
    //   from the class: exercises the closed-form term)
    // fr class (n=4): 2 s1 + 2 s2 -> TVD = 1/2 (.25 + .25) = .25
    val dir = corpus(Seq(
      (0L, "a", "en", "s1"), (1L, "b", "en", "s1"),
      (2L, "c", "en", "s1"), (3L, "d", "en", "s1"),
      (4L, "e", "fr", "s1"), (5L, "f", "fr", "s1"),
      (6L, "g", "fr", "s2"), (7L, "h", "fr", "s2")))
    val got = Privacy.privacyTclose(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("en", 0L, 4L, 250000L, true),
      ("fr", 0L, 4L, 250000L, true)))
    // real corpus: integer replay including absent sources
    val real = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$real/documents.parquet")
      .selectExpr("lang", "n_chars div 256 AS lb", "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val g = docs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nn = docs.length.toLong
    val want = docs.groupBy(d => (d._1, d._2)).view.mapValues { ds =>
      val n = ds.size.toLong
      val cs = ds.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      // .iterator, not .keys.map: the set-backed keys view would
      // DEDUPLICATE equal deviation values before the sum
      val dev = g.keysIterator.map { s =>
        math.abs(cs.getOrElse(s, 0L) * nn - g(s) * n)
      }.sum
      (n, dev * 1000000L / (2 * n * nn))
    }.toMap
    val gotReal = Privacy.privacyTclose(spark, real).collect()
    for (r <- gotReal) {
      val k = (r.getString(0), r.getLong(1))
      assert(want(k) == ((r.getLong(2), r.getLong(3))), s"class $k")
      assert(r.getBoolean(4) == (r.getLong(3) <= 300000L))
    }
    assert(gotReal.map(_.getBoolean(4)).distinct.length == 2,
      "both outcomes occur")
  }

  test("simFiltered: top-k is exact within the label filter and never " +
    "crosses labels") {
    val dir = "/root/testdata/sf0.001"
    val rows = Similarity.simFiltered(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[collection.Seq[Float]]("embedding"), r.getAs[Int]("label").toLong))
      .toMap
    def cos(a: collection.Seq[Float], b: collection.Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((qId, grp) <- rows.groupBy(_._1)) {
      val (qe, ql) = emb(qId)
      assert(grp.forall(_._2 == ql), "results stay inside the label")
      // brute-force filtered top-k replay
      val want = emb.toSeq
        .filter { case (id, (_, l)) => id != qId && l == ql }
        .map { case (id, (e, _)) => (id, cos(qe, e)) }
        .sortBy { case (id, s) => (-s, id) }.take(10)
      assert(grp.sortBy(_._3).map(g => (g._4, g._5)).toSeq == want)
    }
  }

  test("tsMad: a planted spike is flagged, a flat series is not, and " +
    "zero-MAD days never self-flag") {
    // type x: 9 flat days + one 100x spike -> MAD 0, only the spike
    // has dev > 0; type y: strictly flat -> no rows
    val rows = (1 to 9).map(i => (i.toLong, i.toLong * 86400 + 9, "x", 1.00)) ++
      Seq((10L, 10L * 86400 + 9, "x", 100.00)) ++
      (11 to 20).map(i => (i.toLong, (i - 10).toLong * 86400 + 99, "y", 2.00))
    val got = TimeSeries.tsMad(spark, eventsDir(rows)).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "x" && got.head.getLong(1) == 10L)
    assert((got.head.getLong(2), got.head.getLong(3), got.head.getLong(4),
      got.head.getLong(5)) == ((10000L, 100L, 0L, 9900L)))
  }

  test("tsMad + tsAcf: integer replays on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("d"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMed(xs: Seq[(Long, Long)]): Long = // (value, day)
      xs.sorted.apply((xs.length + 1) / 2 - 1)._1
    // MAD replay
    val wantMad = daily.groupBy(_._1).view.mapValues { ds =>
      val med = lowerMed(ds.map(d => (d._3, d._2)).toSeq)
      val mad = lowerMed(ds.map(d => (math.abs(d._3 - med), d._2)).toSeq)
      ds.filter(d => math.abs(d._3 - med) > 3 * mad)
        .map(d => (d._2, d._3, med, mad, math.abs(d._3 - med)))
        .sortBy(_._1).toSeq
    }.toMap
    val gotMad = TimeSeries.tsMad(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(gotMad == wantMad.filter(_._2.nonEmpty))
    // ACF replay over floor-dollars
    val wantAcf = daily.groupBy(_._1).view.mapValues { ds =>
      val xs = ds.sortBy(_._2).map(_._3 / 100)
      val n = xs.length.toLong
      val s = xs.sum
      val dev = xs.map(x => x - s / n)
      val den = dev.map(d => d * d).sum
      (1 to 7).map { k =>
        val num = dev.dropRight(k).zip(dev.drop(k)).map(p => p._1 * p._2).sum
        (k.toLong, (n - k).toLong, num * 1000000L / den)
      }
    }.toMap
    val gotAcf = TimeSeries.tsAcf(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap
    assert(gotAcf.nonEmpty)
    for ((ty, w) <- wantAcf) assert(gotAcf(ty) == w, ty)
  }

  test("dqBenford: crafted digits count exactly and the expected " +
    "shares are the pinned Benford constants") {
    // values 1.00 2.00 ... 9.00 -> cents 100..900, first digits 1..9
    // exactly once each for type x
    val rows = (1 to 9).map(i => (i.toLong, i.toLong * 60, "x", i * 1.00))
    val got = Relational.dqBenford(spark, eventsDir(rows)).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    assert(got.map(_._1).toSeq == (1L to 9L))
    assert(got.forall(_._2 == 1L))
    assert(got.forall(_._3 == 111111L)) // 1/9 in ppm, floored
    assert(got.map(_._4).toSeq == benford)
    assert(math.abs(benford.sum - 1000000L) <= 1,
      "the pinned constants are a distribution")
  }

  test("eventAbtest: a planted cohort imbalance is significant, a " +
    "balanced one is not") {
    // 40 users (0..39). Type 'buy': even users 0..38 all emit it (20
    // converters) vs ONE odd user -> significant. Type 'view': both
    // cohorts convert identically -> not significant.
    val buys = (0 until 40 by 2).zipWithIndex.map { case (u, i) =>
      (1000L + i, 600L + i * 60L, u.toLong, "buy", 1.0)
    } :+ ((2000L, 500L, 1L, "buy", 1.0))
    val views = (0 until 40).zipWithIndex.map { case (u, i) =>
      (3000L + i, 9000L + i * 60L, u.toLong, "view", 1.0)
    }
    val dir = eventsDirU(buys ++ views)
    val got = Relational.eventAbtest(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(7))).toMap
    assert(got("buy") == ((20L, 20L, 1L, 20L, true)))
    assert(got("view") == ((20L, 20L, 20L, 20L, false)))
    // exact-arithmetic replay of the inequality on the real corpus
    val real = "/root/testdata/sf0.001"
    for (r <- Relational.eventAbtest(spark, real).collect()) {
      val (ca, na, cb, nb) = (BigInt(r.getLong(1)), BigInt(r.getLong(2)),
        BigInt(r.getLong(3)), BigInt(r.getLong(4)))
      val lhs = (ca * nb - cb * na).pow(2) * (na + nb)
      val rhs = 4 * na * nb * (ca + cb) * (na + nb - ca - cb)
      assert(r.getBoolean(7) == (lhs > rhs), r.getString(0))
    }
  }

  test("textNovelty: crafted unique/template docs and a census identity " +
    "on the real corpus") {
    // doc0 fully unique; doc1 and doc2 share ALL their shingles
    // (identical text) -> novelty 0; doc3 half-shares doc0's tail
    val u = (0 until 12).map(i => s"u$i").mkString(" ")
    val t = (0 until 12).map(i => s"t$i").mkString(" ")
    val dir = corpus(Seq(
      (0L, u, "en", "s1"), (1L, t, "en", "s1"), (2L, t, "en", "s1")))
    val got = Dedup.textNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(0L) == ((10L, 10L, 1000000L)))
    assert(got(1L) == ((10L, 0L, 0L)) && got(2L) == ((10L, 0L, 0L)))
    // census identity: sum of novel shingles == count of df=1 keys
    val real = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$real/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Dedup.shingleSet(r.getString(1))))
    val dfm = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length).toMap
    val rows = Dedup.textNovelty(spark, real).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((id, sh) <- docs) {
      val novel = sh.count(s => dfm(s) == 1).toLong
      assert(rows(id) == ((sh.length.toLong, novel)), s"doc $id")
    }
  }

  test("graphAssortativity: exact integer Pearson replay on the real " +
    "corpus") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.toSeq.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val deg = edges.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = edges.size.toLong
    val sx = edges.iterator.map(e => deg(e._1)).sum
    val sxx = edges.iterator.map(e => deg(e._1) * deg(e._1)).sum
    val sxy = edges.iterator.map(e => deg(e._1) * deg(e._2)).sum
    val want = (n * sxy - sx * sx) * 1000000L / (n * sxx - sx * sx)
    val r = Graph.graphAssortativity(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((n, sx, want)))
  }

  test("sketchBloom: no false negatives ever, and a local bit-set " +
    "replay matches") {
    val dir = "/root/testdata/sf0.001"
    val r = TextAnalysis.sketchBloom(spark, dir).collect().head
    assert(r.getLong(4) == 1000000L, "a Bloom filter has no false negatives")
    // local replay of the whole sketch
    val P = 1000000007L
    def poly(s: String): Long = {
      var h = 0L; s.foreach(c => h = (h * 31 + c) % P); h
    }
    val fps = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect()
      .map(x => poly(x.getString(0).take(256)))
    val m = fps.length * 16L
    def pos(k: Long): Seq[Long] =
      (0 until 3).map(j => ((k * (2 * j + 3) + j * j) % P) % m)
    val bits = fps.flatMap(pos).toSet
    val probes = fps.map(f => (f * 7919 + 104729) % P).distinct
    val fpPos = probes.count(k => pos(k).forall(bits)).toLong
    assert(r.getLong(1) == m && r.getLong(2) == bits.size.toLong)
    assert(r.getLong(3) == bits.size * 1000000L / m)
    assert(r.getLong(5) == fpPos * 1000000L / probes.length)
  }

  test("sampleBalanced: every label keeps exactly the minority size, " +
    "drawn by the portable hash") {
    val dir = "/root/testdata/sf0.001"
    val rows = PipelineOps.sampleBalanced(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("CAST(label AS BIGINT) AS l", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sizes = emb.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val k = sizes.values.min
    val byLabel = rows.groupBy(_._1)
    assert(byLabel.keySet == sizes.keySet)
    for ((l, grp) <- byLabel) {
      assert(grp.length.toLong == k, s"label $l")
      // the draw = the k smallest (polyhash, vec_id) of the label
      def poly(s: String): Long = {
        var h = 0L; s.foreach(c => h = (h * 31 + c) % 1000000007L); h
      }
      val want = emb.filter(_._1 == l)
        .map(e => (poly(e._2.toString), e._2)).sorted.take(k.toInt)
        .map(_._2).toSet
      assert(grp.map(_._3).toSet == want, s"label $l draw")
    }
  }

  test("tsCrosscorr: a planted k-day lead is located at the right lag") {
    // type a: a one-day spike at day 10; type b: the same spike at
    // day 13 -> b lags a by 3 days: ccf peaks at lag +3 for (a, b)
    def series(ty: String, spikeDay: Int, idBase: Long) =
      (1 to 30).map { d =>
        (idBase + d, d.toLong * 86400 + 30, ty,
          if (d == spikeDay) 500.00 else 10.00)
      }
    val dir = eventsDir(series("a", 10, 100) ++ series("b", 13, 500))
    val got = TimeSeries.tsCrosscorr(spark, dir).collect()
    assert(got.length == 1)
    assert((got.head.getString(0), got.head.getString(1),
      got.head.getLong(2)) == (("a", "b", 3L)))
    assert(got.head.getLong(3) > 0, "co-spiking series correlate positively")
  }

  test("graphClustcoeff: triangles/wedges replay from local counts") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.toSeq.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val nbr = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tri = edges.toSeq.map { case (a, b) =>
      (nbr(a) & nbr(b)).count(_ > b).toLong
    }.sum
    val wedges = nbr.values.map(s =>
      s.size.toLong * (s.size - 1) / 2).sum
    val r = Graph.graphClustcoeff(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nbr.size.toLong, wedges, tri, 3 * tri * 1000000L / wedges)))
  }

  test("textBurstiness: a clumped term out-scores an evenly spread one") {
    // 10 docs; 'even' appears once per doc (VMR ~ sub-Poisson);
    // 'bursty' appears 10 times in ONE doc (VMR >> 1000)
    val dir = corpus((0 until 10).map { i =>
      val extra = if (i == 0) " " + Seq.fill(10)("bursty").mkString(" ")
        else ""
      (i.toLong, s"even filler$i$extra", "en", "s1")
    })
    val got = TextAnalysis.textBurstiness(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    // even: x_i = 1 x10 -> n*sxx - sx^2 = 100-100 = 0 -> vmr 0
    assert(got("even") == ((10L, 0L)))
    // bursty: one doc x=10 -> (10*100 - 100)*1000 / (9*10) = 10000
    assert(got("bursty") == ((10L, 10000L)))
  }

  test("graphKcore: membership and in-core degrees equal an independent " +
    "local peel to fixpoint") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.toSeq.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    var kept = edges.map(_._1)
    var stable = false
    while (!stable) {
      val deg = edges.toSeq
        .filter(e => kept(e._1) && kept(e._2))
        .groupBy(_._1).view.mapValues(_.size).toMap
      val next = kept.filter(n => deg.getOrElse(n, 0) >= 6)
      stable = next == kept
      kept = next
    }
    val wantDeg = edges.toSeq.filter(e => kept(e._1) && kept(e._2))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Graph.graphKcore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.keySet != edges.map(_._1),
      "peeling must remove something")
    assert(got == wantDeg)
  }
}
