package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-15 second-session operators (graph_hits / ts_bollinger /
  * dq_freshness / event_cohort_ltv): independent local replays in
  * BigInt/Double + non-vacuity pins.
  */
class Round15bOpsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** The graph family's edge derivation, recomputed independently. */
  private def canonEdges(d: String): Set[(Long, Long)] = {
    val li = graft.sources.Tables.table(spark, d, "lineitem")
      .filter(expr("l_orderkey % 8 = 0"))
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps; if a < b) yield (a, b)
    }.toSet
  }

  test("graphHits: 3-round L1 fixed-point replays in BigInt; direction is real") {
    val canon = canonEdges(dir)
    val nodes = (canon.map(_._1) ++ canon.map(_._2)).toSeq.sorted
    val scale = BigInt(1000000000L)
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      // iterate the edge SET as a seq: mapping a Set of equal scores
      // would dedup them before the sum (the Map.keys lesson)
      val aRaw = nodes.map(n => n -> canon.iterator.filter(_._2 == n)
        .map(e => hub(e._1)).sum).toMap
      val aTot = aRaw.values.sum
      auth = aRaw.map { case (n, v) => n -> v * scale / aTot }
      val hRaw = nodes.map(n => n -> canon.iterator.filter(_._1 == n)
        .map(e => auth(e._2)).sum).toMap
      val hTot = hRaw.values.sum
      hub = hRaw.map { case (n, v) => n -> v * scale / hTot }
    }
    val expect = nodes.map(n => (n, auth(n), hub(n)))
      .sortBy { case (n, a, _) => (-a, n) }.take(20).zipWithIndex
      .map { case ((n, a, h), i) => (i + 1L, n, a.toLong, h.toLong) }.toSet
    val got = Graph.graphHits(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // the canonical orientation must make hubs and authorities
    // genuinely different scores (the undirected-degeneracy guard)
    assert(got.exists(r => r._3 != r._4),
      "hub == authority everywhere — orientation degenerate")
  }

  test("graphWalks: hash-seeded 4-step walks replay; every hop is a real edge") {
    val P = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % P)
    val sym = canonEdges(dir).flatMap(e => Seq(e, (e._2, e._1)))
    val adj = sym.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).toSeq.sorted
    }
    val expect = adj.keySet.toSeq.sorted.map { start =>
      var cur = start
      val hops = (1 to 4).map { k =>
        val ns = adj(cur)
        val h = polyHash(s"$start|$k|$cur")
        cur = ns((((h % ns.length) + ns.length) % ns.length).toInt)
        cur
      }
      (start, hops(0), hops(1), hops(2), hops(3))
    }.toSet
    val got = Graph.graphWalks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    // hop validity: every consecutive pair is an edge of the graph
    for ((s0, s1, s2, s3, s4) <- got;
         (a, b) <- Seq((s0, s1), (s1, s2), (s2, s3), (s3, s4)))
      assert(sym((a, b)), s"walk hop ($a,$b) is not an edge")
    // walks diverge (the hash actually selects, not a constant pick)
    assert(got.map(_._5).size > 1)
  }

  test("tsBollinger: trailing-window moments + IEEE band release replay") {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("d"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = daily.groupBy(_._1).flatMap { case (t, rs) =>
      val srt = rs.sortBy(_._2)
      srt.indices.map { i =>
        val w = srt.slice(math.max(0, i - 6), i + 1)
        val n = w.length.toLong
        val s = w.map(x => BigInt(x._3)).sum
        val sq = w.map(x => BigInt(x._3) * x._3).sum
        val mean = r6(s.toDouble / n)
        val sd = r6(math.sqrt((sq * n - s * s).toDouble) / n)
        val up = r6(mean + 2 * sd); val lo = r6(mean - 2 * sd)
        val breach =
          if (srt(i)._3 > up) 1L else if (srt(i)._3 < lo) -1L else 0L
        (t, srt(i)._2, srt(i)._3, n, mean, sd, up, lo, breach)
      }
    }.toSet
    val got = TimeSeries.tsBollinger(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getLong(8))).toSet
    assert(got == expect)
    assert(got.exists(_._9 != 0L), "no band breach anywhere (vacuous flag)")
    assert(got.exists(_._9 == 0L), "every day breaches (degenerate bands)")
  }

  test("tsHoltWinters: triple-smoothing integer recurrence replays; season is live") {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("d"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def div2(x: Long): Long = x / 2 // both engines truncate toward zero
    val expect = daily.groupBy(_._1).map { case (t, rs) =>
      val srt = rs.sortBy(_._2)
      var l = srt.head._3; var b = 0L
      val s = Array.fill(7)(0L)
      for ((_, d, x) <- srt.tail) {
        val dow = (d % 7).toInt
        val lN = div2(x - s(dow) + l + b)
        val bN = div2(lN - l + b)
        s(dow) = div2(x - lN + s(dow))
        l = lN; b = bN
      }
      val last = srt.last._2
      (t, srt.length.toLong, last, l, b, s.toSeq,
        l + b + s(((last + 1) % 7).toInt))
    }.toSet
    val got = TimeSeries.tsHoltWinters(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        (5 to 11).map(r.getLong), r.getLong(12))
    }.toSet
    assert(got == expect)
    // the seasonal state must be genuinely live (not all zeros)
    assert(got.forall(_._6.exists(_ != 0L)), "seasonal slots never engaged")
  }

  test("dqUniqueness: per-table PK audit replays; lineitem key is a true composite distinct") {
    val expect = Seq(
      ("customer", "customer", "c_custkey"),
      ("documents", "documents", "doc_id"),
      ("embeddings", "embeddings", "vec_id"),
      ("orders", "orders", "o_orderkey"),
      ("part", "part", "p_partkey"),
      ("supplier", "supplier", "s_suppkey")).map { case (n, t2, k) =>
      val rows = spark.read.parquet(s"$dir/$t2.parquet")
        .selectExpr(s"CAST($k AS BIGINT)").collect().map(_.getLong(0))
      (n, rows.length.toLong, rows.distinct.length.toLong)
    } ++ {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .selectExpr("l_orderkey", "CAST(l_linenumber AS BIGINT)").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // ADVICE r15 #1: the audit is a TRUE multi-column distinct now —
      // the replay counts distinct PAIRS, no packing arithmetic at all
      Seq(("lineitem", li.length.toLong, li.distinct.length.toLong))
    } ++ {
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("event_id")).collect().map(_.getLong(0))
      Seq(("events", ev.length.toLong, ev.distinct.length.toLong))
    }
    val expSet = expect.map { case (n, r, k) =>
      (n, r, k, (r - k) * 1000000L / r)
    }.toSet
    val got = Relational.dqUniqueness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expSet)
    assert(got.size == 8)
    // both verdict arms are LIVE: every dimension key is clean, and
    // lineitem's nominal (orderkey, linenumber) key is genuinely
    // violated by this generator (the same collision quirk that broke
    // window tiebreaks at sf1 in round 15) — the audit DETECTS it
    // rather than assuming the textbook schema
    for ((n, _, _, ppm) <- got if n != "lineitem")
      assert(ppm == 0L, s"$n unexpectedly dirty")
    assert(got.find(_._1 == "lineitem").get._4 > 0L,
      "lineitem's known key violation went undetected")
  }

  test("dqFreshness: staleness + hour coverage replay; coverage is partial") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), col("ts_ns")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val hours = ev.map(e => e._2 / 3600000000000L)
    val corpusLast = ev.map(_._2 / 1000000000L).max
    val corpusHours = hours.max - hours.min + 1
    val expect = ev.groupBy(_._1).map { case (t, rs) =>
      val ss = rs.map(_._2 / 1000000000L)
      val hc = rs.map(_._2 / 3600000000000L).distinct.length.toLong
      (t, rs.length.toLong, ss.min, ss.max, corpusLast - ss.max,
        hc, hc * 1000000L / corpusHours)
    }.toSet
    val got = Relational.dqFreshness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect)
    assert(got.forall(_._5 >= 0L))
    assert(got.exists(_._7 < 1000000L),
      "every stream covers every hour — coverage arm vacuous at sf0.001")
  }

  test("intervalAllen: ordered-pair relation census replays; grid is total") {
    val spans = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("s"),
        (expr("ts_ns div 1000") +
          floor(col("value") * 60000000L).cast("long")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for {
      (_, us) <- spans.groupBy(_._1)
      a <- us; b <- us
      if Ordering[(Long, Long, Long)].lt((a._3, a._4, a._2), (b._3, b._4, b._2))
    } {
      val rel =
        if (a._4 < b._3) "precedes"
        else if (a._4 == b._3) "meets"
        else if (a._3 == b._3 && a._4 == b._4) "equals"
        else if (a._3 == b._3 && a._4 < b._4) "starts"
        else if (a._3 < b._3 && a._4 == b._4) "finished_by"
        else if (a._3 < b._3 && b._4 < a._4) "contains"
        else "overlaps"
      counts(rel) += 1L
    }
    val rels = Seq("contains", "equals", "finished_by", "meets",
      "overlaps", "precedes", "starts")
    val expect = rels.map(r => (r, counts(r)))
    val got = TimeSeries.intervalAllen(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(got.length == 7, "relation grid must be total")
    for (r <- Seq("precedes", "overlaps", "contains"))
      assert(counts(r) > 0L, s"$r arm vacuous at sf0.001")
  }

  test("privacyDpQuantile: clamped base-2 exponential mechanism replays in BigInt") {
    val P = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % P)
    val B = 4096; val width = 16384L; val clamp = 50
    val pcs = graft.sources.Tables.table(spark, dir, "orders")
      .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(_.getLong(0))
    val nB = Array.fill(B)(0L)
    pcs.foreach(pc => nB(math.min(pc / width, B - 1L).toInt) += 1)
    val n = pcs.length.toLong
    val cums = nB.scanLeft(0L)(_ + _).tail
    val u = cums.map(c => -math.abs(c - n / 2))
    val uMax = u.max
    val w = u.map(x => if (x >= uMax - clamp) 1L << (x - uMax + clamp) else 0L)
    val wTot = w.sum
    val draw = ((polyHash(s"dpq|$n") % wTot) + wTot) % wTot
    val cumw = w.scanLeft(0L)(_ + _).tail
    val picked = cumw.indexWhere(_ > draw).toLong
    val trueMed = u.indexWhere(_ == uMax).toLong
    val r = Privacy.privacyDpQuantile(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n, n / 2, trueMed, picked)))
    assert((r.getLong(4), r.getLong(5)) ==
      ((picked * width, (picked + 1) * width - 1)))
    assert((r.getLong(6), r.getLong(7)) == ((wTot, draw)))
    // the mechanism arm must be real in-gate: weight mass off the
    // argmax bucket, so the draw genuinely selects (the dp_topk
    // both-arms discipline)
    assert(w.count(_ > 0L) >= 2, "weight support degenerate to argmax")
  }

  test("wavInfo: LIST(INFO) tags round-trip; format walk unaffected; hostile inputs None") {
    val tagged = Multimodal.wavBytes(8000, 2, 55,
      info = Seq("INAM" -> "a song", "ISFT" -> "graft", "ICMT" -> "odd"))
    assert(Multimodal.wavInfo(tagged).contains(
      Seq("INAM" -> "a song", "ISFT" -> "graft", "ICMT" -> "odd")))
    // the sample walker must still see fmt/data THROUGH the LIST chunk
    assert(Multimodal.AudioHeaderDecoder.wavMeta(tagged).contains(
      Multimodal.AudioMeta(8000, 2, 16, 55L)))
    // an independent reader decodes the tagged container
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(tagged))
    assert(ais.getFormat.getSampleRate == 8000f &&
      ais.getFormat.getChannels == 2 && ais.getFrameLength == 55L)
    // untagged wavs report empty tag lists, not None
    assert(Multimodal.wavInfo(Multimodal.wavBytes(8000, 1, 3)).contains(Nil))
    assert(Multimodal.wavInfo("not riff".getBytes).isEmpty)
    // truncated tag size inside INFO -> None, never a garble
    val bad = tagged.clone()
    val listAt = tagged.indexOfSlice("LIST".getBytes)
    bad(listAt + 16) = 0x7f.toByte // inflate first tag's size field
    assert(Multimodal.wavInfo(bad).isEmpty)
  }

  test("mmAudioMeta: tagged-WAV walk equals the attribute closed form") {
    val rows = Multimodal.mmAudioMeta(spark, dir).collect()
    assert(rows.nonEmpty)
    val nChars = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val id = r.getLong(0)
      assert(id % 3 == 1)
      assert(r.getLong(1) == 8000 + (id % 4) * 4000, s"rate $id")
      assert(r.getLong(2) == 1 + id % 2, s"channels $id")
      assert(r.getLong(3) == nChars(id), s"samples $id")
      assert(r.getLong(4) == 2L && r.getString(5) == s"track-$id")
    }
  }

  test("textLangidEval: census replays from the classifier's own rows; both arms live") {
    val preds = TextAnalysis.textLangid(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val cells = preds.groupBy(identity).map { case ((l, p), rs) =>
      (l, p, rs.length.toLong)
    }
    val perLang = preds.groupBy(_._1).map { case (l, rs) => l -> rs.length.toLong }
    val expect = cells.map { case (l, p, n) =>
      (l, p, n, l == p, n * 1000000L / perLang(l))
    }.toSet
    val got = TextAnalysis.textLangidEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4))).toSet
    assert(got == expect)
    // both correctness arms occur (en is right, the collapsed rest wrong)
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  test("embedNormAudit: fixed-point norm distribution replays in BigInt") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("CAST(label AS BIGINT)", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val scale = 1048576L
    val n2 = rows.map { case (l, v) =>
      l -> v.map(x => { val q = math.floor(x.toDouble * scale).toLong; BigInt(q) * q }).sum
    }
    val expect = n2.groupBy(_._1).map { case (l, rs) =>
      val vs = rs.map(_._2)
      (l, vs.length.toLong, vs.min.toLong, vs.max.toLong,
        (vs.sum / vs.length).toLong)
    }.toSet
    val got = Similarity.embedNormAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.forall(r => r._3 <= r._5 && r._5 <= r._4))
  }

  test("tsTheilSen: integer pairwise-slope median replays; both slope signs occur") {
    val daily = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("d"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (t, rs) =>
      val srt = rs.sortBy(_._2)
      val slopes = for {
        i <- srt.indices; j <- (i + 1) until srt.length
      } yield {
        val q = BigInt(srt(j)._3 - srt(i)._3) * 1000000 / (srt(j)._2 - srt(i)._2)
        (q.toLong, srt(i)._2, srt(j)._2)
      }
      val ord = slopes.sortBy(identity)
      val med = ord(((ord.length + 1) / 2 - 1).toInt)
      (t, ord.length.toLong, med._1)
    }.toSet
    val got = TimeSeries.tsTheilSen(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // per-pair slopes carry both signs somewhere (the median is a
    // genuine robust pick, not a constant-sign artifact)
    val anyPos = daily.groupBy(_._1).values.exists { rs =>
      val s = rs.sortBy(_._2); s.zip(s.tail).exists(p => p._2._3 > p._1._3)
    }
    val anyNeg = daily.groupBy(_._1).values.exists { rs =>
      val s = rs.sortBy(_._2); s.zip(s.tail).exists(p => p._2._3 < p._1._3)
    }
    assert(anyPos && anyNeg)
  }

  test("privacyGeneralize: minimal-level ladder replays; residual is honest") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val K = 5L
    val g0 = d.groupBy(x => (x._1, x._2, x._3 / 256)).map { case (k, v) => k -> v.length.toLong }
    val g1 = d.groupBy(x => (x._1, x._2, x._3 / 1024)).map { case (k, v) => k -> v.length.toLong }
    val g2 = d.groupBy(x => (x._1, x._2)).map { case (k, v) => k -> v.length.toLong }
    val levels = d.map { case (l, s, nc) =>
      val c0 = g0((l, s, nc / 256)); val c1 = g1((l, s, nc / 1024)); val c2 = g2((l, s))
      if (c0 >= K) (0L, c0) else if (c1 >= K) (1L, c1) else (2L, c2)
    }
    val expect = levels.groupBy(_._1).map { case (lv, rs) =>
      (lv, rs.length.toLong, rs.map(_._2).min, rs.map(_._2).max,
        rs.count(_._2 < K).toLong)
    }.toSet
    val got = graft.ext.Privacy.privacyGeneralize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
    // the ladder genuinely repairs: level-1/2 docs exist, levels 0-1
    // never carry residual, and the level-2 residual is only there
    // when even full length suppression cannot reach k
    assert(got.exists(_._1 > 0L), "no doc ever needed generalization")
    for ((lv, _, _, _, res) <- got if lv < 2L) assert(res == 0L)
  }

  test("sampleNeyman: exact-moment weights + largest-remainder allocation replay") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val m = d.groupBy(_._1).map { case (s, rs) =>
      val xs = rs.map(x => BigInt(x._2))
      val num = BigInt(xs.length) * xs.map(x => x * x).sum - xs.sum * xs.sum
      (s, rs.length.toLong,
        math.round(math.sqrt(num.toDouble) * 1e6))
    }.toSeq
    val wTot = m.map(_._3).sum
    val B = 1000L
    val withFloor = m.map { case (s, n, w) =>
      (s, n, w, B * w / wTot, (B * w) % wTot)
    }
    val short = B - withFloor.map(_._4).sum
    val topped = withFloor.sortBy(t => (-t._5, t._1)).zipWithIndex.map {
      case ((s, n, w, f, _), i) => (s, n, w, f + (if (i < short) 1L else 0L))
    }.toSet
    val got = PipelineOps.sampleNeyman(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == topped)
    assert(got.toSeq.map(_._4).sum == B, "allocations must sum to the budget")
    assert(got.map(_._4).size > 1, "allocation must discriminate strata")
  }

  test("streamKmvDistinct: sketch state replays; estimator branch fires at sf0.1") {
    def replay(d: String): Map[Long, (Long, Long)] = {
      val ev = graft.sources.Tables.events(spark, d)
        .select(expr("ts_ns div 86400000000000").as("day"), col("user_id"))
        .collect().map(r => (r.getLong(0) * 86400L, r.getLong(1)))
      ev.groupBy(_._1).map { case (day, rs) =>
        // unsigned order via sign-flip; (K-1)*2^64 / kth floor — the
        // eventStickinessKmv replay pattern, K = 256
        val hs = rs.map(_._2).distinct
          .map(u => graft.functions.KmvSketch.hash(u.toString))
          .map(_ ^ Long.MinValue).sorted
        val est =
          if (hs.length < 256) hs.length.toLong
          else {
            val kthU = BigInt(hs(255)) + (BigInt(1) << 63)
            ((BigInt(255) << 64) / kthU).toLong
          }
        day -> (rs.length.toLong, est)
      }
    }
    val exp1 = replay(dir)
    val got1 = graft.streaming.EventStreams.streamKmvDistinct(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got1 == exp1)
    // the bottom-k ESTIMATOR branch needs > K daily actives — sf0.001's
    // 150-user population never reaches K = 256, sf0.1's does; run the
    // streaming query there so the estimator is exercised under state
    val dBig = "/root/testdata/sf0.1"
    val expB = replay(dBig)
    val gotB = graft.streaming.EventStreams.streamKmvDistinct(spark, dBig)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotB == expB)
    assert(expB.values.exists(_._2 > 256),
      "estimator branch never fired at sf0.1 — K too large for the corpus")
  }

  test("mmImagePhash: aHash over decoded pixels equals the closed-form replay") {
    val rows = Multimodal.mmImagePhash(spark, dir).collect()
    assert(rows.nonEmpty)
    val nChars = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val id = r.getLong(0)
      val w = (1 + nChars(id) % 32).toInt; val h = (1 + id % 24).toInt
      val cellN = Array.fill(64)(0L); val cellS = Array.fill(64)(0L)
      var tot = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = (id * 31 + 7L * x + 13L * y) % 256
        val c = (y * 8 / h) * 8 + (x * 8 / w)
        cellN(c) += 1; cellS(c) += v; tot += v
      }
      val n = (w * h).toLong
      var hi = 0L; var lo = 0L
      for (c <- 0 until 64; if cellS(c) * n > tot * cellN(c))
        if (c < 32) hi |= 1L << c else lo |= 1L << (c - 32)
      assert(r.getLong(1) == w && r.getLong(2) == h)
      assert(r.getLong(3) == cellN.count(_ > 0).toLong, s"filled $id")
      assert(r.getLong(4) == hi && r.getLong(5) == lo, s"hash $id")
    }
    // hashes discriminate (not a constant fingerprint)
    assert(rows.map(r => (r.getLong(4), r.getLong(5))).distinct.length > 1)
    // small widths leave empty cells — the documented bit-0 arm is real
    assert(rows.exists(_.getLong(3) < 64L) && rows.exists(_.getLong(3) == 64L))
  }

  test("mmVideoMeta: box-metadata walk equals the attribute closed form, no pixel decode") {
    val rows = Multimodal.mmVideoMeta(spark, dir).collect()
    assert(rows.nonEmpty)
    val nChars = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val id = r.getLong(0)
      assert(id % 3 == 2)
      assert(r.getString(1) == "jpeg" && r.getLong(2) == 600L)
      assert(r.getLong(3) == (1 + nChars(id) % 4) * 8, s"width $id")
      assert(r.getLong(4) == (1 + id % 3) * 8, s"height $id")
      val nf = 1 + id % 5
      assert(r.getLong(5) == nf)
      val ticks = (0L until nf).map(f => 24 + (id + f) % 2)
      assert(r.getLong(6) == ticks.sum, s"duration $id")
      assert(r.getLong(7) == ticks.min && r.getLong(8) == ticks.max)
    }
    // both tick values occur somewhere (the 24/25 cadence is real)
    assert(rows.exists(_.getLong(7) == 24L) && rows.exists(_.getLong(8) == 25L))
  }

  test("eventCohortLtv: week cohorts, non-negative ages, cumulative LTV replay") {
    val p = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts_ns div 604800000000000").as("w"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = p.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val sized = cohort.groupBy(_._2).map { case (w, us) => w -> us.size.toLong }
    val cells = p.groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .map { case ((cw, age), rs) =>
        (cw, age, rs.map(_._1).distinct.size.toLong,
          rs.map(e => BigInt(e._3)).sum)
      }.toSeq.sortBy(t => (t._1, t._2))
    val expect = cells.groupBy(_._1).flatMap { case (cw, rs) =>
      val srt = rs.sortBy(_._2)
      srt.indices.map { i =>
        val cum = srt.take(i + 1).map(_._4).sum
        (cw, srt(i)._2, sized(cw), srt(i)._3, srt(i)._4.toLong,
          cum.toLong, (cum / sized(cw)).toLong)
      }
    }.toSet
    val got = Relational.eventCohortLtv(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect)
    assert(got.forall(_._2 >= 0L), "negative cohort age")
    assert(got.map(_._1).size >= 2, "need at least two cohorts")
    assert(got.exists(_._2 > 0L), "no cohort survives past age 0")
  }
}
