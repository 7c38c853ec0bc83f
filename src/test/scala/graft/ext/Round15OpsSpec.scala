package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-15 operators: crafted pins + independent local replays. */
class Round15OpsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  // the KMV replay runs at sf0.01: the estimator (seen >= K) branch
  // needs a corpus whose daily actives exceed K = 64 (non-vacuity)
  private val dirMid = "/root/testdata/sf0.01"

  test("eventStickinessKmv: estimator branch engages; independent KmvSketch replay") {
    val K = Relational.StickinessKmvK
    val du = graft.sources.Tables.events(spark, dirMid)
      .select(expr("ts_ns div 86400000000000").as("d"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = du.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    def est(users: Set[Long]): Long = {
      // independent replay: same hash, unsigned order via sign-flip,
      // same (K-1)*2^64 / kth floor
      val hs = users.map(u => graft.functions.KmvSketch.hash(u.toString))
        .toArray.map(_ ^ Long.MinValue).sorted
      if (hs.length < K) hs.length.toLong
      else {
        val kthU = BigInt(hs(K - 1)) + (BigInt(1) << 63)
        ((BigInt(K - 1) << 64) / kthU).toLong
      }
    }
    val expect = byDay.keySet.map { d =>
      val week = (d - 6L to d).flatMap(x =>
        byDay.getOrElse(x, Set.empty[Long])).toSet
      val dauE = est(byDay(d)); val wauE = est(week)
      (d, dauE, wauE, dauE * 1000000L / wauE)
    }
    val got = Relational.eventStickinessKmv(spark, dirMid).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // non-vacuity pin: the k-th-min estimator must actually fire in
    // the gate corpus (the dedup_embedding_ann_hi lesson)
    assert(byDay.values.exists(_.size >= K),
      s"gate corpus never exceeds K=$K — the estimator branch is vacuous")
    // and it estimates: within 4x the KMV error law of the exact count
    for ((d, dauE, _, _) <- got; exact = byDay(d).size; if exact >= K)
      assert(math.abs(dauE - exact).toDouble / exact <= 4.0 / math.sqrt(K - 2.0),
        s"day $d: estimate $dauE too far from exact $exact")
  }

  test("eventStickinessKmv: per-day k-smallest runs through TopKPerKey, not a sort") {
    val plan = Relational.eventStickinessKmv(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q18LargeOrders: HAVING survivors replay locally; top-100 order pinned") {
    val qty = graft.sources.Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("decimal(18,2)"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getDecimal(1).longValueExact()).sum }
    val big = qty.filter(_._2 > 250L)
    assert(big.nonEmpty, "threshold must keep survivors at sf0.001")
    val got = Relational.q18LargeOrders(spark, dir).collect()
    assert(got.length == math.min(big.size, 100))
    for (r <- got) {
      assert(big(r.getLong(2)) == r.getLong(5), s"sum_qty of ${r.getLong(2)}")
    }
    // descending by order value, orderkey tiebreak
    val tp = got.map(r => (r.getLong(4), r.getLong(2)))
    assert(tp.sameElements(tp.sortBy(t => (-t._1, t._2))))
  }

  test("aggMoments: exact central-sum algebra replays in BigInt + IEEE release") {
    val daily = graft.sources.Tables.table(spark, dir, "orders")
      .select(col("o_orderpriority"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case ((p, d), rs) => (p, d, rs.map(_._2).sum / 1000000L) }
    val expect = daily.groupBy(_._1).map { case (p, rs) =>
      val ys = rs.map(r => BigInt(r._3)).toSeq
      val n = BigInt(ys.length)
      val s1 = ys.sum; val s2 = ys.map(y => y * y).sum
      val s3 = ys.map(y => y * y * y).sum; val s4 = ys.map(y => y * y * y * y).sum
      val a2 = n * s2 - s1 * s1
      val a3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
      val a4 = n * n * n * s4 - 4 * n * n * s1 * s3 +
        6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
      val (a2d, a3d, a4d) = (a2.toDouble, a3.toDouble, a4.toDouble)
      (p, ys.length.toLong, s1.toLong,
        a3d / math.sqrt(a2d * a2d * a2d), a4d / (a2d * a2d) - 3.0)
    }.toSet
    val got = Relational.aggMoments(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == expect)
    // kurtosis of any real distribution ≥ skew² − 2 (public bound) —
    // a sanity pin that the released pair is a coherent moment pair
    for ((_, _, _, sk, ku) <- got)
      assert(ku + 3.0 >= sk * sk + 1.0 - 1e-9, s"moment bound violated: $sk $ku")
  }

  test("asofTolerance: staleness nulls out, never falls through to older clicks") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val tolNs = 3600L * 1000000000L
    val byUser = ev.groupBy(_._1)
    val expect = ev.filter(_._2 == "purchase").map { case (u, _, ts, eid) =>
      val clicks = byUser(u).filter(e => e._2 == "click" && e._3 <= ts).map(_._3)
      val last = if (clicks.isEmpty) None else Some(clicks.max)
      val fresh = last.exists(c => ts - c <= tolNs)
      (eid, u, ts / 1000000000L,
        if (fresh) Some(last.get / 1000000000L) else None,
        if (fresh) Some((ts - last.get) / 1000000000L) else None,
        if (fresh) 1L else 0L)
    }.toSet
    val got = Relational.asofTolerance(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5))
    }.toSet
    assert(got == expect)
    assert(got.exists(_._6 == 0L) && got.exists(_._6 == 1L),
      "both fresh and stale matches must occur (non-vacuity)")
  }

  test("graphMotifs: directed triad census replays with scala sets") {
    val li = graft.sources.Tables.table(spark, dir, "lineitem")
      .filter(expr("l_orderkey % 8 = 0"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = li.groupBy(_._1).values.flatMap { rs =>
      // (linenumber, partkey) — the engine's tie pin
      val sorted = rs.sortBy(r => (r._2, r._3)).map(_._3)
      sorted.zip(sorted.drop(1)).filter(p => p._1 != p._2)
    }.toSet
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val paths = edges.toSeq.flatMap { case (a, b) =>
      out.getOrElse(b, Set.empty).filter(_ != a).map(c => (a, b, c)) }
    val nFfl = paths.count { case (a, _, c) => edges((a, c)) }
    val nCyc = paths.count { case (a, _, c) => edges((c, a)) }
    val nRecip = edges.count { case (a, b) => edges((b, a)) } / 2
    val r = Graph.graphMotifs(spark, dir).collect().head
    assert(r.getLong(0) == edges.size && r.getLong(1) == nRecip &&
      r.getLong(2) == paths.size && r.getLong(3) == nFfl &&
      r.getLong(4) == nCyc,
      s"got $r vs (${edges.size}, $nRecip, ${paths.size}, $nFfl, $nCyc)")
    assert(paths.nonEmpty, "census must be non-vacuous")
  }

  test("textRake: phrase scores replay a from-scratch RAKE implementation") {
    val stops = Set("the", "a", "and", "of", "to", "in", "is", "on", "for",
      "with", "slow", "fast", "big", "small")
    val texts = graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // candidate phrase occurrences: maximal non-stop runs, len <= 4
    val occs = texts.flatMap { case (_, t) =>
      val toks = "[a-z]+".r.findAllIn(t.toLowerCase).toVector
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      for (w <- toks) {
        if (stops(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs.filter(_.length <= 4)
    }
    val freq = occs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val deg = occs.flatMap(p => p.map(w => (w, p.length.toLong)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def score(p: Vector[String]): Long =
      p.map(w => deg(w) * 1000000L / freq(w)).sum
    val expect = occs.groupBy(identity).map { case (p, os) =>
      (p.mkString(" "), os.length.toLong, score(p))
    }.toSeq.sortBy(t => (-t._3, t._1)).take(20)
    val rows = TextAnalysis.textRake(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == expect, s"\ngot:    $rows\nexpect: $expect")
  }

  test("q21WaitingSuppliers: only-late-supplier-on-multi-supplier-order replays") {
    val orders = graft.sources.Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate")).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate))
      .toMap
    val li = graft.sources.Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2).toLocalDate))
    val byOrder = li.groupBy(_._1)
    val numwait = scala.collection.mutable.Map.empty[Long, Long]
    for ((ok, rs) <- byOrder) {
      val od = orders(ok)
      val supp = rs.map(_._2).toSet
      val late = rs.filter(r =>
        java.time.temporal.ChronoUnit.DAYS.between(od, r._3) > 60)
        .map(_._2).toSet
      if (supp.size >= 2 && late.size == 1)
        numwait(late.head) = numwait.getOrElse(late.head, 0L) + 1L
    }
    assert(numwait.nonEmpty, "census must be non-vacuous")
    val got = Relational.q21WaitingSuppliers(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    for ((sk, nw) <- got) assert(numwait(sk) == nw, s"numwait of $sk")
    assert(got.length == math.min(numwait.size, 100))
  }

  test("q22GlobalSales: integer-exact above-average + dormancy anti join replays") {
    val cust = graft.sources.Tables.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val orders = graft.sources.Tables.table(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 1000000"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mx = orders.map(_._2).max
    val recent = orders.filter(_._2 >= mx - 180L * 86400L).map(_._1).toSet
    val pos = cust.filter(_._3 > 0L)
    val (nPos, sumPos) = (pos.length.toLong, pos.map(_._3).sum)
    val dormantRich = pos.filter(c =>
      c._3 * nPos > sumPos && !recent(c._1))
    assert(dormantRich.nonEmpty, "dormant-rich arm must be non-vacuous")
    val expect = dormantRich.groupBy(_._2).map { case (nk, rs) =>
      (nk, rs.length.toLong, rs.map(_._3).sum)
    }.toSet
    val got = Relational.q22GlobalSales(spark, dir).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        r.getLong(2))).toSet
    assert(got == expect)
  }

  test("privacyDpTopk: noisy-threshold release replays the exact sampler; " +
    "both arms exercised") {
    val P = 1000000007L
    def polyHash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % P)
    val DpRange = 786432L
    def mag(u3: Long): Long =
      if (u3 < 262144L) 0L
      else (1 to 19).find(j => u3 < DpRange - (1L << (19 - j)))
        .getOrElse(19).toLong
    def noise(key: String): Long = {
      val h = polyHash(key)
      val m = mag(h % DpRange)
      if (m == 0L) 0L else if ((h / 2097152) % 2 == 0) m else -m
    }
    // sf0.01: the sf0.001 domain tops out at n=66, so whether anything
    // clears tau=64 there is noise-luck; the mid corpus splits 368/988
    val parts = graft.sources.Tables.table(spark, dirMid, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val cells = graft.sources.Tables.table(spark, dirMid, "lineitem")
      .select(col("l_partkey")).collect().map(r => parts(r.getLong(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val released = cells.toSeq.flatMap { case ((b, sz), n) =>
      val dpN = math.max(n + noise(s"$b|$sz|dptk"), 0L)
      if (dpN >= 64L) Some((b, sz, n, dpN)) else None
    }
    assert(released.nonEmpty && released.size < cells.size,
      "both the release AND the withhold arm must fire (non-vacuity)")
    val expect = released
      .sortBy { case (b, sz, _, dpN) => (-dpN, b, sz) }.zipWithIndex
      .map { case ((b, sz, n, dpN), i) => (i + 1L, b, sz, n, dpN) }.toSet
    val got = Privacy.privacyDpTopk(spark, dirMid).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(5))).toSet
    assert(got == expect)
  }

  test("aggTheil: pinned-order fold replays; indices coherent with Gini") {
    def round6(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val dom = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = dom.groupBy(_._1).map { case (t, rs) =>
      val n = rs.map(_._3).sum
      val tot = rs.map(r => r._2 * r._3).sum
      val sorted = rs.sortBy(_._2)
      var tt = 0.0; var tl = 0.0
      for ((_, x, c) <- sorted) {
        val r = x.toDouble * n / tot
        tt += c * r * math.log(r)
        tl += -c.toDouble * math.log(r)
      }
      (t, n, tot, round6(tt / n), round6(tl / n))
    }.toSet
    val got = Relational.aggTheil(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == expect)
    // Theil indices are non-negative and zero only under equality
    for ((_, _, _, tt, tl) <- got) assert(tt >= 0.0 && tl >= 0.0)
  }

  test("dqReferential: both reconciliation directions replay with sets") {
    def keys(tbl: String, c: String): Set[Long] =
      graft.sources.Tables.table(spark, dir, tbl).select(col(c))
        .distinct().collect().map(_.getLong(0)).toSet
    val cases = Seq(
      ("lineitem->orders", keys("lineitem", "l_orderkey"),
        keys("orders", "o_orderkey")),
      ("lineitem->part", keys("lineitem", "l_partkey"),
        keys("part", "p_partkey")),
      ("lineitem->supplier", keys("lineitem", "l_suppkey"),
        keys("supplier", "s_suppkey")),
      ("orders->customer", keys("orders", "o_custkey"),
        keys("customer", "c_custkey")))
    val expect = cases.map { case (name, ck, pk) =>
      val childless = (pk -- ck).size.toLong
      (name, ck.size.toLong, pk.size.toLong, (ck -- pk).size.toLong,
        childless, childless * 1000000L / pk.size)
    }.toSet
    val got = Relational.dqReferential(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect)
    // clean corpus: zero orphans is the EXPECTED audit result, and the
    // childless arm must be non-vacuous somewhere
    assert(got.forall(_._4 == 0L))
    assert(got.exists(_._5 > 0L), "childless arm never fired (vacuity)")
  }

  test("streamTopk: converged per-hour leaderboard equals the batch top-3") {
    val counts = graft.sources.Tables.events(spark, dir)
      .select(expr("ts_ns div 3600000000000 * 3600").as("hour_s"),
        col("user_id"))
      .groupBy("hour_s", "user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = counts.groupBy(_._1).toSeq.flatMap { case (h, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, u, n), i) => (h, i + 1L, u, n) }
    }.toSet
    val got = graft.streaming.EventStreams.streamTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("simBqRerank: hamming shortlist + exact rescore replays; rescore reorders") {
    val vecs = graft.sources.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(vecs.head._2.length == 64)
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      java.math.BigDecimal.valueOf(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    def ham(a: Array[Float], b: Array[Float]): Long =
      a.indices.count(i => (a(i) > 0) != (b(i) > 0)).toLong
    val expect = vecs.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val shortlist = vecs.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, ham(qv, cv), cv) }
        .sortBy { case (cid, h, _) => (h, cid) }.take(30)
      shortlist.map { case (cid, h, cv) => (cid, h, cos6(qv, cv)) }
        .sortBy { case (cid, _, c) => (-c, cid) }.take(10).zipWithIndex
        .map { case ((cid, h, c), i) => (qid, i + 1L, cid, h, c) }
    }.toSet
    val got = Similarity.simBqRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expect)
    // non-vacuity: the rescore must actually change the order — some
    // final ranking must not be the hamming-ascending prefix order
    val reordered = got.groupBy(_._1).exists { case (_, rs) =>
      val hs = rs.toSeq.sortBy(_._2).map(_._4)
      hs != hs.sorted
    }
    assert(reordered, "rescore never reordered the shortlist — vacuous")
  }
}
