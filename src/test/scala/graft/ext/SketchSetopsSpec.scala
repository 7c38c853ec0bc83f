package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Semantics pins for KMV sketch set algebra: exhaustive-regime
  * exactness (both sketches under k) and saturated-regime estimate
  * quality on constructed overlap. The oracle gate carries the
  * bit-equality check at corpus scale.
  */
class SketchSetopsSpec extends AnyFunSuite with SparkTestBase {

  /** Events fixture: (event_type, user_id) memberships. */
  private def eventsOf(rows: Seq[(String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sketch-events").toString
    rows.zipWithIndex.map { case ((t, u), i) => (i.toLong, t, u) }
      .toDF("event_id", "event_type", "user_id")
      .selectExpr("event_id", "timestamp_micros(event_id * 1000) AS ts",
        "user_id", "event_type", "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("sketchSetops: under-k sets produce EXACT union and intersection") {
    // |A| = 60, |B| = 50, |A∩B| = 20 — all far below k=256, so the
    // estimator must degrade to truth
    val a = (0L until 60L).map(u => ("A", u))
    val b = (40L until 90L).map(u => ("B", u))
    val dir = eventsOf(a ++ b)
    val r = Relational.sketchSetops(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(2) == 60L && row.getLong(3) == 50L)
    assert(row.getLong(4) == 90L && row.getLong(5) == 20L)
    assert(row.getLong(6) == 90L, "exhaustive union estimate must be exact")
    assert(row.getLong(7) == 20L, "exhaustive intersection estimate must be exact")
  }

  test("sketchSetops: saturated sketches estimate within KMV error bounds") {
    // |A| = |B| = 2000, |A∩B| = 1000 -> union 3000, J = 1/3.
    // k = 256: relative sd ~ 1/sqrt(255) ~ 6%; allow ~4 sd (25%).
    val a = (0L until 2000L).map(u => ("A", u))
    val b = (1000L until 3000L).map(u => ("B", u))
    val dir = eventsOf(a ++ b)
    val row = Relational.sketchSetops(spark, dir).collect().head
    assert(row.getLong(4) == 3000L && row.getLong(5) == 1000L)
    val estU = row.getLong(6).toDouble
    val estI = row.getLong(7).toDouble
    assert(math.abs(estU - 3000.0) / 3000.0 < 0.25,
      s"union estimate off: $estU vs 3000")
    assert(math.abs(estI - 1000.0) / 1000.0 < 0.40,
      s"intersection estimate off: $estI vs 1000")
  }

  test("aggHll: linear-counting and raw regimes both land within HLL error bounds") {
    // group A: 150 distinct (linear-counting regime, v_zero > 0);
    // group B: 5000 distinct (raw-estimator regime for m=512)
    val rows = (0L until 150L).map(u => ("A", u)) ++
      (10000L until 15000L).map(u => ("B", u)) ++
      (0L until 150L).map(u => ("A", u)) // duplicates must not move registers
    val dir = eventsOf(rows)
    val out = Relational.aggHll(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(4))).toMap
    val (exactA, estA, vzA) = out("A")
    val (exactB, estB, _) = out("B")
    assert(exactA == 150L && exactB == 5000L)
    assert(vzA > 0, "150 distinct must leave zero registers at m=512")
    // 3σ at m=512 is ~14%; linear counting is tighter still
    assert(math.abs(estA - 150.0) / 150.0 < 0.10, s"lc estimate off: $estA")
    assert(math.abs(estB - 5000.0) / 5000.0 < 0.15, s"raw estimate off: $estB")
  }
}
