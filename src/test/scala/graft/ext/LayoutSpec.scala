package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LayoutSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Independent Morton reference: interleave via bit loops. */
  private def morton(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 12)
      z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    z
  }

  test("zValue column matches the independent Morton reference") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (4095L, 4095L),
      (2400L, 1500L), (1023L, 2048L), (7L, 9L))
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"))).collect().map(_.getLong(0))
    assert(got.toSeq == pts.map { case (x, y) => morton(x, y) })
  }

  test("z-cells bound BOTH dimensions to 512-wide slices and cover every row") {
    val orders = graft.sources.Tables.table(spark, dir, "orders")
    val cells = Layout.layoutZorder(spark, dir).collect()
    assert(cells.length > 3, "degenerate cell count")
    assert(cells.map(_.getLong(1)).sum == orders.count())
    // global spans dwarf the per-cell spans: that's the skipping win
    for (c <- cells) {
      assert(c.getLong(3) - c.getLong(2) < 512L,
        s"cell ${c.getLong(0)} day span too wide")
      assert(c.getLong(5) - c.getLong(4) < 512L,
        s"cell ${c.getLong(0)} cust span too wide")
      // a cell's keys live in one aligned 512-grid slice per dim
      assert(c.getLong(2) / 512L == c.getLong(3) / 512L)
      assert(c.getLong(4) / 512L == c.getLong(5) / 512L)
    }
  }

  test("writing the layout: range partitions on z are disjoint, ordered") {
    val z = graft.sources.Tables.table(spark, dir, "orders")
      .select(
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("x"),
        col("o_custkey").as("y"))
      .select(Layout.zValue(col("x").bitwiseAND(lit(4095L)),
        col("y").bitwiseAND(lit(4095L))).as("z"))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
    val ranges = z.select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("p").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    for (Array((_, hi1), (lo2, _)) <- ranges.sliding(2))
      assert(hi1 <= lo2, "z ranges overlap across partitions")
  }
}
