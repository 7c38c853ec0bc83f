package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkTestBase

/** Custom physical top-k-per-key: result parity with the window
  * formulation and the expected plan shape (no Window/Sort, exactly
  * one exchange between partial and final).
  */
class TopKPerKeySpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def viaCustom = TopK.topKPerKey(
    spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice")),
    Seq("p_brand"), Seq("p_retailprice" -> true, "p_partkey" -> false), 3)

  test("matches the window row_number formulation exactly") {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    val viaWindow = spark.read.parquet(s"$dir/part.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_retailprice")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val custom = viaCustom
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(custom == viaWindow)
    assert(custom.nonEmpty)
  }

  test("plan: partial + final exec pair, one exchange, no Window/Sort") {
    val plan = viaCustom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"))
    assert(plan.contains("TopKPerKeyFinal"))
    assert(!plan.contains("Window"))
    assert("Exchange".r.findAllIn(plan).size == 1)
  }

  test("k larger than group size returns whole groups") {
    val all = TopK.topKPerKey(
      spark.read.parquet(s"$dir/part.parquet")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice")),
      Seq("p_brand"), Seq("p_retailprice" -> true, "p_partkey" -> false), 1000000)
    assert(all.count() == spark.read.parquet(s"$dir/part.parquet").count())
  }

  test("unknown column name fails fast") {
    intercept[IllegalArgumentException] {
      TopK.topKPerKey(spark.read.parquet(s"$dir/part.parquet"),
        Seq("nope"), Seq("p_retailprice" -> true), 3)
    }
  }
}
