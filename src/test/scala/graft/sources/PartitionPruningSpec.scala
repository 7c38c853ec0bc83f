package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Storage-layout evidence (README scale design): hive-style partition
  * layout prunes at the file listing, so a partition filter never
  * touches the other partitions' files.
  */
class PartitionPruningSpec extends AnyFunSuite with SparkTestBase {

  test("partitioned write + filter prunes to one partition directory") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("evpart").toString
    Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val pruned = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("event_type"))

    // physically: only the purchase partition's files are read
    val read = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(read.nonEmpty)
    assert(read.forall(_.contains("event_type=purchase")))

    // and the count matches the unpartitioned filter
    val expected = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
  }
}
