package graft.tools
import org.apache.spark.sql.SparkSession
object HotProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.head
    for (name <- args.tail) {
      val fn = graft.SparkEntry.queries(name)
      val times = (0 until 4).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count(); (System.nanoTime()-t0)/1e9
      }
      println(f"$name cold=${times.head}%.2f hot_median=${times.tail.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
