package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: prints the exchange/join/scan skeleton of
  * named registry queries so a round's plan audit is one command.
  * Usage: runMain graft.tools.PlanPeek <sfDir> <query...>
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-plan-peek").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.drop(1)) {
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Scan parquet") || l.contains("Broadcast"))
        .map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
