package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` of named registry queries to
  * files — the plan evidence the optimization rounds commit under
  * `plans/rNN/<query>_{before,after}.txt`.
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <query...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, rest @ _*) = args.toSeq.toArray: @unchecked
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-explain-dump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- rest) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
