package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: planned vs post-execution (AQE-final) lineitem scan
  * counts for the queries that plan the fact more than once. */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val planned = "lineitem\\.parquet".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
      df.collect()
      val fin = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val physical = "lineitem\\.parquet".r.findAllIn(fin).length
      val reused = "ReusedExchange".r.findAllIn(fin).length
      println(s"AUDIT $name planned=$planned physical=$physical reusedEx=$reused")
    }
    spark.stop()
  }
}
