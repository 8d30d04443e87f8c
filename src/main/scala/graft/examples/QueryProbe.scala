package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-loop probe: run named SparkEntry queries at sf0.01 and print
  * row count + planned lineitem-subtree count (the PlanAuditSpec
  * budget metric), or the full exception on failure — the fast way to
  * triage a new query before a Verify/diffcheck round trip.
  *
  *   sbt -batch "runMain graft.examples.QueryProbe q_sqltext_q97 ..."
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val planned = "lineitem\\.parquet".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
        println(s"OK $n rows=${df.count()} lineitemSubtrees=$planned")
      } catch { case e: Throwable =>
        println(s"FAIL $n: ${e.getClass.getName}: ${e.getMessage}")
        e.printStackTrace()
      }
    }
    spark.stop()
  }
}
