package graft
import org.apache.spark.sql.SparkSession
/** Temporary r14 probe: full stack for a failing q_sqltext body. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
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
