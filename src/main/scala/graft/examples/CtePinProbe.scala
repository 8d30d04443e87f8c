package graft.examples

import graft.SparkEntry
import graft.dsreal.DsOracle
import graft.operators.{DsRealPack, DsRealPack2}
import org.apache.spark.sql.SparkSession

/** Measures the [[graft.plans.CtePin]] prototype on SQL-text-battery
  * EXCLUSION texts (the shared-frame CTE family — q72 is the cheapest
  * case): raw text with the pin off vs on, wall time (min of 3 warm
  * runs), planned fact scans, and a row-hash comparison against the
  * DataFrame twin. Fresh JVM per invocation for clean numbers:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.examples.CtePinProbe q72 [on|off]"
  */
object CtePinProbe {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q72")
    val on = !args.contains("off")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.plans.CtePin.EnabledKey, on.toString)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    val full = DsRealPack.oracle.getOrElse(s"q_dsreal_$q",
      DsRealPack2.oracle(s"q_dsreal_$q"))
    require(full.startsWith(DsOracle.prelude))
    val b0 = full.drop(DsOracle.prelude.length)
    val body = if (b0.dropWhile(_.isWhitespace).startsWith(","))
      "WITH " + b0.dropWhile(_.isWhitespace).drop(1) else b0

    // star views like SqlTextPack's
    graft.operators.SqlTextPack.registerStar(spark, d)

    val df = spark.sql(body)
    val planned = "lineitem\\.parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // timed runs re-enter spark.sql so the measurement INCLUDES the
    // analysis-time materialization job the pin runs (each analysis
    // re-pins — the prototype has no pin cache, which is itself part
    // of the adjudication)
    val times = (1 to 3).map { _ =>
      isolate()
      val t0 = System.nanoTime()
      spark.sql(body).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val twin = SparkEntry.queries(s"q_dsreal_$q")(spark, d)
      .collect().map(_.toSeq).toSeq
    val text = spark.sql(body).collect().map(_.toSeq).toSeq
    println(f"CTEPIN $q on=$on plannedFactScans=$planned " +
      f"min=${times.min}%.2f times=${times.map(t => f"$t%.2f").mkString(",")} " +
      s"rowsMatchTwin=${text == twin} rows=${text.size}")
    spark.stop()
  }
}
