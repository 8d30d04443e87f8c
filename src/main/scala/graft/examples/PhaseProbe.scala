package graft.examples

import org.apache.spark.sql.SparkSession

/** Where does a query's wall-clock go — analysis, optimization,
  * physical planning, or execution? Prints QueryExecutionTracker phase
  * durations plus build/exec wall times for named SparkEntry queries,
  * warm (2nd run) like the bench's reported min.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.PhaseProbe q1 q2 ..."
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        // decompose one run: fn() = plan build + analysis;
        // executedPlan = optimization + physical planning (this
        // QueryExecution's, no re-plan later); collect() = execution
        // of exactly that plan. The bench's count() pays the same
        // three phases on an almost-identical tree.
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val tPlan = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        df.collect()
        val tExec = (System.nanoTime() - t2) / 1e9
        val phases = df.queryExecution.tracker.phases
          .map { case (p, s) => f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.2f" }
          .toSeq.sorted.mkString(" ")
        println(f"PHASE $name run$run build=$tBuild%.2f plan=$tPlan%.2f " +
          f"exec=$tExec%.2f $phases")
        isolate()
      }
    }
    spark.stop()
  }
}
