package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Fresh-JVM single-query timing probe (judge r15 directive 3): the
  * in-session bench number for a query can carry session history
  * (JIT state, block-manager churn, adjacency); this probe times the
  * named queries in a JVM that has done NOTHING else, mirroring
  * [[graft.Bench]]'s protocol (same session confs, untimed warmup of
  * the query itself, min over 3 runs, isolation between runs). Invoke
  * with ONE query per sbt run for a genuinely clean reading:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.examples.CleanProbe q_pagerank"
  */
object CleanProbe {
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
    // optional A/B overrides, e.g.
    // SPARK_GRAFT_CONFS=spark.graft.preAggThroughJoin.enabled=false
    sys.env.get("SPARK_GRAFT_CONFS").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        isolate()
        t
      }
      // first sample is the untimed-warmup analog (JIT/codegen)
      val timed = samples.tail
      println(f"CLEAN $name min=${timed.min}%.2f " +
        f"samples=${samples.map(s => f"$s%.2f").mkString(",")} sf=$sfDir")
    }
    spark.stop()
  }
}
