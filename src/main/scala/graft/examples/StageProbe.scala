package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for one warm run of a SparkEntry query:
  * stage wall (submission->completion), summed task time, executor CPU
  * time, input bytes, shuffle read/write bytes, task count — the
  * local-mode stand-in for the Spark UI's stage page (guide §7.1; the
  * UI is disabled in this sandbox).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.StageProbe <query>"
  */
object StageProbe {
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
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup (JIT/codegen), untimed
      isolate()
      val stages = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, Double, Double, Double, Long, Long, Long, Int)]
      val listener = new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1e3).getOrElse(-1.0)
          val m = si.taskMetrics
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
            m.executorRunTime / 1e3, m.executorCpuTime / 1e9,
            m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener events drain asynchronously
      spark.sparkContext.removeSparkListener(listener)
      println(f"STAGES $name warm_total=$total%.2f n_stages=${stages.size}")
      stages.sortBy(-_._3).take(20).foreach {
        case (id, nm, wall, run, cpu, in, sr, sw, nt) =>
          println(f"  stage=$id wall=$wall%6.2f taskSum=$run%6.2f " +
            f"cpu=$cpu%6.2f in=${in / 1e6}%8.1fMB sr=${sr / 1e6}%7.1fMB " +
            f"sw=${sw / 1e6}%7.1fMB tasks=$nt $nm")
      }
      isolate()
    }
    spark.stop()
  }
}
