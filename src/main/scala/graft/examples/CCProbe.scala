package graft.examples
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
/** Reproduce Bench's repeated-run + clearCache measurement for a single
  * query in an otherwise-pristine JVM (usage: runMain ... q_name). Run 1
  * carries codegen/JIT warmup; runs 2-3 are the steady state. A query
  * that is much slower inside the full Bench sweep than here is being
  * slowed by cross-query session residue, not by its own plan — that
  * gap is what led to Bench unpersisting leftover pinned RDDs between
  * queries, not just clearing the SQL cache. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_dedup_clusters"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      println(f"[probe] $name run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
