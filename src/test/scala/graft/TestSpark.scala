package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites (SURVEY §5: ITCase-style tests). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the engine's injected Catalyst rules (scalar-agg-bank fusion,
      // trivial-hamming rewrite) are part of the product — tests run
      // with them active, exactly like Verify/Bench sessions
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // saveAsTable targets (bucketed-join tests) land in a temp dir,
      // never in the repo working directory
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // deny known-benign WARN spam per message (StateStoreCoordinator
    // snapshot-lag from the many short-lived streaming test queries,
    // broadcast-task-binary sizes, ...) — see LogHygiene
    LogHygiene.install()
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
