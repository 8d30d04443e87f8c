package graft.examples

import graft.dsreal.{DsOracle, DsTables}
import org.apache.spark.sql.SparkSession

/** Dev-loop probe for the scalar-subquery-bank fusion rule (r15
  * directive #2): runs the raw q9 SQL text over the registered star
  * views and prints (a) the optimized logical plan of one subquery so
  * the decomposition shapes are visible, (b) how many store_sales
  * scans the physical plan contains, with and without the rule.
  *
  *   sbt -batch "runMain graft.examples.FusionProbe [rule]"
  */
object FusionProbe {
  def main(args: Array[String]): Unit = {
    val withRule = args.contains("rule")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.plans.ScalarAggBankFusion.EnabledKey, withRule.toString)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    DsTables.storeSales(spark, d).createOrReplaceTempView("store_sales")
    DsTables.reason(spark).createOrReplaceTempView("reason")
    val body = {
      // q9 body = oracle text minus the shared DuckDB prelude
      val full = graft.operators.DsRealPack2.oracle("q_dsreal_q9")
      full.drop(DsOracle.prelude.length)
    }
    val df = spark.sql(body)
    val opt = df.queryExecution.optimizedPlan
    // distinct canonicalized subquery plans: MergeScalarSubqueries
    // leaves each ScalarSubquery holding Project(GetStructField_i,
    // <merged plan copy>), so strip the top Project and count distinct
    // canonicalized CHILDREN — one per surviving fact pass
    import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val subPlans = opt.expressions.flatMap(_.collect {
      case s: ScalarSubquery => s.plan match {
        case Project(_, c) => c.canonicalized
        case p => p.canonicalized
      }
    })
    println(s"==== subqueries: ${subPlans.size}, distinct merged bodies: " +
      s"${subPlans.distinct.size} (withRule=$withRule)")
    println(s"rewrite visible (FILTER in plan): " +
      opt.toString.contains(" FILTER ("))
    // ground truth: total records actually read off disk during the run
    val recordsRead = new java.util.concurrent.atomic.AtomicLong()
    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          Option(e.taskMetrics).foreach { m =>
            recordsRead.addAndGet(m.inputMetrics.recordsRead)
            bytesRead.addAndGet(m.inputMetrics.bytesRead)
          }
        }
      })
    val t0 = System.nanoTime()
    df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let the listener bus drain
    println(s"==== exec: recordsRead=${recordsRead.get} " +
      s"bytesRead=${bytesRead.get} tasks=${tasks.get} sec=$sec")
    println(s"rows=${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
