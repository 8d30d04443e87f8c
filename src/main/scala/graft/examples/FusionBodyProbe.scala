package graft.examples

import graft.operators.SqlTextPack
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
import org.apache.spark.sql.catalyst.plans.logical.Project

/** One-off diagnostic: print the distinct merged subquery bodies of
  * q_sqltext_q9 with the bank-fusion rule ON, to see why the count
  * moved 1 -> 2 under the r16 scan fan-out. */
object FusionBodyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if (args.contains("nofan"))
      spark.conf.set(graft.ext.FanOut.EnabledConf, "false")
    spark.conf.set(graft.plans.ScalarAggBankFusion.EnabledKey, "true")
    val df = SqlTextPack.queries("q_sqltext_q9")(spark, d)
    val bodies = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case s: ScalarSubquery => s.plan match {
        case Project(_, c) => c.canonicalized
        case p => p.canonicalized
      }
    })
    val distinct = bodies.distinct
    println(s"== ${bodies.size} subquery sites, ${distinct.size} distinct bodies ==")
    distinct.zipWithIndex.foreach { case (b, i) =>
      println(s"---- body $i (${bodies.count(_ == b)} sites) ----")
      println(b.treeString.take(4000))
    }
    spark.stop()
  }
}
