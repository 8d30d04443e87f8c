package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** One-off diagnostic for RuleFireProbe's UNSTABLE blind spot (judge
  * r15 directive 4): rebuild each named query's analyzed canonicalized
  * plan twice and print the first differing line pair, so the
  * nondeterministic token (cte id? seed? exprId leak?) can be
  * identified and normalized away in the census. */
object CensusDiffProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def plan(): Array[String] = graft.plans.RuleCensus.canon(
        fn(spark, d).queryExecution.analyzed).split("\n")
      val a = plan(); val b = plan()
      if (a.sameElements(b)) println(s"STABLE $name")
      else {
        println(s"DIFFERS $name (${a.length} vs ${b.length} lines)")
        a.zipAll(b, "<missing>", "<missing>").zipWithIndex
          .filter { case ((x, y), _) => x != y }
          .take(3)
          .foreach { case ((x, y), i) =>
            println(s"  line $i:\n   A: ${x.take(300)}\n   B: ${y.take(300)}")
          }
      }
    }
    spark.stop()
  }
}
