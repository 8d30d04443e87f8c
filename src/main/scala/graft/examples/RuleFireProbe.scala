package graft.examples

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Reports every query whose ANALYZED plan changes when the two
  * bank-fusion analyzer rules are enabled — the blast-radius census
  * for the r15 cartesian-bomb fix (a fused bank whose base was a
  * comma-join). Planning only, nothing executes. */
object RuleFireProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val keys = Seq(graft.plans.ScalarAggBankFusion.EnabledKey,
      graft.plans.CrossJoinAggFusion.EnabledKey)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        def planWith(scalar: Boolean, cross: Boolean): String = {
          spark.conf.set(keys(0), scalar.toString)
          spark.conf.set(keys(1), cross.toString)
          fn(spark, d).queryExecution.analyzed.canonicalized.toString
        }
        val off = planWith(scalar = false, cross = false)
        val off2 = planWith(scalar = false, cross = false)
        if (off != off2) println(s"UNSTABLE $name (seeded nondeterminism)")
        else {
          val s1 = planWith(scalar = true, cross = false) != off
          val c1 = planWith(scalar = false, cross = true) != off
          if (s1 || c1) println(s"FIRES $name scalar=$s1 cross=$c1")
        }
      } catch { case e: Throwable => println(s"ERR $name ${e.getMessage}") }
      finally keys.foreach(k => spark.conf.unset(k))
    }
    spark.stop()
  }
}
