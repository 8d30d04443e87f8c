package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Iterate, Materialize}
import graft.{Tables => T}

/** Phase timing for the iterative graph queries: edge build vs
  * per-round cost, to separate fixed pin/job overhead from join cost.
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[iterprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val fwd = t("fwd pin")(Materialize.pin(T.lineitem(spark, d)
      .select(col("l_partkey").as("src"),
        (col("l_suppkey") + 100000L).as("dst"))
      .distinct()))
    val e = t("sym pin")(Materialize.pin(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))))
    println(s"[iterprobe] edges=${e.count()}")
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val ewd = t("ewd pin")(Materialize.pin(e.join(deg, "src")))
    val init = t("init")(
      e.select(col("src").as("id")).distinct()
        .withColumn("rank_micro", lit(1000000L)))
    var pr = t("init pin")(Materialize.pin(init))
    (1 to 10).foreach { r =>
      val next = broadcast(pr)
        .join(ewd, pr("id") === ewd("src"))
        .select(ewd("dst").as("id"), expr("rank_micro div d").as("c"))
        .groupBy("id").agg(sum("c").as("contrib"))
        .select(col("id"),
          (lit(150000L) + expr("(17 * contrib) div 20"))
            .as("rank_micro"))
      if (r == 10) {
        next.collect()
        println(next.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0))
      }
      pr = t(s"round $r")(Materialize.pin(next))
    }
    spark.stop()
  }
}
