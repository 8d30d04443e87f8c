package graft.examples

import graft.dsreal.DsTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand}

/** Dev-loop probe for PreAggBeforeExpand (r15 directive #3): runs the
  * raw q22 text with the rule on/off, reports whether the optimized
  * plan carries an Aggregate below the Expand, wall time, and result
  * rows for an eyeball diff.
  *
  *   sbt -batch "runMain graft.examples.PreAggProbe [off]"
  */
object PreAggProbe {
  def main(args: Array[String]): Unit = {
    val on = !args.contains("off")
    val push = !args.contains("nopush")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.plans.PreAggBeforeExpand.EnabledKey, on.toString)
      .config(graft.plans.PreAggBeforeExpand.PushKey, push.toString)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    DsTables.inventory(spark, d).createOrReplaceTempView("inventory")
    DsTables.dateDim(spark).createOrReplaceTempView("date_dim")
    DsTables.item(spark, d).createOrReplaceTempView("item")
    val df = spark.sql("""
      SELECT i_product_name, i_brand, i_class, i_category,
             (sum(inv_quantity_on_hand) div count(*)) * 1000000
               + ((sum(inv_quantity_on_hand) % count(*)) * 1000000)
                 div count(*) AS qoh_e6
      FROM inventory, date_dim, item
      WHERE inv_date_sk = d_date_sk AND inv_item_sk = i_item_sk
        AND d_month_seq BETWEEN 48 AND 59
      GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
      ORDER BY qoh_e6, i_product_name, i_brand, i_class, i_category
      LIMIT 100""")
    val opt = df.queryExecution.optimizedPlan
    val preAgg = opt.collect { case e: Expand => e }.exists(
      _.children.exists(_.collectFirst { case a: Aggregate => a }.nonEmpty))
    // the r16 push: a SECOND aggregate below the pre-agg's join
    // (fact-side partials computed before the item join)
    val pushedAgg = opt.collect { case a: Aggregate => a }.exists(
      _.children.exists(_.collectFirst {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.children.exists(_.collectFirst {
              case a2: Aggregate => a2 }.nonEmpty) => j
      }.nonEmpty))
    println(s"==== preAggBelowExpand=$preAgg pushedBelowJoin=$pushedAgg " +
      s"(on=$on push=$push)")
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = df.collect()
    println(f"==== rows=${rows.length} min=${times.min}%.2f " +
      s"times=${times.map(t => f"$t%.2f").mkString(",")}")
    println(rows.take(5).mkString("\n"))
    println(rows.takeRight(3).mkString("\n"))
    spark.stop()
  }
}
