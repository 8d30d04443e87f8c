package graft.dsreal

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star replication for the TPC-DS scaling probe: writes a driver-dir
  * layout containing `mult` copies of the four base tables the derived
  * star consumes ([[DsTables]]: lineitem, orders, part, customer), each
  * replica's surrogate keys shifted past the previous replica's range
  * so the result is one CONSISTENT larger instance, not `mult`
  * overlapping ones:
  *
  *   - o_orderkey / l_orderkey  += i * okOff  (fact + order identity)
  *   - p_partkey  / l_partkey   += i * pkOff  (item dim grows with the
  *                                            facts — inventory too,
  *                                            being part x weeks x wh)
  *   - c_custkey  / o_custkey   += i * ckOff  (customer dim grows)
  *
  * Every other surrogate the derivation computes is a MODULO into a
  * fixed-size synthetic dim (store 10, demographics 210/72, promo 10,
  * warehouse 5, time 86400...), so shifted keys still land on valid
  * dim rows — exactly how a bigger TPC-H SF behaves (more orders and
  * parts; same stores). Dates are untouched: replicas add VOLUME
  * inside the same 1995-2001 window, the "same window, more data"
  * growth a scan-bound plan must absorb linearly.
  *
  * Offsets are the table's max key + 1 (computed from the source), so
  * replica key ranges are disjoint and dense enough that `% N`-derived
  * attributes keep their distributions.
  */
object DsScale {

  /** Writes the `mult`-times star base into `outDir` and returns it. */
  def replicate(spark: SparkSession, srcDir: String, outDir: String,
      mult: Int): String = {
    require(mult >= 1)
    val li = T.lineitem(spark, srcDir)
    val ord = T.orders(spark, srcDir)
    val part = T.part(spark, srcDir)
    val cust = T.customer(spark, srcDir)
    val okOff = ord.agg(max("o_orderkey")).first().getLong(0) + 1
    val pkOff = part.agg(max("p_partkey")).first().getLong(0) + 1
    val ckOff = cust.agg(max("c_custkey")).first().getLong(0) + 1

    def times(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until mult).map { i =>
        df.select(df.columns.map { c =>
          shifts.get(c) match {
            case Some(off) => (col(c) + lit(i * off)).as(c)
            case None => col(c)
          }
        }: _*)
      }.reduce(_ unionAll _)

    times(li, Map("l_orderkey" -> okOff, "l_partkey" -> pkOff))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    times(ord, Map("o_orderkey" -> okOff, "o_custkey" -> ckOff))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    times(part, Map("p_partkey" -> pkOff))
      .write.mode("overwrite").parquet(s"$outDir/part.parquet")
    times(cust, Map("c_custkey" -> ckOff))
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    outDir
  }

  /** The round-11 bench's 10 slowest dsreal queries — the scale-probe
    * battery (VERDICT r11 directive 1). */
  val HeavyQueries: Seq[String] = Seq(
    "q_dsreal_q72", "q_dsreal_q22", "q_dsreal_q67", "q_dsreal_q68",
    "q_dsreal_q88", "q_dsreal_q64", "q_dsreal_q14a", "q_dsreal_q49",
    "q_dsreal_q39a", "q_dsreal_q75")
}
