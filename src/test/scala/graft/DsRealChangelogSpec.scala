package graft

import graft.dsreal.DsTables
import graft.streaming.{ChangelogAgg, ChangelogJoin, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RETRACTION path on the real derived star — the seam
  * DsRealStreamingSpec left open (its two parity specs are
  * append-only). Here store_returns arrive as `-U/+U` CORRECTIONS
  * against facts already ingested, driving the changelog operators
  * (reference: OP/aggregate/GroupAggFunction.java:43 retraction
  * in/out, FlinkChangelogModeInferenceProgram.scala:43), and the
  * materialized changelog must equal the batch program over the same
  * final data — the same self-oracle contract, extended to update
  * streams.
  */
class DsRealChangelogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runAll(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    q.processAllAvailable()

  test("ChangelogAgg over store_sales with store_returns arriving as " +
      "-U/+U corrections equals the batch net-revenue aggregate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // sales facts: +I (store, sale_cents); returns become corrections
    // -U(old amount) / +U(old - refund) for the sale they amend —
    // exactly Flink's update-stream encoding of an upstream UPDATE.
    // The driver's lineitem carries a handful of exact-duplicate
    // (orderkey, linenumber) rows, so (item, ticket) is made unique by
    // pre-summing — one changelog entity per ticket line
    val sales = DsTables.storeSales(spark, TestSpark.sf)
      .groupBy($"ss_item_sk", $"ss_ticket_number")
      .agg(coalesce(max($"ss_store_sk"), lit(-1L)).as("store"),
        sum(coalesce($"ss_ext_sales_price_cents", lit(0L))).as("amt"),
        max($"ss_sold_date_sk").as("ss_sold_date_sk"))
    // one correction per returned sale: refunds pre-summed per
    // (item, ticket) so a sale is amended exactly once
    val refunds = DsTables.storeReturns(spark, TestSpark.sf)
      .groupBy($"sr_item_sk", $"sr_ticket_number")
      .agg(sum(coalesce($"sr_return_amt_cents", lit(0L))).as("refund"),
        max($"sr_returned_date_sk").as("ret_date"))
    val corrections = sales.join(refunds,
        $"ss_item_sk" === $"sr_item_sk" &&
          $"ss_ticket_number" === $"sr_ticket_number")
      .select($"store", $"amt", $"refund", $"ret_date")
      .as[(Long, Long, Long, Long)].collect()
    assert(corrections.nonEmpty,
      "no matched returns — the retraction path would be vacuous")

    val salesRows = sales
      .select($"store", $"amt", $"ss_sold_date_sk")
      .as[(Long, Long, Long)].collect()

    val in = MemoryStream[(String, Long, Double)] // (kind, store, cents)
    val agg = ChangelogAgg.sumCount(in.toDS())(_._2, _._1, _._3)
      .map(u => (u.row_kind, u.key, u.sum, u.count))
      .toDF("kind", "store", "sum", "count")
    val q = agg.writeStream.format("memory").queryName("dsr_cagg")
      .outputMode("update").start()

    // three chronological chunks; a correction lands in the chunk of
    // its RETURN date (>= the sale date, so it never precedes its +I)
    val cuts = Seq((0L, 900L), (900L, 1800L), (1800L, 99999L))
    cuts.foreach { case (lo, hi) =>
      val inserts = salesRows.collect {
        case (store, amt, d) if d >= lo && d < hi =>
          (StreamOps.Insert, store, amt.toDouble)
      }
      val amendments = corrections.collect {
        case (store, amt, refund, rd) if rd >= lo && rd < hi =>
          Seq((StreamOps.UpdateBefore, store, amt.toDouble),
            (StreamOps.UpdateAfter, store, (amt - refund).toDouble))
      }.flatten
      in.addData(inserts.toSeq ++ amendments.toSeq)
      runAll(q)
    }
    q.stop()

    // changelog materialization: last update per key wins; -D removes
    val updates = spark.table("dsr_cagg")
      .as[(String, Long, Double, Long)].collect()
    val live = updates.zipWithIndex
      .groupBy(_._1._2).view
      .mapValues(_.maxBy(_._2)._1).toMap
      .collect { case (store, (kind, _, s, n)) if kind != StreamOps.Delete =>
        store -> (s, n)
      }.toMap

    val batch = sales
      .join(refunds, $"ss_item_sk" === $"sr_item_sk" &&
        $"ss_ticket_number" === $"sr_ticket_number", "left")
      .groupBy($"store")
      .agg(sum($"amt" - coalesce($"refund", lit(0L))).as("net"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
      .map { case (store, net, n) => store -> (net.toDouble, n) }.toMap

    assert(live == batch,
      s"changelog != batch: missing=${(batch.keySet -- live.keySet).take(3)} " +
        s"diff=${batch.collect { case (k, v) if live.get(k).exists(_ != v) =>
          (k, v, live(k)) }.take(3)}")
    // the retractions must have BITTEN: some store's net < its gross
    val gross = salesRows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    assert(batch.exists { case (k, (net, _)) => net < gross(k) },
      "no store's revenue was reduced — corrections were vacuous")
  }

  test("ChangelogJoin.inner of sales x returns with amended return " +
      "amounts equals the batch join on the final data") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // (item, ticket) made unique by pre-summing (see the agg test)
    val sales = DsTables.storeSales(spark, TestSpark.sf)
      .groupBy($"ss_item_sk", $"ss_ticket_number")
      .agg(sum(coalesce($"ss_ext_sales_price_cents", lit(0L))).as("amt"),
        max($"ss_sold_date_sk").as("sold_date"))
      .as[(Long, Long, Long, Long)].collect()
    val rets = DsTables.storeReturns(spark, TestSpark.sf)
      .groupBy($"sr_item_sk", $"sr_ticket_number")
      .agg(sum(coalesce($"sr_return_amt_cents", lit(0L))).as("refund"))
      .as[(Long, Long, Long)].collect()
    assert(rets.nonEmpty)

    // every 3rd return is later AMENDED: -D the original, +I double
    // the refund (a clerical correction) — the stream's final truth
    val amended = rets.filter(_._2 % 3 == 0)
    val finalRets = rets.map { case r @ (i, t, a) =>
      if (t % 3 == 0) (i, t, a * 2) else r
    }

    // tuples: (kind, item, ticket, amt/refund)
    val lIn = MemoryStream[(String, Long, Long, Long)]
    val rIn = MemoryStream[(String, Long, Long, Long)]
    val joined = ChangelogJoin.inner(lIn.toDS(), rIn.toDS())(
      l => (l._2, l._3), _._1, l => (l._2, l._3, l._4),
      r => (r._2, r._3), _._1, r => (r._2, r._3, r._4))
      .map(d => (d.row_kind, d.left._2, d.left._3, d.left._4, d.right._4))
      .toDF("kind", "item", "ticket", "amt", "refund")
    val q = joined.writeStream.format("memory").queryName("dsr_cjoin")
      .outputMode("update").start()

    // batch 1: early sales; batch 2: late sales + ALL original
    // returns; batch 3: the amendments (-D old, +I corrected)
    lIn.addData(sales.filter(_._4 < 1200)
      .map { case (i, t, a, _) => (StreamOps.Insert, i, t, a) }.toSeq)
    runAll(q)
    lIn.addData(sales.filter(_._4 >= 1200)
      .map { case (i, t, a, _) => (StreamOps.Insert, i, t, a) }.toSeq)
    rIn.addData(rets.map { case (i, t, a) =>
      (StreamOps.Insert, i, t, a) }.toSeq)
    runAll(q)
    rIn.addData(amended.flatMap { case (i, t, a) =>
      Seq((StreamOps.Delete, i, t, a),
        (StreamOps.Insert, i, t, a * 2)) }.toSeq)
    runAll(q)
    q.stop()

    // net-materialize the join changelog: +I adds a pair, -D removes
    val deltas = spark.table("dsr_cjoin")
      .as[(String, Long, Long, Long, Long)].collect()
    val net = scala.collection.mutable.Map
      .empty[(Long, Long, Long, Long), Long].withDefaultValue(0L)
    deltas.foreach { case (kind, i, t, a, r) =>
      net((i, t, a, r)) += (if (kind == StreamOps.Delete) -1L else 1L)
    }
    assert(net.values.forall(v => v == 0L || v == 1L),
      "net multiplicity out of {0,1} — a delta misapplied")
    val live = net.collect { case (k, 1L) => k }.toSet

    val salesByKey = sales.map { case (i, t, a, _) => (i, t) -> a }.toMap
    val batch = finalRets.flatMap { case (i, t, r) =>
      salesByKey.get((i, t)).map(a => (i, t, a, r))
    }.toSet
    assert(batch.nonEmpty)
    assert(live == batch,
      s"changelog join != batch: missing=${(batch -- live).take(3)} " +
        s"extra=${(live -- batch).take(3)}")
    // amendments must have replaced, not duplicated: no amended key
    // retains its original refund
    assert(amended.forall { case (i, t, a) =>
      !live.contains((i, t, salesByKey.getOrElse((i, t), -1L), a)) })
  }
}
