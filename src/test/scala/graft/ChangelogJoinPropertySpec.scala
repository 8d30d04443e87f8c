package graft

import graft.streaming.{ChangelogJoin, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Changelog event for the join property draws (top-level: Spark's
  * product encoder rejects spec-inner classes). */
case class CJ(k: String, id: Long, kind: String, seq: Long)

/** Differential property test for the retraction-aware changelog join
  * (streaming/ChangelogJoin.scala — reference StreamingJoinOperator /
  * StreamingSemiAntiJoinOperator): the second-most intricate
  * hand-written state machine in the repo after the CEP NFA, guarded
  * until r13 by example-based suites. Property: for a RANDOM
  * interleaved changelog history on both sides (random keys, inserts,
  * and retractions of random live rows, +I/+U/-U/-D kinds mixed), the
  * accumulated output changelog of EVERY variant, materialized as a
  * multiset (insert kinds add a pair, delete kinds remove it), must
  * equal the corresponding relational join of the materialized final
  * inputs — and no pair's count may ever go transiently negative (a
  * retraction emitted before its insert would corrupt any downstream
  * consumer).
  *
  * Mechanics: batch-mode flatMapGroupsWithState IS the one-micro-batch
  * streaming execution of the same lambda (Spark runs the identical
  * code path with per-group fresh state), so the bulk of the draws run
  * as fast batch jobs with real per-batch sequence numbers (the lSeq/
  * rSeq contract — many events per key per batch). Cross-batch state
  * is pinned separately: a sample of draws replays the same history
  * through MemoryStream in three chunks and must produce the same
  * materialization.
  */
class ChangelogJoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Random two-sided changelog history: interleaved global seq; each
    * event inserts a fresh row or retracts a random LIVE row of its
    * key; kinds drawn from both spellings (+I/+U add, -U/-D remove). */
  private def genHistory(rnd: scala.util.Random)
      : (Vector[CJ], Vector[CJ]) = {
    val keys = Vector("k0", "k1", "k2")
    var seq = 0L
    var nextId = 0L
    def side(n: Int): Vector[CJ] = {
      var live = Map.empty[String, Vector[Long]].withDefaultValue(Vector())
      val out = Vector.newBuilder[CJ]
      (1 to n).foreach { _ =>
        val k = keys(rnd.nextInt(keys.length))
        seq += 1
        if (rnd.nextInt(100) < 65 || live(k).isEmpty) {
          nextId += 1
          live = live.updated(k, live(k) :+ nextId)
          val kind = if (rnd.nextBoolean()) StreamOps.Insert
            else StreamOps.UpdateAfter
          out += CJ(k, nextId, kind, seq)
        } else {
          val victim = live(k)(rnd.nextInt(live(k).size))
          live = live.updated(k, live(k).filterNot(_ == victim))
          val kind = if (rnd.nextBoolean()) StreamOps.Delete
            else StreamOps.UpdateBefore
          out += CJ(k, victim, kind, seq)
        }
      }
      out.result()
    }
    (side(8 + rnd.nextInt(7)), side(8 + rnd.nextInt(7)))
  }

  private def isAdd(kind: String): Boolean =
    kind == StreamOps.Insert || kind == StreamOps.UpdateAfter

  /** Final live rows per key after applying the history. */
  private def materializeSide(h: Vector[CJ]): Map[String, Vector[CJ]] = {
    var live = Map.empty[String, Vector[CJ]].withDefaultValue(Vector())
    h.foreach { r =>
      if (isAdd(r.kind)) live = live.updated(r.k, live(r.k) :+ r)
      else live = live.updated(r.k, {
        val (pre, post) = live(r.k).span(_.id != r.id)
        pre ++ post.drop(1)
      })
    }
    live
  }

  /** Apply an output changelog to a multiset, failing on any transient
    * negative count. Pairs are identified by (leftId, rightId) using
    * -1 for a padding None. */
  private def applyDeltas(deltas: Seq[(String, Long, Long)],
      what: String): Map[(Long, Long), Int] = {
    var ms = Map.empty[(Long, Long), Int].withDefaultValue(0)
    deltas.foreach { case (kind, li, ri) =>
      val d = if (isAdd(kind)) 1 else -1
      val n = ms((li, ri)) + d
      assert(n >= 0, s"$what: pair ($li,$ri) went negative")
      ms = ms.updated((li, ri), n)
    }
    ms.filter(_._2 > 0)
  }

  private def expectedFor(variant: String, lv: Map[String, Vector[CJ]],
      rv: Map[String, Vector[CJ]]): Map[(Long, Long), Int] = {
    val keys = (lv.keySet ++ rv.keySet).toSeq
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), Int]
      .withDefaultValue(0)
    keys.foreach { k =>
      val ls = lv.getOrElse(k, Vector())
      val rs = rv.getOrElse(k, Vector())
      variant match {
        case "inner" =>
          for (l <- ls; r <- rs) pairs((l.id, r.id)) += 1
        case "left" =>
          if (rs.isEmpty) ls.foreach(l => pairs((l.id, -1L)) += 1)
          else for (l <- ls; r <- rs) pairs((l.id, r.id)) += 1
        case "full" =>
          if (rs.isEmpty) ls.foreach(l => pairs((l.id, -1L)) += 1)
          else if (ls.isEmpty) rs.foreach(r => pairs((-1L, r.id)) += 1)
          else for (l <- ls; r <- rs) pairs((l.id, r.id)) += 1
        case "semi" =>
          if (rs.nonEmpty) ls.foreach(l => pairs((l.id, -1L)) += 1)
        case "anti" =>
          if (rs.isEmpty) ls.foreach(l => pairs((l.id, -1L)) += 1)
      }
    }
    pairs.toMap.filter(_._2 > 0)
  }

  private def runVariant(variant: String, l: org.apache.spark.sql.Dataset[CJ],
      r: org.apache.spark.sql.Dataset[CJ]): Seq[(String, Long, Long)] =
    variant match {
      case "inner" =>
        ChangelogJoin.inner(l, r)(
          _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
          .collect().toSeq.map(d => (d.row_kind, d.left.id, d.right.id))
      case "left" =>
        ChangelogJoin.leftOuter(l, r)(
          _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
          .collect().toSeq
          .map(d => (d.row_kind, d.left.id, d.right.map(_.id).getOrElse(-1L)))
      case "full" =>
        ChangelogJoin.fullOuter(l, r)(
          _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
          .collect().toSeq
          .map(d => (d.row_kind, d.left.map(_.id).getOrElse(-1L),
            d.right.map(_.id).getOrElse(-1L)))
      case "semi" =>
        ChangelogJoin.semi(l, r)(
          _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
          .collect().toSeq.map(d => (d.row_kind, d.left.id, -1L))
      case "anti" =>
        ChangelogJoin.anti(l, r)(
          _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
          .collect().toSeq.map(d => (d.row_kind, d.left.id, -1L))
    }

  private val Variants = Seq("inner", "left", "full", "semi", "anti")

  test("differential: 12 random changelog histories x all five join " +
      "variants — accumulated output materializes to the relational " +
      "join of the materialized inputs, with no transient negatives") {
    var nonTrivial = 0
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val (lh, rh) = genHistory(rnd)
      val lv = materializeSide(lh)
      val rv = materializeSide(rh)
      val lds = lh.toDS()
      val rds = rh.toDS()
      Variants.foreach { v =>
        val got = applyDeltas(runVariant(v, lds, rds), s"seed=$seed $v")
        val want = expectedFor(v, lv, rv)
        assert(got == want,
          s"seed=$seed variant=$v\nlh=$lh\nrh=$rh\ngot=$got\nwant=$want")
        if (want.nonEmpty) nonTrivial += 1
      }
    }
    // the draw space must exercise real joins, not vacuous empties
    assert(nonTrivial >= 30, s"only $nonTrivial non-empty materializations")
  }

  test("differential: cross-batch state — the same history in three " +
      "MemoryStream chunks materializes identically (sample draws)") {
    Seq(2 -> "inner", 5 -> "left", 7 -> "full", 9 -> "semi", 11 -> "anti")
      .foreach { case (seed, variant) =>
        val rnd = new scala.util.Random(seed)
        val (lh, rh) = genHistory(rnd)
        val lv = materializeSide(lh)
        val rv = materializeSide(rh)
        val lIn = MemoryStream[CJ]
        val rIn = MemoryStream[CJ]
        val got = new scala.collection.mutable.ArrayBuffer[(String, Long, Long)]
        def sink[T](f: T => (String, Long, Long))(
            b: org.apache.spark.sql.Dataset[T]): Unit =
          got.synchronized { got ++= b.collect().map(f) }
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_cjprop_ck").toString
        val q = (variant match {
          case "inner" => ChangelogJoin.inner(lIn.toDS(), rIn.toDS())(
              _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch((b: org.apache.spark.sql.Dataset[
              ChangelogJoin.JoinDelta[CJ, CJ]], _: Long) =>
              sink[ChangelogJoin.JoinDelta[CJ, CJ]](
                d => (d.row_kind, d.left.id, d.right.id))(b))
          case "left" => ChangelogJoin.leftOuter(lIn.toDS(), rIn.toDS())(
              _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch((b: org.apache.spark.sql.Dataset[
              ChangelogJoin.JoinDelta[CJ, Option[CJ]]], _: Long) =>
              sink[ChangelogJoin.JoinDelta[CJ, Option[CJ]]](d =>
                (d.row_kind, d.left.id, d.right.map(_.id).getOrElse(-1L)))(b))
          case "full" => ChangelogJoin.fullOuter(lIn.toDS(), rIn.toDS())(
              _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch((b: org.apache.spark.sql.Dataset[
              ChangelogJoin.JoinDelta[Option[CJ], Option[CJ]]], _: Long) =>
              sink[ChangelogJoin.JoinDelta[Option[CJ], Option[CJ]]](d =>
                (d.row_kind, d.left.map(_.id).getOrElse(-1L),
                  d.right.map(_.id).getOrElse(-1L)))(b))
          case "semi" => ChangelogJoin.semi(lIn.toDS(), rIn.toDS())(
              _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch((b: org.apache.spark.sql.Dataset[
              ChangelogJoin.SemiDelta[CJ]], _: Long) =>
              sink[ChangelogJoin.SemiDelta[CJ]](
                d => (d.row_kind, d.left.id, -1L))(b))
          case "anti" => ChangelogJoin.anti(lIn.toDS(), rIn.toDS())(
              _.k, _.kind, _.id, _.k, _.kind, _.id, _.seq, _.seq)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch((b: org.apache.spark.sql.Dataset[
              ChangelogJoin.SemiDelta[CJ]], _: Long) =>
              sink[ChangelogJoin.SemiDelta[CJ]](
                d => (d.row_kind, d.left.id, -1L))(b))
        }).start()
        // three CHRONOLOGICAL chunks per side (contiguous slices keep
        // every retraction after its insert) — rows retracting a
        // batch-1 insert arrive in a later batch, exercising state
        // carried across micro-batches
        (0 until 3).foreach { i =>
          lIn.addData(lh.slice(i * lh.size / 3, (i + 1) * lh.size / 3))
          rIn.addData(rh.slice(i * rh.size / 3, (i + 1) * rh.size / 3))
          q.processAllAvailable()
        }
        q.stop()
        val gotMs = applyDeltas(got.toSeq, s"stream seed=$seed $variant")
        val want = expectedFor(variant, lv, rv)
        assert(gotMs == want, s"stream seed=$seed variant=$variant\n" +
          s"got=$gotMs\nwant=$want")
      }
  }
}
