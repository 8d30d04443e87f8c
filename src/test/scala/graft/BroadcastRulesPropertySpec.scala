package graft

import graft.streaming.BroadcastRules
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Control-stream rule and data-stream event for the broadcast-state
  * property draws (top-level: Spark's product encoder rejects
  * spec-inner classes). */
case class BRule(k: Long, tier: String, seq: Long)
case class BEvt(id: Long, k: Long)

/** Differential property test for dynamic broadcast state
  * (streaming/BroadcastRules.scala — reference
  * KeyedBroadcastProcessFunction.java): every data micro-batch must
  * be enriched with EXACTLY the rules current at batch time — the
  * keep-last-per-key fold of every control batch committed before it,
  * and a stable all-null-rule-columns schema before the first control
  * commit.
  *
  * The two streams are driven alternately (control chunk → await
  * commit → data chunk → await), so visibility is deterministic and
  * the oracle is a plain fold: rules_i = keepLast(control chunks
  * 0..i), enriched_i = data chunk i LEFT JOIN rules_i. Random draws
  * overwrite the same keys repeatedly (seq-increasing upserts), so
  * batches observe rule VERSIONS — a stale broadcast (yesterday's
  * rules) or a torn read (mixing versions) breaks equality. Round 0
  * sends data BEFORE any control in half the seeds, pinning the
  * empty-snapshot schema contract.
  */
class BroadcastRulesPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val RulesSchema = StructType(Seq(StructField("k", LongType),
    StructField("tier", StringType), StructField("seq", LongType)))

  test("differential: each data micro-batch joins exactly the rules " +
      "committed before it — keep-last fold oracle, rule-version " +
      "overwrites, and the pre-first-rule all-null schema") {
    var preRuleRows = 0
    var versionFlips = 0
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory("graft_brprop").toString
      val control = MemoryStream[BRule]
      val data = MemoryStream[BEvt]
      val qc = BroadcastRules.materialize(control.toDF(), Seq("k"), "seq",
        s"$dir/rules").queryName(s"brpropc$seed").start()
      val got = scala.collection.mutable.Map[Long, Vector[
        (Long, Long, Option[String], Option[Long])]]()
      val qd = BroadcastRules.enrich(data.toDF(), s"$dir/rules",
        Seq("k"), RulesSchema) { (b, id) =>
        got.synchronized {
          got(id) = b.select($"id", $"k", $"tier", $"seq")
            .as[(Long, Long, Option[String], Option[Long])]
            .collect().toVector
          ()
        }
      }.queryName(s"brpropd$seed").start()

      var seq = 0L
      var evId = 0L
      var rules = Map.empty[Long, BRule]
      (0 until 4).foreach { round =>
        // control first — except half the seeds skip round 0's rules,
        // so the first data batch joins the EMPTY snapshot
        if (round > 0 || seed % 2 == 0) {
          val upserts = Vector.fill(1 + rnd.nextInt(4)) {
            seq += 1
            BRule(rnd.nextInt(6).toLong, s"t${seed}_${seq}", seq)
          }
          control.addData(upserts)
          qc.processAllAvailable()
          upserts.foreach { r =>
            if (rules.contains(r.k)) versionFlips += 1
            rules = rules.updated(r.k, r)
          }
        }
        val evs = Vector.fill(5 + rnd.nextInt(6)) {
          evId += 1; BEvt(evId, rnd.nextInt(8).toLong)
        }
        data.addData(evs)
        qd.processAllAvailable()
        val want = evs.map { e =>
          rules.get(e.k) match {
            case Some(r) => (e.id, e.k, Some(r.tier), Some(r.seq))
            case None => preRuleRows += 1; (e.id, e.k, None, None)
          }
        }.toSet
        val batchRows = got.synchronized {
          got.values.flatten.filter(r => evs.exists(_.id == r._1)).toSet
        }
        assert(batchRows == want,
          s"seed=$seed round=$round\ngot=$batchRows\nwant=$want")
      }
      qd.stop(); qc.stop()
    }
    assert(versionFlips >= 15,
      s"only $versionFlips rule-version overwrites — batches never " +
        "observed a rule changing")
    assert(preRuleRows >= 10,
      s"only $preRuleRows un-enriched rows — the empty-snapshot and " +
        "unmatched-key contracts were barely exercised")
  }
}
