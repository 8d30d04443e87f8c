package graft

import graft.streaming.StreamingNearDup
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash near-dup gate (streaming/StreamingNearDup.scala):
  * cross-batch fuzzy dedup against bucket state, restart persistence,
  * and batch-parity against the batch LSH family on the same docs.
  */
case class NearDupDoc(doc_id: Long, source: String, text: String)

class StreamingNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base + " extra"      // shares nearly all tokens
  private val fresh =
    "completely different content about spark catalyst optimizer plans"

  /** Drive docs through the gate via a FILE streaming source (the
    * repo's restart pattern — source offsets persist in the
    * checkpoint), collecting per-doc verdicts through foreachBatch.
    * restartBetween=true runs one query per feed (stop + restart on
    * the same checkpoint); false runs ONE query over all feeds with
    * maxFilesPerTrigger=1, so each feed is its own micro-batch within
    * a single run. */
  private def run(feeds: Seq[Seq[NearDupDoc]], restartBetween: Boolean)
      : Map[Long, (Boolean, Long)] = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ndup_ck").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft_ndup_in").toString
    val acc = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Long)]
    def feed(docs: Seq[NearDupDoc]): Unit = {
      spark.createDataset(docs).coalesce(1)
        .write.mode("append").parquet(inDir)
      Thread.sleep(50) // distinct mod-times keep file (= batch) order
    }
    def startAndDrain(): Unit = {
      val src = spark.readStream
        .option("maxFilesPerTrigger", "1")
        .schema("doc_id LONG, source STRING, text STRING")
        .parquet(inDir)
      val q = StreamingNearDup.bandVerdicts(src)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            StreamingNearDup.BandVerdict], _: Long) =>
          StreamingNearDup.collapse(batch.toDF()).collect().foreach { r =>
            acc(r.getLong(0)) = (r.getBoolean(1), r.getLong(2))
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); q.stop()
    }
    if (restartBetween) feeds.foreach { d => feed(d); startAndDrain() }
    else { feeds.foreach(feed); startAndDrain() }
    acc.toMap
  }

  test("near-dup across micro-batches is flagged against bucket state; " +
      "fresh content passes") {
    val v = run(Seq(
      Seq(NearDupDoc(10L, "web", base)),
      Seq(NearDupDoc(20L, "web", nearDup), NearDupDoc(30L, "web", fresh))),
      restartBetween = false)
    assert(v(10L) == (false, 10L), s"first doc must be new: $v")
    assert(v(20L)._1 && v(20L)._2 == 10L,
      s"near-dup must point at the claimant: $v")
    assert(v(30L) == (false, 30L), s"fresh doc must pass: $v")
  }

  test("in-batch ties claim deterministically (smallest doc id wins)") {
    val v = run(Seq(Seq(NearDupDoc(7L, "web", base), NearDupDoc(3L, "web", base))),
      restartBetween = false)
    assert(v(3L) == (false, 3L) && v(7L) == (true, 3L), s"got $v")
  }

  test("bucket state survives a checkpoint restart (accepted corpus " +
      "persists across runs)") {
    val v = run(Seq(
      Seq(NearDupDoc(1L, "web", base)),
      Seq(NearDupDoc(2L, "web", nearDup))),
      restartBetween = true)
    assert(v(1L) == (false, 1L))
    assert(v(2L)._1 && v(2L)._2 == 1L,
      s"post-restart near-dup must still hit pre-restart state: $v")
  }

  test("same source-text in a DIFFERENT source namespace does not collide") {
    val v = run(Seq(
      Seq(NearDupDoc(1L, "web", base)),
      Seq(NearDupDoc(2L, "books", base))),
      restartBetween = false)
    assert(v(2L) == (false, 2L),
      s"buckets are per-source; cross-source text must pass: $v")
  }

  test("re-delivery of the SAME doc id is idempotent (not self-dup)") {
    val v = run(Seq(
      Seq(NearDupDoc(5L, "web", base)),
      Seq(NearDupDoc(5L, "web", base))),
      restartBetween = false)
    assert(v(5L) == (false, 5L), s"got $v")
  }

  test("state holds exactly one row per OCCUPIED bucket (the bounded-" +
      "state claim: n_docs x bands, never pairs, never texts)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ndst_ck").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft_ndst_in").toString
    val docs = Seq(NearDupDoc(1L, "web", base),
      NearDupDoc(2L, "web", nearDup), NearDupDoc(3L, "web", fresh),
      NearDupDoc(4L, "books", base))
    spark.createDataset(docs).coalesce(1)
      .write.mode("overwrite").parquet(inDir)
    var stateRows = -1L
    val q = StreamingNearDup.bandVerdicts(spark.readStream
        .schema("doc_id LONG, source STRING, text STRING").parquet(inDir))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: org.apache.spark.sql.Dataset[
        StreamingNearDup.BandVerdict], _: Long) => { b.count(); () })
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    import org.apache.spark.sql.functions._
    val buckets = spark.createDataset(docs).toDF()
      .select($"source", posexplode(graft.ext.TextOps.bandKeys(
        graft.ext.TextOps.minhashSignature($"text", 16), 4, 4))
        .as(Seq("band", "bkey")))
      .select(concat_ws("\u0001", $"source", $"band", $"bkey"))
      .distinct().count()
    assert(stateRows == buckets,
      s"state rows $stateRows must equal occupied buckets $buckets")
  }

  test("verdicts agree with the batch MinHash banding on the same corpus") {
    // batch parity: stream the sf0.001 documents through in one batch;
    // a doc the BATCH banding buckets with a smaller doc_id must be
    // flagged, and every claimant must be new
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", $"source", $"text").limit(200)
    val batchDocs = docs.collect().map(r =>
      NearDupDoc(r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val v = run(Seq(batchDocs), restartBetween = false)
    import org.apache.spark.sql.functions._
    val banded = docs.select($"doc_id", $"source",
        posexplode(graft.ext.TextOps.bandKeys(
          graft.ext.TextOps.minhashSignature($"text", 16), 4, 4))
          .as(Seq("band", "bkey")))
    val expectDup = banded.as("a").join(banded.as("b"),
        $"a.source" === $"b.source" && $"a.band" === $"b.band" &&
          $"a.bkey" === $"b.bkey" && $"a.doc_id" > $"b.doc_id")
      .select($"a.doc_id").distinct().as[Long].collect().toSet
    val flagged = v.collect { case (id, (true, _)) => id }.toSet
    assert(flagged == expectDup,
      s"stream flagged $flagged vs batch banding $expectDup")
  }
}
