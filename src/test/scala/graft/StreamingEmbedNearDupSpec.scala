package graft

import graft.streaming.{StreamingEmbedNearDup, StreamingNearDup}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming embedding near-dup gate (streaming/StreamingEmbedNearDup
  * .scala): sign-LSH bucket state across micro-batches, restart
  * persistence, and batch parity against the same lshBucket keys.
  */
case class EmbDoc(vec_id: Long, emb: Seq[Double])

class StreamingEmbedNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dims = 64
  private def mkVec(seed: Int): Seq[Double] =
    (0 until Dims).map(i => math.sin(seed * 131 + i * 7).toDouble * 10)
  private val base = mkVec(1)
  // positive scaling never flips a dot-product sign -> identical
  // buckets in EVERY table (a guaranteed near-dup under sign-LSH)
  private val nearDup = base.map(_ * 1.5)
  private val fresh = mkVec(9)

  private def run(feeds: Seq[Seq[EmbDoc]], restartBetween: Boolean)
      : Map[Long, (Boolean, Long)] = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_endup_ck").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft_endup_in").toString
    val acc = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Long)]
    def feed(docs: Seq[EmbDoc]): Unit = {
      spark.createDataset(docs).coalesce(1)
        .write.mode("append").parquet(inDir)
      Thread.sleep(50)
    }
    def startAndDrain(): Unit = {
      val src = spark.readStream
        .option("maxFilesPerTrigger", "1")
        .schema("vec_id LONG, emb ARRAY<DOUBLE>")
        .parquet(inDir)
      val q = StreamingEmbedNearDup.bandVerdicts(src, dims = Dims)
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

  test("scaled (cosine-identical) vector is flagged across micro-batches; " +
      "unrelated vector passes") {
    val v = run(Seq(
      Seq(EmbDoc(10L, base)),
      Seq(EmbDoc(20L, nearDup), EmbDoc(30L, fresh))),
      restartBetween = false)
    assert(v(10L) == (false, 10L), s"first vec must be new: $v")
    assert(v(20L)._1 && v(20L)._2 == 10L,
      s"scaled vec must hit the claimant's buckets: $v")
    assert(v(30L) == (false, 30L), s"unrelated vec must pass: $v")
  }

  test("in-batch ties claim deterministically (smallest vec_id wins)") {
    val v = run(Seq(Seq(EmbDoc(7L, base), EmbDoc(3L, base))),
      restartBetween = false)
    assert(v(3L) == (false, 3L) && v(7L) == (true, 3L), s"got $v")
  }

  test("bucket state survives a checkpoint restart") {
    val v = run(Seq(
      Seq(EmbDoc(1L, base)),
      Seq(EmbDoc(2L, nearDup))),
      restartBetween = true)
    assert(v(1L) == (false, 1L))
    assert(v(2L)._1 && v(2L)._2 == 1L,
      s"post-restart near-dup must still hit pre-restart state: $v")
  }

  test("verdicts agree with batch sign-LSH banding on real embeddings") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, TestSpark.sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
      .limit(150)
    val fed = vecs.collect().map(r =>
      EmbDoc(r.getLong(0), r.getSeq[Double](1))).toSeq
    val v = run(Seq(fed), restartBetween = false)
    val banded = vecs.select($"vec_id", posexplode(array((0 until 4).map(t =>
        graft.ext.VectorOps.lshBucket($"emb", 16, Dims, planeOffset = t * 16)
          .cast("string")): _*)).as(Seq("table", "bucket")))
    val expectDup = banded.as("a").join(banded.as("b"),
        $"a.table" === $"b.table" && $"a.bucket" === $"b.bucket" &&
          $"a.vec_id" > $"b.vec_id")
      .select($"a.vec_id").distinct().as[Long].collect().toSet
    val flagged = v.collect { case (id, (true, _)) => id }.toSet
    assert(flagged == expectDup,
      s"stream flagged ${flagged.size} vs batch banding ${expectDup.size}")
  }

  test("null embeddings surface as singletons (never collide with each " +
      "other or with real vectors)") {
    val v = run(Seq(
      Seq(EmbDoc(1L, base), EmbDoc(2L, null), EmbDoc(3L, null))),
      restartBetween = false)
    assert(v(2L) == (false, 2L) && v(3L) == (false, 3L),
      s"null-emb docs must each be singletons, not mutual dups: $v")
    assert(v(1L) == (false, 1L))
  }

  test("state holds exactly one row per occupied (table, bucket)") {
    import org.apache.spark.sql.functions._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_enst_ck").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft_enst_in").toString
    val docs = Seq(EmbDoc(1L, base), EmbDoc(2L, nearDup),
      EmbDoc(3L, fresh), EmbDoc(4L, mkVec(5)))
    spark.createDataset(docs).coalesce(1)
      .write.mode("overwrite").parquet(inDir)
    val q = StreamingEmbedNearDup.bandVerdicts(spark.readStream
        .schema("vec_id LONG, emb ARRAY<DOUBLE>").parquet(inDir),
        dims = Dims)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: org.apache.spark.sql.Dataset[
        StreamingNearDup.BandVerdict], _: Long) => { b.count(); () })
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    val buckets = spark.createDataset(docs).toDF()
      .select(posexplode(array((0 until 4).map(t =>
        graft.ext.VectorOps.lshBucket($"emb", 16, Dims, planeOffset = t * 16)
          .cast("string")): _*)).as(Seq("table", "bucket")))
      .select(concat_ws("\u0001", $"table", $"bucket"))
      .distinct().count()
    assert(stateRows == buckets,
      s"state rows $stateRows must equal occupied buckets $buckets")
  }
}
