package graft

import graft.ext.TextOps
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential property test for the streaming near-dup gate's
  * bucket-claim state machine (streaming/StreamingNearDup.scala —
  * the keyed RowTimeDeduplicateFunction-style state crossed with the
  * batch LSH family). The banding itself (MinHash signature → band
  * keys) is oracle-gated on the batch side (q_minhash_lsh family);
  * what had no randomized adversary is the STATE machine: first-
  * claimant-wins across micro-batches, smallest-id-wins inside one,
  * any-hit ⇒ near-dup with dup_of = min claimant over hit bands,
  * null-signature docs surfacing as singletons.
  *
  * Oracle: compute each doc's band buckets ONCE with the same public
  * TextOps banding the engine uses (shared by design — the banding
  * has its own oracle), then replay the claim protocol in plain Scala
  * over the chunk sequence:
  *
  *   claimant(bucket) = prior claim, else min doc_id in this chunk
  *   hit(doc, bucket) = doc_id != claimant(bucket)
  *   is_dup(doc)      = ∃ hit band;  dup_of = min hit claimant | self
  *
  * and the engine's per-micro-batch collapsed verdicts must equal the
  * fold's, after EVERY chunk. Draws are mutation-heavy (40% of docs
  * are 1-token edits of an earlier doc) so claimed-bucket collisions,
  * in-batch ties, and cross-batch claims all occur; ~5% empty texts
  * pin the singleton branch.
  */
class NearDupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val NumHashes = 16
  private val Bands = 4
  private val RowsPerBand = 4
  private val Pool = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon")

  private def genDocs(rnd: scala.util.Random): Vector[NearDupDoc] = {
    val docs = scala.collection.mutable.ArrayBuffer[NearDupDoc]()
    (0 until 40 + rnd.nextInt(21)).foreach { i =>
      val text =
        // null text → null signature → the singleton branch (split of
        // the EMPTY string still yields one "" token, so null is the
        // only no-element input)
        if (rnd.nextInt(100) < 8) null
        else if (docs.nonEmpty && rnd.nextInt(100) < 40) {
          // 1-token mutation of an earlier doc: likely band collision
          val src = docs(rnd.nextInt(docs.size)).text
          val toks = Option(src).map(_.split(" ").toVector)
            .getOrElse(Vector.empty)
          if (toks.isEmpty || toks.head.isEmpty) Pool(rnd.nextInt(Pool.size))
          else toks.updated(rnd.nextInt(toks.size),
            Pool(rnd.nextInt(Pool.size))).mkString(" ")
        } else
          Vector.fill(8 + rnd.nextInt(8))(Pool(rnd.nextInt(Pool.size)))
            .mkString(" ")
      docs += NearDupDoc(i.toLong, "s", text)
    }
    docs.toVector
  }

  /** Band buckets per doc via the engine's own (batch-oracled)
    * banding; docs absent from the map have a null signature. */
  private def bucketsOf(docs: Vector[NearDupDoc]): Map[Long, Seq[String]] =
    spark.createDataset(docs)
      .select($"doc_id", $"source",
        TextOps.minhashSignature($"text", NumHashes).as("sig"))
      .filter($"sig".isNotNull)
      .select($"doc_id",
        posexplode(TextOps.bandKeys($"sig", Bands, RowsPerBand))
          .as(Seq("band", "bkey")))
      .select($"doc_id",
        concat_ws("", lit("s"), $"band", $"bkey").as("bucket"))
      .as[(Long, String)].collect().toSeq
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2) }

  /** The claim-protocol fold: per chunk, doc_id -> (is_dup, dup_of). */
  private def oracle(chunks: Seq[Vector[NearDupDoc]],
      buckets: Map[Long, Seq[String]]): Map[Long, (Boolean, Long)] = {
    val state = scala.collection.mutable.Map[String, Long]()
    val out = scala.collection.mutable.Map[Long, (Boolean, Long)]()
    chunks.foreach { chunk =>
      val rows = chunk.flatMap(d =>
        buckets.getOrElse(d.doc_id, Seq.empty).map(b => (d.doc_id, b)))
      val claim = rows.groupBy(_._2).map { case (b, rs) =>
        b -> state.getOrElseUpdate(b, rs.map(_._1).min)
      }
      chunk.foreach { d =>
        buckets.get(d.doc_id) match {
          case None => out(d.doc_id) = (false, d.doc_id) // singleton
          case Some(bs) =>
            val hits = bs.map(claim).filter(_ != d.doc_id)
            out(d.doc_id) =
              if (hits.isEmpty) (false, d.doc_id)
              else (true, hits.min)
        }
      }
    }
    out.toMap
  }

  test("differential: the bucket-claim state machine matches the " +
      "fold oracle after EVERY micro-batch across random " +
      "mutation-heavy corpora") {
    var dups = 0
    var singletons = 0
    var crossBatchDups = 0
    (1 to 6).foreach { seed =>
      val docs = genDocs(new scala.util.Random(seed))
      val buckets = bucketsOf(docs)
      val chunks = (0 until 4).map(i =>
        docs.slice(i * docs.size / 4, (i + 1) * docs.size / 4))
      val in = MemoryStream[NearDupDoc]
      val got = scala.collection.concurrent
        .TrieMap.empty[Long, (Boolean, Long)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_ndprop_ck").toString
      val q = StreamingNearDup.bandVerdicts(in.toDF(), NumHashes, Bands,
        RowsPerBand)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
          StreamingNearDup.BandVerdict], _: Long) =>
          StreamingNearDup.collapse(b.toDF()).collect().foreach { r =>
            got(r.getLong(0)) = (r.getBoolean(1), r.getLong(2))
          }
          ()
        }.start()
      chunks.zipWithIndex.foreach { case (c, i) =>
        in.addData(c)
        q.processAllAvailable()
        val want = oracle(chunks.take(i + 1), buckets)
        assert(got.toMap == want,
          s"seed=$seed chunk=$i\ngot=${got.toMap}\nwant=$want")
      }
      q.stop()
      val fin = oracle(chunks, buckets)
      dups += fin.count(_._2._1)
      singletons += docs.count(d => !buckets.contains(d.doc_id))
      // dup whose representative arrived in an EARLIER chunk
      crossBatchDups += fin.count { case (id, (isDup, of)) =>
        isDup && chunks.indexWhere(_.exists(_.doc_id == of)) <
          chunks.indexWhere(_.exists(_.doc_id == id))
      }
    }
    assert(dups >= 20, s"only $dups near-dups across draws")
    assert(singletons >= 3, s"only $singletons null-signature docs")
    assert(crossBatchDups >= 8,
      s"only $crossBatchDups cross-micro-batch claims exercised")
  }
}
