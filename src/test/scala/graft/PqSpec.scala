package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization (ext/ProductQuantization.scala): structural
  * invariants + the self-coding and monotone-refinement properties a
  * driver-side re-derivation can pin without an oracle. The end-to-end
  * value parity (codes, ADC ranking, recall) is oracle-checked by
  * q_pq_topk / q_pq_recall in ExtPack7.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.ext.{ProductQuantization => PQ}

  private val M = 16
  private val K = 32 // smaller codebook at sf0.001 (fewer vectors)
  private val Dim = 64

  private lazy val q = PQ.quantize(Tables.embeddings(spark, TestSpark.sf))
  private lazy val cents = PQ.codebook(q, M, K, Dim)
  private lazy val vb = PQ.blockize(q, M, Dim)
  private lazy val codes = PQ.encode(vb, cents, Dim / M)

  test("codebook has exactly m x k block-centroids of dim/m elements") {
    val rows = cents.collect()
    assert(rows.length == M * K)
    assert(rows.forall(_.getSeq[Long](2).length == Dim / M))
    val perBlock = rows.groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(perBlock.values.forall(_ == K) && perBlock.size == M)
  }

  test("every vector gets exactly m codes, each in [0, k)") {
    val n = q.count()
    assert(codes.count() == n * M)
    val bad = codes.filter(col("code") < 0 || col("code") >= K).count()
    assert(bad == 0)
  }

  test("a seed vector codes at distance 0 in every block (self-coding)") {
    // the codebook rows carry the seed vectors' own blocks, so encoding
    // a seed must land at distance 0 in every block (a tie at 0 breaks
    // to the lowest cid, which can only be another IDENTICAL block —
    // either way d2 of the chosen centroid is 0). Restrict to the
    // ACTUAL seeds — the k hash-smallest vec_ids, re-derived exactly as
    // codebook() picks them — and require ALL of them to self-code.
    val seedIds = q
      .withColumn("h", graft.ext.TextOps.tokenHash32(
        concat(lit("pq_"), col("vec_id"))))
      .orderBy(col("h"), col("vec_id")).limit(K)
      .select("vec_id")
    val worst = codes.join(vb, Seq("vec_id", "b"))
      .join(cents.withColumnRenamed("cid", "code"), Seq("b", "code"))
      .withColumn("d2", PQ.l2sqFixed(col("xvec"), col("cvec"), Dim / M))
      .join(seedIds, Seq("vec_id"), "left_semi")
      .groupBy("vec_id").agg(max("d2").as("worst"))
    assert(worst.count() == K, "every seed must be encoded")
    assert(worst.filter(col("worst") =!= 0).count() == 0,
      "every seed vector must self-code at distance 0 in all blocks")
  }

  test("ADC distance of a query to a SEED vector equals the code-table " +
      "sum (lookup consistency)") {
    val lut = PQ.lut(vb.filter(col("vec_id") < 5), cents, Dim / M)
    val top = PQ.search(codes, lut, 1000000).cache()
    // ADC(q, x) must equal sum over blocks of lut[q][b][code(x, b)] —
    // re-derive one side independently via a fresh join
    val rederived = codes.join(lut,
        codes("b") === lut("b") && codes("code") === lut("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id").agg(sum("qd2").as("expected"))
    val joined = top.join(rederived, Seq("q_id", "vec_id"))
    assert(joined.filter(col("adist") =!= col("expected")).count() == 0)
    top.unpersist()
  }

  test("finer codebooks never worsen quantization error (monotone in k)") {
    def totalErr(k: Int): Long = {
      val cb = PQ.codebook(q, M, k, Dim)
      vb.join(broadcast(cb), "b")
        .withColumn("d2", PQ.l2sqFixed(col("xvec"), col("cvec"), Dim / M))
        .groupBy("vec_id", "b").agg(min("d2").as("best"))
        .agg(sum("best")).collect()(0).getLong(0)
    }
    val coarse = totalErr(8)
    val fine = totalErr(32)
    // the 32-seed codebook contains the 8-seed one (same hash order),
    // so per-block best distance can only shrink
    assert(fine <= coarse, s"fine=$fine coarse=$coarse")
  }

  test("IVF x PQ composition: ADC over IVF candidates prunes the scan " +
      "and stays consistent with full-corpus PQ on the candidate set") {
    import graft.ext.{VectorOps => V}
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .withColumn("cell", V.lshBucket(col("embedding"), planes = 6, dims = 64))
    val probes = emb.filter(col("vec_id") < 10)
    val cand = V.ivfCandidatesMulti(emb, probes, "cell",
      rounds = 1, a = 3, nProbe = 5).select("q_id", "vec_id").cache()
    val n = q.count()
    val nCand = cand.count()
    // the router must actually prune: candidates well below Q x (N-1)
    assert(nCand < 10 * (n - 1) * 7 / 10,
      s"IVF candidates $nCand vs full ${10 * (n - 1)} - no pruning?")
    val lut = PQ.lut(vb.filter(col("vec_id") < 10), cents, Dim / M)
    val ivfpq = PQ.searchCandidates(cand, codes, lut, 5)
    // consistency: restricting full-corpus ADC to the candidate set and
    // re-ranking must reproduce the composed result exactly
    val fullAdc = codes.join(broadcast(lut),
        codes("b") === lut("b") && codes("code") === lut("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id").agg(sum("qd2").as("adist"))
      .join(cand, Seq("q_id", "vec_id"), "left_semi")
    val expected = graft.operators.TopN(fullAdc, Seq(col("q_id")),
      Seq(col("adist").asc, col("vec_id").asc), 5)
    assert(ivfpq.select("q_id", "vec_id", "adist").except(
        expected.select("q_id", "vec_id", "adist")).count() == 0 &&
      expected.select("q_id", "vec_id", "adist").except(
        ivfpq.select("q_id", "vec_id", "adist")).count() == 0)
    // and the composed path must still find true neighbors: recall@5
    // vs exact integer L2 at or above the measured floor
    val pr = q.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("eq").as("qe"))
    val brute = q.join(broadcast(pr), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        PQ.l2sqFixed(col("eq"), col("qe"), Dim).as("d2"))
    val truth = graft.operators.TopN(brute, Seq(col("q_id")),
      Seq(col("d2").asc, col("vec_id").asc), 5).select("q_id", "vec_id")
    val hits = truth.join(ivfpq.select("q_id", "vec_id"),
      Seq("q_id", "vec_id"), "left_semi").count()
    cand.unpersist()
    assert(hits >= 10, s"IVF x PQ recall@5 collapsed: $hits/50 hits")
  }
}
