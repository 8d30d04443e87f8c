package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for memory-compressed ANN (north-star ext
  * op; Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011). The 100-TB problem it solves: a brute or IVF
  * scan must hold full vectors (dim x 4 bytes); PQ stores one byte per
  * BLOCK (m bytes per vector — 16x smaller at dim=64/m=16/k=256) and
  * scores a probe with m table lookups + adds instead of dim
  * multiplies. The
  * classic deployment is IVF (ext/VectorOps.ivfSearch cells) for
  * candidate pruning + PQ codes for in-cell scoring; this module is
  * the PQ half, composable with either full-corpus or cell-restricted
  * scans.
  *
  * Everything is INTEGER-exact so the DuckDB oracle can replay it
  * bit-for-bit (the q_dsir / q_token_entropy micro-unit lesson):
  * vectors quantize to milli-units (round(x*1000) as BIGINT) before
  * any distance math, all distances are integer L2-squared, and every
  * argmin tie breaks on the lowest centroid id. The codebook is
  * data-derived but deterministic: the k vectors with the smallest
  * md5-derived hash (tokenHash32('pq_' || vec_id), the cross-engine
  * hash used by the MinHash family) seed the centroids — sampled
  * codebooks rather than Lloyd-refined ones, trading some quantization
  * error for full engine-independence (a Lloyd pass would need
  * float averaging that no oracle can replay exactly; at deploy time
  * swap [[codebook]] for a trained table — every downstream op reads
  * only (b, cid, cvec)).
  *
  * Scale shape: encode is a broadcast join of the m·k centroid-block
  * table against N·m vector blocks (map-side, one shuffle to fold the
  * argmin per (vec, block)); search is a broadcast of the Q·m·k ADC
  * lookup table against the N·m code rows (map-side) + one shuffle to
  * sum per (query, vector). No pairwise vector×vector work anywhere.
  */
object ProductQuantization {

  /** Milli-unit integer vectors: (vec_id, eq: array<bigint>). Cast to
    * double FIRST (exact widening) so Spark and DuckDB round the same
    * binary value. */
  def quantize(emb: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    emb.select(col(idCol).as("vec_id"),
      transform(col(embCol).cast("array<double>"),
        x => round(x * 1000).cast("long")).as("eq"))

  /** Integer squared L2 between two equal-length bigint arrays. */
  def l2sq(x: Column, c: Column): Column =
    aggregate(zip_with(x, c, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  /** Statically-unrolled integer squared L2 for a KNOWN length: n
    * scalar (x[i]-c[i])^2 terms instead of a zip_with lambda — stays
    * in whole-stage codegen with no per-row array allocation, which
    * matters because encode evaluates this N x m x k times (the 4-dim
    * block distance is the single hottest expression in the module;
    * the HOF form benched ~3x slower on the encode join). */
  def l2sqFixed(x: Column, c: Column, n: Int): Column =
    (1 to n).map { i =>
      val d = element_at(x, i) - element_at(c, i)
      d * d
    }.reduce(_ + _)

  /** Deterministic seed codebook: the k hash-smallest vectors, split
    * into m blocks of dim/m. Returns (b, cid, cvec). The global
    * order-by-limit lowers to TakeOrderedAndProject (distributed
    * top-k, no full sort); the k-row window that assigns cid runs on
    * k rows only. */
  def codebook(q: DataFrame, m: Int, k: Int, dim: Int): DataFrame = {
    val bs = dim / m
    val seeds = q
      .withColumn("h", TextOps.tokenHash32(concat(lit("pq_"), col("vec_id"))))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .withColumn("cid",
        row_number().over(Window.orderBy(col("h"), col("vec_id"))) - 1)
    seeds
      .select(col("cid"), explode(sequence(lit(0), lit(m - 1))).as("b"),
        col("eq"))
      .select(col("b"), col("cid"),
        slice(col("eq"), col("b") * bs + 1, lit(bs)).as("cvec"))
  }

  /** (vec_id, b, xvec): each vector exploded into its m blocks. */
  def blockize(q: DataFrame, m: Int, dim: Int): DataFrame = {
    val bs = dim / m
    q.select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("b"),
        col("eq"))
      .select(col("vec_id"), col("b"),
        slice(col("eq"), col("b") * bs + 1, lit(bs)).as("xvec"))
  }

  /** PQ codes: (vec_id, b, code) — nearest centroid per block, ties to
    * the lowest cid (min over (d2, cid) structs — one shuffle). */
  def encode(vecBlocks: DataFrame, cents: DataFrame, bs: Int): DataFrame =
    vecBlocks.join(broadcast(cents), "b")
      .withColumn("d2", l2sqFixed(col("xvec"), col("cvec"), bs))
      .groupBy(col("vec_id"), col("b"))
      .agg(min(struct(col("d2"), col("cid"))).as("mc"))
      .select(col("vec_id"), col("b"), col("mc.cid").as("code"))

  /** ADC lookup table for a query set: (q_id, b, cid, qd2) — the
    * distance from each query's block to each centroid. Q·m·k rows;
    * broadcast it against the code table. */
  def lut(queryBlocks: DataFrame, cents: DataFrame, bs: Int): DataFrame =
    queryBlocks.join(broadcast(cents), "b")
      .select(col("vec_id").as("q_id"), col("b"), col("cid"),
        l2sqFixed(col("xvec"), col("cvec"), bs).as("qd2"))

  /** Asymmetric-distance top-k: approximate distance = sum over blocks
    * of the query-to-centroid table entry for the vector's code.
    * One broadcast join + one shuffle on (q_id, vec_id); the window
    * lowers to WindowGroupLimit (per-task top-k before the shuffle). */
  def search(codes: DataFrame, lutDf: DataFrame, k: Int): DataFrame = {
    // alias the lut side: codes and lut can share lineage (both derive
    // from the same vector scan), and dataframe("b") === dataframe("b")
    // on shared lineage resolves to a trivially-true self-comparison
    val lutA = lutDf.select(col("q_id"), col("b").as("lut_b"),
      col("cid"), col("qd2"))
    val adc = codes
      .join(broadcast(lutA),
        col("b") === col("lut_b") && col("code") === col("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("qd2")).as("adist"))
    graft.operators.TopN(adc, Seq(col("q_id")),
      Seq(col("adist").asc, col("vec_id").asc), k)
  }

  /** IVF x PQ — the classic composition: score with ADC only the
    * (q_id, vec_id) CANDIDATE pairs an IVF router produced (e.g.
    * `VectorOps.ivfCandidatesMulti`), instead of the whole corpus.
    * At 100 TB this is the full deployment: cells prune the scan to
    * nProbe posting lists, codes shrink what the scan reads to m
    * bytes/vector. Same determinism contract as [[search]]. */
  def searchCandidates(candPairs: DataFrame, codes: DataFrame,
      lutDf: DataFrame, k: Int): DataFrame = {
    // distinct() defends the sum: a duplicate candidate pair (easy to
    // produce from a multi-probe router) would silently double adist
    val adc = candPairs.select(col("q_id"), col("vec_id")).distinct()
      .join(codes, "vec_id")
      .withColumnRenamed("code", "cid")
      .join(broadcast(lutDf), Seq("q_id", "b", "cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("qd2")).as("adist"))
    graft.operators.TopN(adc, Seq(col("q_id")),
      Seq(col("adist").asc, col("vec_id").asc), k)
  }
}
