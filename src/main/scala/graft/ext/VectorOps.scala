package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector operators: cosine similarity, brute-force top-k
  * neighbor search, and sign-LSH bucketing as the approximate/scale
  * path (north-star ext surface).
  *
  * 100 TB posture: queries are broadcast against the corpus (no corpus
  * shuffle); top-k goes through the row_number<=k pattern which Catalyst
  * executes as WindowGroupLimit (per-map-task top-k before the single
  * small shuffle). Sign-LSH bucket assignment is per-row and narrow;
  * bucketed search turns an O(N*Q) scan into O(N/2^planes * Q) per
  * bucket probe — the standard random-hyperplane scheme (Charikar '02).
  */
object VectorOps {

  /** Elementwise dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * Output: q_id, vec_id, sim, rank_no. Queries are broadcast; corpus is
    * scanned once. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosine(col("q_emb"), col("emb")).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank_no", row_number().over(w).cast("long"))
      .filter(col("rank_no") <= k)
  }

  /** Per-label centroids (IVF coarse quantizer): mean vector per cell.
    * posexplode -> per-(cell,dim) mean -> re-assembled ordered array.
    * Two shuffles over (cells x dims) rows — independent of corpus
    * width, so it scales to billions of vectors. */
  def centroids(corpus: DataFrame, cellCol: String): DataFrame =
    corpus
      .select(col(cellCol).as("cell"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("v")).as("cv"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("centroid"))

  /** IVF search: route each query to its nProbe nearest centroids, then
    * exact-search only those cells — the standard inverted-file ANN
    * scheme (Jégou et al.): cost drops from O(N) to O(N * nProbe / cells)
    * per query. Ranking uses round(sim, 6) for engine-stable order. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, cellCol: String,
      nProbe: Int, k: Int): DataFrame = {
    import graft.operators.TopN
    val emb = corpus.select(col("vec_id"), col(cellCol).as("cell"),
      col("embedding").cast("array<double>").as("e"))
    val cent = centroids(corpus, cellCol)
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("qe"))
    val routed = TopN(
      q.crossJoin(broadcast(cent))
        .select(col("q_id"), col("qe"), col("cell"),
          round(cosine(col("qe"), col("centroid")), 6).as("csim")),
      Seq(col("q_id")), Seq(col("csim").desc, col("cell").asc), nProbe)
      .select(col("q_id"), col("qe"), col("cell"))
    val cand = routed.join(emb, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("qe"), col("e")), 6).as("sim"))
    TopN(cand, Seq(col("q_id")), Seq(col("sim").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id"), col("sim"), col("rank_no"))
  }

  /** Embedding-cosine near-duplicate dedup: candidate pairs from shared
    * sign-LSH cells, verified by cosine >= threshold, each vector
    * assigned the smallest vec_id it pairs with (rep-assignment, like
    * MinHashLSH.dedupByLSH — no O(n^2) pair output). Fewer planes =
    * higher recall at more candidate cost; tune per corpus density. */
  def cosineDedup(corpus: DataFrame, threshold: Double,
      planes: Int = 2, dims: Int = 64): DataFrame = {
    val emb = corpus.select(col("vec_id"),
        lshBucket(col("embedding"), planes, dims).as("cell"),
        col("embedding").cast("array<double>").as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partners = emb.as("a").join(emb.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(cosine(col("a.e"), col("b.e")), 6) >= threshold)
      .groupBy(col("b.vec_id").as("vid"))
      .agg(min(col("a.vec_id")).as("mp"))
    emb.select(col("vec_id")).join(partners, col("vec_id") === col("vid"), "left")
      .select(col("vec_id"), coalesce(col("mp"), col("vec_id")).as("rep_id"))
      .withColumn("is_dup", col("rep_id") < col("vec_id"))
  }

  /** Deterministic ±1 random-hyperplane matrix: weight(plane p, dim i) =
    * +1 iff the first md5 nibble of "p_i" >= 8. Derived from md5 so the
    * DuckDB oracle can reproduce it exactly. */
  def planeWeights(planes: Int, dims: Int): Array[Array[Int]] = {
    val mdf = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, i) =>
      val h = mdf.digest(s"${p}_$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xF) >= 8) 1 else -1
    }
  }

  /** Sign-LSH bucket id per vector: one bit per hyperplane = sign of the
    * integer-quantized dot product (quantization makes the sign exactly
    * reproducible across engines regardless of float summation order). */
  def lshBucket(emb: Column, planes: Int, dims: Int): Column = {
    val w = planeWeights(planes, dims)
    val bits = (0 until planes).map { p =>
      val weights = array(w(p).map(x => lit(x.toLong)): _*)
      val qdot = aggregate(
        zip_with(emb.cast("array<double>"), weights,
          (e, wt) => round(e * 1000).cast("long") * wt),
        lit(0L), (acc, x) => acc + x)
      when(qdot >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
