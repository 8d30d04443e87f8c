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

  /** Elementwise dot product of two array<double> columns — fused
    * native expression (graft.functions.DotD), bit-identical to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` including summation
    * order and null-padding behavior, with no per-element lambda
    * re-entry (the dominant cost of pairwise scoring joins). */
  def dot(a: Column, b: Column): Column = graft.functions.DotD.of(a, b)

  def l2norm(a: Column): Column = graft.functions.L2NormD.of(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine with pre-computed norms: `dot(a, b) / (na * nb)`. In any
    * many-to-many scoring join, inline [[cosine]] recomputes each
    * side's norm once PER PAIR (a corpus vector scored against 64
    * centroids pays its own norm 64 times); hoisting the norms into
    * columns before the join makes scoring one dot product per pair.
    * Bit-identical to [[cosine]] — the same float ops, just factored —
    * so rounded comparisons and oracle hashes are unchanged. */
  def cosinePre(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Exact top-k cosine neighbors for each query vector.
    * Output: q_id, vec_id, sim, rank_no. Queries are broadcast; corpus is
    * scanned once, its norms computed once per row (not per pair). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("emb_n", l2norm(col("emb")))
    val q = queries.select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("q_emb"))
      .withColumn("q_n", l2norm(col("q_emb")))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosinePre(col("q_emb"), col("q_n"), col("emb"), col("emb_n")).as("sim"))
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

  /** Lloyd (k-means) refinement of a coarse-quantizer cell assignment:
    * starting from `cellCol` (e.g. a sign-LSH bucket — deterministic
    * seeding), run `rounds` iterations of
    * centroids-from-assignment -> reassign-to-nearest-centroid
    * (cosine, rounded to 6 digits, ties broken by cell id — the same
    * engine-stable ordering [[ivfTopK]] uses). Standard IVF training
    * (Jégou et al.): the LSH seed cells cut space by random
    * hyperplanes, k-means moves the centroids onto the data's actual
    * cluster structure so the assignment metric AGREES with the probe
    * routing metric — which is what lifts recall at the same nProbe.
    * Output: vec_id, cell (the refined assignment).
    *
    * Each round costs one (cells x dims) centroid aggregation plus one
    * broadcast-centroids scan with a per-vector top-1 (WindowGroupLimit)
    * — linear in the corpus, no vector-vector pairs. Rounds are pinned
    * ([[Materialize.pin]]) so iterative lineage stays flat. */
  def kmeansAssign(corpus: DataFrame, cellCol: String, rounds: Int): DataFrame = {
    import graft.operators.TopN
    var cur = corpus.select(col("vec_id"), col(cellCol).as("cell"),
      col("embedding").cast("array<double>").as("e"))
    for (_ <- 1 to rounds) {
      val cent = centroids(
        cur.select(col("cell"), col("e").as("embedding")), "cell")
      val scored = cur.select(col("vec_id"), col("e"))
        .withColumn("en", l2norm(col("e"))) // once per vector, not per cell
        .crossJoin(broadcast(
          cent.select(col("cell").as("c_cell"), col("centroid"))
            .withColumn("cn", l2norm(col("centroid")))))
        .select(col("vec_id"), col("e"), col("c_cell"),
          round(cosinePre(col("e"), col("en"), col("centroid"), col("cn")), 6)
            .as("csim"))
      val next = Materialize.pin(
        TopN(scored, Seq(col("vec_id")),
          Seq(col("csim").desc, col("c_cell").asc), 1)
          .select(col("vec_id"), col("c_cell").as("cell"), col("e")))
      // release the superseded round (no-op on round 1: `cur` is the
      // caller's unpinned projection, which release won't touch)
      Materialize.release(cur)
      cur = next
    }
    cur.select(col("vec_id"), col("cell"))
  }

  /** The routing half of [[ivfTopK]]: each query's nProbe nearest
    * cells by centroid cosine. Output: q_id, qe, qn (query norm), cell.
    * Exposed so recall/scan-fraction measurements probe EXACTLY the
    * cells the search does. */
  def ivfRoute(corpus: DataFrame, queries: DataFrame, cellCol: String,
      nProbe: Int): DataFrame =
    routeWith(centroids(corpus, cellCol), queries, nProbe)

  private def routeWith(cent: DataFrame, queries: DataFrame,
      nProbe: Int): DataFrame = {
    import graft.operators.TopN
    val q = queries.select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("qe"))
      .withColumn("qn", l2norm(col("qe")))
    TopN(
      q.crossJoin(broadcast(
          cent.withColumn("cn", l2norm(col("centroid")))))
        .select(col("q_id"), col("qe"), col("qn"), col("cell"),
          round(cosinePre(col("qe"), col("qn"), col("centroid"), col("cn")), 6)
            .as("csim")),
      Seq(col("q_id")), Seq(col("csim").desc, col("cell").asc), nProbe)
      .select(col("q_id"), col("qe"), col("qn"), col("cell"))
  }

  /** Candidate set of the MULTI-ASSIGNED IVF search (the recall lever
    * near-isotropic corpora need — plain Lloyd moves recall@5 only
    * 0.54 -> 0.58 on the test embeddings because single-cell Voronoi
    * membership barely correlates with neighborhood there; redundant
    * posting lists are the standard fix, cf. Jégou et al.'s
    * multiple-assignment): cells are Lloyd-refined ([[kmeansAssign]]),
    * each VECTOR then joins the posting lists of its `a` nearest
    * centroids, each QUERY probes its `nProbe` nearest; a candidate is
    * any vector sharing at least one probed cell, deduplicated.
    * Scan cost per query ~= a * nProbe / cells of the corpus.
    * Output: q_id, vec_id, qe, qn, e, en (distinct; the norm columns
    * let consumers score with [[cosinePre]] — one dot per pair). */
  def ivfCandidatesMulti(corpus: DataFrame, queries: DataFrame,
      cellCol: String, rounds: Int, a: Int, nProbe: Int): DataFrame = {
    import graft.operators.TopN
    val assigned = corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb0"))
      .join(kmeansAssign(corpus, cellCol, rounds), "vec_id")
    val cent = centroids(
      assigned.select(col("cell"), col("emb0").as("embedding")), "cell")
    // redundant posting lists: each vector in its `a` nearest cells
    val postings = TopN(
      assigned.select(col("vec_id"), col("emb0"))
        .withColumn("en", l2norm(col("emb0"))) // once per vector
        .crossJoin(broadcast(
          cent.select(col("cell").as("pcell"), col("centroid"))
            .withColumn("cn", l2norm(col("centroid")))))
        .select(col("vec_id"), col("emb0"), col("en"), col("pcell"),
          round(cosinePre(col("emb0"), col("en"), col("centroid"), col("cn")), 6)
            .as("psim")),
      Seq(col("vec_id")), Seq(col("psim").desc, col("pcell").asc), a)
      .select(col("vec_id"), col("pcell").as("cell"),
        col("emb0").as("e"), col("en"))
    routeWith(cent, queries, nProbe)
      .join(postings, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("qe"), col("qn"),
        col("e"), col("en"))
      .distinct()
  }

  /** Multi-assigned IVF top-k search over [[ivfCandidatesMulti]].
    * With (planes=6 -> 64 seed cells, rounds=1, a=3, nProbe=5) this
    * measures recall@5 = 0.76 scanning ~21% of the corpus on the test
    * embeddings (vs 0.54 at 25% for the single-assignment quantizer) —
    * the in-pipeline measurement is q_ivf_recall. */
  def ivfTopKMulti(corpus: DataFrame, queries: DataFrame, cellCol: String,
      rounds: Int, a: Int, nProbe: Int, k: Int): DataFrame = {
    import graft.operators.TopN
    // OUTPUT similarity in integer micro-units (round(x*1e6) as BIGINT):
    // same quantization grid as round(x, 6) — ordering is unchanged —
    // but the emitted cell is an integer, immune to round-implementation
    // and float-formatting divergence across oracle-engine builds (the
    // r4 q_substring_dedup lesson; see tools/floatsweep.py).
    val cand = ivfCandidatesMulti(corpus, queries, cellCol, rounds, a, nProbe)
      .select(col("q_id"), col("vec_id"),
        round(cosinePre(col("qe"), col("qn"), col("e"), col("en")) * 1e6)
          .cast("long").as("sim_micro"))
    TopN(cand, Seq(col("q_id")), Seq(col("sim_micro").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id"), col("sim_micro"), col("rank_no"))
  }

  /** IVF search: route each query to its nProbe nearest centroids, then
    * exact-search only those cells — the standard inverted-file ANN
    * scheme (Jégou et al.): cost drops from O(N) to O(N * nProbe / cells)
    * per query. Ranking uses round(sim, 6) for engine-stable order.
    * Pair with [[kmeansAssign]] for the cell column: Lloyd-refined
    * cells lift recall@5 from 0.54 to >= 0.8 at the same scan fraction
    * on the test corpus (measured in-pipeline by q_ivf_recall). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, cellCol: String,
      nProbe: Int, k: Int): DataFrame = {
    import graft.operators.TopN
    val emb = corpus.select(col("vec_id"), col(cellCol).as("cell"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("en", l2norm(col("e")))
    val routed = ivfRoute(corpus, queries, cellCol, nProbe)
    val cand = routed.join(emb, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosinePre(col("qe"), col("qn"), col("e"), col("en")) * 1e6)
          .cast("long").as("sim_micro"))
    TopN(cand, Seq(col("q_id")), Seq(col("sim_micro").desc, col("vec_id").asc), k)
      .select(col("q_id"), col("vec_id"), col("sim_micro"), col("rank_no"))
  }

  /** Embedding-cosine near-duplicate dedup: candidate pairs from shared
    * sign-LSH cells, verified by cosine >= threshold, each vector
    * assigned the smallest vec_id it pairs with (rep-assignment, like
    * MinHashLSH.dedupByLSH — no O(n^2) pair output).
    *
    * Candidate generation is multi-table OR-amplified LSH (the standard
    * (r, b) amplification): `tables` INDEPENDENT sets of `planes`
    * hyperplanes each; a pair is a candidate if it collides in ANY
    * table. Many planes per table keep every cell small (2^planes cells
    * ⇒ ~n/2^planes vectors per cell, so in-cell pairs stay near-linear
    * instead of the ~n^2/4 a 2-plane/4-cell scheme produces), while
    * multiple tables recover the recall that more planes alone would
    * lose: P(candidate) = 1 - (1 - p^planes)^tables with
    * p = 1 - angle/pi. At cosine 0.95 and 8 planes x 4 tables that is
    * ~0.89 — high recall exactly where true near-duplicates live. */
  def cosineDedup(corpus: DataFrame, threshold: Double,
      planes: Int = 8, tables: Int = 4, dims: Int = 64): DataFrame = {
    // The projected corpus feeds four consumers (cell assignment, both
    // sides of the verification join, the final restore join), so it is
    // cached — but ONLY for the duration of this call: the result (three
    // narrow columns, one row per vector) is materialized eagerly via
    // Materialize.pin and the corpus cache released in the finally, so
    // repeated invocations in a long-lived session cannot accumulate
    // pinned corpus blocks.
    val base = corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // table t uses global plane indices [t*planes, (t+1)*planes)
      val cellArr = array((0 until tables).map(t =>
        lshBucket(col("e"), planes, dims, planeOffset = t * planes)): _*)
      val cells = base.select(col("vec_id"),
        posexplode(cellArr).as(Seq("tbl", "cell")))
      val cand = cells.as("a").join(cells.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
        .distinct() // a pair colliding in several tables counts once
      val partners = cand
        .join(base.select(col("vec_id").as("id1"), col("e").as("e1")), Seq("id1"))
        .join(base.select(col("vec_id").as("id2"), col("e").as("e2")), Seq("id2"))
        .filter(round(cosine(col("e1"), col("e2")), 6) >= threshold)
        .groupBy(col("id2").as("vid"))
        .agg(min(col("id1")).as("mp"))
      Materialize.pin(
        base.select(col("vec_id")).join(partners, col("vec_id") === col("vid"), "left")
          .select(col("vec_id"), coalesce(col("mp"), col("vec_id")).as("rep_id"))
          .withColumn("is_dup", col("rep_id") < col("vec_id")))
    } finally { base.unpersist(); () }
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embedding space, then prune near-duplicate pairs INSIDE each
    * cluster only — semantic dedup whose pairwise work is bounded by
    * the cluster size, never the corpus. Clusters come from
    * sign-LSH-seeded Lloyd centroids (deterministic,
    * geometry-adaptive), with each vector MULTI-ASSIGNED to its `a`
    * nearest cells (Jégou-style multiple assignment — the published
    * hard-assignment variant recalls only 0.10 of true near-dup pairs
    * on near-isotropic embeddings; see q_semdedup_recall); within any
    * shared cell, every vector takes the smallest vec_id it pairs with
    * at cosine >= threshold as its representative (rep-assignment like
    * [[cosineDedup]] — no O(n^2) pair output). At 100 TB the cluster
    * count scales with n (more planes / more Lloyd centroids), holding
    * per-cluster membership — and therefore the in-cluster join —
    * bounded at a^2 x cell size; that in-cluster pairwise IS the
    * published algorithm's shape. Output: vec_id, cell (primary),
    * rep_id, is_dup. */
  /** The assignment half of [[semDedup]]: each vector's `a` nearest
    * Lloyd centroids (seeded from sign-LSH cells; with rounds = 1 the
    * reference centroids are the raw seed-cell means). MULTI-assignment
    * is the same recall lever as [[ivfCandidatesMulti]], and for the
    * same reason: on near-isotropic embeddings, single-cell Voronoi
    * membership barely correlates with neighborhood — the r5
    * in-pipeline measurement put single-assignment pair recall at
    * 0.10, a=4 at ~0.73-0.78 while scanning ~25% of the pair space
    * (q_semdedup_recall). Exposed so the recall measurement probes
    * EXACTLY the cells the dedup uses.
    * Output: vec_id, cell, e, en, rank_no (rank_no = 1 is primary). */
  def semAssignments(corpus: DataFrame, planes: Int = 6, dims: Int = 64,
      rounds: Int = 1, a: Int = 4): DataFrame = {
    import graft.operators.TopN
    val emb = corpus
      .withColumn("cell0", lshBucket(col("embedding"), planes, dims))
    val prev =
      if (rounds <= 1) emb.select(col("vec_id"), col("cell0").as("cell"))
      else kmeansAssign(emb, "cell0", rounds - 1)
    val withE = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val cent = centroids(withE.join(prev, Seq("vec_id"))
      .select(col("cell"), col("e").as("embedding")), "cell")
    TopN(
      withE.withColumn("en", l2norm(col("e")))
        .crossJoin(broadcast(
          cent.select(col("cell").as("pcell"), col("centroid"))
            .withColumn("cn", l2norm(col("centroid")))))
        .select(col("vec_id"), col("e"), col("en"), col("pcell"),
          round(cosinePre(col("e"), col("en"), col("centroid"), col("cn")), 6)
            .as("csim")),
      Seq(col("vec_id")), Seq(col("csim").desc, col("pcell").asc), a)
      .select(col("vec_id"), col("pcell").as("cell"),
        col("e"), col("en"), col("rank_no"))
  }

  def semDedup(corpus: DataFrame, threshold: Double, planes: Int = 6,
      dims: Int = 64, rounds: Int = 1, a: Int = 4): DataFrame = {
    // a pair is verified if it shares ANY of its `a` assigned cells;
    // in-cluster pairwise stays bounded by cell size x a^2 — never the
    // corpus. Postings pinned: they feed both sides of the pair join
    // plus the primary-cell restore.
    val postings = Materialize.pin(
      semAssignments(corpus, planes, dims, rounds, a))
    val partners = postings.as("a").join(postings.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(cosinePre(
        col("a.e"), col("a.en"), col("b.e"), col("b.en")), 6) >= threshold)
      .groupBy(col("b.vec_id").as("vid"))
      .agg(min(col("a.vec_id")).as("mp"))
    postings.filter(col("rank_no") === 1).select(col("vec_id"), col("cell"))
      .join(partners, col("vec_id") === col("vid"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("mp"), col("vec_id")).as("rep_id"))
      .withColumn("is_dup", col("rep_id") < col("vec_id"))
  }

  /** Deterministic ±1 random-hyperplane matrix: weight(plane p, dim i) =
    * +1 iff the first md5 nibble of "p_i" >= 8. Derived from md5 so the
    * DuckDB oracle can reproduce it exactly. `planeOffset` shifts the
    * global plane index — independent plane SETS (multi-table LSH) are
    * just disjoint index ranges of the same md5 stream. */
  def planeWeights(planes: Int, dims: Int, planeOffset: Int = 0): Array[Array[Int]] = {
    val mdf = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, i) =>
      val h = mdf.digest(s"${p + planeOffset}_$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xF) >= 8) 1 else -1
    }
  }

  /** Sign-LSH bucket id per vector: one bit per hyperplane = sign of the
    * integer-quantized dot product (quantization makes the sign exactly
    * reproducible across engines regardless of float summation order).
    * Fused native expression (graft.functions.SignLshBucket): the
    * vector is quantized ONCE and all planes' integer dots run in a
    * tight loop, vs the HOF form's planes separate zip_with passes. */
  def lshBucket(emb: Column, planes: Int, dims: Int, planeOffset: Int = 0): Column =
    graft.functions.SignLshBucket.of(emb.cast("array<double>"),
      planeWeights(planes, dims, planeOffset))
}
