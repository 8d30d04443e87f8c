package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join (gram-set Jaccard >= t) via prefix
  * filtering — the AllPairs/PPJoin scheme (Bayardo et al. WWW'07,
  * Xiao et al. WWW'08), the same family Flink-era batch dedup pipelines
  * use for scalable document similarity.
  *
  * Principle: order every doc's grams by one global total order
  * (ascending document frequency, rarest first). If jaccard(x, y) >= t,
  * the first |x| - ceil(t*|x|) + 1 grams of x and the first
  * |y| - ceil(t*|y|) + 1 grams of y MUST share an element, so candidate
  * pairs need only be generated from prefix-gram collisions; exact
  * Jaccard on the full gram arrays then verifies each candidate. No
  * false negatives — the output is IDENTICAL to the quadratic
  * formulation.
  *
  * 100 TB argument: a stop-gram ("of the") occurring in k docs makes
  * k^2 pairs in a naive inverted-index self-join — quadratic on
  * exactly the hottest buckets. Under prefix filtering, high-df grams
  * sort LAST within every doc and thus fall outside almost every
  * prefix, so the join touches ~0.4*|grams| rare grams per doc whose
  * postings lists are short by construction. Work stays near-linear in
  * corpus size and the shuffle keys (rare grams) are unskewed.
  */
object JaccardJoin {

  /** Candidate pairs from prefix-gram collisions, before verification.
    * Exposed for tests that bound candidate counts on skewed corpora.
    * Output: id1 < id2, distinct. */
  def candidates(docs: DataFrame, idCol: String, srcCol: String,
      gramsCol: String, threshold: Double): DataFrame =
    candidatesWithPrefixes(docs, idCol, srcCol, gramsCol, threshold)._1

  /** [[candidates]] plus the pinned prefix table feeding it, so
    * [[selfJoin]] can release those blocks the moment the candidate
    * set is materialized instead of leaving them to GC reaping. */
  private def candidatesWithPrefixes(docs: DataFrame, idCol: String,
      srcCol: String, gramsCol: String, threshold: Double)
      : (DataFrame, DataFrame) = {
    val t = threshold
    val exploded = docs.select(col(idCol).as("id"), col(srcCol).as("src"),
      size(col(gramsCol)).as("n"), explode(col(gramsCol)).as("g"))
    val dfreq = exploded.groupBy("src", "g").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("src"), col("id"))
      .orderBy(col("df").asc, col("g").asc)
    // The prefix frame (df-join + window) feeds BOTH sides of the
    // candidate self-join, so it is materialized once via
    // Materialize.pin — eager and lineage-cut like a persist, but the
    // blocks are reclaimed by the ContextCleaner when the frame goes
    // out of scope instead of leaking until session end.
    val prefixes = Materialize.pin(
      exploded.join(dfreq, Seq("src", "g"))
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") <= col("n") - ceil(col("n") * t) + 1)
        .select(col("src"), col("id"), col("g"), col("n"), col("rn")))
    // PPJoin pruning on top of the prefix collision (both exact):
    //  - length filter: J >= t forces t*|x| <= |y| <= |x|/t
    //  - position filter: overlap can be at most 1 + the grams remaining
    //    AFTER the shared prefix gram on each side, which must reach the
    //    required overlap t/(1+t)*(|x|+|y|)
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.src") === col("b.src") && col("a.g") === col("b.g") &&
          col("a.id") < col("b.id") &&
          col("b.n") >= col("a.n") * t && col("a.n") >= col("b.n") * t &&
          (lit(1) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn"))) >=
            (col("a.n") + col("b.n")) * (t / (1 + t)))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    (cand, prefixes)
  }

  /** Same-source pairs with exact Jaccard >= threshold over the gram
    * arrays. Output: id1, id2, jaccard. */
  def selfJoin(docs: DataFrame, idCol: String, srcCol: String,
      gramsCol: String, threshold: Double): DataFrame = {
    // `base` feeds the candidate generator plus both verification
    // joins; the cache is scoped to this call — `scored` (ids + 3 ints
    // per candidate, the gram arrays projected away) is materialized
    // eagerly below, after which base is released in the finally.
    val base = docs.select(col(idCol).as("id"), col(srcCol).as("src"),
        col(gramsCol).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (cand0, prefixes) =
        candidatesWithPrefixes(base, "id", "src", "grams", threshold)
      // Verification is COMPUTE-bound per candidate (array_intersect
      // over the full gram arrays), but the candidate set is only a
      // few ids+ints per row — AQE's size-based coalescing therefore
      // shrinks the post-distinct stage to ONE partition and the whole
      // verification runs serially (measured r16: a single 2.6 s
      // one-task stage inside q_ngram_jaccard). Explicit repartition
      // (user-specified count, which AQE must preserve) spreads the
      // verification across the session's parallelism; bytes moved are
      // trivial by the same argument that makes AQE coalesce them.
      // key on id1 ONLY: the distinct above already hash-partitions on
      // (id1, id2), so a repartition on the identical key set is
      // optimized away as redundant and the surviving
      // ENSURE_REQUIREMENTS exchange gets AQE-coalesced to one
      // partition again (measured — that elimination was exactly the
      // first version of this fix failing)
      val cand = cand0.repartition(
        cand0.sparkSession.sparkContext.defaultParallelism, col("id1"))
      // On a small corpus the verification joins must be BROADCAST:
      // the cached gram table sits just over the broadcast threshold,
      // so Catalyst picks sort-merge, whose ENSURE_REQUIREMENTS
      // exchanges AQE then coalesces to ONE ~1 MB partition — and the
      // array_intersect verification (the compute-heavy half of
      // PPJoin) runs serially above it, defeating the repartition
      // (measured r16: a single-task 2.6 s stage inside
      // q_ngram_jaccard). Broadcasting the gram side keeps the
      // verification fused 32-wide on the candidate partitions with no
      // gram-array shuffle at all. Size-gated like FanOut: on a corpus
      // past the gate the hint is not applied and verification runs as
      // a real co-partitioned join — the 100 TB shape.
      val verifyGate = docs.sparkSession.conf
        .get("spark.graft.jaccard.verifyBroadcastMaxBytes",
          (64L << 20).toString).toLong
      val gramSide: DataFrame => DataFrame =
        if (docs.queryExecution.optimizedPlan.stats.sizeInBytes
            <= verifyGate) broadcast _
        else identity _
      // The materialization boundary between scoring and the threshold
      // filter is deliberate: without it Catalyst pushes the jaccard
      // predicate into the join condition, where array_intersect is
      // evaluated twice per row in interpreted (non-codegen) mode.
      val scored = Materialize.pin(cand
        .join(gramSide(base.select(col("id").as("id1"),
          col("grams").as("g1"))), Seq("id1"))
        .join(gramSide(base.select(col("id").as("id2"),
          col("grams").as("g2"))), Seq("id2"))
        .select(col("id1"), col("id2"),
          size(array_intersect(col("g1"), col("g2"))).as("i"),
          size(col("g1")).as("n1"), size(col("g2")).as("n2")))
      // the candidate set is materialized in `scored`; the prefix
      // table's blocks can go now instead of waiting for GC
      Materialize.release(prefixes)
      scored
        .select(col("id1"), col("id2"),
          (col("i") * lit(1.0) / (col("n1") + col("n2") - col("i")))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
    } finally { base.unpersist(); () }
  }
}
