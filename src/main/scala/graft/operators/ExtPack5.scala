package graft.operators

import graft.{QueryPack, Tables => T}
import graft.ext.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators, part 5: the published Gopher
  * document-quality rule gate and a fastText-shaped hashed-linear
  * quality classifier.
  *
  * Same verification design as ExtPack..ExtPack4: bit-reproducible in
  * DuckDB. All pass/fail flags are derived from INTEGER
  * cross-multiplication (e.g. `5*n_alpha >= 4*n_words` instead of
  * `n_alpha/n_words >= 0.8`) so no float rounding can flip a flag
  * between engines. All shapes are linear: per-row higher-order
  * functions plus one explode+groupBy for the top-word share — the
  * same 100 TB posture as q_quality_repetition.
  */
object ExtPack5 extends QueryPack {

  /** The canonical stopword set ([[TextOps.stopwordsEn]]), also
    * interpolated into the oracle SQL below. */
  private val stops = TextOps.stopwordsEn
  private val stopsSql = stops.map(w => s"'$w'").mkString(", ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher rules (Rae et al. 2021, §A1.1 "Quality filtering"),
    // adapted to this corpus's single-space token stream (no lines, so
    // the bullet/ellipsis line rules don't apply; the word-level gates
    // do): word count bounds, mean word length bounds, stopword
    // presence, alphabetic-word fraction, and the repetition gate on
    // the most frequent word's share.
    //   flag_wc    : 20 <= n_words <= 1000
    //   flag_wlen  : 3 <= mean(word length) <= 10
    //   flag_stop  : >= 2 stopwords present
    //   flag_alpha : >= 80% of words contain an alphabetic char
    //   flag_rep   : most frequent word <= 20% of all words
    // Reference analog: the reference has no built-in quality gate;
    // this is the pipeline operator a corpus-prep user would run as a
    // Calc (fused project+filter) node
    // (flink-table-planner .../batch/BatchExecCalc.java:43).
    "q_gopher_rules" -> ((s, d) => {
      import s.implicits._
      val base = T.documents(s, d)
        .withColumn("ws", TextOps.tokens($"text"))
      val nWords = size($"ws").cast("long")
      val sumLen = aggregate(transform($"ws", t => length(t).cast("long")),
        lit(0L), (a, x) => a + x)
      val nStop = size(filter($"ws", t =>
        array_contains(array(stops.map(lit): _*), t))).cast("long")
      val nAlpha = size(filter($"ws", t => t.rlike("[a-z]"))).cast("long")
      val perDoc = base.select(
        $"doc_id", nWords.as("n_words"), sumLen.as("sum_len"),
        nStop.as("n_stop"), nAlpha.as("n_alpha"))
      val top = base.select($"doc_id", explode($"ws").as("w"))
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("top_c"))
      perDoc.join(top, Seq("doc_id"))
        .select(
          $"doc_id", $"n_words", $"n_stop",
          // mean word length in integer centi-chars: exact in both
          // engines (BIGINT floor division; Scala `/` on Columns is
          // double division, so use SQL `div`)
          expr("sum_len * 100 div n_words").as("mean_wlen_x100"),
          ($"n_words" >= 20L && $"n_words" <= 1000L).as("flag_wc"),
          ($"sum_len" >= $"n_words" * 3L &&
            $"sum_len" <= $"n_words" * 10L).as("flag_wlen"),
          ($"n_stop" >= 2L).as("flag_stop"),
          ($"n_alpha" * 5L >= $"n_words" * 4L).as("flag_alpha"),
          ($"top_c" * 5L <= $"n_words").as("flag_rep"),
          ($"n_words" >= 20L && $"n_words" <= 1000L &&
            $"sum_len" >= $"n_words" * 3L &&
            $"sum_len" <= $"n_words" * 10L &&
            $"n_stop" >= 2L &&
            $"n_alpha" * 5L >= $"n_words" * 4L &&
            $"top_c" * 5L <= $"n_words").as("pass"))
    }),

    // CCNet head/middle/tail selection (Wenzek et al. 2020 §4.4): per
    // language, rank documents by LM perplexity into terciles and keep
    // head+middle — the published pipeline's selection step on top of
    // q_ngram_lm_ppl's scores (reused directly; micro-nat integers, so
    // ordering is exact in both engines; ties broken by doc_id).
    // Scale note: ntile is a per-language global sort — exact, and the
    // oracle-comparable form. At 100 TB the production swap is fixed
    // per-language CUTPOINTS (approx_percentile over a sample,
    // broadcast, map-side filter — CCNet itself uses precomputed
    // thresholds); the output contract is identical except at the
    // tercile boundary rows.
    "q_ccnet_buckets" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang")
        .orderBy($"avg_nll_micronat".asc, $"doc_id".asc)
      ExtPack4.queries("q_ngram_lm_ppl")(s, d)
        .join(T.documents(s, d).select($"doc_id", $"lang"), Seq("doc_id"))
        .withColumn("tercile", ntile(3).over(w).cast("long"))
        .select($"doc_id", $"lang", $"avg_nll_micronat", $"tercile",
          when($"tercile" === 1, "head").when($"tercile" === 2, "middle")
            .otherwise("tail").as("bucket"),
          ($"tercile" < 3).as("keep"))
    }),

    // fastText-shaped linear quality classifier (Joulin et al. 2016):
    // score(doc) = sum over tokens of weight[h(token)] with a hashed
    // feature table. The "trained" weights are a deterministic
    // function of the feature hash so both engines reproduce them
    // exactly: h(t) = (37*len(t) + ascii(t[0])) % 13, weight = h - 6
    // (integer micro-logits in [-6, +6]). Real deployments swap the
    // weight expression for a broadcast-joined learned table — the
    // plan shape (per-row HOF sum, no shuffle) is identical, which is
    // what matters at 100 TB.
    "q_quality_classifier" -> ((s, d) => {
      import s.implicits._
      val score = aggregate(
        transform(TextOps.tokens($"text"),
          t => ((length(t) * 37 + ascii(substring(t, 1, 1))) % 13 - 6)
            .cast("long")),
        lit(0L), (a, x) => a + x)
      T.documents(s, d).select(
        $"doc_id",
        score.as("score"),
        (score > 0L).as("label_keep"))
    }),

    // Z-order (Morton) clustering key (ext/ZOrder.scala): the
    // multi-dimensional data-layout sort key that makes parquet
    // min/max pruning work for conjunctive (partkey, suppkey) filters
    // at 100 TB. Pure shiftleft/mask BIGINT arithmetic — whole-stage
    // codegen in Spark, bit-identical `<<`/`&`/`|` in the DuckDB
    // oracle. The locality property itself (contiguous z-ranges are
    // small rectangles) is pinned in ZOrderSpec.
    "q_zorder" -> ((s, d) => {
      import s.implicits._
      import graft.ext.ZOrder
      val li = T.lineitem(s, d)
      val bounds = li.agg(
        min($"l_partkey").as("amin"), max($"l_partkey").as("amax"),
        min($"l_suppkey").as("bmin"), max($"l_suppkey").as("bmax"))
      li.crossJoin(broadcast(bounds))
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          ZOrder.interleave16(
            ZOrder.quantize($"l_partkey", $"amin", $"amax"),
            ZOrder.quantize($"l_suppkey", $"bmin", $"bmax")).as("zval"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_zorder" ->
      """WITH b AS (
           SELECT min(l_partkey) AS amin, max(l_partkey) AS amax,
                  min(l_suppkey) AS bmin, max(l_suppkey) AS bmax
           FROM lineitem),
         q AS (
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                  CASE WHEN amax <= amin THEN 0
                       ELSE ((l_partkey - amin) * 65535) // (amax - amin)
                  END AS qa,
                  CASE WHEN bmax <= bmin THEN 0
                       ELSE ((l_suppkey - bmin) * 65535) // (bmax - bmin)
                  END AS qb
           FROM lineitem, b),
         s AS (
           SELECT l_orderkey, l_linenumber,
                  (qa & 65535) AS a0,
                  ((a0 | (a0 << 8)) & 16711935) AS a1,
                  ((a1 | (a1 << 4)) & 252645135) AS a2,
                  ((a2 | (a2 << 2)) & 858993459) AS a3,
                  ((a3 | (a3 << 1)) & 1431655765) AS a4,
                  (qb & 65535) AS b0,
                  ((b0 | (b0 << 8)) & 16711935) AS b1,
                  ((b1 | (b1 << 4)) & 252645135) AS b2,
                  ((b2 | (b2 << 2)) & 858993459) AS b3,
                  ((b3 | (b3 << 1)) & 1431655765) AS b4
           FROM q)
         SELECT l_orderkey, l_linenumber,
                CAST(a4 | (b4 << 1) AS BIGINT) AS zval
         FROM s""",
    "q_gopher_rules" ->
      s"""WITH base AS (
           SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         ), perdoc AS (
           SELECT doc_id,
                  CAST(len(ws) AS BIGINT) AS n_words,
                  CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len,
                  CAST(len(list_filter(ws, w -> w IN ($stopsSql))) AS BIGINT) AS n_stop,
                  CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha
           FROM base
         ), top AS (
           SELECT doc_id, CAST(max(c) AS BIGINT) AS top_c FROM (
             SELECT doc_id, w, count(*) AS c
             FROM (SELECT doc_id, unnest(ws) AS w FROM base)
             GROUP BY doc_id, w)
           GROUP BY doc_id
         )
         SELECT p.doc_id, p.n_words, p.n_stop,
                CAST(p.sum_len * 100 // p.n_words AS BIGINT) AS mean_wlen_x100,
                (p.n_words >= 20 AND p.n_words <= 1000) AS flag_wc,
                (p.sum_len >= p.n_words * 3 AND p.sum_len <= p.n_words * 10) AS flag_wlen,
                (p.n_stop >= 2) AS flag_stop,
                (p.n_alpha * 5 >= p.n_words * 4) AS flag_alpha,
                (t.top_c * 5 <= p.n_words) AS flag_rep,
                (p.n_words >= 20 AND p.n_words <= 1000
                 AND p.sum_len >= p.n_words * 3 AND p.sum_len <= p.n_words * 10
                 AND p.n_stop >= 2
                 AND p.n_alpha * 5 >= p.n_words * 4
                 AND t.top_c * 5 <= p.n_words) AS pass
         FROM perdoc p JOIN top t USING (doc_id)""",
    // LM score CTEs shared verbatim with q_ngram_lm_ppl's oracle
    // (ExtPack4.PplCtes) so the two can never disagree on the scores
    "q_ccnet_buckets" ->
      s"""WITH ${ExtPack4.PplCtes},
         ppl AS (
           SELECT d.doc_id, d.lang,
                  CAST(CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0
                       ELSE nll // n_bigrams END AS BIGINT)
                    AS avg_nll_micronat
           FROM documents d LEFT JOIN per USING (doc_id)),
         ranked AS (
           SELECT doc_id, lang, avg_nll_micronat,
                  CAST(ntile(3) OVER (PARTITION BY lang
                    ORDER BY avg_nll_micronat ASC, doc_id ASC) AS BIGINT)
                    AS tercile
           FROM ppl)
         SELECT doc_id, lang, avg_nll_micronat, tercile,
                CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS bucket,
                (tercile < 3) AS keep
         FROM ranked""",
    "q_quality_classifier" ->
      """SELECT doc_id,
                CAST(list_sum(list_transform(string_split(text, ' '),
                  t -> (length(t) * 37 + ascii(t[1])) % 13 - 6)) AS BIGINT) AS score,
                CAST(list_sum(list_transform(string_split(text, ' '),
                  t -> (length(t) * 37 + ascii(t[1])) % 13 - 6)) AS BIGINT) > 0 AS label_keep
         FROM documents"""
  )
}
