package graft

import graft.operators.ExtPack4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the ExtPack4 pipeline operators (the DuckDB
  * hash parity itself is covered by Verify/diffcheck; these pin the
  * properties the hashes alone don't explain). */
class ExtPack4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("q_line_dedup keeps each distinct line exactly once globally") {
    val out = ExtPack4.queries("q_line_dedup")(spark, sf)
    import spark.implicits._

    val docs = Tables.documents(spark, sf)
    val inst = docs.select($"doc_id",
      posexplode(transform(sequence(lit(1), size(split($"text", " ")), lit(10)),
        i => array_join(slice(split($"text", " "), i, lit(10)), " ")))
        .as(Seq("pos0", "line")))
    val nDistinct = inst.select($"line").distinct().count()
    val totalKept = out.agg(sum($"n_kept")).as[Long].collect().head

    // C4 keep-first: the kept instances across the corpus are exactly
    // one per distinct line
    assert(totalKept === nDistinct)
    // every doc is present, n_kept <= n_lines, and empty kept_text
    // only when n_kept == 0
    assert(out.count() === docs.count())
    assert(out.filter($"n_kept" > $"n_lines").count() === 0)
    assert(out.filter($"n_kept" === 0 && $"kept_text" =!= "").count() === 0)
    // reconstruction: a doc with all lines kept reproduces its text
    val intact = out.filter($"n_kept" === $"n_lines")
      .join(docs, Seq("doc_id"))
      .filter($"kept_text" =!= $"text")
    assert(intact.count() === 0)
  }

  test("q_dsir scores target-language docs above the pool") {
    val out = ExtPack4.queries("q_dsir")(spark, sf)
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val joined = out.join(docs.select($"doc_id", $"lang"), Seq("doc_id"))

    // bigram accounting: n_bigrams == max(tokens - 1, 0) per doc
    val bad = joined.join(
        docs.select($"doc_id",
          greatest(size(split($"text", " ")) - 1, lit(0)).cast("long")
            .as("expect_bg")), Seq("doc_id"))
      .filter($"n_bigrams" =!= $"expect_bg")
    assert(bad.count() === 0)

    // the importance weight must separate the target distribution:
    // mean log-weight of en docs strictly above every other language's
    val means = joined.groupBy($"lang")
      .agg(avg($"log_weight_micronats").as("m"))
      .as[(String, Double)].collect().toMap
    val enMean = means("en")
    means.filter(_._1 != "en").foreach { case (lang, m) =>
      assert(enMean > m, s"en mean $enMean not above $lang mean $m")
    }
  }

  test("q_ngram_lm_ppl: NLL accounting is exact and the LM separates " +
      "its training slice from held-out docs") {
    val out = ExtPack4.queries("q_ngram_lm_ppl")(spark, sf)
    import spark.implicits._
    val docs = Tables.documents(spark, sf)

    // bigram accounting: n_bigrams == max(tokens - 1, 0); NLL of a
    // Laplace-smoothed model is strictly positive for any scored doc;
    // the average is the integer quotient of the BIGINT sum.
    val bad = out.join(
        docs.select($"doc_id",
          greatest(size(split($"text", " ")) - 1, lit(0)).cast("long")
            .as("expect_bg")), Seq("doc_id"))
      .filter($"n_bigrams" =!= $"expect_bg"
        || ($"n_bigrams" > 0 && $"nll_micronats" <= 0)
        || ($"n_bigrams" > 0
             && $"avg_nll_micronat" =!= expr("nll_micronats div n_bigrams")))
    assert(bad.count() === 0)

    // the filter signal: docs the LM was trained on (doc_id % 4 == 0)
    // must average lower per-token NLL than held-out docs — their
    // bigrams all carry count mass. This is the property a perplexity
    // threshold keeps/drops on.
    val Array((trainM, heldM)) = out
      .agg(avg(when(pmod($"doc_id", lit(4L)) === 0, $"avg_nll_micronat")),
        avg(when(pmod($"doc_id", lit(4L)) =!= 0, $"avg_nll_micronat")))
      .as[(Double, Double)].collect()
    assert(trainM < heldM,
      s"train mean $trainM not below held-out mean $heldM")
  }

  test("q_semdedup: dup pairs share a cluster and clear the cosine bar") {
    val out = ExtPack4.queries("q_semdedup")(spark, sf)
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))

    assert(out.count() === emb.count())
    // rep-assignment basics: rep never above the member, flag consistent
    assert(out.filter($"rep_id" > $"vec_id").count() === 0)
    assert(out.filter($"is_dup" =!= ($"rep_id" < $"vec_id")).count() === 0)
    // every flagged pair clears the cosine bar (pairs come from shared
    // MULTI-assigned cells, so primary `cell` equality is NOT implied;
    // the verification filter is the correctness boundary)
    val pairs = out.filter($"is_dup")
    val scored = pairs
      .join(emb.select($"vec_id", $"e"), Seq("vec_id"))
      .join(emb.select($"vec_id".as("rep_id"), $"e".as("re")), Seq("rep_id"))
      .filter(round(ext.VectorOps.cosine($"e", $"re"), 6) < 0.4)
    assert(scored.count() === 0)
  }

  test("q_semdedup_recall reports the multi-assignment recall lift " +
      "(>= 0.5 on the sample; single assignment measured 0.10)") {
    val r = ExtPack4.queries("q_semdedup_recall")(spark, sf).head()
    val ppm = r.getAs[Long]("recall_ppm")
    assert(ppm >= 500000L && ppm <= 1000000L, s"recall_ppm = $ppm")
  }

  test("q_fuzzy_decontam separates docs by true benchmark set-Jaccard") {
    val out = ExtPack4.queries("q_fuzzy_decontam")(spark, sf)
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", array_distinct(split($"text", " ")).as("t"))
    assert(out.count() === docs.filter($"doc_id" >= 5).count())
    assert(out.filter($"contaminated_fuzzy" =!= ($"n_bench_hits" > 0))
      .count() === 0)
    // band collisions are Jaccard evidence: the flagged population's
    // best set-Jaccard against the benchmark must exceed the
    // unflagged population's on average
    val bench = docs.filter($"doc_id" < 5)
      .select($"t".as("bt")).collect().map(_.getSeq[String](0).toSet)
    val bBc = spark.sparkContext.broadcast(bench)
    val withJ = docs.filter($"doc_id" >= 5).as[(Long, Seq[String])]
      .map { case (id, t) =>
        val ts = t.toSet
        val j = bBc.value.map(b =>
          ts.intersect(b).size.toDouble / ts.union(b).size).max
        (id, j)
      }.toDF("doc_id", "max_jac")
    val agg = out.join(withJ, Seq("doc_id"))
      .groupBy($"contaminated_fuzzy").agg(avg($"max_jac").as("mj"))
      .as[(Boolean, Double)].collect().toMap
    if (agg.contains(true) && agg.contains(false))
      assert(agg(true) > agg(false),
        s"flagged mean jaccard ${agg(true)} not above unflagged ${agg(false)}")
  }

  test("scale-critical plan shapes: small sides broadcast, corpus scanned once") {
    // q_dsir: the 256-row bucket table and the totals row must ride
    // broadcast joins (the corpus-side explode is never shuffled for
    // the scoring join)
    val dsirPlan = ExtPack4.queries("q_dsir")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(dsirPlan.contains("BroadcastHashJoin") ||
      dsirPlan.contains("BroadcastNestedLoopJoin"), dsirPlan.take(2000))
    // q_fuzzy_decontam: the benchmark band table rides a broadcast
    // hash join against the corpus bands
    val fdPlan = ExtPack4.queries("q_fuzzy_decontam")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(fdPlan.contains("BroadcastHashJoin"), fdPlan.take(2000))
  }

  test("q_cms_heavyhitters: admissible everywhere, sketch rides a " +
      "broadcast, corpus never scanned per hash row") {
    val df = ExtPack4.queries("q_cms_heavyhitters")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // CMS never under-estimates — the sketch invariant must hold on
    // every emitted heavy hitter
    assert(rows.forall(_.getAs[Boolean]("admissible")))
    val whole = df.queryExecution.executedPlan.toString
    // an executed AQE plan prints Final AND Initial sections — count
    // scans in the final plan only
    val p = whole.split("== Initial Plan ==").head
    // the d x w sketch (<= 4096 rows) must broadcast to the probe side
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // sketch pass + exact-count pass: 2 scans, NOT one per hash row
    assert("Scan parquet".r.findAllIn(p).length <= 2, p.take(2000))
  }

  test("q_epoch_shard positions are the dense per-shard rank of the hash order") {
    val out = ExtPack4.queries("q_epoch_shard")(spark, sf)
    import spark.implicits._
    val docs = Tables.documents(spark, sf)

    // dense positions: per shard, positions are exactly 1..count
    val perShard = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos_in_shard").as("mx"),
        min($"pos_in_shard").as("mn"),
        countDistinct($"pos_in_shard").as("nd"))
    assert(perShard.filter($"mx" =!= $"n" || $"mn" =!= 1 || $"nd" =!= $"n")
      .count() === 0)
    assert(out.count() === docs.count())

    // parity with the single-node window formulation (the thing
    // PrefixSum replaces at scale must give identical ranks)
    val ids = docs.select($"doc_id",
      (ext.TextOps.tokenHash32(concat(lit("shard_"), $"doc_id")) % 8L)
        .as("shard"),
      (ext.TextOps.tokenHash32(concat(lit("pos42_"), $"doc_id"))
        * 2147483648L + $"doc_id").as("k"))
    val viaWindow = ids.select($"doc_id", $"shard",
      row_number().over(Window.partitionBy($"shard").orderBy($"k"))
        .cast("long").as("pos_in_shard"))
    assert(out.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(out).count() === 0)

    // determinism: a second evaluation yields the identical assignment
    val again = ExtPack4.queries("q_epoch_shard")(spark, sf)
    assert(out.exceptAll(again).count() === 0)
  }
}
