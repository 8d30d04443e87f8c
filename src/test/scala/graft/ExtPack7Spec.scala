package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExtPack7's non-oracle properties: CDC chunking shift-resistance and
  * the MAD gate's robustness claim (PQ invariants live in PqSpec).
  */
class ExtPack7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunkHashes(rows: Seq[(Long, String)]): Map[Long, Set[String]] =
    graft.ext.TextOps.cdcChunks(rows.toDF("doc_id", "text"), mod = 8)
      .select($"doc_id", $"chunk_hash").as[(Long, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("CDC chunking is shift-resistant: a prefix edit redraws at most " +
      "the first chunk; fixed-size chunking shares almost nothing") {
    val toks = (0 until 120).map(i => s"w${i * 37 % 211}")
    val base = toks.mkString(" ")
    val shifted = "injected boilerplate header " + base
    val h = chunkHashes(Seq((1L, base), (2L, shifted)))
    val shared = h(1L).intersect(h(2L)).size
    // every boundary after the edit re-synchronizes on content, so all
    // chunks except the one containing the insertion point survive
    assert(shared >= h(1L).size - 1,
      s"expected all but one chunk to survive the prefix edit: " +
        s"shared $shared of ${h(1L).size}")
    // contrast: fixed 8-token windows of the shifted doc share NO
    // window with the base (every window is offset by 4 tokens)
    val fixedBase = toks.grouped(8).map(_.mkString(" ")).toSet
    val fixedShifted = ("injected boilerplate header".split(" ") ++ toks)
      .grouped(8).map(_.mkString(" ")).toSet
    assert(fixedBase.intersect(fixedShifted).isEmpty,
      "fixed-size chunks should all shift (this is the failure mode " +
        "CDC exists to avoid)")
  }

  test("CDC chunk decomposition reassembles the document exactly") {
    val text = (0 until 60).map(i => s"tok$i").mkString(" ")
    val chunks = graft.ext.TextOps.cdcChunks(
        Seq((7L, text)).toDF("doc_id", "text"), mod = 8)
      .orderBy($"chunk_no")
    val total = chunks.agg(sum($"n_tokens")).collect()(0).getLong(0)
    assert(total == 60, s"chunk token counts must cover the doc: $total")
  }

  test("MAD gate flags an injected extreme length but the median pair " +
      "is unmoved by it (robustness vs mean/stddev)") {
    val lens = Seq.fill(49)(500L) :+ 100000L // one absurd outlier
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, "srcX", n) }
      .toDF("doc_id", "source", "n_chars")
    val med = docs.groupBy($"source")
      .agg(expr("CAST(percentile(2 * n_chars, 0.5) AS BIGINT)").as("med2"))
      .collect()(0).getLong(1)
    assert(med == 1000L, s"median must ignore the outlier, got $med")
    // mean is dragged to ~2490 by the single outlier — the gate the
    // MAD row replaces would misclassify half the corpus
    val mean = docs.agg(avg($"n_chars")).collect()(0).getDouble(0)
    assert(mean > 2000.0)
  }

  test("GlobalRank matches the single-partition window semantics with " +
      "NO single-partition exchange in its plan") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(1, 501).select(($"id" * 7 % 997).as("k"))
    val got = graft.ext.GlobalRank.rank(spark, df, col("k"), k = 8,
      partitions = 8)
    // the two-phase plan never funnels data through one task
    assert(!got.queryExecution.executedPlan.toString
      .contains("SinglePartition"),
      "GlobalRank plan must not contain a SinglePartition exchange")
    val want = df
      .withColumn("rn", row_number().over(Window.orderBy($"k")).cast("long"))
      .withColumn("ntile_k", ntile(8).over(Window.orderBy($"k"))
        .cast("long"))
      .withColumn("cume_dist_e6", expr("(rn * 1000000) div 500"))
      .withColumn("percent_rank_e6", expr("((rn - 1) * 1000000) div 499"))
      .select($"k", $"rn", $"ntile_k", $"cume_dist_e6", $"percent_rank_e6")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val gotRows = got
      .select($"k", $"rn", $"ntile_k", $"cume_dist_e6", $"percent_rank_e6")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(gotRows.toSeq == want.toSeq)
  }

  test("GlobalRank is tie-exact on a heavily duplicated key: rank/" +
      "dense_rank/cume_dist/percent_rank equal the global window, " +
      "with key groups never split across range partitions") {
    import org.apache.spark.sql.expressions.Window
    // 600 rows over just 37 distinct keys — every key group spans many
    // rows, and with 8 range partitions several groups sit exactly at
    // would-be boundaries (the case a naive row-split partitioner gets
    // wrong; RangePartitioner assigns by VALUE so it cannot happen)
    val df = spark.range(0, 600)
      .select(($"id" * 13 % 37).as("k"), $"id".as("uid"))
    val got = graft.ext.GlobalRank.rank(spark, df, col("k"), k = 8,
      partitions = 8)
    assert(!got.queryExecution.executedPlan.toString
      .contains("SinglePartition"))
    val w = Window.orderBy($"k")
    val want = df
      .withColumn("rank_g", rank().over(w).cast("long"))
      .withColumn("dense_rank_g", dense_rank().over(w).cast("long"))
      .withColumn("cume", count(lit(1)).over(
        w.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cume_dist_e6", expr("(cume * 1000000) div 600"))
      .withColumn("percent_rank_e6",
        expr("((rank_g - 1) * 1000000) div 599"))
      .select($"uid", $"rank_g", $"dense_rank_g", $"cume_dist_e6",
        $"percent_rank_e6")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val gotRows = got
      .select($"uid", $"rank_g", $"dense_rank_g", $"cume_dist_e6",
        $"percent_rank_e6")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(gotRows.toSeq == want.toSeq)
    // rn stays a permutation of 1..600 even with ties
    val rns = got.select($"rn").as[Long].collect().sorted
    assert(rns.toSeq == (1L to 600L))
  }
}
