package graft

import org.scalatest.funsuite.AnyFunSuite

/** ExtPack6: token-budget mixing + BPE merge-rule training. */
class ExtPack6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Canonical greedy BPE, computed driver-side as an independent
    * oracle: tokenize → vocab freq → k rounds of (count adjacent pairs
    * over token lists, weighted by freq; argmax by (count desc, pair
    * asc); merge left-to-right greedily over the token LIST). The
    * engine implements the merge as a delimiter-preserving string
    * replace — this re-derivation never touches strings, so agreement
    * pins that the replace encoding IS canonical greedy BPE (including
    * back-to-back matches like banana's a-n a-n that a single-space
    * encoding would skip).
    */
  private def canonicalBpe(docs: Seq[String], rounds: Int): Seq[(Long, String, Long)] = {
    val vocab = scala.collection.mutable.Map.empty[List[String], Long]
    docs.foreach { t =>
      t.toLowerCase.split("[^a-z]+").filter(w => w.nonEmpty && w.length <= 20)
        .foreach { w =>
          val key = w.map(_.toString).toList
          vocab(key) = vocab.getOrElse(key, 0L) + 1L
        }
    }
    var v = vocab.toMap
    (1 to rounds).map { k =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      v.foreach { case (toks, f) =>
        toks.zip(toks.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((a, b), cnt) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, x + " " + y) }
      // greedy left-to-right merge over the token list
      def merge(toks: List[String]): List[String] = toks match {
        case x :: y :: rest if x == a && y == b => (a + b) :: merge(rest)
        case x :: rest => x :: merge(rest)
        case Nil => Nil
      }
      v = v.toSeq.map { case (toks, f) => (merge(toks), f) }
        .groupBy(_._1).map { case (t, fs) => (t, fs.map(_._2).sum) }
      (k.toLong, s"$a $b", cnt)
    }
  }

  test("q_bpe_train matches a canonical greedy-BPE re-derivation") {
    val got = SparkEntry.queries("q_bpe_train")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("text").collect().map(_.getString(0)).toSeq
    val want = canonicalBpe(docs, 3)
    assert(got == want)
  }

  test("q_bpe_train merge handles back-to-back pair occurrences (banana case)") {
    // pure mechanism check on the delimiter encoding: tokens joined by
    // double space, padded by single; pattern " x  y " -> " xy ".
    val seq = " b  a  n  a  n  a "
    val merged = seq.replace(" a  n ", " an ")
    assert(merged == " b  an  an  a ",
      "both a-n occurrences must merge, as canonical greedy BPE does")
  }

  test("q_bpe_apply: per-doc token counts sit between word count and char count") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_bpe_apply")(spark, TestSpark.sf)
    // chars per doc over the SAME tokenization the trainer uses
    val chars = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= 20)
      .groupBy("doc_id")
      .agg(sum(length(col("w"))).cast("long").as("n_chars_tok"))
    val joined = got.join(chars, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nw, nt, nc) = (r.getLong(r.fieldIndex("n_words")),
        r.getLong(r.fieldIndex("n_bpe_tokens")),
        r.getLong(r.fieldIndex("n_chars_tok")))
      assert(nt <= nc, "merges can only shrink the token count")
      assert(nt >= nw, "every word keeps at least one token")
    }
    // 3 merge rounds must actually compress: strictly fewer tokens than chars
    val totTok = joined.map(_.getLong(1)).sum
    val totChr = joined.map(r => r.getLong(r.fieldIndex("n_chars_tok"))).sum
    assert(totTok < totChr)
  }

  test("q_token_budget: per-source selection respects the derived budget and is maximal") {
    import org.apache.spark.sql.functions._
    val sel = SparkEntry.queries("q_token_budget")(spark, TestSpark.sf)
    val docs = Tables.documents(spark, TestSpark.sf)
    // re-derive the budgets with plain driver-side integer arithmetic
    val toks = docs.groupBy("source").agg(sum("n_chars").cast("long").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = toks.values.sum
    val cap = total / toks.size
    val w = toks.map { case (s, t) => s -> math.min(t, cap) }
    val sumW = w.values.sum
    val budget = w.map { case (s, x) =>
      s -> (total / 2) * (x * 1000 / sumW) / 1000
    }
    val got = sel.groupBy("source")
      .agg(max("cum_chars").cast("long").as("cum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (s, cum, n) =>
      assert(cum <= budget(s), s"source $s exceeds budget")
      assert(n > 0)
    }
    // global: selected tokens never exceed the half-corpus budget
    val selected = got.map(_._2).sum
    assert(selected <= total / 2)
  }
}
