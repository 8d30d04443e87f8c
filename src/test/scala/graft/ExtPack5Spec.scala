package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for ExtPack5 (Gopher rule gate + hashed-linear
  * quality classifier) on crafted documents — the oracle check covers
  * the corpus; these cover the rule boundaries. */
class ExtPack5Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def gopher(docs: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("ep5").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.operators.ExtPack5.queries("q_gopher_rules")(spark, dir)
  }

  test("gopher gate: clean doc passes, degenerate docs fail the right flag") {
    val clean = (1 to 10).map(i => s"the quick brown fox jumps over a lazy dog$i").mkString(" ")
    val tooShort = "the a of word here"                       // < 20 words
    val repetitive = ("spam " * 30).trim + " the a end"       // top word > 20%
    val noStops = (1 to 25).map(i => s"token$i").mkString(" ") // 0 stopwords
    val rows = gopher(Seq((1L, clean), (2L, tooShort), (3L, repetitive), (4L, noStops)))
      .select($"doc_id", $"flag_wc", $"flag_stop", $"flag_rep", $"pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._5, "clean doc must pass the full gate")
    assert(!rows(2L)._2 && !rows(2L)._5, "short doc fails word-count flag")
    assert(!rows(3L)._4 && !rows(3L)._5, "repetitive doc fails repetition flag")
    assert(!rows(4L)._3 && !rows(4L)._5, "stopword-free doc fails stopword flag")
  }

  test("classifier score is the exact per-token weight sum") {
    val dir = java.nio.file.Files.createTempDirectory("ep5c").toString
    Seq((1L, "ab xyz")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.ExtPack5.queries("q_quality_classifier")(spark, dir)
      .select($"score").as[Long].head()
    def w(t: String): Long = (t.length * 37 + t.head.toInt) % 13 - 6
    assert(got == w("ab") + w("xyz"))
  }
}
