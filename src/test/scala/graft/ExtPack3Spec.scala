package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants + plan shapes for the ExtPack3 pipeline ops
  * (vocab/TF-IDF, URL dedup, repeated-span dedup, Bloom incremental
  * dedup, token entropy, edit-distance verify). Value-level
  * correctness is gated by the DuckDB differential; these tests pin
  * the properties the oracle can't express — Bloom no-false-negative
  * equivalence, canonicalization collapse, and the scale-critical
  * plan shapes. */
class ExtPack3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("q_vocab_topk: exactly k rows, occurrences >= doc frequency") {
    val rows = q("q_vocab_topk").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_occurs") >= r.getAs[Long]("n_docs"))
    }
  }

  test("q_tfidf: three keywords per doc, scores non-increasing by rank") {
    val byDoc = q("q_tfidf").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rs =>
      assert(rs.length == 3)
      val byRank = rs.sortBy(_.getAs[Long]("rank_no"))
      val scores = byRank.map(_.getAs[Long]("score_micro"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_tfidf plans a WindowGroupLimit top-k (map-side trim)") {
    val plan = q("q_tfidf").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("q_url_dedup: tracking params and fragments collapse; url variants " +
      "with distinct payload params stay distinct") {
    val rows = q("q_url_dedup").collect()
    // ids i and i+350 share host (350%7=0), path (350%50=0) and fragment
    // parity; when i%3==1 the pair lands on the two different utm_*
    // branches (utm_source=feed&id=m vs id=m&utm_campaign=x) whose
    // canonical forms are BOTH "?id=m" — canonicalization must merge
    // exactly these. Doc 1 + doc 351 is such a pair at sf0.001.
    val both = q("q_url_dedup").filter($"keep_id" === 1).collect()
    assert(both.length == 1 && both.head.getAs[Long]("n_dups") >= 2,
      s"expected ids 1 and 351 to share a canonical URL: ${both.mkString(",")}")
    // every doc lands in exactly one canonical group
    assert(rows.map(_.getAs[Long]("n_dups")).sum == 500L)
    // no canonical URL retains a fragment or a utm param; the default
    // :443 is dropped but the non-default :8443 slice survives as a
    // distinct origin
    rows.foreach { r =>
      val u = r.getAs[String]("canon_url")
      assert(!u.contains("#") && !u.contains("utm_"), u)
      assert(u.startsWith("https://www.example"), u)
      assert(!u.contains(":443"), u)
    }
    assert(rows.exists(_.getAs[String]("canon_url").contains(":8443")))
  }

  test("q_substring_dedup: ppm fractions bounded, dup spans never exceed spans") {
    q("q_substring_dedup").collect().foreach { r =>
      val n = r.getAs[Long]("n_spans")
      val dup = r.getAs[Long]("n_dup_spans")
      val ppm = r.getAs[Long]("dup_frac_ppm")
      assert(dup <= n)
      assert(ppm >= 0L && ppm <= 1000000L)
      if (n > 0)
        assert(math.abs(ppm / 1e6 - dup.toDouble / n) < 1e-4)
      else assert(ppm == 0L)
    }
  }

  test("q_bloom_dedup matches the exact (no-bloom) membership join") {
    val got = q("q_bloom_dedup")
      .select($"doc_id", $"in_base").as[(Long, Boolean)].collect().toMap
    val docs = Tables.documents(spark, TestSpark.sf)
      .select($"doc_id", graft.ext.TextOps.fingerprint($"text").as("fp"))
    val baseFps = docs.filter($"doc_id" % 4 =!= 0)
      .select($"fp").distinct().as[String].collect().toSet
    val expected = docs.filter($"doc_id" % 4 === 0)
      .select($"doc_id", $"fp").as[(Long, String)].collect()
      .map { case (id, fp) => id -> baseFps(fp) }.toMap
    assert(got == expected)
  }

  test("q_token_entropy: repetitive text scores below diverse text") {
    // invariant on real data: 0 <= entropy <= log2(n_distinct) + eps,
    // in integer micro-bits (the cross-engine-exact encoding)
    q("q_token_entropy").collect().foreach { r =>
      val eu = r.getAs[Long]("entropy_microbits")
      val d = r.getAs[Long]("n_distinct")
      assert(eu >= 0L)
      assert(eu / 1e6 <= math.log(d.toDouble) / math.log(2.0) + 1e-4)
      val ne = r.getAs[Long]("norm_entropy_ppm")
      assert(ne >= 0L && ne <= 1000001L)
    }
  }

  test("q_edit_distance: equi join on enumerated ids (no per-source " +
      "cross product), distances within prefix bound") {
    val plan = q("q_edit_distance").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    q("q_edit_distance").collect().foreach { r =>
      val dEdit = r.getAs[Long]("edit_dist")
      assert(dEdit >= 0 && dEdit <= 48)
      assert(r.getAs[Boolean]("is_near") == (dEdit <= 12))
    }
  }

  test("q_vocab_topk plans partial aggregation before the shuffle") {
    val plan = q("q_vocab_topk").queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"expected map-side partial agg:\n$plan")
  }
}
