package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Direct parity of the fused native expressions (TokenHash32,
  * MinHashSig, SimHash16, BandKeys, DotD, L2NormD) against the LITERAL
  * higher-order-function SQL formulations they replaced — evaluated
  * side by side on edge inputs: empty arrays, null elements, null
  * inputs, length-mismatched vectors, unicode, duplicates.
  *
  * SqlFunctionsSpec covers some of this transitively (the registered
  * SQL bodies are the HOF forms), but only on happy-path inputs and —
  * for minhash — only by signature LENGTH. This spec pins VALUES, and
  * pins the two deliberate, documented deviations:
  *   - MinHashSig: empty element set -> NULL (the HOF aggregate would
  *     return the untouched seed, making every empty doc a spurious
  *     duplicate of every other — see TextOps.minhashOf).
  *   - SimHash16: null elements are SKIPPED (the HOF form's vote
  *     accumulator is poisoned to null by one null element and yields
  *     sketch 0 regardless of the other tokens). Real inputs
  *     (split() output) never contain nulls, so the fused choice is
  *     the saner one; the deviation is pinned, not hidden.
  */
class HofParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hash32Sql = (t: String) =>
    s"CAST(conv(substring(md5($t), 1, 8), 16, 10) AS BIGINT)"

  private def minhashHofSql(arr: String, n: Int): String =
    s"""aggregate(
         transform($arr, tk -> ${hash32Sql("tk")}),
         array_repeat(CAST(9223372036854775807 AS BIGINT), $n),
         (acc, h) -> zip_with(acc,
           transform(sequence(0, ${n - 1}),
             j -> (h * (CAST(j AS BIGINT) * 2 + 1)
                   + CAST(j AS BIGINT) * 12345 + 7) % 1000000007),
           (a, b) -> least(a, b)))"""

  private def simhashHofSql(arr: String): String =
    s"""aggregate(
         zip_with(
           aggregate(
             transform($arr, tk -> ${hash32Sql("tk")}),
             array_repeat(CAST(0 AS BIGINT), 16),
             (acc, h) -> zip_with(acc,
               transform(sequence(0, 15),
                 b -> (CAST(floor(h / power(2, b)) AS BIGINT) % 2) * 2 - 1),
               (x, y) -> x + y)),
           sequence(0, 15),
           (s, b) -> CASE WHEN s > 0 THEN CAST(power(2, b) AS BIGINT)
                          ELSE CAST(0 AS BIGINT) END),
         CAST(0 AS BIGINT), (acc, x) -> acc + x)"""

  private def bandKeysHofSql(sig: String, bands: Int, rpb: Int): String =
    s"""transform(sequence(0, ${bands - 1}),
         b -> md5(concat_ws(',',
           transform(slice($sig, b * $rpb + 1, $rpb),
             x -> CAST(x AS STRING)))))"""

  test("TokenHash32 == conv(md5 .substr) on plain, empty, unicode, null") {
    val rows = Seq("fox", "", "ünïcödé £", "a b", null).toDF("t")
      .select(graft.functions.TokenHash32.of($"t").as("fused"),
        expr(hash32Sql("t")).as("hof"))
      .collect()
    rows.foreach { r => assert(r.get(0) == r.get(1), r.toString) }
    assert(rows.last.isNullAt(0))
  }

  test("MinHashSig values == aggregate/zip_with HOF on non-empty arrays " +
      "(incl. null elements, duplicates, unicode)") {
    val df = spark.sql(
      """SELECT arr FROM VALUES
           (array('a', 'b', 'c')),
           (array('a', 'a')),
           (array('solo')),
           (array('a', CAST(NULL AS STRING), 'b')),
           (array('ü', '£', '')) AS t(arr)""")
    val rows = df.select(
        graft.ext.TextOps.minhashOf($"arr", 8).as("fused"),
        expr(minhashHofSql("arr", 8)).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("MinHashSig deviation pinned: empty set -> NULL, HOF -> seed") {
    val r = spark.sql("SELECT array() AS arr")
      .select(graft.ext.TextOps.minhashOf($"arr".cast("array<string>"), 4)
          .as("fused"),
        expr(minhashHofSql("CAST(arr AS ARRAY<STRING>)", 4)).as("hof"))
      .head()
    assert(r.isNullAt(0), "fused must be null for an empty element set")
    assert(r.getSeq[Long](1) == Seq.fill(4)(Long.MaxValue),
      "HOF form returns the untouched seed")
  }

  test("SimHash16 == per-bit HOF on null-free arrays; null elements " +
      "skipped (== simhash of the null-stripped array)") {
    val clean = spark.sql(
      """SELECT arr FROM VALUES
           (array('a', 'b', 'c')),
           (array('the', 'quick', 'fox')),
           (array('solo')),
           (CAST(array() AS ARRAY<STRING>)) AS t(arr)""")
    clean.select(graft.functions.SimHash16.of($"arr").as("fused"),
        expr(simhashHofSql("arr")).as("hof"))
      .collect()
      .foreach { r => assert(r.getLong(0) == r.getLong(1), r.toString) }
    // deviation: fused skips nulls; HOF would yield 0
    val r = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b') AS arr")
      .select(graft.functions.SimHash16.of($"arr").as("fused"),
        graft.functions.SimHash16.of(array(lit("a"), lit("b"))).as("stripped"),
        expr(simhashHofSql("arr")).as("hof"))
      .head()
    assert(r.getLong(0) == r.getLong(1), "null elements must be skipped")
    assert(r.getLong(2) == 0L, "HOF form's vote sum is null-poisoned -> 0")
  }

  test("BandKeys == transform/slice/md5(concat_ws) HOF incl. short and " +
      "null-bearing signatures; null-signature deviation pinned") {
    val df = spark.sql(
      """SELECT sig FROM VALUES
           (array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),
           (array(1L, 2L, 3L)),
           (array(CAST(NULL AS BIGINT), 2L, 3L, 4L)),
           (CAST(array() AS ARRAY<BIGINT>)) AS t(sig)""")
    val rows = df.select(
        graft.ext.TextOps.bandKeys($"sig", 2, 4).as("fused"),
        expr(bandKeysHofSql("sig", 2, 4)).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
    // deviation (documented in TextOps.bandKeys): a NULL signature
    // (empty element set upstream) yields null — the HOF form instead
    // emits md5("") per band, which would bucket every empty doc
    // together as spurious mutual duplicates.
    val nr = spark.sql("SELECT CAST(NULL AS ARRAY<BIGINT>) AS sig")
      .select(graft.ext.TextOps.bandKeys($"sig", 2, 4).as("fused"),
        expr(bandKeysHofSql("sig", 2, 4)).as("hof"))
      .head()
    assert(nr.isNullAt(0), "fused must be null for a null signature")
    assert(nr.getSeq[String](1) ==
      Seq.fill(2)("d41d8cd98f00b204e9800998ecf8427e"),
      "HOF form emits md5('') keys — the trap the fused null avoids")
  }

  test("DotD == aggregate(zip_with(*)) HOF: normal, empty, mismatch, " +
      "null element, negative zeros") {
    val df = spark.sql(
      """SELECT a, b FROM VALUES
           (array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)),
           (CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>)),
           (array(1.0D, 2.0D), array(1.0D)),
           (array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)),
           (array(-0.0D, 0.0D), array(5.0D, -3.0D)) AS t(a, b)""")
    val rows = df.select(
        graft.functions.DotD.of($"a", $"b").as("fused"),
        expr("""aggregate(zip_with(a, b, (x, y) -> x * y),
                CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""").as("hof"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1))
        assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
      else assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"bit mismatch: $r")
    }
  }

  test("L2NormD == sqrt(aggregate(transform(sq))) HOF: normal, empty, " +
      "null element") {
    val df = spark.sql(
      """SELECT a FROM VALUES
           (array(3.0D, 4.0D)),
           (CAST(array() AS ARRAY<DOUBLE>)),
           (array(1.0D, CAST(NULL AS DOUBLE))),
           (array(-0.0D)) AS t(a)""")
    val rows = df.select(
        graft.functions.L2NormD.of($"a").as("fused"),
        expr("""sqrt(aggregate(transform(a, x -> x * x),
                CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))""").as("hof"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1))
        assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
      else assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"bit mismatch: $r")
    }
  }

  test("structurally equal SignLshBucket expressions are equal " +
      "(semanticEquals / CSE requires value equality, not array identity)") {
    import graft.ext.VectorOps
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val child = Literal.create(Array(1.0, 2.0), ArrayType(DoubleType))
    // planeWeights allocates FRESH arrays per call — the expression must
    // still compare equal (Seq value equality), or Catalyst CSE / plan
    // dedup can never merge two lshBucket computations.
    val e1 = graft.functions.SignLshBucket(child,
      VectorOps.planeWeights(4, 8).map(_.toSeq).toSeq)
    val e2 = graft.functions.SignLshBucket(child,
      VectorOps.planeWeights(4, 8).map(_.toSeq).toSeq)
    assert(e1 == e2,
      "two lshBucket calls with identical parameters must be equal " +
        "expressions (fresh weight arrays would break this)")
    assert(e1.semanticEquals(e2))
  }
}
