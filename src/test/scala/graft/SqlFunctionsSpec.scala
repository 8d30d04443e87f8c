package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the Flink-only scalars (SURVEY §2.10):
  * Spark 4 SQL UDFs are inlined at analysis time -> still codegen'd. */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registered SQL functions evaluate correctly via spark.sql") {
    GraftFunctions.registerSqlFunctions(spark)
    val r = spark.sql("""
      SELECT split_index('a,b,c', ',', 1) AS si,
             is_digit('123') AS d1, is_digit('12x') AS d2,
             is_alpha('abc') AS a1,
             is_decimal('-1.5') AS dec1, is_decimal('x') AS dec2,
             truncate_n(3.149, 1) AS tr
    """).as[(String, Boolean, Boolean, Boolean, Boolean, Boolean, Double)].head()
    assert(r == (("b", true, false, true, true, false, 3.1)))
  }

  test("ext text ops are callable from SQL and match the Column API") {
    import graft.ext.TextOps
    import org.apache.spark.sql.functions._
    TextOps.registerSqlFunctions(spark)
    val df = Seq("b a a", "the quick fox").toDF("t")
    val viaSql = spark.sql(
      """SELECT graft_fingerprint('b a a') AS fp,
                graft_simhash16('b a a') AS sh,
                graft_lang_guess('the quick fox') AS lg,
                graft_token_hash32('fox') AS th,
                size(graft_minhash('b a a', 8)) AS mh_n""")
      .as[(String, Long, String, Long, Int)].head()
    val viaCols = df.agg(
      first(TextOps.fingerprint(lit("b a a"))),
      first(TextOps.simhash16(lit("b a a"))),
      first(TextOps.langGuess(lit("the quick fox"))),
      first(TextOps.tokenHash32(lit("fox"))),
      first(size(TextOps.minhashSignature(lit("b a a"), 8))))
      .as[(String, Long, String, Long, Int)].head()
    assert(viaSql == viaCols)
    assert(viaSql._3 == "en" && viaSql._5 == 8)
  }
}
