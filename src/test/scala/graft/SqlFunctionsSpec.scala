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
}
