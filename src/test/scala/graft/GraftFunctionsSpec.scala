package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hash_code matches Java String.hashCode (100 random strings)") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(100)(
      rnd.alphanumeric.take(1 + rnd.nextInt(11)).mkString)
    val got = samples.toDF("s")
      .select($"s", GraftFunctions.hash_code($"s")).as[(String, Int)].collect()
    got.foreach { case (s, h) => assert(h == s.hashCode, s"for '$s'") }
  }

  test("split_index: in-range and out-of-range") {
    val df = Seq("a b c").toDF("s")
    assert(df.select(GraftFunctions.split_index($"s", " ", 1)).as[String].head() == "b")
    assert(df.select(GraftFunctions.split_index($"s", " ", 9)).as[String].head() == null)
  }

  test("is_digit / is_alpha / is_decimal") {
    val df = Seq(("123", "abc", "-1.5")).toDF("d", "a", "dec")
    assert(df.select(GraftFunctions.is_digit($"d")).as[Boolean].head())
    assert(!df.select(GraftFunctions.is_digit($"a")).as[Boolean].head())
    assert(df.select(GraftFunctions.is_alpha($"a")).as[Boolean].head())
    assert(df.select(GraftFunctions.is_decimal($"dec")).as[Boolean].head())
    assert(!df.select(GraftFunctions.is_decimal($"a")).as[Boolean].head())
  }

  test("truncate truncates toward zero") {
    val df = Seq((3.149, -3.149)).toDF("p", "n")
    assert(df.select(GraftFunctions.truncate($"p", 1)).as[Double].head() == 3.1)
    assert(df.select(GraftFunctions.truncate($"n", 1)).as[Double].head() == -3.1)
  }

  test("single_value errors on >1 row per group") {
    val ok = Seq((1, 10.0), (2, 20.0)).toDF("k", "v")
      .groupBy($"k").agg(GraftFunctions.single_value($"v").as("sv"))
    assert(ok.as[(Int, Double)].collect().toSet == Set((1, 10.0), (2, 20.0)))
    val bad = Seq((1, 10.0), (1, 20.0)).toDF("k", "v")
      .groupBy($"k").agg(GraftFunctions.single_value($"v").as("sv"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null)
  }
}
