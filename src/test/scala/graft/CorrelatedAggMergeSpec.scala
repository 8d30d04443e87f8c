package graft

import graft.plans.CorrelatedAggMerge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.plans.CorrelatedAggMerge]]: sibling correlated scalar
  * aggregates over one base merge into a single struct-valued
  * subquery, so decorrelation plans ONE pass instead of one per
  * aggregate (the restored q32-family spelling's count/sum gate pair).
  * Includes the empty-correlated-group ("count bug") case: the merged
  * struct's zero-tuple value must still deliver count = 0 / sum = null
  * field-wise.
  */
class CorrelatedAggMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sf

  private def run(sql: String, on: Boolean): DataFrame = {
    graft.Tables.registerAll(spark, d)
    spark.conf.set(CorrelatedAggMerge.EnabledKey, on.toString)
    try spark.sql(sql)
    finally spark.conf.unset(CorrelatedAggMerge.EnabledKey)
  }

  /** Distinct ScalarSubquery ids anywhere in the analyzed plan. */
  private def subqueryIds(df: DataFrame): Set[Long] = {
    val ids = scala.collection.mutable.Set[Long]()
    df.queryExecution.analyzed.foreach(p => p.expressions.foreach(_.foreach {
      case s: ScalarSubquery => ids += s.exprId.id
      case _ =>
    }))
    ids.toSet
  }

  private val gatePair =
    """SELECT count(*) AS c
       FROM orders
       WHERE o_totalprice * 2 >
             (SELECT sum(l_quantity) FROM lineitem
              WHERE l_orderkey = o_orderkey)
         AND 3 < (SELECT count(*) FROM lineitem
                  WHERE l_orderkey = o_orderkey)"""

  test("a correlated count/sum gate pair merges into ONE subquery " +
      "(the q32-family shape) with identical rows") {
    val on = run(gatePair, on = true)
    assert(subqueryIds(on).size == 1,
      s"expected one merged subquery, got ${subqueryIds(on).size}")
    val off = run(gatePair, on = false)
    assert(subqueryIds(off).size == 2, "rule-off baseline lost a subquery")
    assert(on.collect().map(_.toSeq).toSeq ==
      off.collect().map(_.toSeq).toSeq)
  }

  test("select-list siblings merge and EMPTY correlated groups keep " +
      "count = 0 / sum = null (the count-bug case)") {
    val sql =
      """SELECT o_orderkey,
              (SELECT count(*) FROM lineitem
               WHERE l_orderkey = o_orderkey AND l_quantity > 49) AS n,
              (SELECT sum(l_quantity) FROM lineitem
               WHERE l_orderkey = o_orderkey AND l_quantity > 49) AS s
         FROM orders
         ORDER BY o_orderkey"""
    val on = run(sql, on = true)
    assert(subqueryIds(on).size == 1)
    val onRows = on.collect().map(_.toSeq).toSeq
    val offRows = run(sql, on = false).collect().map(_.toSeq).toSeq
    assert(onRows == offRows, s"first on=${onRows.take(3)} " +
      s"off=${offRows.take(3)}")
    assert(onRows.exists(r => r(1) == 0L && r(2) == null),
      "fixture lost its empty correlated groups — the count-bug path " +
        "is no longer exercised; lower the quantity gate")
  }

  test("guards: different inner filters do not merge; an identical " +
      "pair is left alone (nothing a merge would save)") {
    val different =
      """SELECT o_orderkey,
              (SELECT count(*) FROM lineitem
               WHERE l_orderkey = o_orderkey AND l_quantity > 25) AS a,
              (SELECT count(*) FROM lineitem
               WHERE l_orderkey = o_orderkey AND l_quantity <= 25) AS b
         FROM orders ORDER BY o_orderkey LIMIT 10"""
    assert(subqueryIds(run(different, on = true)).size == 2,
      "members with different children must not merge")
    val same =
      """SELECT o_orderkey,
              (SELECT count(*) FROM lineitem
               WHERE l_orderkey = o_orderkey) AS a,
              (SELECT count(*) FROM lineitem
               WHERE l_orderkey = o_orderkey) AS b
         FROM orders ORDER BY o_orderkey LIMIT 10"""
    assert(subqueryIds(run(same, on = true)).size == 2,
      "an all-identical group has nothing to merge")
  }
}
