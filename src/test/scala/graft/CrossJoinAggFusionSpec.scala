package graft

import graft.plans.CrossJoinAggFusion
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.plans.CrossJoinAggFusion]] — the FROM-clause spelling
  * of the scalar-agg bank: a condition-free join of N single-row
  * aggregates over the same source with distinct gates must fuse into
  * ONE conditional-aggregate pass (and must NOT fire across different
  * sources, non-global aggregates, or when all gates are equal).
  */
class CrossJoinAggFusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sf

  private val bankSql =
    """SELECT lo.s AS lo_s, hi.s AS hi_s, mid.c AS mid_c
       FROM (SELECT sum(l_quantity) AS s FROM lineitem
             WHERE l_quantity <= 10) lo,
            (SELECT sum(l_quantity) AS s FROM lineitem
             WHERE l_quantity > 40) hi,
            (SELECT count(*) AS c FROM lineitem
             WHERE l_quantity BETWEEN 11 AND 40) mid"""

  private def run(sql: String, on: Boolean): DataFrame = {
    graft.Tables.registerAll(spark, d)
    spark.conf.set(CrossJoinAggFusion.EnabledKey, on.toString)
    try spark.sql(sql)
    finally spark.conf.unset(CrossJoinAggFusion.EnabledKey)
  }

  private def joins(df: DataFrame): Int =
    df.queryExecution.analyzed.collect { case j: Join => j }.size

  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.exists(_.toString.contains("lineitem")) => l
    }.size

  test("a 3-branch cross-joined aggregate bank fuses into one pass") {
    val df = run(bankSql, on = true)
    assert(joins(df) == 0, "the join tree survived fusion")
    assert(scans(df) == 1,
      s"expected one lineitem scan, got ${scans(df)}")
    val fused = df.queryExecution.analyzed.collect {
      case a: Aggregate if a.groupingExpressions.isEmpty => a
    }
    assert(fused.exists(_.aggregateExpressions.size == 3),
      "fused aggregate should carry all three branch outputs")
  }

  test("fusion ON and OFF return the identical single row") {
    val on = run(bankSql, on = true).collect().map(_.toSeq).toSeq
    val off = run(bankSql, on = false).collect().map(_.toSeq).toSeq
    assert(on.size == 1 && on == off, s"on=$on off=$off")
    assert(run(bankSql, on = false).queryExecution.analyzed
      .collect { case j: Join => j }.nonEmpty)
  }

  test("empty-gate branches still produce the aggregate's empty-input " +
      "value (one row, null sum / zero count)") {
    val sql =
      """SELECT a.s AS a_s, b.c AS b_c
         FROM (SELECT sum(l_quantity) AS s FROM lineitem
               WHERE l_quantity > 1000000) a,
              (SELECT count(*) AS c FROM lineitem
               WHERE l_quantity < -5) b"""
    val on = run(sql, on = true).collect().map(_.toSeq).toSeq
    val off = run(sql, on = false).collect().map(_.toSeq).toSeq
    assert(on == Seq(Seq(null, 0L)) && on == off)
  }

  test("q90 shape: comma-join branches keep their join predicates " +
      "below the fused aggregate (no cartesian) and fuse to one pass") {
    // two branches over the same comma-join differing only in a
    // single-attribute gate — the TPC-DS q90 shape that hung r15's
    // verify when the join predicates were folded up with the gate
    val sql =
      """SELECT am.c AS am_c, pm.c AS pm_c
         FROM (SELECT count(*) AS c FROM lineitem, orders
               WHERE l_orderkey = o_orderkey AND l_quantity <= 25) am,
              (SELECT count(*) AS c FROM lineitem, orders
               WHERE l_orderkey = o_orderkey AND l_quantity > 25) pm"""
    val df = run(sql, on = true)
    assert(joins(run(sql, on = true)) == 1,
      "expected exactly the reconstituted lineitem-orders join")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      s"structural conjuncts were folded up — cartesian:\n$phys")
    assert(scans(df) == 1, s"expected one lineitem scan, got ${scans(df)}")
    val on = df.collect().map(_.toSeq).toSeq
    val off = run(sql, on = false).collect().map(_.toSeq).toSeq
    assert(on.size == 1 && on == off, s"on=$on off=$off")
  }

  test("JOIN…ON spelling fuses like the comma spelling (r15 directive " +
      "5): ON conjuncts pool with WHERE conjuncts") {
    // the q90 bank with every join spelled INNER JOIN … ON, the gate
    // in the WHERE — plus the members themselves joined with ON true
    val sql =
      """SELECT am.c AS am_c, pm.c AS pm_c
         FROM (SELECT count(*) AS c FROM lineitem
               INNER JOIN orders ON l_orderkey = o_orderkey
               WHERE l_quantity <= 25) am
         INNER JOIN
              (SELECT count(*) AS c FROM lineitem
               INNER JOIN orders ON l_orderkey = o_orderkey
               WHERE l_quantity > 25) pm
         ON true"""
    val df = run(sql, on = true)
    assert(joins(df) == 1,
      "expected exactly the reconstituted lineitem-orders join")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      s"ON conjuncts were folded up — cartesian:\n$phys")
    assert(scans(df) == 1, s"expected one lineitem scan, got ${scans(df)}")
    val on = df.collect().map(_.toSeq).toSeq
    val off = run(sql, on = false).collect().map(_.toSeq).toSeq
    assert(on.size == 1 && on == off, s"on=$on off=$off")
  }

  test("mixed spellings fuse when join order matches; a gate written " +
      "in the ON clause still folds") {
    val sql =
      """SELECT am.c AS am_c, pm.c AS pm_c
         FROM (SELECT count(*) AS c FROM lineitem, orders
               WHERE l_orderkey = o_orderkey AND l_quantity <= 25) am,
              (SELECT count(*) AS c FROM lineitem
               INNER JOIN orders
               ON l_orderkey = o_orderkey AND l_quantity > 25) pm"""
    val df = run(sql, on = true)
    assert(joins(df) == 1 && scans(df) == 1,
      s"joins=${joins(df)} scans=${scans(df)}")
    val on = df.collect().map(_.toSeq).toSeq
    val off = run(sql, on = false).collect().map(_.toSeq).toSeq
    assert(on.size == 1 && on == off, s"on=$on off=$off")
  }

  test("guard: a REAL condition between members blocks fusion (it " +
      "filters the joined row)") {
    val sql =
      """SELECT am.c AS am_c, pm.c AS pm_c
         FROM (SELECT count(*) AS c FROM lineitem
               WHERE l_quantity <= 25) am
         INNER JOIN
              (SELECT count(*) AS c FROM lineitem
               WHERE l_quantity > 25) pm
         ON am.c < pm.c"""
    val df = run(sql, on = true)
    assert(joins(df) == 1, "members joined ON a real predicate must " +
      "keep their join")
    assert(scans(df) == 2)
  }

  test("guards: different sources and grouped branches are untouched") {
    val mixed =
      """SELECT a.s AS a_s, b.c AS b_c
         FROM (SELECT sum(l_quantity) AS s FROM lineitem
               WHERE l_quantity <= 10) a,
              (SELECT count(*) AS c FROM orders
               WHERE o_orderkey > 5) b"""
    assert(joins(run(mixed, on = true)) == 1,
      "branches over different sources must not fuse")
    val grouped =
      """SELECT g.k AS g_k, g.s AS g_s, t.c AS t_c
         FROM (SELECT l_returnflag AS k, sum(l_quantity) AS s
               FROM lineitem GROUP BY l_returnflag) g,
              (SELECT count(*) AS c FROM lineitem
               WHERE l_quantity > 10) t"""
    assert(joins(run(grouped, on = true)) == 1,
      "a grouped branch is not single-row and must not fuse")
  }
}
