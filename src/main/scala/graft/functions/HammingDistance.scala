package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hamming distance between two 64-bit
  * sketch values (popcount of XOR). Used for SimHash near-duplicate
  * candidate filtering (graft.ext.TextOps.simhash16) — the hot inner
  * loop of sketch-based dedup at corpus scale, so it gets real codegen
  * (`doGenCode`), not a UDF and not CodegenFallback: inside
  * whole-stage codegen it compiles to `Long.bitCount(a ^ b)` with no
  * boxing.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Column API: hamming(a, b). */
  def hamming(a: Column, b: Column): Column =
    GraftSqlBridge.columnOf(HammingDistance(
      GraftSqlBridge.expressionOf(a), GraftSqlBridge.expressionOf(b)))

  /** SQL registration: SELECT hamming(a, b) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, "hamming",
      exprs => HammingDistance(exprs(0), exprs(1)))
}
