package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the embedding hot path
  * (graft.ext.VectorOps). Each replaces a `zip_with`/`aggregate`
  * higher-order formulation that re-enters interpreted lambdas per
  * ELEMENT per PAIR in scoring joins — the dominant cost of the ANN /
  * cosine-dedup family. Semantics are bit-identical to the HOF forms:
  * the same left-to-right float summation order, the same null
  * behavior (length mismatch or null element -> null, exactly what
  * zip_with's null padding produced), so rounded comparisons and every
  * DuckDB oracle hash are unchanged.
  */
object VectorExprs {

  /** `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)`:
    * left-to-right sum of products; null if lengths differ or any
    * element is null (zip_with pads the shorter side with null and the
    * running sum absorbs it). */
  def dotD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** `sqrt(aggregate(transform(a, x => x * x), 0.0, (acc, x) => acc + x))`:
    * null if any element is null; 0.0 for an empty array. */
  def l2normD(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  /** Sign-LSH bucket string (VectorOps.lshBucket semantics): bit p is
    * '1' iff the integer-quantized dot of the vector with ±1 plane p
    * is >= 0. Quantization is Spark's `round(e * 1000)` (HALF_UP via
    * BigDecimal) cast to long. A length-mismatched or null-bearing
    * vector yields all-'0' bits — the value the HOF form's
    * `when(null >= 0, "1").otherwise("0")` produced. */
  def signLshBucket(emb: ArrayData, weights: Array[Array[Int]]): UTF8String = {
    val planes = weights.length
    val dims = if (planes > 0) weights(0).length else 0
    val n = emb.numElements()
    val bits = new Array[Char](planes)
    var valid = n == dims
    val q = new Array[Long](n)
    var i = 0
    while (valid && i < n) {
      if (emb.isNullAt(i)) valid = false
      else q(i) = java.math.BigDecimal.valueOf(emb.getDouble(i) * 1000)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    var p = 0
    while (p < planes) {
      if (!valid) bits(p) = '0'
      else {
        var acc = 0L
        var j = 0
        val w = weights(p)
        while (j < dims) { acc += q(j) * w(j); j += 1 }
        bits(p) = if (acc >= 0) '1' else '0'
      }
      p += 1
    }
    UTF8String.fromString(new String(bits))
  }

  private[functions] def requireDoubleArray(t: DataType, fn: String): TypeCheckResult =
    t match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects ARRAY<DOUBLE>, got ${other.sql}")
    }
}

/** Fused dot product over two array<double> columns. */
case class DotD(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (VectorExprs.requireDoubleArray(left.dataType, "dot_d"),
      VectorExprs.requireDoubleArray(right.dataType, "dot_d")) match {
      case (TypeCheckResult.TypeCheckSuccess, r) => r
      case (l, _) => l
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorExprs.dotD(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double d_${ev.value} = graft.functions.VectorExprs.dotD($a, $b);
      if (d_${ev.value} == null) { ${ev.isNull} = true; }
      else { ${ev.value} = d_${ev.value}.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotD =
    copy(left = newLeft, right = newRight)
}

/** Fused L2 norm over an array<double> column. */
case class L2NormD(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray(child.dataType, "l2norm_d")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    VectorExprs.l2normD(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double d_${ev.value} = graft.functions.VectorExprs.l2normD($c);
      if (d_${ev.value} == null) { ${ev.isNull} = true; }
      else { ${ev.value} = d_${ev.value}.doubleValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): L2NormD =
    copy(child = newChild)
}

/** Fused sign-LSH bucket assignment. The ±1 plane matrix is embedded
  * at construction (md5-derived, deterministic — see
  * VectorOps.planeWeights) and referenced from generated code.
  *
  * The matrix is held as immutable `Seq[Seq[Int]]` so that two
  * structurally identical SignLshBucket expressions are `equals` (JVM
  * arrays compare by reference) — Catalyst semanticEquals, common-
  * subexpression elimination, and plan dedup all depend on it, and
  * VectorOps.planeWeights allocates fresh arrays per call. Eval and
  * codegen use a cached primitive int[][] view. */
case class SignLshBucket(child: Expression, weights: Seq[Seq[Int]])
    extends UnaryExpression {
  @transient private lazy val weightArr: Array[Array[Int]] =
    weights.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray(child.dataType, "sign_lsh_bucket")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    VectorExprs.signLshBucket(input.asInstanceOf[ArrayData], weightArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("lshWeights", weightArr, "int[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorExprs.signLshBucket($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

object DotD {
  def of(a: Column, b: Column): Column =
    GraftSqlBridge.columnOf(DotD(
      GraftSqlBridge.expressionOf(a), GraftSqlBridge.expressionOf(b)))
}

object L2NormD {
  def of(c: Column): Column =
    GraftSqlBridge.columnOf(L2NormD(GraftSqlBridge.expressionOf(c)))
}

object SignLshBucket {
  def of(c: Column, weights: Array[Array[Int]]): Column =
    GraftSqlBridge.columnOf(
      SignLshBucket(GraftSqlBridge.expressionOf(c),
        weights.map(_.toSeq).toSeq))
}
