package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot path
  * (graft.ext.TextOps). Semantics are BIT-IDENTICAL to the
  * HOF/md5-string formulations they replace — same md5, same affine
  * MinHash family, same band-key strings — so every DuckDB oracle
  * keeps matching; what changes is the work per row: the composed form
  * `conv(md5(t).substr(1, 8), 16, 10)` allocates a 32-char hex string,
  * a substring and a decimal string per TOKEN (and the HOF minhash
  * re-enters interpreted lambdas numHashes times per token), while
  * these compute digest -> long -> minima in one pass with zero
  * intermediate strings. All three implement `doGenCode` (static-call
  * codegen like [[HammingDistance]]) so projections stay inside
  * whole-stage codegen.
  *
  * Reference anchor: Flink evaluates scalar functions as generated
  * Java over binary rows (flink-table-planner
  * .../codegen/calls/ScalarOperatorGens.scala) — this is the Spark
  * equivalent done the Catalyst way.
  */
object TextHashes {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes as an unsigned 32-bit value in a long —
    * exactly `conv(md5(t).substr(1, 8), 16, 10)`. */
  def hash32(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }

  /** MinHash signature over a string array (TextOps.minhashOf
    * semantics): per element ONE hash32, then numHashes affine minima;
    * null for an EMPTY array (empty element sets have no signature);
    * null elements are skipped (`least(acc, null)` keeps acc). */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val acc = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash32(arr.getUTF8String(i))
        var j = 0
        while (j < numHashes) {
          val v = (h * (2L * j + 1L) + j * 12345L + 7L) % 1000000007L
          if (v < acc(j)) acc(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** 16-bit SimHash over a string array (TextOps.simhash16 semantics):
    * per element one hash32; vote bit b is `(floor(h / 2^b) % 2)*2-1`
    * (= +1 when bit b of h is set); sketch bit b set when the vote sum
    * is strictly positive. Empty array -> 0 (all vote sums zero). */
  def simhash16(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](16)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash32(arr.getUTF8String(i))
        var b = 0
        while (b < 16) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** md5 hex of a string's UTF-8 bytes (Spark md5() semantics). */
  private def md5Hex(s: String): UTF8String = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(dig(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** LSH band keys from a signature (TextOps.bandKeys semantics): per
    * band, md5 hex of the comma-joined decimal slice values. Slice
    * bounds clamp like `slice()`; null elements are skipped like
    * `concat_ws`. */
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = sig.numElements()
    val keys = new Array[UTF8String](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 11)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var k = b * rowsPerBand
      val end = math.min(k + rowsPerBand, n)
      var first = true
      while (k < end) {
        if (!sig.isNullAt(k)) {
          if (!first) sb.append(',')
          sb.append(sig.getLong(k))
          first = false
        }
        k += 1
      }
      keys(b) = md5Hex(sb.toString)
      b += 1
    }
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }
}

/** `conv(md5(t).substr(1, 8), 16, 10) :: bigint`, fused. */
case class TokenHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_hash32 expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.hash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.hash32($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHash32 =
    copy(child = newChild)
}

/** TextOps.minhashOf fused: one digest per element, affine minima in a
  * tight loop, null for empty element sets. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHashes.minhashSig($c, $numHashes);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** TextOps.bandKeys fused: per band one md5 over the joined decimal
  * slice — no per-band string-array churn. */
case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands > 0 && rowsPerBand > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_keys expects ARRAY<BIGINT>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.bandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.bandKeys($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

/** TextOps.simhash16 fused: one digest + 16 integer votes per element. */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.simhash16(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash16($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  def of(c: Column): Column =
    GraftSqlBridge.columnOf(SimHash16(GraftSqlBridge.expressionOf(c)))
}

object TokenHash32 {
  def of(c: Column): Column =
    GraftSqlBridge.columnOf(TokenHash32(GraftSqlBridge.expressionOf(c)))
}

object MinHashSig {
  def of(c: Column, numHashes: Int): Column =
    GraftSqlBridge.columnOf(MinHashSig(GraftSqlBridge.expressionOf(c), numHashes))
}

object BandKeys {
  def of(c: Column, bands: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.columnOf(
      BandKeys(GraftSqlBridge.expressionOf(c), bands, rowsPerBand))
}
