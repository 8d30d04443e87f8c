package graft.sources

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf wire-format bridge (SURVEY.md §2.1 formats row; reference
  * flink-formats/flink-protobuf
  * .../protobuf/deserialize/PbRowDataDeserializationSchema.java and
  * serialize/PbRowDataSerializationSchema.java — Flink maps RowData
  * <-> compiled protobuf messages).
  *
  * The container ships NO protobuf runtime, so instead of a generated-
  * message bridge this implements the public protobuf WIRE FORMAT
  * directly (developers.google.com/protocol-buffers/docs/encoding):
  * varint / zigzag / fixed32 / fixed64 / length-delimited, driven by a
  * declarative [[PSchema]] descriptor (the role flink-protobuf's
  * `PbFormatConfig` + descriptor class plays). That makes the format
  * self-contained: no protoc, no runtime jar, bytes interoperable with
  * any standard protobuf library.
  *
  * Semantics (proto3-shaped, matching flink-protobuf defaults):
  *  - absent field -> NULL (flink's `protobuf.read-default-values` =
  *    false behavior); null column -> field omitted on encode
  *  - duplicated non-repeated field -> last value wins
  *  - unknown field numbers are skipped by wire type on decode
  *  - repeated numeric fields encode PACKED (proto3 default) and
  *    decode both packed and unpacked; repeated string/bytes/message
  *    are per-element length-delimited as the spec requires
  *  - groups (wire types 3/4) are deprecated upstream -> decode error
  *
  * Both directions are per-row Catalyst expressions, CodegenFallback
  * like Spark's own JsonToStructs/from_avro — format codecs sit at the
  * scan/sink boundary, not inside hot arithmetic, so interpreted eval
  * is the idiomatic trade here. Scale posture: pure map-side row work,
  * no shuffle, no state; distribution is whatever the surrounding scan
  * already has.
  */
object ProtoFormat {

  // -------------------------------------------------------------------
  // Descriptor model (the declarative stand-in for a compiled .proto).

  sealed trait PType
  object PType {
    /** int64/int32/uint32-on-the-wire varint (two's-complement). */
    case object PInt64 extends PType
    case object PInt32 extends PType
    /** sint64: zigzag varint (efficient negatives). */
    case object PSInt64 extends PType
    case object PBool extends PType
    /** double: little-endian fixed64. */
    case object PDouble extends PType
    /** float: little-endian fixed32. */
    case object PFloat extends PType
    case object PString extends PType
    case object PBytes extends PType
    /** Nested message (length-delimited). */
    final case class PMsg(schema: PSchema) extends PType
  }
  import PType._

  final case class PField(no: Int, name: String, tpe: PType,
      repeated: Boolean = false) {
    require(no >= 1 && no < (1 << 29), s"field number out of range: $no")
  }

  final case class PSchema(fields: Seq[PField]) {
    require(fields.map(_.no).distinct.length == fields.length,
      "duplicate field numbers")
    // hoisted out of the per-row encode/decode loops (lazy vals do not
    // participate in case-class equality, so expression canonicalization
    // is unaffected)
    lazy val byNo: Map[Int, (PField, Int)] =
      fields.zipWithIndex.map { case (f, i) => f.no -> ((f, i)) }.toMap
    lazy val ordered: Seq[(PField, Int)] = fields.zipWithIndex.sortBy(_._1.no)
  }

  /** Spark schema the decoder produces / the encoder consumes. */
  def sparkType(schema: PSchema): StructType = StructType(schema.fields.map {
    f =>
      val elem: DataType = f.tpe match {
        case PInt64 | PSInt64 => LongType
        case PInt32 => IntegerType
        case PBool => BooleanType
        case PDouble => DoubleType
        case PFloat => FloatType
        case PString => StringType
        case PBytes => BinaryType
        case PMsg(s) => sparkType(s)
      }
      StructField(f.name, if (f.repeated) ArrayType(elem) else elem)
  })

  // -------------------------------------------------------------------
  // Wire primitives.

  private def wireType(t: PType): Int = t match {
    case PInt64 | PInt32 | PSInt64 | PBool => 0
    case PDouble => 1
    case PString | PBytes | PMsg(_) => 2
    case PFloat => 5
  }

  /** Growable little-endian byte sink (no java.io stream overhead). */
  private final class Out {
    private var buf = new Array[Byte](64)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
      }
    def writeVarint(v0: Long): Unit = {
      ensure(10)
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7
      }
      buf(len) = v.toByte; len += 1
    }
    def writeTag(no: Int, wire: Int): Unit = writeVarint((no.toLong << 3) | wire)
    def writeFixed32(v: Int): Unit = {
      ensure(4)
      buf(len) = v.toByte; buf(len + 1) = (v >> 8).toByte
      buf(len + 2) = (v >> 16).toByte; buf(len + 3) = (v >> 24).toByte
      len += 4
    }
    def writeFixed64(v: Long): Unit = {
      writeFixed32(v.toInt); writeFixed32((v >>> 32).toInt)
    }
    def writeBytes(b: Array[Byte]): Unit = {
      ensure(b.length); System.arraycopy(b, 0, buf, len, b.length)
      len += b.length
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  // -------------------------------------------------------------------
  // Encode: InternalRow -> bytes. Fields emitted in ascending field-
  // number order (canonical, deterministic output for the oracle).

  def encodeRow(row: InternalRow, schema: PSchema,
      spark: StructType): Array[Byte] = {
    val out = new Out
    schema.ordered.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val dt = spark(i).dataType
        if (f.repeated) {
          val arr = row.getArray(i)
          val elemDt = dt.asInstanceOf[ArrayType].elementType
          f.tpe match {
            case PString | PBytes | PMsg(_) =>
              var j = 0
              while (j < arr.numElements()) {
                // null elements inside a repeated field have no wire
                // representation -> encoded as absent (skipped)
                if (!arr.isNullAt(j)) {
                  out.writeTag(f.no, 2)
                  writeDelimited(out, arr, j, f.tpe, elemDt)
                }
                j += 1
              }
            case scalar =>
              // proto3 packed: ONE length-delimited run of elements
              val inner = new Out
              var j = 0
              while (j < arr.numElements()) {
                if (!arr.isNullAt(j)) writeScalar(inner, arr, j, scalar)
                j += 1
              }
              val payload = inner.toBytes
              out.writeTag(f.no, 2)
              out.writeVarint(payload.length)
              out.writeBytes(payload)
          }
        } else f.tpe match {
          case PString | PBytes | PMsg(_) =>
            out.writeTag(f.no, 2)
            writeDelimitedRow(out, row, i, f.tpe, dt)
          case scalar =>
            out.writeTag(f.no, wireType(scalar))
            writeScalarRow(out, row, i, scalar)
        }
      }
    }
    out.toBytes
  }

  private def writeScalar(out: Out, a: ArrayData, j: Int, t: PType): Unit =
    t match {
      case PInt64 => out.writeVarint(a.getLong(j))
      case PInt32 => out.writeVarint(a.getInt(j).toLong)
      case PSInt64 => out.writeVarint(zigzag(a.getLong(j)))
      case PBool => out.writeVarint(if (a.getBoolean(j)) 1L else 0L)
      case PDouble =>
        out.writeFixed64(java.lang.Double.doubleToLongBits(a.getDouble(j)))
      case PFloat =>
        out.writeFixed32(java.lang.Float.floatToIntBits(a.getFloat(j)))
      case other => throw new IllegalStateException(s"not scalar: $other")
    }

  private def writeScalarRow(out: Out, r: InternalRow, i: Int, t: PType): Unit =
    t match {
      case PInt64 => out.writeVarint(r.getLong(i))
      case PInt32 => out.writeVarint(r.getInt(i).toLong)
      case PSInt64 => out.writeVarint(zigzag(r.getLong(i)))
      case PBool => out.writeVarint(if (r.getBoolean(i)) 1L else 0L)
      case PDouble =>
        out.writeFixed64(java.lang.Double.doubleToLongBits(r.getDouble(i)))
      case PFloat =>
        out.writeFixed32(java.lang.Float.floatToIntBits(r.getFloat(i)))
      case other => throw new IllegalStateException(s"not scalar: $other")
    }

  private def writeDelimited(out: Out, a: ArrayData, j: Int, t: PType,
      dt: DataType): Unit = {
    val payload: Array[Byte] = t match {
      case PString => a.getUTF8String(j).getBytes
      case PBytes => a.getBinary(j)
      case PMsg(nested) =>
        val st = dt.asInstanceOf[StructType]
        encodeRow(a.getStruct(j, st.length), nested, st)
      case other => throw new IllegalStateException(s"not delimited: $other")
    }
    out.writeVarint(payload.length)
    out.writeBytes(payload)
  }

  private def writeDelimitedRow(out: Out, r: InternalRow, i: Int, t: PType,
      dt: DataType): Unit = {
    val payload: Array[Byte] = t match {
      case PString => r.getUTF8String(i).getBytes
      case PBytes => r.getBinary(i)
      case PMsg(nested) =>
        val st = dt.asInstanceOf[StructType]
        encodeRow(r.getStruct(i, st.length), nested, st)
      case other => throw new IllegalStateException(s"not delimited: $other")
    }
    out.writeVarint(payload.length)
    out.writeBytes(payload)
  }

  // -------------------------------------------------------------------
  // Decode: bytes -> InternalRow.

  def decodeRow(bytes: Array[Byte], schema: PSchema): InternalRow = {
    val n = schema.fields.length
    val byNo = schema.byNo
    val values = new Array[Any](n)
    // repeated fields accumulate across (possibly interleaved) records
    var lists: Array[scala.collection.mutable.ArrayBuffer[Any]] = null
    def listFor(i: Int) = {
      if (lists == null) {
        lists = new Array[scala.collection.mutable.ArrayBuffer[Any]](n)
      }
      if (lists(i) == null) {
        lists(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
      }
      lists(i)
    }
    var pos = 0
    def readVarint(): Long = {
      var shift = 0; var acc = 0L
      while (shift < 64) {
        val b = bytes(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def readFixed32(): Int = {
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def readFixed64(): Long =
      (readFixed32() & 0xffffffffL) | (readFixed32().toLong << 32)
    def decodeScalarVarint(t: PType, raw: Long): Any = t match {
      case PInt64 => raw
      case PInt32 => raw.toInt
      case PSInt64 => unzigzag(raw)
      case PBool => raw != 0L
      case other =>
        throw new IllegalArgumentException(s"varint wire for $other")
    }
    while (pos < bytes.length) {
      val tag = readVarint()
      val no = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      byNo.get(no) match {
        case None => wire match { // unknown field: skip by wire type
          case 0 => readVarint()
          case 1 => pos += 8
          case 2 => val len = readVarint().toInt; pos += len
          case 5 => pos += 4
          case w => throw new IllegalArgumentException(
            s"unsupported wire type $w (groups are deprecated)")
        }
        case Some((f, i)) => (wire, f.tpe) match {
          case (2, PString) =>
            val len = readVarint().toInt
            val v = UTF8String.fromBytes(bytes, pos, len); pos += len
            if (f.repeated) listFor(i) += v else values(i) = v
          case (2, PBytes) =>
            val len = readVarint().toInt
            val v = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
            pos += len
            if (f.repeated) listFor(i) += v else values(i) = v
          case (2, PMsg(nested)) =>
            val len = readVarint().toInt
            val v = decodeRow(
              java.util.Arrays.copyOfRange(bytes, pos, pos + len), nested)
            pos += len
            if (f.repeated) listFor(i) += v else values(i) = v
          // packed encoding is only legal for REPEATED numerics — a
          // non-repeated scalar with wire type 2 must fall through to
          // the wire-type-mismatch error below, not park an array in a
          // scalar slot that explodes later at row access
          case (2, scalar) if f.repeated => // packed repeated numerics
            val len = readVarint().toInt
            val end = pos + len
            val acc = listFor(i)
            while (pos < end) {
              acc += (scalar match {
                case PDouble =>
                  java.lang.Double.longBitsToDouble(readFixed64())
                case PFloat => java.lang.Float.intBitsToFloat(readFixed32())
                case t => decodeScalarVarint(t, readVarint())
              })
            }
          case (0, t) =>
            val v = decodeScalarVarint(t, readVarint())
            if (f.repeated) listFor(i) += v else values(i) = v
          case (1, PDouble) =>
            val v = java.lang.Double.longBitsToDouble(readFixed64())
            if (f.repeated) listFor(i) += v else values(i) = v
          case (5, PFloat) =>
            val v = java.lang.Float.intBitsToFloat(readFixed32())
            if (f.repeated) listFor(i) += v else values(i) = v
          case (w, t) => throw new IllegalArgumentException(
            s"wire type $w does not match field ${f.name}: $t")
        }
      }
    }
    if (lists != null) {
      var i = 0
      while (i < n) {
        if (lists(i) != null) values(i) = new GenericArrayData(lists(i).toArray)
        i += 1
      }
    }
    new GenericInternalRow(values)
  }

  // -------------------------------------------------------------------
  // Catalyst expressions (JsonToStructs-style boundary codecs).

  /** struct -> protobuf bytes. */
  case class ProtoEncode(child: Expression, schema: PSchema)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "proto_encode"
    override protected def nullSafeEval(input: Any): Any =
      encodeRow(input.asInstanceOf[InternalRow], schema,
        child.dataType.asInstanceOf[StructType])
    override protected def withNewChildInternal(c: Expression): ProtoEncode =
      copy(child = c)
  }

  /** protobuf bytes -> struct. */
  case class ProtoDecode(child: Expression, schema: PSchema)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = sparkType(schema)
    override def prettyName: String = "proto_decode"
    override protected def nullSafeEval(input: Any): Any =
      decodeRow(input.asInstanceOf[Array[Byte]], schema)
    override protected def withNewChildInternal(c: Expression): ProtoDecode =
      copy(child = c)
  }

  /** Column API: encode a struct column with the given descriptor. */
  def protoEncode(c: Column, schema: PSchema): Column =
    GraftSqlBridge.columnOf(
      ProtoEncode(GraftSqlBridge.expressionOf(c), schema))

  /** Column API: decode a binary column with the given descriptor. */
  def protoDecode(c: Column, schema: PSchema): Column =
    GraftSqlBridge.columnOf(
      ProtoDecode(GraftSqlBridge.expressionOf(c), schema))
}
