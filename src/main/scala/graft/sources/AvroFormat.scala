package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.time.Instant
import scala.jdk.CollectionConverters._

/** Avro container-file format bridge (SURVEY.md §2.1 formats row;
  * reference flink-formats/flink-avro
  * .../avro/AvroRowDataSerializationSchema.java and
  * .../typeutils/AvroSchemaConverter.java — Flink maps RowData <->
  * Avro GenericRecord including nested rows, arrays, maps and the
  * decimal / timestamp / date logical types; we map Spark Row <->
  * GenericRecord over the same public Avro spec).
  *
  * The container image ships Avro core (avro-1.12.1.jar) but not the
  * spark-avro datasource, so this bridge goes straight to the public
  * Avro GenericRecord API:
  *  - write: one container file per partition (distributed, no driver
  *    collect — the same per-partition-file layout every columnar sink
  *    uses), schema derived from the DataFrame schema
  *  - read: parallelize the file list, stream-decode each container
  *    file on an executor
  *
  * Type mapping (AvroSchemaConverter's, restated for Spark types):
  *  - primitives: boolean/int/long/float/double/string/binary
  *    (short/byte widen to Avro int and narrow back on read)
  *  - StructType -> nested Avro record (record names derived from the
  *    field path — Avro requires unique names per schema)
  *  - ArrayType -> Avro array (element nullability = union item)
  *  - MapType (string keys — the only key type Avro maps have) ->
  *    Avro map
  *  - DecimalType(p,s) -> bytes + logicalType decimal (two's-complement
  *    unscaled big-endian, the Avro spec encoding)
  *  - TimestampType -> long + logicalType timestamp-micros;
  *    TimestampNTZType -> long + local-timestamp-micros
  *  - DateType -> int + logicalType date (days since epoch)
  *  - nullable field/element -> union("null", T)
  *  - Avro ENUM <-> StringType, FIXED <-> BinaryType (or DecimalType
  *    when the decimal logical type is attached), and MULTI-BRANCH
  *    unions <-> a struct of nullable `member0..memberN-1` fields (one
  *    per non-null branch, exactly one set) — the same convention the
  *    reference's AvroSchemaConverter uses for non-nullable unions.
  *    These three exist only on the Avro side of the bridge, so they
  *    flow through `writeWithSchema` (caller-supplied Avro schema) and
  *    `readAny`/`sparkTypeOf` (schema derived from the container file).
  *
  * Scale posture: files are written where the executor runs; on a real
  * cluster the dir would be on a shared filesystem (HDFS/object store
  * path), and each partition still writes exactly one file with no
  * cross-partition coordination, so the pattern holds at any fan-out.
  */
object AvroFormat {

  /** Spark StructType -> Avro record schema JSON (nullable = union).
    * `recordName` seeds the path-derived names of nested records. */
  def avroSchemaJson(schema: StructType, recordName: String = "row"): String = {
    def typeJson(dt: DataType, path: String): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case dec: DecimalType =>
        s"""{"type": "bytes", "logicalType": "decimal", """ +
          s""""precision": ${dec.precision}, "scale": ${dec.scale}}"""
      case TimestampType =>
        """{"type": "long", "logicalType": "timestamp-micros"}"""
      case TimestampNTZType =>
        """{"type": "long", "logicalType": "local-timestamp-micros"}"""
      case DateType => """{"type": "int", "logicalType": "date"}"""
      case st: StructType => recordJson(st, path)
      case ArrayType(et, containsNull) =>
        val item = typeJson(et, s"${path}_item")
        val itemT = if (containsNull) s"""["null", $item]""" else item
        s"""{"type": "array", "items": $itemT}"""
      case MapType(StringType, vt, valueContainsNull) =>
        val v = typeJson(vt, s"${path}_value")
        val vT = if (valueContainsNull) s"""["null", $v]""" else v
        s"""{"type": "map", "values": $vT}"""
      case MapType(kt, _, _) => throw new IllegalArgumentException(
        s"Avro maps have string keys only, got key type $kt")
      case other => throw new IllegalArgumentException(
        s"AvroFormat cannot map $other to an Avro type")
    }
    def recordJson(st: StructType, path: String): String = {
      val fields = st.fields.map { f =>
        val t = typeJson(f.dataType, s"${path}_${f.name}")
        val tJson = if (f.nullable) s"""["null", $t]""" else t
        s"""{"name": "${f.name}", "type": $tJson}"""
      }.mkString(", ")
      s"""{"type": "record", "name": "$path", "fields": [$fields]}"""
    }
    recordJson(schema, recordName)
  }

  /** Strip the null branch off a union schema (nullable encoding). */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  /** The union's non-null branches ([s] when not a union). */
  private def nonNullBranches(s: Schema): Seq[Schema] =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toSeq
    else Seq(s)

  /** A union with >1 non-null branches (beyond the nullable encoding). */
  private def isMultiUnion(s: Schema): Boolean = nonNullBranches(s).size > 1

  /** Spark shape of a multi-branch union: struct(member0..memberN-1),
    * all nullable, exactly one set per value. */
  private def isMemberStruct(st: StructType): Boolean =
    st.fields.nonEmpty && st.fields.zipWithIndex.forall {
      case (f, i) => f.name == s"member$i"
    }

  /** Avro schema -> Spark type (the read-side AvroSchemaConverter
    * mapping): ENUM -> string, FIXED -> binary (or decimal when the
    * logical type says so), nullable unions -> nullable inner type,
    * multi-branch unions -> struct of member_i. Timestamps are mapped
    * micros-only (the write side's encoding). */
  def sparkTypeOf(s: Schema): DataType = {
    val lt = Option(s.getLogicalType).map(_.getName).getOrElse("")
    s.getType match {
      case Schema.Type.UNION =>
        val branches = nonNullBranches(s)
        if (branches.size == 1) sparkTypeOf(branches.head)
        else StructType(branches.zipWithIndex.map { case (b, i) =>
          StructField(s"member$i", sparkTypeOf(b), nullable = true)
        })
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (lt == "date") DateType else IntegerType
      case Schema.Type.LONG => lt match {
        case "timestamp-micros" => TimestampType
        case "local-timestamp-micros" => TimestampNTZType
        case _ => LongType
      }
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        if (lt == "decimal") {
          val d = s.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
          DecimalType(d.getPrecision, d.getScale)
        } else BinaryType
      case Schema.Type.RECORD =>
        StructType(s.getFields.asScala.map { f =>
          StructField(f.name, sparkTypeOf(f.schema()),
            nullable = f.schema().getType == Schema.Type.UNION &&
              f.schema().getTypes.asScala.exists(_.getType == Schema.Type.NULL))
        }.toArray)
      case Schema.Type.ARRAY =>
        val es = s.getElementType
        ArrayType(sparkTypeOf(es), containsNull =
          es.getType == Schema.Type.UNION &&
            es.getTypes.asScala.exists(_.getType == Schema.Type.NULL))
      case Schema.Type.MAP =>
        val vs = s.getValueType
        MapType(StringType, sparkTypeOf(vs), valueContainsNull =
          vs.getType == Schema.Type.UNION &&
            vs.getTypes.asScala.exists(_.getType == Schema.Type.NULL))
      case other => throw new IllegalArgumentException(
        s"AvroFormat cannot map Avro $other to a Spark type")
    }
  }

  /** Spark external value -> Avro datum, following the declared Spark
    * type (the write side of AvroRowDataSerializationSchema's
    * conversion tree). */
  private def toAvro(v: Any, dt: DataType, fieldSchema: Schema): Any =
    if (v == null) null else (v, dt) match {
      // multi-branch union: the member-struct carries exactly one
      // non-null field; encode that branch's value against its schema
      case (r: Row, st: StructType)
          if isMultiUnion(fieldSchema) && isMemberStruct(st) =>
        val branches = nonNullBranches(fieldSchema)
        val i = st.fields.indices.find(j => !r.isNullAt(j)).getOrElse(
          throw new IllegalArgumentException(
            "multi-branch union value must set exactly one member"))
        toAvro(r.get(i), st.fields(i).dataType, branches(i))
      case (s: String, StringType)
          if nonNull(fieldSchema).getType == Schema.Type.ENUM =>
        new GenericData.EnumSymbol(nonNull(fieldSchema), s)
      case (b: Array[Byte], BinaryType)
          if nonNull(fieldSchema).getType == Schema.Type.FIXED =>
        new GenericData.Fixed(nonNull(fieldSchema), b)
      case (r: Row, st: StructType) =>
        val sch = nonNull(fieldSchema)
        val rec = new GenericData.Record(sch)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(r.get(i), f.dataType,
            sch.getField(f.name).schema()))
        }
        rec
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        val itemSchema = nonNull(fieldSchema).getElementType
        seq.map(x => toAvro(x, et, itemSchema)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        val valueSchema = nonNull(fieldSchema).getValueType
        val out = new java.util.HashMap[String, Any]()
        m.foreach { case (k, x) => out.put(k.toString, toAvro(x, vt, valueSchema)) }
        out
      case (d: JBigDecimal, dec: DecimalType) =>
        java.nio.ByteBuffer.wrap(
          d.setScale(dec.scale).unscaledValue().toByteArray)
      case (t: java.sql.Timestamp, TimestampType) =>
        val inst = t.toInstant
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      case (t: java.time.LocalDateTime, TimestampNTZType) =>
        val inst = t.toInstant(java.time.ZoneOffset.UTC)
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
      case (b: Array[Byte], _) => java.nio.ByteBuffer.wrap(b)
      case (s: Short, _) => s.toInt
      case (b: Byte, _) => b.toInt
      case (x, _) => x
    }

  /** Avro datum -> Spark external value for the declared Spark type
    * (by NAME for records, so reader-schema evolution composes). */
  private def fromAvro(v: Any, dt: DataType): Any =
    if (v == null) null else (v, dt) match {
      // multi-branch union target: resolve which member the datum is by
      // its runtime Avro type (checked BEFORE the record case — a union
      // may carry record branches). First matching member wins, in the
      // union's declared branch order.
      case (v, st: StructType) if isMemberStruct(st) =>
        val i = unionBranch(v, st)
        Row.fromSeq(st.fields.indices.map(j =>
          if (j == i) fromAvro(v, st.fields(j).dataType) else null))
      case (rec: GenericRecord, st: StructType) =>
        Row.fromSeq(st.fields.toIndexedSeq.map(f =>
          fromAvro(rec.get(f.name), f.dataType)))
      case (c: java.util.Collection[_], ArrayType(et, _)) =>
        c.asScala.map(fromAvro(_, et)).toSeq
      case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
        m.asScala.map { case (k, x) => k.toString -> fromAvro(x, vt) }.toMap
      case (bb: java.nio.ByteBuffer, dec: DecimalType) =>
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a)
        new JBigDecimal(new BigInteger(a), dec.scale)
      case (f: GenericData.Fixed, dec: DecimalType) =>
        new JBigDecimal(new BigInteger(f.bytes()), dec.scale)
      case (f: GenericData.Fixed, BinaryType) => f.bytes()
      case (micros: java.lang.Long, TimestampType) =>
        val sec = Math.floorDiv(micros.longValue(), 1000000L)
        val nano = Math.floorMod(micros.longValue(), 1000000L) * 1000L
        java.sql.Timestamp.from(Instant.ofEpochSecond(sec, nano))
      case (micros: java.lang.Long, TimestampNTZType) =>
        val sec = Math.floorDiv(micros.longValue(), 1000000L)
        val nano = Math.floorMod(micros.longValue(), 1000000L) * 1000L
        java.time.LocalDateTime.ofEpochSecond(sec, nano.toInt,
          java.time.ZoneOffset.UTC)
      case (days: Integer, DateType) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue()))
      case (s, StringType) => s.toString
      case (bb: java.nio.ByteBuffer, BinaryType) =>
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      // write() widens Short/Byte to Avro int; narrow back so the
      // value matches the declared Spark type
      case (i: Integer, ShortType) => i.shortValue()
      case (i: Integer, ByteType) => i.byteValue()
      case (x, _) => x
    }

  /** Which member of the member-struct the Avro datum belongs to, by
    * runtime Avro type (the only signal available once the writer has
    * erased the union). Record branches match by field-name set. */
  private def unionBranch(v: Any, st: StructType): Int = {
    def matches(dt: DataType): Boolean = (v, dt) match {
      case (_: java.lang.Integer, IntegerType | ShortType | ByteType | DateType) => true
      case (_: java.lang.Long, LongType | TimestampType | TimestampNTZType) => true
      case (_: java.lang.Float, FloatType) => true
      case (_: java.lang.Double, DoubleType) => true
      case (_: java.lang.Boolean, BooleanType) => true
      case (_: GenericData.EnumSymbol, StringType) => true
      case (_: CharSequence, StringType) => true
      case (_: GenericData.Fixed, BinaryType | _: DecimalType) => true
      case (_: java.nio.ByteBuffer, BinaryType | _: DecimalType) => true
      case (r: GenericRecord, s2: StructType) =>
        s2.fieldNames.toSet ==
          r.getSchema.getFields.asScala.map(_.name).toSet
      case (_: java.util.Collection[_], _: ArrayType) => true
      case (_: java.util.Map[_, _], _: MapType) => true
      case _ => false
    }
    val i = st.fields.indexWhere(f => matches(f.dataType))
    if (i < 0) throw new IllegalArgumentException(
      s"no union member of $st matches datum type ${v.getClass.getName}")
    // Runtime-type resolution is only sound when exactly one branch
    // matches: two records with identical field-name sets, int+date,
    // long+timestamp, bytes+fixed etc. are indistinguishable once the
    // writer has erased the union — first-match-wins would silently
    // decode into the wrong member, so fail loudly instead.
    val j = st.fields.indexWhere(f => matches(f.dataType), i + 1)
    if (j >= 0) throw new IllegalArgumentException(
      s"ambiguous union: datum type ${v.getClass.getName} matches both " +
        s"member '${st.fields(i).name}' and member '${st.fields(j).name}' " +
        s"of $st — these branches are indistinguishable under the " +
        "runtime-type mapping; use distinct record field-name sets or " +
        "split the union")
    i
  }

  /** Write `df` as Avro container files under `dir` (one per partition). */
  def write(df: DataFrame, dir: String): Unit =
    writeWithSchema(df, dir, avroSchemaJson(df.schema))

  /** Write `df` against a CALLER-SUPPLIED Avro schema — the path that
    * reaches enum (from string columns), fixed (from binary columns)
    * and multi-branch unions (from member-struct columns), none of
    * which Spark's type system can express natively. The schema must be
    * field-compatible with `df.schema` under the mapping in the
    * scaladoc above. */
  def writeWithSchema(df: DataFrame, dir: String, schemaJson: String): Unit = {
    val d = new File(dir)
    if (d.exists()) d.listFiles().foreach(_.delete()) else d.mkdirs()
    val sparkSchema = df.schema
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val sch = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, new File(s"$dir/part-$pid.avro"))
      var n = 0L
      rows.foreach { r =>
        w.append(toAvro(r, sparkSchema, sch).asInstanceOf[GenericRecord])
        n += 1
      }
      w.close()
      Iterator(n)
    }.count(): Unit
  }

  /** Read Avro container files under `dir` back into a DataFrame with
    * the given Spark schema. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    readCore(spark, dir, schema, None)

  /** Read third-party Avro under `dir` with NO declared Spark schema:
    * the first container file's writer schema is converted via
    * [[sparkTypeOf]] (enum -> string, fixed -> binary, multi-branch
    * union -> member struct). */
  def readAny(spark: SparkSession, dir: String): DataFrame = {
    val paths = new File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted
    // The derived Spark schema comes from one writer schema, so every
    // container file must agree — a directory of mixed writers would
    // otherwise decode later files against the wrong shape. (Headers
    // only: this reads a few KB per file, not the data blocks.)
    val schemas = paths.map { p =>
      val rd = DataFileReader.openReader(
        new File(p), new GenericDatumReader[GenericRecord]())
      try p -> rd.getSchema finally rd.close()
    }
    val writerSchema = schemas.head._2
    schemas.find(_._2 != writerSchema).foreach { case (p, s) =>
      throw new IllegalArgumentException(
        s"readAny requires one writer schema per directory: $p declares " +
          s"$s but ${schemas.head._1} declares $writerSchema — use " +
          "readEvolved with an explicit reader schema for mixed writers")
    }
    readCore(spark, dir,
      sparkTypeOf(writerSchema).asInstanceOf[StructType], None)
  }

  /** Read with SCHEMA RESOLUTION (the flink-avro
    * AvroDeserializationSchema reader-schema semantics,
    * flink-formats/flink-avro/.../AvroDeserializationSchema.java):
    * each file's writer schema resolves against `readerSchemaJson` —
    * reader fields missing from the writer take their schema
    * "default", writer fields absent from the reader are skipped,
    * fields match by NAME not position (at any nesting depth).
    * `schema` is the Spark shape of the reader schema. */
  def readEvolved(spark: SparkSession, dir: String, schema: StructType,
      readerSchemaJson: String): DataFrame =
    readCore(spark, dir, schema, Some(readerSchemaJson))

  private def readCore(spark: SparkSession, dir: String, schema: StructType,
      readerSchemaJson: Option[String]): DataFrame = {
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".avro"))
      .map(_.getAbsolutePath).sorted.toSeq
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { path =>
        val datum = new GenericDatumReader[GenericRecord]()
        readerSchemaJson.foreach(j =>
          datum.setExpected(new Schema.Parser().parse(j)))
        val rd = DataFileReader.openReader(new File(path), datum)
        rd.iterator().asScala.map(rec =>
          fromAvro(rec, schema).asInstanceOf[Row])
      }
    spark.createDataFrame(rows, schema)
  }
}
