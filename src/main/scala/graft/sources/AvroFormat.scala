package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
import scala.jdk.CollectionConverters._

/** Avro container-file format bridge (SURVEY.md §2.1 formats row;
  * reference flink-formats/flink-avro
  * .../avro/AvroRowDataSerializationSchema.java and
  * AvroRowDataDeserializationSchema.java — Flink maps RowData <-> Avro
  * GenericRecord; we map Spark Row <-> GenericRecord the same way).
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
  * Supported Spark types: the Avro-primitive subset (boolean, int,
  * long, float, double, string, binary), nullable via union(null, T) —
  * the same mapping AvroSchemaConverter uses for these types.
  *
  * Scale posture: files are written where the executor runs; on a real
  * cluster the dir would be on a shared filesystem (HDFS/object store
  * path), and each partition still writes exactly one file with no
  * cross-partition coordination, so the pattern holds at any fan-out.
  */
object AvroFormat {

  /** Spark StructType -> Avro record schema JSON (nullable = union). */
  def avroSchemaJson(schema: StructType, recordName: String = "row"): String = {
    def prim(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType | ShortType | ByteType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case other => throw new IllegalArgumentException(
        s"AvroFormat supports primitive columns only, got $other")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$recordName", "fields": [$fields]}"""
  }

  /** Write `df` as Avro container files under `dir` (one per partition). */
  def write(df: DataFrame, dir: String): Unit = {
    val d = new File(dir)
    if (d.exists()) d.listFiles().foreach(_.delete()) else d.mkdirs()
    val schemaJson = avroSchemaJson(df.schema)
    val names = df.schema.fieldNames
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val sch = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      w.create(sch, new File(s"$dir/part-$pid.avro"))
      var n = 0L
      rows.foreach { r =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < names.length) {
          val v = r.get(i) match {
            case null => null
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case s: Short => s.toInt
            case b: Byte => b.toInt
            case x => x
          }
          rec.put(names(i), v)
          i += 1
        }
        w.append(rec); n += 1
      }
      w.close()
      Iterator(n)
    }.count(): Unit
  }

  /** Read Avro container files under `dir` back into a DataFrame with
    * the given Spark schema. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    readCore(spark, dir, schema, None)

  /** Read with SCHEMA RESOLUTION (the flink-avro
    * AvroDeserializationSchema reader-schema semantics,
    * flink-formats/flink-avro/.../AvroDeserializationSchema.java):
    * each file's writer schema resolves against `readerSchemaJson` —
    * reader fields missing from the writer take their schema
    * "default", writer fields absent from the reader are skipped,
    * fields match by NAME not position. `schema` is the Spark shape
    * of the reader schema. */
  def readEvolved(spark: SparkSession, dir: String, schema: StructType,
      readerSchemaJson: String): DataFrame =
    readCore(spark, dir, schema, Some(readerSchemaJson))

  private def readCore(spark: SparkSession, dir: String, schema: StructType,
      readerSchemaJson: Option[String]): DataFrame = {
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".avro"))
      .map(_.getAbsolutePath).sorted.toSeq
    val names = schema.fieldNames
    val dts = schema.fields.map(_.dataType)
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { path =>
        val datum = new GenericDatumReader[GenericRecord]()
        readerSchemaJson.foreach(j =>
          datum.setExpected(new Schema.Parser().parse(j)))
        val rd = DataFileReader.openReader(new File(path), datum)
        rd.iterator().asScala.map { rec =>
          val vals = names.indices.map { i =>
            (rec.get(names(i)), dts(i)) match {
              case (null, _) => null
              case (v, StringType) => v.toString
              case (v: java.nio.ByteBuffer, BinaryType) =>
                val a = new Array[Byte](v.remaining()); v.get(a); a
              // write() widens Short/Byte to Avro int; narrow back so the
              // value matches the declared Spark type
              case (v: Integer, ShortType) => v.shortValue()
              case (v: Integer, ByteType) => v.byteValue()
              case (v, _) => v
            }
          }
          Row.fromSeq(vals)
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
