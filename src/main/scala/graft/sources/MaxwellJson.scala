package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maxwell-JSON changelog format: the third CDC envelope the reference
  * ships (flink-formats/flink-json/src/main/java/org/apache/flink/
  * formats/json/maxwell/MaxwellJsonDeserializationSchema.java).
  *
  * Envelope shape (Maxwell's Daemon wire format): a SINGLE row image
  * per line — `data` is the full new image, `type` is
  * insert / update / delete (lowercase), `ts` is epoch SECONDS, and on
  * update `old` carries ONLY the changed fields' before-values (the
  * same partial-before-image convention as canal, but unbatched). On
  * delete, `data` holds the deleted row.
  *
  * Decode shape matches [[DebeziumJson]]/[[CanalJson]]: typed
  * `from_json`, one generator for the 1-or-2-row kind expansion,
  * output contract (`kind`, `ts_ms`, payload columns) identical, so
  * [[DebeziumJson.materialize]] is shared by all three envelopes.
  * `ts_ms` = ts * 1000 — Maxwell's seconds normalized to the common
  * millisecond axis.
  *
  * Before-image merge follows [[CanalJson]]: a second parse of `old`
  * as map<string,string> answers field PRESENCE, so a changed field
  * whose before-value was explicitly null keeps the null in the -U
  * image (the reference's MaxwellJsonDeserializationSchema probes
  * JSON field presence the same way).
  */
object MaxwellJson {

  def envelopeSchema(payload: StructType): StructType = new StructType()
    .add("data", payload)
    .add("old", payload)
    .add("type", StringType)
    .add("ts", LongType)

  /** Decode maxwell envelope lines into changelog rows (`kind`,
    * `ts_ms`, payload columns) — drop-in interchangeable with
    * [[DebeziumJson.decode]] / [[CanalJson.decode]] upstream of
    * materialization. Unknown types drop (ignore-parse-errors mode;
    * Maxwell also emits bootstrap-insert etc. which the reference
    * ignores unless configured). */
  def decode(raw: DataFrame, payload: StructType,
      valueCol: String = "value"): DataFrame = {
    def tagged(kind: String, row: Column): Column =
      struct(lit(kind).as("kind"), row.as("row"))
    // before-image: fields PRESENT in `old` (explicit nulls included,
    // via the presence probe) from `old`, the rest from `data`
    def mergedBefore(old: Column, oldMap: Column, newRow: Column): Column =
      struct(payload.fields.map(f =>
        when(map_contains_key(oldMap, f.name), old.getField(f.name))
          .otherwise(newRow.getField(f.name))
          .as(f.name)): _*)
    val probeSchema = new StructType()
      .add("old", MapType(StringType, StringType))
    val parsed = raw
      .select(from_json(col(valueCol), envelopeSchema(payload)).as("e"),
        from_json(col(valueCol), probeSchema).getField("old").as("om"))
      .select((col("e.ts") * 1000L).as("ts_ms"), col("e.type").as("t"),
        col("e.old").as("o"), col("om"), col("e.data").as("row"))
    parsed.select(
      col("ts_ms"),
      explode(
        when(col("t") === "insert", array(tagged("+I", col("row"))))
        .when(col("t") === "update",
          array(tagged("-U", mergedBefore(col("o"), col("om"), col("row"))),
            tagged("+U", col("row"))))
        .when(col("t") === "delete", array(tagged("-D", col("row"))))
        .otherwise(array().cast(ArrayType(new StructType()
          .add("kind", StringType).add("row", payload))))).as("x"))
      .select(col("x.kind").as("kind"), col("ts_ms"), col("x.row.*"))
  }
}
