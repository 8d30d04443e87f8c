package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canal-JSON changelog format: the other CDC envelope the reference
  * ships (flink-formats/flink-json/src/main/java/org/apache/flink/
  * formats/json/canal/CanalJsonDeserializationSchema.java).
  *
  * Envelope differences from debezium that this decode honors:
  *  - `data` is an ARRAY of row images (one envelope can carry a
  *    batch); `type` is INSERT / UPDATE / DELETE.
  *  - on UPDATE, `old[i]` holds ONLY the changed fields of the i-th
  *    row's before-image — the unchanged fields must be filled from
  *    `data[i]` (the reference does the same merge). The -U row is
  *    therefore field-wise coalesce(old[i], data[i]).
  *
  * A CHANGED field whose before-value was explicitly null must be
  * distinguished from an ABSENT (unchanged) field — the reference's
  * CanalJsonDeserializationSchema probes JSON field PRESENCE
  * (findValue) so a null->x update emits a -U carrying null, not x.
  * A bare coalesce(old[i].f, data[i].f) cannot see that difference,
  * so the merge here keys off a SECOND parse of `old` as
  * array<map<string,string>>: `map_contains_key` answers "was the
  * field present in old[i]" regardless of its value, and the typed
  * value (null included) then comes from the typed parse. Both
  * parses are codegen'd Jackson runs over the same string — no extra
  * shuffle, no UDF.
  *
  * Same Spark-first shape as [[DebeziumJson]]: typed `from_json`, one
  * posexplode over the batch array, one generator for the 1-or-2-row
  * kind expansion; materialization reuses
  * [[DebeziumJson.materialize]].
  */
object CanalJson {

  def envelopeSchema(payload: StructType): StructType = new StructType()
    .add("data", ArrayType(payload))
    .add("old", ArrayType(payload))
    .add("type", StringType)
    .add("ts", LongType)

  /** Decode canal envelope lines into changelog rows (`kind`, `ts_ms`,
    * payload columns) — same output contract as
    * [[DebeziumJson.decode]], so the two formats are drop-in
    * interchangeable upstream of materialization. Unknown types drop
    * (ignore-parse-errors mode). */
  def decode(raw: DataFrame, payload: StructType,
      valueCol: String = "value"): DataFrame = {
    def tagged(kind: String, row: Column): Column =
      struct(lit(kind).as("kind"), row.as("row"))
    // before-image of row i: fields PRESENT in old[i] (the presence
    // probe - explicit nulls included) from old[i], the rest from the
    // new image data[i]
    def mergedBefore(old: Column, oldMaps: Column, idx: Column,
        newRow: Column): Column = {
      val o = element_at(old, idx + 1)
      val om = element_at(oldMaps, idx + 1)
      struct(payload.fields.map(f =>
        when(map_contains_key(om, f.name), o.getField(f.name))
          .otherwise(newRow.getField(f.name))
          .as(f.name)): _*)
    }
    val probeSchema = new StructType()
      .add("old", ArrayType(MapType(StringType, StringType)))
    val parsed = raw
      .select(from_json(col(valueCol), envelopeSchema(payload)).as("e"),
        from_json(col(valueCol), probeSchema).getField("old").as("om"))
      .select(col("e.ts").as("ts_ms"), col("e.type").as("t"),
        col("e.old").as("o"), col("om"),
        posexplode(col("e.data")).as(Seq("i", "row")))
    parsed.select(
      col("ts_ms"),
      explode(
        when(col("t") === "INSERT", array(tagged("+I", col("row"))))
        .when(col("t") === "UPDATE",
          array(tagged("-U",
            mergedBefore(col("o"), col("om"), col("i"), col("row"))),
            tagged("+U", col("row"))))
        .when(col("t") === "DELETE", array(tagged("-D", col("row"))))
        .otherwise(array().cast(ArrayType(new StructType()
          .add("kind", StringType).add("row", payload))))).as("x"))
      .select(col("x.kind").as("kind"), col("ts_ms"), col("x.row.*"))
  }
}
