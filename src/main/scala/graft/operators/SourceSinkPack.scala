package graft.operators

import graft.{QueryPack, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources, formats, sinks, and the remaining structural operators
  * (SURVEY.md §2.1/§2.3/§2.4):
  *  - Values source (StreamExecValues.java:44 / ValuesInputFormat)
  *  - CSV / JSON formats (flink-formats/flink-csv, flink-json) via
  *    write-then-read roundtrips through Spark's built-in datasources
  *  - Window join (StreamExecWindowJoin.java:69): equality on the
  *    window + key — after windowing this is a plain shuffled equi join
  *    whose state/scan is bounded per window, exactly Flink's
  *    WindowJoinOperator story
  *  - Table aggregate / UDTAGG (StreamExecGroupTableAggregate.java:59):
  *    one group -> many rows, via typed groupByKey.flatMapGroups
  *  - ConstraintEnforcer (OP/sink/ConstraintEnforcer.java): NOT NULL
  *    assertion + CHAR-length trim applied as a pre-write projection
  */
object SourceSinkPack extends QueryPack {

  private def tmpDir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_fmt_$name"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Inline literal rows.
    "q_values" -> ((s, d) => {
      import s.implicits._
      Seq((1, "a", Option(1.5)), (2, "b", Option(2.5)), (3, "c", Option.empty[Double]))
        .toDF("id", "tag", "score")
        .select($"id", $"tag", $"score".cast("double"))
    }),

    // CSV format roundtrip: write nation as CSV, read it back with an
    // explicit schema (headers on; deterministic content).
    "q_csv_source" -> ((s, d) => {
      val dir = tmpDir("csv_nation")
      T.nation(s, d).coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(dir)
      s.read.option("header", "true")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(dir)
    }),

    // JSON-lines format roundtrip on region.
    "q_json_source" -> ((s, d) => {
      val dir = tmpDir("json_region")
      T.region(s, d).coalesce(1).write.mode("overwrite").json(dir)
      s.read.schema("r_regionkey INT, r_name STRING").json(dir)
    }),

    // Compressed-format roundtrip (flink-formats/flink-compress
    // analog): gzip JSON-lines out, transparent codec-detected read
    // back. Each partition writes one .gz file; the codec rides on the
    // writer, so the layout story is identical to the uncompressed
    // path. (Gzip is not splittable — one file = one read task — which
    // is why the per-partition-file layout matters at scale; splittable
    // codecs like zstd ride the same option.)
    "q_compress_source" -> ((s, d) => {
      val dir = tmpDir("gz_customer")
      T.customer(s, d).write.mode("overwrite")
        .option("compression", "gzip").json(dir)
      s.read.schema(T.customer(s, d).schema).json(dir)
    }),

    // ORC format roundtrip on part (Spark built-in columnar datasource;
    // flink-formats/flink-orc analog). Full pushdown on re-read.
    "q_orc_source" -> ((s, d) => {
      val dir = tmpDir("orc_part")
      T.part(s, d).write.mode("overwrite").orc(dir)
      s.read.orc(dir)
    }),

    // Avro format roundtrip on supplier via the GenericRecord bridge
    // (flink-formats/flink-avro analog; see sources/AvroFormat.scala).
    "q_avro_source" -> ((s, d) => {
      val dir = tmpDir("avro_supplier")
      val src = T.supplier(s, d)
      graft.sources.AvroFormat.write(src, dir)
      graft.sources.AvroFormat.read(s, dir, src.schema)
    }),

    // Avro FULL type mapping roundtrip (flink-formats/flink-avro
    // .../typeutils/AvroSchemaConverter.java analog): nested record,
    // array of decimals (bytes + decimal logical type), string-keyed
    // map, timestamp-micros — written and re-read through the
    // GenericRecord bridge, then flattened so the DuckDB oracle can
    // recompute the identical projection straight from orders. The
    // encode+decode across every composite type must be the identity.
    // The hashed surface emits integer cents (BIGINT) rather than the
    // DECIMAL(18,2) itself: per repo rule, no hashed output is ever a
    // double→decimal rendering (driver-side decimal canonicalization
    // differs from DuckDB's); the decimal logical-type roundtrip stays
    // bit-exact-pinned in AvroFormatSpec.
    "q_avro_nested" -> ((s, d) => {
      import s.implicits._
      val dir = tmpDir("avro_nested_orders")
      // fan the single-split orders scan out before the per-row encode
      // + file write (size-gated no-op at scale — graft.ext.FanOut):
      // the whole write-roundtrip otherwise encodes on one core and
      // round-trips through a single output file
      val o = graft.ext.FanOut.fanOut(T.orders(s, d), $"o_orderkey")
      val src = o.select(
        $"o_orderkey", $"o_custkey",
        struct($"o_orderstatus".as("status"),
          $"o_orderpriority".as("prio")).as("meta"),
        array($"o_totalprice".cast("decimal(18,2)"),
          $"o_totalprice".cast("decimal(18,2)")).as("amounts"),
        map(lit("seg"), $"o_orderstatus").as("tags"),
        $"o_orderdate".as("od"))
      graft.sources.AvroFormat.write(src, dir)
      val back = graft.sources.AvroFormat.read(s, dir, src.schema)
      back.select(
        $"o_orderkey", $"o_custkey",
        $"meta.status".as("status"), $"meta.prio".as("prio"),
        round(element_at($"amounts", 1) * 100).cast("long").as("price_cents"),
        element_at($"tags", "seg").as("seg"),
        $"od")
    }),

    // Avro ENUM + FIXED + multi-branch UNION roundtrip (the remaining
    // AvroSchemaConverter.java mappings — flink-formats/flink-avro
    // .../typeutils/AvroSchemaConverter.java maps ENUM->string,
    // FIXED->bytes, general unions->row of members): the writer schema
    // is hand-declared (Spark can't express these), the read side
    // derives the Spark schema FROM the container file (readAny), and
    // the flattened projection is recomputed by the oracle straight
    // from orders, so enum symbol, fixed bytes and union branch routing
    // must all survive the roundtrip exactly.
    "q_avro_complex" -> ((s, d) => {
      import s.implicits._
      val dir = tmpDir("avro_complex_orders")
      // fan the single-split orders scan out before the per-row encode
      // + file write (size-gated no-op at scale — graft.ext.FanOut):
      // the whole write-roundtrip otherwise encodes on one core and
      // round-trips through a single output file
      val o = graft.ext.FanOut.fanOut(T.orders(s, d), $"o_orderkey")
      val src = o.select(
        $"o_orderkey",
        $"o_orderstatus".as("status"), // -> enum {O,F,P}
        unhex(lpad(hex($"o_orderkey"), 16, "0")).as("okey_fx"), // -> fixed(8)
        when($"o_orderkey" % 2 === 0,
          struct($"o_custkey".as("member0"),
            lit(null).cast("string").as("member1")))
          .otherwise(struct(lit(null).cast("long").as("member0"),
            $"o_orderpriority".as("member1")))
          .as("uval")) // -> union(null, long, string)
      val schemaJson =
        """{"type": "record", "name": "row", "fields": [
          |  {"name": "o_orderkey", "type": ["null", "long"]},
          |  {"name": "status", "type": ["null",
          |     {"type": "enum", "name": "st", "symbols": ["O", "F", "P"]}]},
          |  {"name": "okey_fx", "type": ["null",
          |     {"type": "fixed", "name": "fx8", "size": 8}]},
          |  {"name": "uval", "type": ["null", "long", "string"]}
          |]}""".stripMargin
      graft.sources.AvroFormat.writeWithSchema(src, dir, schemaJson)
      val back = graft.sources.AvroFormat.readAny(s, dir)
      back.select($"o_orderkey", $"status",
        hex($"okey_fx").as("okey_hex"),
        coalesce($"uval.member0".cast("string"), $"uval.member1").as("uval"))
    }),

    // Protobuf format roundtrip (flink-formats/flink-protobuf analog;
    // see sources/ProtoFormat.scala — native wire-format codec, no
    // protobuf runtime needed). Exercises varint, zigzag (score can be
    // negative), repeated string, and a nested message; the oracle
    // computes the same projection directly, so encode+decode must be
    // the identity for the hash to match.
    "q_proto_source" -> ((s, d) => {
      import s.implicits._
      import graft.sources.ProtoFormat._
      import graft.sources.ProtoFormat.PType._
      val meta = PSchema(Seq(
        PField(1, "source", PString), PField(2, "n_chars", PInt64)))
      val schema = PSchema(Seq(
        PField(1, "doc_id", PInt64),
        PField(2, "lang", PString),
        PField(3, "score", PSInt64),
        PField(4, "toks", PString, repeated = true),
        PField(5, "meta", PMsg(meta))))
      T.documents(s, d)
        .select(protoEncode(struct(
          $"doc_id", $"lang", ($"n_chars" - 300L).as("score"),
          slice(split($"text", " "), 1, 5).as("toks"),
          struct($"source", $"n_chars").as("meta")), schema).as("bin"))
        .select(protoDecode($"bin", schema).as("m"))
        .select($"m.doc_id".as("doc_id"), $"m.lang".as("lang"),
          $"m.score".as("score"),
          array_join($"m.toks", " ").as("toks_head"),
          $"m.meta.source".as("source"), $"m.meta.n_chars".as("n_chars"))
    }),

    // Kafka RecordBatch v2 (log-segment) codec roundtrip
    // (sources/KafkaSegmentFormat.scala): orders grouped into batches
    // of 256 keys, encoded into real magic=2 batches (CRC32C, zigzag
    // varints, gzip'd records section), decoded back and exploded —
    // the DuckDB oracle reconstructs the same (offset, timestamp,
    // key, value) rows from plain SQL, so the gate covers the full
    // binary roundtrip including the offset/timestamp delta
    // arithmetic. sort_array on the unique o_orderkey timestamp makes
    // the per-batch record order total on both engines.
    "q_kafka_segments" -> ((s, d) => {
      import s.implicits._
      import graft.sources.KafkaSegmentFormat._
      val grouped = T.orders(s, d)
        .select((expr("o_orderkey div 256")).as("batch_id"),
          struct($"o_orderkey".as("timestamp"),
            encode($"o_orderkey".cast("string"), "UTF-8").as("key"),
            encode($"o_orderpriority", "UTF-8").as("value")).as("rec"))
        .groupBy($"batch_id")
        .agg(sort_array(collect_list($"rec")).as("records"))
      // ALL FIVE protocol codecs in one oracle-gated roundtrip (r13):
      // each batch_id slice encodes with a different attribute codec
      // (0 none, 1 gzip, 2 snappy, 3 lz4, 4 zstd); the decoded rows
      // are codec-invariant, so the DuckDB oracle is unchanged
      val batches = (0 to 4).map { c =>
        grouped.filter($"batch_id" % 5 === c)
          .select(kafkaEncode(struct(($"batch_id" * 1000L)
            .as("base_offset"), $"records"), codec = c).as("bin"))
      }.reduce(_ unionAll _)
      batches
        .select(explode(kafkaDecode($"bin")).as("r"))
        .select($"r.offset".as("rec_offset"),
          $"r.timestamp".as("rec_ts"),
          decode($"r.key", "UTF-8").as("k"),
          decode($"r.value", "UTF-8").as("v"))
    }),

    // Debezium-JSON changelog format roundtrip (flink-formats/
    // flink-json .../debezium/DebeziumJsonDeserializationSchema.java
    // analog; see sources/DebeziumJson.scala). Synthesizes a
    // deterministic CDC history over orders — every row inserted
    // (op c, ts 1), keys %3==0 updated with +10 totalprice (op u,
    // ts 2), keys %7==0 deleted (op d, ts 3) — encodes it as envelope
    // JSON lines, then decodes and MATERIALIZES final state. The
    // oracle recomputes that state from the same rules directly, so
    // envelope encode -> decode -> +I/-U/+U/-D expansion ->
    // keep-last-by-key must compose to exactly the final table.
    "q_debezium_source" -> ((s, d) => {
      import s.implicits._
      import graft.sources.DebeziumJson
      val dir = tmpDir("dbz_orders")
      // fan the single-split orders scan out before the per-row encode
      // + file write (size-gated no-op at scale — graft.ext.FanOut):
      // the whole write-roundtrip otherwise encodes on one core and
      // round-trips through a single output file
      val o = graft.ext.FanOut.fanOut(T.orders(s, d), $"o_orderkey")
      val pay = struct(o.columns.map(col): _*)
      val payUpd = struct(o.columns.map(c =>
        if (c == "o_totalprice") (col(c) + 10).as(c) else col(c)): _*)
      val nullPay = lit(null).cast(o.schema)
      val inserts = o.select(nullPay.as("before"), pay.as("after"),
        lit("c").as("op"), lit(1L).as("ts_ms"))
      val updates = o.filter($"o_orderkey" % 3 === 0)
        .select(pay.as("before"), payUpd.as("after"),
          lit("u").as("op"), lit(2L).as("ts_ms"))
      val deletes = o.filter($"o_orderkey" % 7 === 0)
        .select(pay.as("before"), nullPay.as("after"),
          lit("d").as("op"), lit(3L).as("ts_ms"))
      inserts.union(updates).union(deletes)
        .select(to_json(struct($"before", $"after", $"op", $"ts_ms"))
          .as("value"))
        .write.mode("overwrite").text(dir)
      DebeziumJson.materialize(
        DebeziumJson.decode(s.read.text(dir), o.schema),
        Seq("o_orderkey"))
    }),

    // DataGen table source analog (flink-table-api-java-bridge
    // .../datagen/table/DataGenTableSource.java): a generated table
    // with a SEQUENCE column (start offset) and RANDOM columns
    // (bounded int, fixed-length string). Spark-first: spark.range is
    // the parallel, partitioned generator; "randomness" is md5-derived
    // from the row id so both engines reproduce it exactly (the
    // deterministic analog of datagen's seeded generators). Scale:
    // range splits across executors; every derived column is a
    // per-row projection — no shuffle at any size.
    "q_datagen_source" -> ((s, d) => {
      import s.implicits._
      val h = md5(concat(lit("dg_"), $"id".cast("string")))
      s.range(1000).select(
        $"id",
        ($"id" + 100L).as("seq_val"),
        (conv(substring(h, 1, 4), 16, 10).cast("long") % 100L)
          .as("rand_int"),
        substring(h, 5, 8).as("rand_str"))
    }),

    // Raw format roundtrip (flink-table-runtime .../formats/raw/
    // RawFormatSerializationSchema.java): a single column's bytes ARE
    // the payload — UTF-8 for strings, big-endian for integers (the
    // reference's default). Serialize then deserialize must be the
    // identity; the oracle reads the source columns directly.
    "q_raw_source" -> ((s, d) => {
      import s.implicits._
      val enc = T.documents(s, d).select(
        $"doc_id",
        $"text".cast("binary").as("text_bytes"),
        expr("unhex(lpad(hex(n_chars), 16, '0'))").as("n_bytes"))
      enc.select(
        $"doc_id",
        $"text_bytes".cast("string").as("text"),
        conv(hex($"n_bytes"), 16, 10).cast("long").as("n_chars"))
    }),

    // Canal-JSON changelog roundtrip (flink-formats/flink-json
    // .../canal/CanalJsonDeserializationSchema.java analog; see
    // sources/CanalJson.scala). Same synthesized CDC history as
    // q_debezium_source but canal-encoded: batched `data` arrays,
    // UPDATE's `old` carrying ONLY the changed field (o_totalprice) —
    // the decode must merge the partial before-image from the new
    // image. Materialization is shared with debezium, so both formats
    // must reduce to the identical final state.
    "q_canal_source" -> ((s, d) => {
      import s.implicits._
      import graft.sources.{CanalJson, DebeziumJson}
      val dir = tmpDir("canal_orders")
      // fan the single-split orders scan out before the per-row encode
      // + file write (size-gated no-op at scale — graft.ext.FanOut):
      // the whole write-roundtrip otherwise encodes on one core and
      // round-trips through a single output file
      val o = graft.ext.FanOut.fanOut(T.orders(s, d), $"o_orderkey")
      val pay = struct(o.columns.map(col): _*)
      val payUpd = struct(o.columns.map(c =>
        if (c == "o_totalprice") (col(c) + 10).as(c) else col(c)): _*)
      // partial before-image: only the changed column is present
      val payOldPartial = struct(o.schema.fields.map(f =>
        if (f.name == "o_totalprice") col(f.name).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)): _*)
      val nullOld = lit(null)
        .cast(org.apache.spark.sql.types.ArrayType(o.schema))
      val inserts = o.select(array(pay).as("data"), nullOld.as("old"),
        lit("INSERT").as("type"), lit(1L).as("ts"))
      val updates = o.filter($"o_orderkey" % 3 === 0)
        .select(array(payUpd).as("data"), array(payOldPartial).as("old"),
          lit("UPDATE").as("type"), lit(2L).as("ts"))
      val deletes = o.filter($"o_orderkey" % 7 === 0)
        .select(array(pay).as("data"), nullOld.as("old"),
          lit("DELETE").as("type"), lit(3L).as("ts"))
      inserts.union(updates).union(deletes)
        .select(to_json(struct($"data", $"old", $"type", $"ts")).as("value"))
        .write.mode("overwrite").text(dir)
      DebeziumJson.materialize(
        CanalJson.decode(s.read.text(dir), o.schema),
        Seq("o_orderkey"))
    }),

    // Maxwell-JSON changelog roundtrip (flink-formats/flink-json
    // .../maxwell/MaxwellJsonDeserializationSchema.java analog; see
    // sources/MaxwellJson.scala). Same synthesized CDC history as
    // q_debezium_source/q_canal_source, maxwell-encoded: single-row
    // `data` images, lowercase types, ts in epoch SECONDS, UPDATE's
    // `old` carrying only the changed field. All three envelopes share
    // one materialization, so all three must reduce to the identical
    // final state — the oracle is byte-identical to canal's.
    "q_maxwell_source" -> ((s, d) => {
      import s.implicits._
      import graft.sources.{DebeziumJson, MaxwellJson}
      val dir = tmpDir("maxwell_orders")
      // fan the single-split orders scan out before the per-row encode
      // + file write (size-gated no-op at scale — graft.ext.FanOut):
      // the whole write-roundtrip otherwise encodes on one core and
      // round-trips through a single output file
      val o = graft.ext.FanOut.fanOut(T.orders(s, d), $"o_orderkey")
      val pay = struct(o.columns.map(col): _*)
      val payUpd = struct(o.columns.map(c =>
        if (c == "o_totalprice") (col(c) + 10).as(c) else col(c)): _*)
      // partial before-image: only the changed column is present
      val payOldPartial = struct(o.schema.fields.map(f =>
        if (f.name == "o_totalprice") col(f.name).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)): _*)
      val nullOld = lit(null).cast(o.schema)
      val inserts = o.select(pay.as("data"), nullOld.as("old"),
        lit("insert").as("type"), lit(1L).as("ts"))
      val updates = o.filter($"o_orderkey" % 3 === 0)
        .select(payUpd.as("data"), payOldPartial.as("old"),
          lit("update").as("type"), lit(2L).as("ts"))
      val deletes = o.filter($"o_orderkey" % 7 === 0)
        .select(pay.as("data"), nullOld.as("old"),
          lit("delete").as("type"), lit(3L).as("ts"))
      inserts.union(updates).union(deletes)
        .select(to_json(struct($"data", $"old", $"type", $"ts")).as("value"))
        .write.mode("overwrite").text(dir)
      DebeziumJson.materialize(
        MaxwellJson.decode(s.read.text(dir), o.schema),
        Seq("o_orderkey"))
    }),

    // SequenceFile format roundtrip (flink-formats/flink-sequence-file
    // .../SequenceFileWriterFactory.java analog): Hadoop key-value
    // SequenceFile written and re-read through the in-container Hadoop
    // API (saveAsSequenceFile / sc.sequenceFile — Writable conversion
    // is implicit), bridged back to a DataFrame. The key carries the
    // row id (LongWritable), the value a delimited record (Text) —
    // the classic Hadoop-interop layout. This is the one deliberate
    // RDD use in the source packs: SequenceFile IS a key-value RDD
    // format; everything after the read is DataFrame again.
    "q_seqfile_source" -> ((s, d) => {
      import s.implicits._
      val dir = tmpDir("seq_nation")
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true) // overwrite semantics
      T.nation(s, d)
        .select($"n_nationkey".cast("long"),
          concat_ws("|", $"n_name", $"n_regionkey"))
        .as[(Long, String)].rdd
        .saveAsSequenceFile(dir)
      s.sparkContext.sequenceFile[Long, String](dir)
        .toDF("k", "payload")
        .select($"k".cast("int").as("n_nationkey"),
          split($"payload", "\\|")(0).as("n_name"),
          split($"payload", "\\|")(1).cast("int").as("n_regionkey"))
    }),

    // JDBC connector roundtrip through embedded Derby (the same
    // spark-jdbc path a Postgres/MySQL URL would take; flink-connector-
    // jdbc analog). Embedded = in-JVM, so single-partition write; a
    // server URL lifts that restriction with numPartitions/partitionColumn.
    "q_jdbc_source" -> ((s, d) => {
      val url = s"jdbc:derby:${tmpDir("derby_db")};create=true"
      T.nation(s, d).coalesce(1).write.mode("overwrite")
        .format("jdbc").option("url", url)
        .option("dbtable", "nation_jdbc")
        .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver").save()
      s.read.format("jdbc").option("url", url)
        .option("dbtable", "nation_jdbc")
        .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver").load()
    }),

    // Window join: purchases joined to clicks of the same user within
    // the same 1h tumbling window.
    "q_window_join" -> ((s, d) => {
      import s.implicits._
      val e = T.events(s, d)
      val p = WindowOps.tumble(e.filter($"event_type" === "purchase"), $"ts", "1 hour")
        .select($"user_id", $"window_start", $"event_id".as("purchase_id"))
      val c = WindowOps.tumble(e.filter($"event_type" === "click"), $"ts", "1 hour")
        .select($"user_id".as("c_user"), $"window_start".as("c_ws"),
          $"event_id".as("click_id"))
      p.join(c, $"user_id" === $"c_user" && $"window_start" === $"c_ws")
        .select($"purchase_id", $"click_id", $"window_start")
    }),

    // Table aggregate (UDTAGG): each group emits multiple rows.
    "q_table_agg" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_returnflag", $"l_quantity").as[(String, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (flag: String, rows: Iterator[(String, Double)]) =>
          var mn = Double.MaxValue; var mx = Double.MinValue; var n = 0L
          rows.foreach { case (_, q) =>
            if (q < mn) mn = q
            if (q > mx) mx = q
            n += 1
          }
          Iterator(
            (flag, "min", mn), (flag, "max", mx), (flag, "n", n.toDouble))
        }
        .toDF("l_returnflag", "metric", "value")
    }),

    // Constraint enforcement before a sink: NOT NULL assert + CHAR(6)
    // trim (Flink's ConstraintEnforcer with CHAR length enforcement).
    "q_constraint_enforce" -> ((s, d) => {
      import s.implicits._
      T.customer(s, d).select(
        $"c_custkey",
        when($"c_name".isNull,
          raise_error(lit("NOT NULL constraint violated: c_name")))
          .otherwise($"c_name").as("c_name"),
        substring($"c_mktsegment", 1, 6).as("seg_char6"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_values" ->
      """SELECT id, tag, CAST(score AS DOUBLE) AS score
         FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', NULL))
         AS t(id, tag, score)""",
    "q_csv_source" ->
      """SELECT * FROM nation""",
    "q_json_source" ->
      """SELECT * FROM region""",
    "q_orc_source" ->
      """SELECT * FROM part""",
    "q_compress_source" ->
      """SELECT * FROM customer""",
    "q_jdbc_source" ->
      """SELECT * FROM nation""",
    "q_seqfile_source" ->
      """SELECT * FROM nation""",
    "q_debezium_source" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
            CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                 ELSE o_totalprice END AS o_totalprice,
            o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 7 <> 0""",
    "q_datagen_source" ->
      """SELECT r.range AS id,
            r.range + 100 AS seq_val,
            CAST(('0x' || substr(md5('dg_' || r.range), 1, 4)) AS BIGINT)
              % 100 AS rand_int,
            substr(md5('dg_' || r.range), 5, 8) AS rand_str
         FROM range(0, 1000) r""",
    "q_raw_source" ->
      """SELECT doc_id, text, n_chars FROM documents""",
    "q_canal_source" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
            CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                 ELSE o_totalprice END AS o_totalprice,
            o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 7 <> 0""",
    "q_maxwell_source" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
            CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                 ELSE o_totalprice END AS o_totalprice,
            o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey % 7 <> 0""",
    "q_proto_source" ->
      """SELECT doc_id, lang, n_chars - 300 AS score,
            array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
              AS toks_head,
            source, n_chars
         FROM documents""",
    "q_kafka_segments" ->
      """SELECT (o_orderkey // 256) * 1000
                + row_number() OVER (PARTITION BY o_orderkey // 256
                                     ORDER BY o_orderkey) - 1
                  AS rec_offset,
                o_orderkey AS rec_ts,
                CAST(o_orderkey AS VARCHAR) AS k,
                o_orderpriority AS v
         FROM orders""",
    "q_avro_source" ->
      """SELECT * FROM supplier""",
    "q_avro_nested" ->
      """SELECT o_orderkey, o_custkey,
            o_orderstatus AS status, o_orderpriority AS prio,
            CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
            o_orderstatus AS seg, o_orderdate AS od
         FROM orders""",
    "q_avro_complex" ->
      """SELECT o_orderkey, o_orderstatus AS status,
            upper(lpad(to_hex(o_orderkey), 16, '0')) AS okey_hex,
            CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_custkey AS VARCHAR)
                 ELSE o_orderpriority END AS uval
         FROM orders""",
    "q_window_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
            make_timestamp(CAST(floor(epoch(p.ts)/3600)*3600 AS BIGINT)*1000000) AS window_start
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND floor(epoch(p.ts)/3600) = floor(epoch(c.ts)/3600)""",
    "q_table_agg" ->
      """SELECT l_returnflag, 'min' AS metric, min(l_quantity) AS value
         FROM lineitem GROUP BY l_returnflag
         UNION ALL
         SELECT l_returnflag, 'max' AS metric, max(l_quantity) AS value
         FROM lineitem GROUP BY l_returnflag
         UNION ALL
         SELECT l_returnflag, 'n' AS metric, CAST(count(*) AS DOUBLE) AS value
         FROM lineitem GROUP BY l_returnflag""",
    "q_constraint_enforce" ->
      """SELECT c_custkey, c_name, substr(c_mktsegment, 1, 6) AS seg_char6
         FROM customer"""
  )
}
