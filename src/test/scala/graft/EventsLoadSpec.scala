package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.events`'s schema-adaptive ts handling. The driver's
  * generator has shipped events.ts as TIMESTAMP(NANOS) (surfaced as
  * nanos-since-epoch long under `nanosAsLong`) and later as plain
  * TIMESTAMP(MICROS); a hard-coded assumption either way breaks every
  * events-view query at analysis time (round 6 lost 26 queries to
  * exactly this). Both paths must yield timestamp_ntz with identical
  * values for the same instant.
  */
class EventsLoadSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("live testdata loads with ts as timestamp_ntz") {
    val df = Tables.events(spark, TestSpark.sf)
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.count() > 0)
  }

  test("nanos-as-long generator flavor floor-truncates to micros") {
    val dir = java.nio.file.Files.createTempDirectory("events_nanos").toString
    // 2021-01-01T00:00:00.000001999 -> micros floor .000001
    val nanos = 1609459200L * 1000000000L + 1999L
    Seq((1L, nanos, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    val got = df.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(got == "2021-01-01 00:00:00.000001")
  }

  test("micros-timestamp generator flavor passes through unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("events_micros").toString
    Seq((1L, "2021-01-01 00:00:00.000001", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts".cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    val got = df.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(got == "2021-01-01 00:00:00.000001")
  }
}
