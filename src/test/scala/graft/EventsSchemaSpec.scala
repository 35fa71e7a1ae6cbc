package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for driver-side testdata regeneration: events.parquet has
  * shipped with different physical `ts` encodings across rounds
  * (TIMESTAMP(NANOS) in rounds 1-4, timestamp[us] from round 5), and a
  * reader pinned to one encoding silently breaks every events query
  * when the data flips. `Tables.normalizeEventsTs` must accept all
  * encodings and produce the SAME session-zoned micro timestamps. */
class EventsSchemaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val wallMicros = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  test("long (nanos-as-long) ts normalizes via the DIV 1000 projection") {
    val df = Seq((1L, wallMicros * 1000L + 789L)).toDF("event_id", "ts")
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == wallMicros, s"nanos DIV 1000 must truncate, got $got")
  }

  test("timestamp_ntz ts normalizes to the same UTC wall-clock micros") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(wallMicros)).cast(TimestampNTZType))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == wallMicros)
  }

  test("already-zoned timestamp ts passes through unchanged") {
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(wallMicros)))
    val out = Tables.normalizeEventsTs(df)
    assert(out eq df, "TimestampType input must not be reprojected")
  }

  test("unsupported ts type fails loudly, not with a silent wrong answer") {
    val df = Seq((1L, "2023-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeEventsTs(df))
    assert(e.getMessage.contains("unsupported"))
  }

  test("the real events table reads as session-zoned timestamps at sf") {
    val out = Tables(spark, sf).events
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.count() > 0)
  }
}
