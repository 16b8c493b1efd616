package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.Streams

/** Structured Streaming parity: the streaming window aggregation over the
  * events table (drained with Trigger.AvailableNow) must equal the batch
  * EventOps result — same plan semantics, different execution mode. */
class StreamsSpec extends SparkSpec {

  test("streaming windowed counts == batch tumbling aggregation") {
    val batch = EventOps.tumbling(Tables.load(spark, sf, "events"), "1 hour")
      .orderBy("window_start", "event_type").collect().toSeq
    // stream the same parquet through readStream; ts arrives as long nanos
    // under nanosAsLong, so rebuild the µs timestamp exactly like Tables.load
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = Streams.readTableStream(spark, sf, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val streamed = Streams.drainToBatch(Streams.windowedCounts(stream, "1 hour"), "t_win")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming sliding windows == batch sliding aggregation") {
    val batch = EventOps.sliding(Tables.load(spark, sf, "events"), "1 hour", "30 minutes")
      .orderBy("window_start", "event_type").collect().toSeq
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = Streams.readTableStream(spark, sf, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val streamed = Streams.drainToBatch(
      Streams.slidingCounts(stream, "1 hour", "30 minutes"), "t_slide")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dropDuplicates dedups across micro-batches") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = Streams.readTableStream(spark, sf, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id") // streaming stateful exact dedup on key
    val out = Streams.drainAppend(stream, "t_dedup")
    val batchKeys = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(out.count() == batchKeys)
  }

  test("foreachBatch streaming MERGE lands the same table as a batch upsert") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val root = java.nio.file.Files.createTempDirectory("cdc").toString
    val table = graft.table.LakeTable(spark, root, "events_t", Seq("event_id"))
    val stream = Streams.readTableStream(spark, sf, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "user_id", "ts", "event_type", "value")
    Streams.upsertStream(stream, table, Seq("event_id"), "ts")
    val batch = Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "ts", "event_type", "value")
    assert(table.read.count() == batch.count())
    assert(table.read.select("event_id").distinct().count() == batch.count())
    // idempotent rerun: same source stream again → identical table
    Streams.upsertStream(Streams.readTableStream(spark, sf, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "user_id", "ts", "event_type", "value"),
      table, Seq("event_id"), "ts")
    assert(table.read.count() == batch.count())
  }

  test("flatMapGroupsWithState sessionization == batch session_window") {
    val events = Tables.load(spark, sf, "events")
    val batch = EventOps.sessions(events, "4 hours")
      .select("user_id", "session_start", "n_events")
      .orderBy("user_id", "session_start").collect().toSeq
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = Streams.readTableStream(spark, sf, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val sessions = Streams.drainAppend(
      Streams.sessionize(stream, gapSeconds = 4 * 3600), "t_sess")
      .select("user_id", "session_start", "n_events")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(sessions == batch)
  }
}
