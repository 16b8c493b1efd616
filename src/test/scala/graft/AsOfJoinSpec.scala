package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (2L, ts("2024-01-01 10:02:00"), 50.0)
  ).toDF("k", "ts", "px")

  private def trades = Seq(
    (1L, ts("2024-01-01 10:03:00"), "t1"), // after 10:00 quote
    (1L, ts("2024-01-01 10:05:00"), "t2"), // exactly at 10:05 quote (tie)
    (2L, ts("2024-01-01 10:01:00"), "t3"), // before any k=2 quote
    (3L, ts("2024-01-01 10:00:00"), "t4")  // key with no right rows
  ).toDF("k", "ts", "tid")

  test("asOf attaches the latest right row at or before each left ts") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      .select("tid", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(out("t1").contains(100.0)) // latest quote ≤ 10:03 is 10:00
    assert(out("t2").contains(101.0)) // tie: simultaneous quote visible
    assert(out("t3").isEmpty)         // no quote yet
    assert(out("t4").isEmpty)         // unseen key
  }

  test("left rows and columns are all preserved") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == trades.columns.toSeq :+ "asof_px")
  }

  test("attached values come atomically from the matched right row, nulls included") {
    // right rows with NULL fields: the MATCHED row's null must be
    // attached, not an older row's non-null value, and multiple value
    // columns must never mix rows
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), Some("early")),
      (1L, ts("2024-01-01 10:04:00"), None, Some("late"))
    ).toDF("k", "ts", "px", "src")
    val trades = Seq(
      (1L, ts("2024-01-01 10:02:00"), "t1"), // matches 10:00 row
      (1L, ts("2024-01-01 10:06:00"), "t2")  // matches 10:04 row (null px)
    ).toDF("k", "ts", "tid")
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "ts", "ts", Seq("px", "src"))
      .select("tid", "asof_px", "asof_src")
      .as[(String, Option[Double], Option[String])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out("t1") == ((Some(100.0), Some("early"))))
    // the matched row's px is genuinely NULL — must NOT resurrect 100.0
    assert(out("t2") == ((None, Some("late"))))
  }
}
