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
}
