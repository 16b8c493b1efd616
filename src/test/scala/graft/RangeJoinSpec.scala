package graft

import java.sql.Timestamp

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binned range join equals the naive theta join") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 10:30:00"), "e3")
    ).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 10:30:00"), "c1"), // in e1's 1h window
      (1L, ts("2024-01-01 11:00:00"), "c2"), // exactly at e1+1h → excluded
      (1L, ts("2024-01-01 12:59:59"), "c3"), // in e2's window
      (2L, ts("2024-01-01 10:30:00"), "c4"), // == e3.ts → included
      (2L, ts("2024-01-01 09:00:00"), "c5")  // before
    ).toDF("k", "ts", "rv")
    val got = RangeJoin.windowFollowing(left, right, Seq("k"), "ts", "ts",
      Seq("rv"), windowSeconds = 3600)
      .select("lv", "r_rv").as[(String, String)].collect().toSet
    assert(got == Set(("e1", "c1"), ("e2", "c3"), ("e3", "c4")))
    // smaller bins than the window also work
    val got2 = RangeJoin.windowFollowing(left, right, Seq("k"), "ts", "ts",
      Seq("rv"), windowSeconds = 3600, binSecondsOpt = Some(900))
      .select("lv", "r_rv").as[(String, String)].collect().toSet
    assert(got2 == got)
  }
}
