package graft

import java.sql.Timestamp

import graft.operators.EventOps

/** Event-stream operators pinned on hand-built streams (the windowed
  * aggs are covered by their oracles; this suite pins the pieces whose
  * correctness is about ORDERING). */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("transitionMatrix: per-user ordering, tiebreak, probabilities") {
    // user 1: a->b->a  user 2: a->b  (+ a lone event for user 3)
    val ev = Seq(
      (1L, "a", ts(10), 100L), (1L, "b", ts(20), 101L), (1L, "a", ts(30), 102L),
      (2L, "a", ts(10), 200L), (2L, "b", ts(40), 201L),
      (3L, "c", ts(10), 300L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventOps.transitionMatrix(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // a->b twice (both users), b->a once; P(b|a)=1.0, P(a|b)=1.0
    assert(got == Set(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitionMatrix: same-ts rows ordered by the tie column") {
    val ev = Seq(
      (1L, "x", ts(10), 2L), (1L, "y", ts(10), 1L), (1L, "z", ts(20), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventOps.transitionMatrix(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // event_id order at ts=10 is y(1) then x(2): y->x->z, never x->y
    assert(got == Set(("y", "x"), ("x", "z")))
  }

  test("rollingZScore: hand-computed spike day, NULL stats until the frame fills") {
    // daily counts 2,2,2,2,2,2,9,2 for one type: day 7's full frame has
    // mean 3, var = (6·4 + 81)/7 − 9 = 6, z = 6/√6 ≈ 2.4495 → anomaly;
    // day 8's frame [2,2,2,2,2,9,2] has the same stats but z ≈ −0.4082
    val counts = Seq(2, 2, 2, 2, 2, 2, 9, 2)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i => (ts(86400L * d + i), "t"))
    }
    val ev = rows.toDF("ts", "event_type")
    val got = EventOps.rollingZScore(ev, "event_type", "ts",
        windowDays = 7, zThreshold = 2.0)
      .orderBy("day").collect()
    assert(got.length == 8)
    // first 6 days: frame not full — every stat NULL, anomaly NULL
    got.take(6).foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5), s"partial frame leaked stats: $r")
    }
    val spike = got(6)
    assert(spike.getLong(2) == 9L)
    assert(spike.getDouble(3) == 3.0) // mean
    assert(spike.getDouble(4) == 2.4495) // z rounded to 4
    assert(spike.getBoolean(5)) // anomaly
    val after = got(7)
    assert(after.getDouble(4) == -0.4082 && !after.getBoolean(5))
  }

  test("rollingZScore: zero-variance full frame gives NULL z, non-anomalous") {
    val rows = (0 until 7).flatMap(d =>
      (0 until 3).map(i => (ts(86400L * d + i), "t")))
    val got = EventOps.rollingZScore(rows.toDF("ts", "event_type"),
        "event_type", "ts", windowDays = 7).orderBy("day").collect()
    val full = got.last
    assert(full.getDouble(3) == 3.0 && full.isNullAt(4) && !full.getBoolean(5))
  }

  test("sequencePairSupport: eventually-before semantics, repeats, per-user counting") {
    val ev = Seq(
      (1L, ts(1), "x"), (1L, ts(2), "y"), (1L, ts(3), "x"),
      (2L, ts(5), "y")).toDF("user_id", "ts", "event_type")
    val got = EventOps.sequencePairSupport(ev, "user_id", "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // u1: x(1)→y(2), y(2)→x(3), x(1)→x(3) recurrence; y has no second y;
    // u2 contributes nothing (single event of one type)
    assert(got == Set(("x", "y", 1L), ("y", "x", 1L), ("x", "x", 1L)))
  }

  test("cusumDrift: level shift accumulates, pointwise noise does not") {
    // counts 2,2,8,8 → μ=5; fold: 0,0,3,6 → max 6 (the level shift
    // accumulates). A symmetric alternation 2,8,2,8 under the same μ
    // peaks at only 3 — CUSUM separates shift from noise.
    def mk(counts: Seq[Int], key: String) = counts.zipWithIndex.flatMap {
      case (n, d) => (0 until n).map(i => (ts(86400L * d + i), key))
    }
    val ev = (mk(Seq(2, 2, 8, 8), "shift") ++ mk(Seq(2, 8, 2, 8), "noise"))
      .toDF("ts", "event_type")
    val got = EventOps.cusumDrift(ev, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("shift") == ((4L, 5.0, 6.0)))
    assert(got("noise") == ((4L, 5.0, 3.0)))
  }

  test("seasonalIndex: hand-computed weekday profile over two weeks") {
    // epoch day 0 (1970-01-01) is a THURSDAY (isodow 4). Mondays get 4
    // events, every other day 2: overall mean = 32/14, so Monday index
    // = 4/(32/14) = 1.75 and all others = 2/(32/14) = 0.875.
    val rows = (0 until 14).flatMap { d =>
      val isodow = ((4 - 1 + d) % 7) + 1
      val n = if (isodow == 1) 4 else 2
      (0 until n).map(i => (ts(86400L * d + i), "t"))
    }
    val got = EventOps.seasonalIndex(rows.toDF("ts", "event_type"),
        "event_type", "ts")
      .orderBy("dow").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 7)
    assert(got.forall(_._2 == 2L)) // two weeks → every weekday twice
    assert(got.toSeq.filter(_._1 == 1).map(g => (g._3, g._4)) ==
      Seq((4.0, 1.75)))
    assert(got.filter(_._1 != 1).forall(g => g._3 == 2.0 && g._4 == 0.875))
  }
}
