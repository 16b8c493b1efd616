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
}
