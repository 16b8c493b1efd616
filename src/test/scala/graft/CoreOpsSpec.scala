package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.CoreOps._

/** Unit tests mirroring the reference's own suites (SURVEY.md §5.1) plus
  * the negative fixtures from FIXTURES.md §A. */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ordersFixture = Seq(
    ("ORD001", 1L, 201L, "2025-06-01 10:00:00", "99.99"),
    ("ORD002", 2L, 202L, "2025-06-02 11:00:00", "10.00"),
    ("ORD003", 2L, 202L, "2025-06-03 12:00:00", "20.00"), // newer dup of key 2
    ("ORD004", 3L, 203L, null, "5.00")                    // null timestamp
  ).toDF("order_num", "order_id", "user_id", "order_timestamp", "total_amount")

  test("enforceSchema raises on missing column") {
    val e = intercept[IllegalArgumentException] {
      enforceSchema(Seq("order_id", "missing_col"))(ordersFixture)
    }
    assert(e.getMessage.contains("missing_col"))
  }

  test("enforceSchema normalizes order and drops extras") {
    val out = enforceSchema(Seq("user_id", "order_id"))(ordersFixture)
    assert(out.columns.toSeq == Seq("user_id", "order_id"))
  }

  test("enforceSchemaLenient keeps only present columns") {
    val out = enforceSchemaLenient(Seq("order_id", "not_there"))(ordersFixture)
    assert(out.columns.toSeq == Seq("order_id"))
  }

  test("castColumns promotes strings to types") {
    val out = castColumns(Map(
      "order_timestamp" -> TimestampType, "total_amount" -> DoubleType))(ordersFixture)
    assert(out.schema("order_timestamp").dataType == TimestampType)
    assert(out.schema("total_amount").dataType == DoubleType)
    assert(out.columns.toSeq == ordersFixture.columns.toSeq) // order preserved
  }

  test("castColumns nulls malformed values (reference semantics) instead of ANSI-throwing") {
    val df = Seq(("x1", "not-a-number", "2025-13-99 99:99:99"))
      .toDF("order_num", "total_amount", "order_timestamp")
    val out = castColumns(Map(
      "total_amount" -> DoubleType, "order_timestamp" -> TimestampType))(df)
    val row = out.collect().head // must not throw despite ANSI mode
    assert(row.isNullAt(out.columns.indexOf("total_amount")))
    assert(row.isNullAt(out.columns.indexOf("order_timestamp")))
    // ...and the rejected split then captures such rows
    val (valid, rejected) = splitValid(Seq("total_amount"))(out)
    assert(valid.count() == 0 && rejected.count() == 1)
  }

  test("splitValid is one-pass, duplicate-preserving, and partitions the input") {
    val casted = castColumns(Map("order_timestamp" -> TimestampType))(ordersFixture)
    val (valid, rejected) = splitValid(Seq("order_id", "order_timestamp"))(casted)
    assert(valid.count() == 3 && rejected.count() == 1)
    assert(valid.count() + rejected.count() == casted.count())
    assert(rejected.select("order_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("latestWins keeps the newest row per key, nulls last") {
    val casted = castColumns(Map("order_timestamp" -> TimestampType))(ordersFixture)
    val out = latestWins(Seq("order_id"), "order_timestamp")(casted)
    assert(out.count() == 3)
    val key2 = out.filter($"order_id" === 2L).select("order_num").as[String].head()
    assert(key2 == "ORD003") // newer timestamp wins
    // the null-timestamp-only key still survives (single row)
    assert(out.filter($"order_id" === 3L).count() == 1)
  }

  test("latestWins tiebreaker makes equal order keys deterministic") {
    val df = Seq((1L, "2025-06-01 10:00:00", "a"), (1L, "2025-06-01 10:00:00", "b"))
      .toDF("k", "ts", "v")
    val out = latestWins(Seq("k"), "ts", tiebreakers = Seq(col("v")))(df)
    assert(out.select("v").as[String].head() == "a")
  }

  test("dedupExact yields at most one row per key") {
    val out = dedupExact(Seq("order_id"))(ordersFixture)
    assert(out.count() == 3)
  }

  test("semiJoin keeps only rows with a match, no column leakage") {
    val dim = Seq(1L, 2L).toDF("order_id")
    val out = semiJoin(Seq("order_id"), dim)(ordersFixture)
    assert(out.count() == 3) // keys 1, 2, 2-dup
    assert(out.columns.toSeq == ordersFixture.columns.toSeq)
  }

  test("semiJoinIfPresent degrades to identity when dim fails") {
    val out = semiJoinIfPresent(Seq("order_id"),
      spark.read.parquet("/nonexistent/path"))(ordersFixture)
    assert(out.count() == ordersFixture.count())
  }

  test("antiJoin is the complement of semiJoin") {
    val dim = Seq(1L, 2L).toDF("order_id")
    val semi = semiJoin(Seq("order_id"), dim)(ordersFixture)
    val anti = antiJoin(Seq("order_id"), dim)(ordersFixture)
    assert(semi.count() + anti.count() == ordersFixture.count())
  }

  test("validityCounts matches split counts in one pass") {
    val casted = castColumns(Map("order_timestamp" -> TimestampType))(ordersFixture)
    val counts = validityCounts(Seq("order_id", "order_timestamp"))(casted)
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(counts(true) == 3 && counts(false) == 1)
  }
}
