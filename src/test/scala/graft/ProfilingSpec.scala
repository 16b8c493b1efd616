package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Shuffle-planning diagnostics pinned on hand-computed fixtures: the
  * skew profile's exact numbers, the salt plan's ceil-division, the
  * log2 histogram's bit-length bucketing, and the annealed mix
  * schedule's IEEE-exact rates. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  // key a: 6 rows, b: 3, c: 1 → freqs {6,3,1}
  private val skewed =
    (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")

  test("keySkewProfile: exact counts, shares, and percentiles") {
    val r = Profiling.keySkewProfile(skewed, "k").head()
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("max_freq") == 6L)
    assert(r.getAs[Double]("avg_freq") == 3.3333)
    assert(r.getAs[Double]("top1_share") == 0.6)
    // exact percentiles of {1,3,6}: p50 = 3; p90 interpolates
    // 3 + 0.8*(6-3) = 5.4; p99 = 3 + 0.98*3 = 5.94
    assert(r.getAs[Double]("freq_p50") == 3.0)
    assert(r.getAs[Double]("freq_p90") == 5.4)
    assert(r.getAs[Double]("freq_p99") == 5.94)
  }

  test("keySkewProfile switches to approx_percentile past the key-count bound") {
    // force the approx path: bound of 0 distinct keys (3 > 0). At this
    // scale approx_percentile is still exact for p50 (the buffered
    // histogram is lossless under the accuracy budget), so the switch
    // must not change the non-percentile columns or the schema
    val ap = Profiling.keySkewProfile(skewed, "k", exactPercentilesUpTo = 0L)
    assert(ap.queryExecution.analyzed.toString.contains("approx_percentile"))
    val r = ap.head()
    assert(r.getAs[Long]("n_rows") == 10L && r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Double]("freq_p50") == 3.0) // exact at tiny cardinality
    // default bound: exact percentile, no approx anywhere in the plan
    val ex = Profiling.keySkewProfile(skewed, "k")
    assert(!ex.queryExecution.analyzed.toString.contains("approx_percentile"))
  }

  test("saltPlan: ceil-division factors, only keys above budget") {
    val got = Profiling.saltPlan(skewed, "k", rowsPerTask = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // a: ceil(6/2)=3, b: ceil(3/2)=2; c (1 <= 2) absent
    assert(got == Set(("a", 6L, 3), ("b", 3L, 2)))
    // exact-budget key is NOT salted (> not >=): freq 3 at budget 3
    val exact = Profiling.saltPlan(skewed, "k", rowsPerTask = 3)
      .collect().map(_.getString(0)).toSet
    assert(exact == Set("a"))
  }

  test("lengthHistogram: bit-length buckets, totals, bounds") {
    val lens = Seq(1, 1, 2, 3, 7, 8, 1023, 1024).toDF("n")
    val got = Profiling.lengthHistogram(lens, col("n"))
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // bit lengths: 1→1, 2..3→2, 7→3, 8→4, 1023→10, 1024→11
    assert(got == Seq(
      (1, 2L, 2L, 1L, 1L), (2, 2L, 5L, 2L, 3L), (3, 1L, 7L, 7L, 7L),
      (4, 1L, 8L, 8L, 8L), (10, 1L, 1023L, 1023L, 1023L),
      (11, 1L, 1024L, 1024L, 1024L)))
  }

  test("tableProfile: null rates and exact KMV distincts below k") {
    val t = Seq((1, Option("a")), (2, Option("b")), (3, None), (4, Option("a")))
      .toDF("id", "s")
    val got = Profiling.tableProfile(t, Seq("id", "s"))
      .orderBy("col_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // 4 distinct ids, 2 distinct strings, one null in s — all below
    // k = 64, so the KMV estimates are exact counts
    assert(got == Seq(("id", 4L, 0L, 0.0, 4L), ("s", 4L, 1L, 0.25, 2L)))
    // all-null column: no sketch row, distinct 0
    val n = Seq[Option[String]](None, None).toDF("x")
    val gotN = Profiling.tableProfile(n, Seq("x")).head()
    assert(gotN.getLong(2) == 2L && gotN.getDouble(3) == 1.0 &&
      gotN.getLong(4) == 0L)
  }

  test("robustOutliers: hand-computed median/MAD screen") {
    val d = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _))
      .toDF("grp", "value")
    val r = Profiling.robustOutliers(d, "grp", "value").head()
    // values 1..9,100: med = 5.5; |dev| medians to 2.5; 3 MADs = 7.5;
    // only the planted 100 (dev 94.5) crosses it
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("med") == 5.5)
    assert(r.getAs[Double]("mad") == 2.5)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Double]("outlier_rate") == 0.1)
  }

  test("joinCardinality: exact output rows and fan-out, no join run") {
    val l = Seq("a", "a", "a", "b", "c").toDF("k1") // freqs 3,1,1
    val r = Seq("a", "a", "b", "d").toDF("k2")      // freqs 2,1,1
    val row = Profiling.joinCardinality(l, "k1", r, "k2").head()
    // matched keys a,b; rows = 3*2 + 1*1 = 7; max fan-out = 6
    assert(row.getLong(0) == 2L && row.getLong(1) == 7L &&
      row.getLong(2) == 6L)
    // ground truth: the actual join
    assert(l.join(r, $"k1" === $"k2").count() == 7L)
  }

  test("winsorizedStats: bounds, clip counts, clipped mean") {
    // 0..10 plus outlier 1000 in one group: p0/p1 quantiles pinned by
    // round numbers — use pLo=0, pHi=0.5 for hand-computable bounds
    val d = ((0 to 10).map(_.toDouble) :+ 1000.0).map(("g", _))
      .toDF("grp", "value")
    val r = Profiling.winsorizedStats(d, "grp", "value", 0.0, 0.5).head()
    // 12 values sorted: lo = min = 0; hi = median = interp(5,6) = 5.5
    assert(r.getAs[Long]("n") == 12L)
    assert(r.getAs[Double]("lo") == 0.0 && r.getAs[Double]("hi") == 5.5)
    assert(r.getAs[Long]("n_clipped_lo") == 0L)
    assert(r.getAs[Long]("n_clipped_hi") == 6L) // 6,7,8,9,10,1000
    // clipped values: 0,1,2,3,4,5 then 5.5×6 → mean = (15 + 33)/12 = 4.0
    assert(r.getAs[Double]("mean_wins") == 4.0)
  }

  test("numericHistogram: clamped equi-width buckets, degenerate range") {
    val d = (0 to 10).map(_.toDouble).toDF("v")
    val got = Profiling.numericHistogram(d, "v", nBuckets = 5)
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    // width 2: [0,2) [2,4) [4,6) [6,8) [8,10]; the max value clamps
    // into the top bucket instead of spilling to a phantom bucket 5
    assert(got == Seq((0, 2L, 0.0, 1.0), (1, 2L, 2.0, 3.0),
      (2, 2L, 4.0, 5.0), (3, 2L, 6.0, 7.0), (4, 3L, 8.0, 10.0)))
    // min == max: everything in bucket 0
    val flat = Seq(5.0, 5.0).toDF("v")
    val f = Profiling.numericHistogram(flat, "v", 5).head()
    assert(f.getInt(0) == 0 && f.getLong(1) == 2L)
  }

  test("functionalDependency: holds, violates, counts the worst key") {
    val holds = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    val h = Profiling.functionalDependency(holds, "k", "v").head()
    assert(h.getLong(0) == 2L && h.getLong(1) == 0L &&
      h.getDouble(2) == 0.0 && h.getLong(3) == 1L)
    val breaks = Seq((1, "a"), (1, "b"), (1, "c"), (2, "x"), (3, "y"),
      (3, "y")).toDF("k", "v")
    val b = Profiling.functionalDependency(breaks, "k", "v").head()
    // key 1 fans out to 3 values; 1 of 3 keys violates
    assert(b.getLong(0) == 3L && b.getLong(1) == 1L &&
      b.getDouble(2) == 0.333333 && b.getLong(3) == 3L)
  }

  test("annealedMixSchedule: sqrt-chain rates and floor'd keeps") {
    val d = (Seq.fill(16)("big") ++ Seq.fill(4)("small")).toDF("source")
    val got = graft.ops.ScaleOps.annealedMixSchedule(d, "source")
      .orderBy("source").collect()
    val big = got(0)
    assert(big.getAs[String]("source") == "big")
    assert(big.getAs[Long]("n_docs") == 16L)
    assert(big.getAs[Double]("rate_a100") == 0.25)
    assert(big.getAs[Long]("keep_a100") == 4L)
    assert(big.getAs[Double]("rate_a50") == 0.5) // sqrt(0.25)
    assert(big.getAs[Long]("keep_a50") == 8L)
    assert(big.getAs[Double]("rate_a25") == 0.707107) // sqrt(0.5) rounded
    assert(big.getAs[Long]("keep_a25") == 11L) // floor(16*0.70710678)
    val small = got(1)
    // the smallest source keeps everything at every temperature
    assert(Seq("keep_a100", "keep_a50", "keep_a25")
      .forall(c => small.getAs[Long](c) == 4L))
    assert(Seq("rate_a100", "rate_a50", "rate_a25")
      .forall(c => small.getAs[Double](c) == 1.0))
  }

  test("equiDepthHistogram: buckets within ±1 row, ordered non-overlapping ranges") {
    import org.apache.spark.sql.functions._
    val orders = Tables.load(spark, sf, "orders")
    val got = graft.operators.Profiling.equiDepthHistogram(
      orders, "o_orderpriority", "o_totalprice", "o_orderkey", nBuckets = 10)
      .orderBy("o_orderpriority", "bucket").collect()
    val byGroup = got.groupBy(_.getString(0))
    val totals = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byGroup.foreach { case (g, rows) =>
      assert(rows.map(_.getInt(1)).toSeq == (1 to 10)) // all buckets present
      val ns = rows.map(_.getLong(2))
      assert(ns.sum == totals(g)) // nothing dropped
      assert(ns.max - ns.min <= 1, s"$g buckets not equal-depth: ${ns.toSeq}")
      // equal-frequency boundaries: each bucket's min ≥ the previous max
      rows.sliding(2).foreach { case Array(a, b) =>
        assert(b.getDouble(3) >= a.getDouble(4), s"$g bucket ranges overlap")
      case _ => }
    }
  }
}
