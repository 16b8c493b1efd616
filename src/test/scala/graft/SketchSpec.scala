package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchAggregates

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("freq_items is exact when capacity exceeds the vocabulary") {
    val df = Seq(
      Seq("a", "b", "a"), Seq("a", "c"), Seq("b", "a"), Seq("d")
    ).toDF("toks").repartition(4) // force partial buffers + merge
    val out = df.agg(SketchAggregates.freqItems($"toks", 3, 100).as("top"))
      .select(explode($"top").as("e"))
      .select($"e.token", $"e.cnt").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 4L), ("b", 2L), ("c", 1L)))
  }

  test("freq_items under eviction still surfaces the dominant token") {
    // one token at 50%, forty rare ones; capacity 4 forces evictions
    val rows = Seq.fill(40)(Seq("hot")) ++ (0 until 40).map(i => Seq(s"rare$i"))
    val df = rows.toDF("toks").repartition(3)
    val out = df.agg(SketchAggregates.freqItems($"toks", 1, 4).as("top"))
      .select(explode($"top").as("e")).select($"e.token").as[String].collect()
    assert(out.head == "hot")
  }

  test("freq_items works per group") {
    val df = Seq(
      ("g1", Seq("x", "x", "y")), ("g1", Seq("x")),
      ("g2", Seq("z", "z"))
    ).toDF("g", "toks")
    val out = df.groupBy("g")
      .agg(SketchAggregates.freqItems($"toks", 1, 100).as("top"))
      .select($"g", element_at($"top", 1).getField("token").as("t"))
      .as[(String, String)].collect().toMap
    assert(out == Map("g1" -> "x", "g2" -> "z"))
  }

  test("count_min never under-counts and is exact without collisions") {
    // keys 0..9 with known multiplicities; width 64 over 10 keys may
    // still collide, so assert the one-sided CMS guarantee per key
    val rows = (0L until 10L).flatMap(k => Seq.fill(k.toInt + 1)(k))
    val df = rows.toDF("k").repartition(4) // force partial sketches + merge
    val sk = df.agg(SketchAggregates.countMin($"k", 4, 64).as("sk"))
    val est = spark.range(0, 10).select($"id".as("p"))
      .crossJoin(sk)
      .select($"p", SketchAggregates.countMinEstimate($"sk", $"p", 4, 64).as("e"))
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { k =>
      assert(est(k) >= k + 1, s"under-count at $k: ${est(k)}")
    }
    // total over-count across all probes is bounded by collisions with
    // the 10-key stream: with width 64 and 10 keys, most estimates are
    // exact — require at least 8 of 10 exact
    val exact = (0L until 10L).count(k => est(k) == k + 1)
    assert(exact >= 8, s"only $exact exact estimates: $est")
  }

  test("count_min merge equals single-partition build") {
    val rows = (0L until 500L).map(_ % 37)
    val one = rows.toDF("k").coalesce(1)
      .agg(SketchAggregates.countMin($"k", 4, 64)).head().getSeq[Long](0)
    val many = rows.toDF("k").repartition(8)
      .agg(SketchAggregates.countMin($"k", 4, 64)).head().getSeq[Long](0)
    assert(one == many)
  }

  test("count_min estimate for an absent key reflects only collisions") {
    val df = (0L until 100L).toDF("k")
    val sk = df.agg(SketchAggregates.countMin($"k", 4, 1024).as("sk"))
    // key far outside the inserted range; wide sketch => likely 0, and
    // never negative
    val e = sk.select(
      SketchAggregates.countMinEstimate($"sk", lit(999999L), 4, 1024).as("e"))
      .as[Long].head()
    assert(e >= 0L && e <= 5L)
  }

  test("approx_percentile lands within its rank-error bound of the exact value") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sf, "events")
    // accuracy 1000 => rank error <= 1/1000; generous envelope: the
    // approximate median must sit between the exact p45 and p55
    val row = ev.agg(
      expr("percentile(value, 0.45)").as("lo"),
      expr("percentile(value, 0.55)").as("hi"),
      expr("approx_percentile(value, 0.5, 1000)").as("ap")).head()
    val (lo, hi, ap) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(ap >= lo && ap <= hi, s"approx median $ap outside [$lo, $hi]")
  }

  test("bottom_k: smallest distinct values, duplicate-proof, ascending") {
    import graft.functions.SketchAggregates
    val df = Seq(9L, 3L, 7L, 3L, 1L, 7L, 5L, 100L).toDF("v")
    val got = df.agg(SketchAggregates.bottomK(col("v"), 3).as("bk"))
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 3L, 5L)) // duplicates collapse, ascending order
    // k above the distinct count returns everything (exact mode)
    val all = df.agg(SketchAggregates.bottomK(col("v"), 100).as("bk"))
      .head().getSeq[Long](0)
    assert(all == Seq(1L, 3L, 5L, 7L, 9L, 100L))
    // SQL registration parity
    graft.functions.Registry.register(spark)
    df.createOrReplaceTempView("bk_in")
    assert(spark.sql("SELECT bottom_k(v, 3) FROM bk_in")
      .head().getSeq[Long](0) == Seq(1L, 3L, 5L))
  }

  test("bottom_k multi-partition merge equals single-partition build") {
    import graft.functions.SketchAggregates
    val vals = (0 until 1000).map(i => ((i * 7919L) % 997L))
    val one = vals.toDF("v").coalesce(1)
      .agg(SketchAggregates.bottomK(col("v"), 16)).head().getSeq[Long](0)
    val many = vals.toDF("v").repartition(13)
      .agg(SketchAggregates.bottomK(col("v"), 16)).head().getSeq[Long](0)
    assert(one == many) // union-closure merge: partitioning-invariant
    assert(one == vals.distinct.sorted.take(16))
  }
}
