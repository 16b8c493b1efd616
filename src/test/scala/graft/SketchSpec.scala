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
}
