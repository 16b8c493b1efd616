package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.GraftOptimizations

class OptimizationsSpec extends SparkSpec {
  import spark.implicits._

  test("size(array_intersect) is rewritten to intersect_count and agrees") {
    GraftOptimizations.install(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a")),          // dup in left counts once
      (Seq.empty[String], Seq("x")),
      (Seq("x"), Seq.empty[String])
    ).toDF("a", "b").repartition(2) // block ConvertToLocalRelation folding
    val out = df.select(size(array_intersect($"a", $"b")).as("n"))
    assert(out.queryExecution.optimizedPlan.toString.contains("intersect_count"))
    assert(out.as[Int].collect().sorted.toSeq == Seq(0, 0, 1, 2))
  }

  test("rewrite handles null elements like the built-in") {
    GraftOptimizations.install(spark)
    val df = Seq(
      (Seq(Some("a"), None, Some("b")), Seq(None, Some("b"))),
      (Seq(Some("a"), None), Seq(Some("a")))
    ).toDF("a", "b")
    val got = df.select(size(array_intersect($"a", $"b")).as("n")).as[Int].collect().toSeq
    assert(got == Seq(2, 1)) // {null, b} and {a}
  }

  test("rewrite is guarded to hash-safe element types") {
    GraftOptimizations.install(spark)
    // array<binary>: Array[Byte] compares by reference in a HashSet, so
    // the rule must NOT fire — and the built-in result must be correct
    val bin = Seq((Seq(Array[Byte](1, 2)), Seq(Array[Byte](1, 2))))
      .toDF("a", "b").repartition(2)
    val binOut = bin.select(size(array_intersect($"a", $"b")).as("n"))
    assert(!binOut.queryExecution.optimizedPlan.toString.contains("intersect_count"))
    assert(binOut.as[Int].collect().toSeq == Seq(1))
    // array<double>: excluded from the rewrite out of caution around
    // -0.0/0.0 and NaN boxing; the built-in (measured: -0.0 and 0.0 are
    // DISTINCT here, NaN equals NaN) stays authoritative
    val dbl = Seq((Seq(-0.0), Seq(0.0))).toDF("a", "b").repartition(2)
    val dblOut = dbl.select(size(array_intersect($"a", $"b")).as("n"))
    assert(!dblOut.queryExecution.optimizedPlan.toString.contains("intersect_count"))
    assert(dblOut.as[Int].collect().toSeq == Seq(0))
    // array<string> still rewrites (the hot Jaccard path)
    val str = Seq((Seq("x"), Seq("x"))).toDF("a", "b").repartition(2)
    assert(str.select(size(array_intersect($"a", $"b")).as("n"))
      .queryExecution.optimizedPlan.toString.contains("intersect_count"))
  }

  test("GraftExtensions wires functions + rule into a fresh session") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val fresh = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val d = fresh.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(d == 11.0)
      // the text-function surface is SQL-callable too
      val toks = fresh.sql("SELECT word_tokens('The quick  Fox') AS t")
        .collect().head.getSeq[String](0)
      assert(toks == Seq("the", "quick", "fox"))
      val lang = fresh.sql("SELECT lang_id('the cat and the dog in the house') AS l")
        .collect().head.getString(0)
      assert(lang == "en")
      assert(fresh.sql("SELECT size(word_shingles('a b c d', 2)) AS n")
        .collect().head.getInt(0) == 3)
      import fresh.implicits._
      val df2 = Seq((Seq("a"), Seq("a", "b"))).toDF("a", "b").repartition(2)
      val plan = df2.select(size(array_intersect($"a", $"b")).as("n"))
      assert(plan.queryExecution.optimizedPlan.toString.contains("intersect_count"))
      assert(plan.collect().head.getInt(0) == 1)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
