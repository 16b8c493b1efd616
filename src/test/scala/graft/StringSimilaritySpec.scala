package graft

import org.apache.spark.sql.functions._

import graft.functions.StringSimilarity

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    StringSimilarity.jaroWinkler(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  // every expected value below was produced by an independent engine
  // (DuckDB 1.0 jaro_winkler_similarity) on the same inputs — the same
  // oracle that gates q_jaro_pairs
  test("jaro-winkler matches the independent-engine reference values") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("dwayne", "duane", 0.8400000000000001),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("cold widget", "cold bracket", 0.843939393939394), // prefix cap 4
      ("abcdefgh", "abcdefxy", 0.9),
      ("trace", "crate", 0.7333333333333334), // >0.7 but prefix 0
      ("aaaaaa", "aaahhh", 0.6666666666666666)) // ≤0.7: no boost
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a,$b)")
    }
  }

  test("edges: empties score 0, identical 1, window-0 transposition 0") {
    // both-empty pinned to the independent engine too: DuckDB 1.0
    // jaro_winkler_similarity('','') = 0.0 (not the 1.0 of some libs)
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0 && jw("", "a") == 0.0)
    assert(jw("abc", "abc") == 1.0 && jw("a", "a") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window max(2,2)/2-1 = 0
    assert(jw("abc", "xyz") == 0.0)
  }

  test("properties: symmetric, bounded, boost never lowers") {
    val words = Seq("spark", "spork", "sprocket", "sparkle", "park",
      "shark", "s", "", "spark plug", "gulp kraps")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s == jw(b, a), s"symmetry $a/$b")
      assert(s >= 0.0 && s <= 1.0, s"bounds $a/$b")
      assert(s >= StringSimilarity.jaro(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) - 1e-15, s"boost $a/$b")
    }
  }

  test("expression evaluates in a DataFrame and survives codegen") {
    val df = Seq(("martha", "marhta"), ("abc", "xyz"), (null, "x"))
      .toDF("a", "b")
      .select(StringSimilarity.jaroWinklerCol(col("a"), col("b")).as("s"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(rows(1).getDouble(0) == 0.0)
    assert(rows(2).isNullAt(0)) // null-safe
    // SQL registration path
    graft.functions.Registry.register(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('dixon', 'dicksonx') AS s").head.getDouble(0)
    assert(math.abs(viaSql - 0.8133333333333332) < 1e-12)
  }
}
