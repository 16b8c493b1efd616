package graft

import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.operators.FuzzyJoin

/** Edit-distance join + its native building blocks (DeletionNeighborhood,
  * MultiPatternMatch). The join's completeness claim is pinned by
  * brute-force parity on a corpus that includes duplicates, near-dups,
  * short strings, and non-ASCII. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val names = Seq(
    1L -> "red widget", 2L -> "red widgett", 3L -> "red wdget",
    4L -> "blue bolt", 5L -> "blue bolts", 6L -> "bleu bolt",
    7L -> "red widget", // exact duplicate of 1
    8L -> "ab", 9L -> "b", // short strings (len <= tau)
    10L -> "café au lait", 11L -> "cafe au lait", // 1 edit, non-ASCII
    12L -> "zzzzzzzz")

  private def brute(tau: Int) = {
    val d = names.toDF("id", "s")
    val a = d.select($"id".as("a_id"), $"s".as("a_str"))
    val b = d.select($"id".as("b_id"), $"s".as("b_str"))
    a.crossJoin(b).filter($"a_id" < $"b_id")
      .withColumn("dist", levenshtein($"a_str", $"b_str"))
      .filter($"dist" <= tau)
      .select("a_id", "b_id", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("selfJoin matches brute-force levenshtein at tau=1 and tau=2") {
    val d = names.toDF("id", "s")
    for (tau <- Seq(1, 2)) {
      val got = FuzzyJoin.selfJoin(d, "id", "s", tau)
        .select("a_id", "b_id", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(tau), s"tau=$tau")
    }
  }

  test("join maps dirty strings back to the catalog") {
    val catalog = Seq(1L -> "red widget", 2L -> "blue bolt").toDF("id", "s")
    val dirty = Seq(10L -> "red wdget", 11L -> "blue boltt", 12L -> "green gear")
      .toDF("id", "s")
    val got = FuzzyJoin.join(dirty, "id", "s", catalog, "id", "s", tau = 1)
      .select("left_id", "right_id", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((10L, 1L, 1), (11L, 2L, 1)))
  }

  test("maxBucketSize only ever drops pairs, never invents them") {
    val d = names.toDF("id", "s")
    val capped = FuzzyJoin.selfJoin(d, "id", "s", tau = 2, maxBucketSize = 2)
      .select("a_id", "b_id", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped.subsetOf(brute(2)))
  }

  test("deletion neighborhood: exact variant set, distinct, code-point edits") {
    def nbhd(s: String, tau: Int): Seq[String] =
      Seq(s).toDF("s")
        .select(TextExpressions.deletionNeighborhood($"s", tau).as("v"))
        .as[Seq[String]].head()
    assert(nbhd("abc", 1).toSet == Set("abc", "bc", "ac", "ab"))
    assert(nbhd("abc", 2).toSet == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(nbhd("aaa", 1) == Seq("aaa", "aa")) // duplicates collapse
    // supplementary-plane char deletes as ONE edit (code points, not chars)
    assert(nbhd("a😀b", 1).toSet ==
      Set("a😀b", "😀b", "ab", "a😀"))
  }

  test("multi-pattern match: suffix outputs, prefix-of-pattern, empty, null") {
    def m(text: String, pats: Seq[String]): Seq[Int] =
      Seq(text).toDF("t")
        .select(TextExpressions.multiPatternMatch($"t", pats).as("m"))
        .as[Seq[Int]].head()
    // "fast table" is a prefix of "fast table value": both must report
    assert(m("x fast table value y", Seq("fast table", "fast table value", "zz"))
      == Seq(0, 1))
    // suffix reached only via fail links: "bab" contains "ab"
    assert(m("xbab", Seq("ab", "bab")) == Seq(0, 1))
    // overlapping occurrences, each pattern reported once
    assert(m("aaaa", Seq("aa", "aaa")) == Seq(0, 1))
    assert(m("no hits here", Seq("zz", "qq")) == Seq())
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextExpressions.multiPatternMatch($"t", Seq("a")).as("m"))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("sharded multi-pattern match == single automaton on real docs") {
    val pats = Seq("merge batch", "fast table", "hash value", "row fast",
      "spark order", "scan slow", "value part")
    val d = Tables.load(spark, sf, "documents")
    val single = d.select($"doc_id",
      TextExpressions.multiPatternMatch($"text", pats).as("m"))
    val sharded = d.select($"doc_id",
      TextExpressions.multiPatternMatchSharded($"text", pats, shardSize = 3).as("m"))
    assert(single.exceptAll(sharded).isEmpty && sharded.exceptAll(single).isEmpty)
  }

  test("multi-pattern match agrees with N contains() probes on real docs") {
    val pats = Seq("merge batch", "fast table", "hash value", "row fast")
    val d = Tables.load(spark, sf, "documents")
    val native = d.select($"doc_id",
      TextExpressions.multiPatternMatch($"text", pats).as("m"))
    val probe = d.select($"doc_id",
      filter(lit(pats.indices.toArray),
        i => contains($"text", element_at(lit(pats.toArray), i + 1))).as("m"))
    assert(native.exceptAll(probe).isEmpty && probe.exceptAll(native).isEmpty)
  }
}
