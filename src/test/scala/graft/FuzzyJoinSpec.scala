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

  // Planted fixture where every name shares its FIRST character — the
  // degenerate case for 1-char blocking (one bucket, all-pairs). The
  // compound (2-char prefix × length band) key must split it into
  // prefix×band blocks, and the candidate count is exactly the
  // hand-computed per-block sum — pinned so a future key change can't
  // silently reintroduce the quadratic bucket (VERDICT r6).
  test("jaroCandidates: compound key divides the degenerate 1-char bucket") {
    // 5 two-char prefixes × 3 length bands (8, 12, 16 → floor(len/4) =
    // 2, 3, 4) × 4 distinct names per block = 60 names, all 'a'-first.
    val names = for {
      p <- Seq("aa", "ab", "ac", "ad", "ae")
      len <- Seq(8, 12, 16)
      i <- 0 until 4
    } yield p + ("x" * (len - 3)) + i.toString
    val d = names.toDF("nm")
    val cand = FuzzyJoin.jaroCandidates(d, "nm")
    // 15 blocks × C(4,2) = 90 candidate pairs; 1-char blocking would
    // produce C(60,2) = 1770. The pin is exact, not an inequality.
    assert(cand.count() == 90L)
    // structural property: every candidate shares prefix-2 and band
    val bad = cand.filter(
      substring($"name1", 1, 2) =!= substring($"name2", 1, 2) ||
        floor(length($"name1") / 4) =!= floor(length($"name2") / 4))
    assert(bad.isEmpty)
    // completeness within the blocking contract: candidates == the
    // brute-force cross join filtered by the same key (nothing dropped)
    val a = d.select($"nm".as("name1"))
    val b = d.select($"nm".as("name2"))
    val brute = a.crossJoin(b)
      .filter($"name1" < $"name2" &&
        substring($"name1", 1, 2) === substring($"name2", 1, 2) &&
        floor(length($"name1") / 4) === floor(length($"name2") / 4))
    assert(cand.exceptAll(brute).isEmpty && brute.exceptAll(cand).isEmpty)
  }

  test("jaroSelfJoin scores candidates with the native expression") {
    val d = Seq("martha", "marhta", "dwayne", "duane", "dixon", "dicksonx")
      .toDF("nm")
    val got = FuzzyJoin.jaroSelfJoin(d, "nm", minSim = 0.5, lenBand = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    // same blocking key (prefix-2 + single band): martha/marhta and
    // dixon/dicksonx share "ma"/"di"; dwayne/duane differ at char 2 —
    // excluded by construction even though jw("dwayne","duane") = 0.84
    val jw = (a: String, b: String) => BigDecimal(
      graft.functions.StringSimilarity.jaroWinkler(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Set(
      ("marhta", "martha", jw("marhta", "martha")),
      ("dicksonx", "dixon", jw("dicksonx", "dixon"))))
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
