package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.operators.Dedup

/** Exact substring-level dedup (duplicated spans): rolling-hash anchor
  * parity, planted-span fixtures, adjacency-merge semantics, and
  * definition-level brute-force parity on the lab corpus. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val L = 10

  /** Definition-level recompute: every L-gram by REAL substring (no
    * hashes anywhere), dup = in >= minDocs docs, island merge. */
  private def bruteSpans(df: DataFrame, minDocs: Int = 2): DataFrame = {
    val grams = df
      .select(col("doc_id").as("__id"),
        posexplode(expr(
          s"transform(sequence(1, greatest(length(text) - ${L - 1}, 0)), " +
            s"p -> substring(text, p, $L))")))
      .select(col("__id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("__g"))
    val dupG = grams.groupBy("__g").agg(countDistinct(col("__id")).as("nd"))
      .filter(col("nd") >= minDocs).select("__g")
    val anchors = grams.join(dupG, Seq("__g"), "left_semi").select("__id", "pos")
    // same island merge, written independently: per-doc sorted fold
    val rows = anchors.as[(Long, Long)].collect().groupBy(_._1).toSeq.flatMap {
      case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for (p <- sorted) {
          val end = p + L - 1
          if (spans.nonEmpty && p <= spans.last._2 + 1)
            spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, end))
          else spans += ((p, end))
        }
        spans.map { case (s, e) => (id, s, e, e - s + 1) }
    }
    rows.toDF("doc_id", "span_start", "span_end", "span_len")
  }

  private def collected(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "span_start", "span_end", "span_len")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("gram rolling hashes match a direct polynomial per position") {
    val s = "abcdefghij"
    val hs = Seq(s).toDF("t")
      .select(TextExpressions.gramHashes(col("t"), 3).as("h"))
      .as[Seq[Long]].head()
    assert(hs.length == s.length - 2)
    val B = 1000003L
    val direct = (0 to s.length - 3).map { i =>
      s.substring(i, i + 3).codePoints().toArray
        .foldLeft(0L)((h, c) => h * B + c)
    }
    assert(hs == direct)
    // equal grams hash equal; distinct grams here hash distinct
    val hs2 = Seq("xxabcxx").toDF("t")
      .select(TextExpressions.gramHashes(col("t"), 3).as("h")).as[Seq[Long]].head()
    assert(hs2(2) == direct(0)) // "abc" at position 3
  }

  test("gram hashes: shorter-than-n and null inputs") {
    val out = Seq(Some("ab"), None, Some("")).toDF("t")
      .select(TextExpressions.gramHashes(col("t"), 3).as("h"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0))
    assert(out(0) != null && out(0).isEmpty)
    assert(out(1) == null)
    assert(out(2) != null && out(2).isEmpty)
  }

  test("planted shared passage yields the exact span in both docs") {
    // shared block of exactly 14 chars at known offsets; surround with
    // unique filler so only the block duplicates
    val shared = "SHAREDPASSAGE!"
    val docs = Seq(
      (1L, "aaaaa" + shared + "bbbbbbb"), // block at pos 6..19
      (2L, "cc" + shared + "dddddddddd"), // block at pos 3..16
      (3L, "totally unrelated filler xyz")
    ).toDF("doc_id", "text")
    val spans = collected(Dedup.duplicateSpans(docs, "doc_id", "text", L))
    assert(spans == Set((1L, 6L, 19L, 14L), (2L, 3L, 16L, 14L)))
  }

  test("adjacent covered blocks merge; a one-char gap splits") {
    val s1 = "AAAAAAAAAA" // 10 chars, duplicated
    val s2 = "BBBBBBBBBB" // 10 chars, duplicated
    val docs = Seq(
      (1L, s1 + s2),         // adjacent in doc 1 -> ONE span 1..20
      (2L, s1 + "q" + s2),   // gap in doc 2 -> spans 1..10 and 12..21
      (3L, "xx" + s1 + "yy"),
      (4L, "zz" + s2 + "ww")
    ).toDF("doc_id", "text")
    val spans = collected(Dedup.duplicateSpans(docs, "doc_id", "text", L))
    assert(spans.filter(_._1 == 1L) == Set((1L, 1L, 20L, 20L)))
    assert(spans.filter(_._1 == 2L) == Set((2L, 1L, 10L, 10L), (2L, 12L, 21L, 10L)))
  }

  test("docs shorter than minLen never anchor") {
    val docs = Seq((1L, "short"), (2L, "short"), (3L, "also tiny")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", L).count() == 0)
  }

  test("duplicateSpans matches the no-hash brute recompute on the lab corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val fast = collected(Dedup.duplicateSpans(docs, "doc_id", "text", L))
    val brute = collected(bruteSpans(docs))
    assert(fast == brute)
    assert(fast.nonEmpty) // fixture actually exercises the operator
  }

  test("minDocs=3 demands three distinct docs") {
    val blk = "0123456789"
    val docs = Seq(
      (1L, "a" + blk), (2L, "bb" + blk), (3L, "unrelated text here"),
      (4L, blk + blk) // same doc twice does not add a distinct doc
    ).toDF("doc_id", "text")
    val two = collected(Dedup.duplicateSpans(docs, "doc_id", "text", L, minDocs = 2))
    assert(two.map(_._1) == Set(1L, 2L, 4L))
    val three = collected(Dedup.duplicateSpans(docs, "doc_id", "text", L, minDocs = 3))
    assert(three.map(_._1) == Set(1L, 2L, 4L)) // 1,2,4 are three distinct docs
    val docsNo4 = docs.filter($"doc_id" =!= 4L)
    assert(Dedup.duplicateSpans(docsNo4, "doc_id", "text", L, minDocs = 3).count() == 0)
  }

  test("coverage: clean docs report zero, duplicated chars count once") {
    val blk = "ABCDEFGHIJ"
    val docs = Seq(
      (1L, blk + "12345"),  // 10 of 15 chars covered
      (2L, "xy" + blk),     // 10 of 12
      (3L, "nothing in common")
    ).toDF("doc_id", "text")
    val cov = Dedup.duplicateSpanCoverage(docs, "doc_id", "text", L)
      .select("doc_id", "n_chars", "dup_chars", "dup_ratio")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(cov == Set(
      (1L, 15L, 10L, 0.666667),
      (2L, 12L, 10L, 0.833333),
      (3L, 17L, 0L, 0.0)))
  }

  test("selfRepetitionSpans covers periodic regions, ignores cross-doc-only dups") {
    val docs = Seq(
      (1L, "XX" + "LOOP" * 3 + "ZZ"),        // periodic region at 3..14
      (2L, "abcdefghij once only here"),
      (3L, "abcdefghij also once here")      // cross-doc dup, NOT intra-doc
    ).toDF("doc_id", "text")
    val spans = Dedup.selfRepetitionSpans(docs, "doc_id", "text", 4)
      .select("doc_id", "span_start", "span_end", "span_len")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 3L, 14L, 12L)))
  }

  test("exciseSpans stitches gap segments; head/tail/multi-span edges") {
    val docs = Seq(
      (1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "abcdefghij"),
      (4L, "abcdefghij"), (5L, "untouched")).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 3L, 5L), (2L, 1L, 4L), (3L, 8L, 10L), (4L, 1L, 2L), (4L, 9L, 10L)
    ).toDF("doc_id", "span_start", "span_end")
    val out = Dedup.exciseSpans(docs, spans, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "abfghij", 2L -> "efghij", 3L -> "abcdefg",
      4L -> "cdefgh", 5L -> "untouched"))
  }

  test("excise after duplicateSpans strips exactly the shared passage") {
    val shared = "SHAREDPASSAGE!"
    val docs = Seq(
      (1L, "aaaaa" + shared + "bbbbbbb"),
      (2L, "cc" + shared + "dddddddddd"),
      (3L, "totally unrelated filler xyz")
    ).toDF("doc_id", "text")
    val out = Dedup.exciseSpans(docs,
        Dedup.duplicateSpans(docs, "doc_id", "text", L), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "aaaaabbbbbbb", 2L -> "ccdddddddddd",
      3L -> "totally unrelated filler xyz"))
  }

  test("keepOneSpans: owner doc keeps the passage, all others lose it") {
    val shared = "SHAREDPASSAGE!"
    val docs = Seq(
      (5L, "aaaaa" + shared + "bbbbbbb"),
      (2L, "cc" + shared + "dddddddddd"), // min id → owner
      (9L, shared + "qqq"),
      (3L, "totally unrelated filler xyz")
    ).toDF("doc_id", "text")
    val spans = collected(Dedup.keepOneSpans(docs, "doc_id", "text", L))
    // doc 2 owns every gram of the shared block; docs 5 and 9 lose it
    assert(spans == Set((5L, 6L, 19L, 14L), (9L, 1L, 14L, 14L)))
    val out = Dedup.exciseSpans(docs,
        Dedup.keepOneSpans(docs, "doc_id", "text", L), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      5L -> "aaaaabbbbbbb",
      2L -> ("cc" + shared + "dddddddddd"), // owner untouched
      9L -> "qqq",
      3L -> "totally unrelated filler xyz"))
  }

  test("contaminatedSpans flags only corpus spans present in the test set") {
    val leak = "LEAKEDBENCHMARKTEXT" // 19 chars
    val corpus = Seq(
      (1L, "prefix" + leak + "suffix"), // leak at 7..25
      (2L, "clean document with nothing shared"),
      // corpus-internal duplicate that is NOT in the test set: must not flag
      (3L, "prefix" + "CORPUSONLYDUP" + "!!"),
      (4L, "other" + "CORPUSONLYDUP" + "??")
    ).toDF("doc_id", "text")
    val testSet = Seq((100L, "the benchmark says " + leak + " verbatim")).toDF("doc_id", "text")
    val spans = collected(Dedup.contaminatedSpans(corpus, testSet, "doc_id", "text", L))
    assert(spans == Set((1L, 7L, 25L, 19L)))
  }
}
