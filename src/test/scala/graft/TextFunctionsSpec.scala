package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  private def oneSeq[T](c: org.apache.spark.sql.Column, text: String): Seq[T] =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getSeq[T](0).toList

  test("tokens lowercases, splits, drops empties") {
    val t = oneSeq[String](tokens(col("t")), "  Hello   World  ")
    assert(t == Seq("hello", "world"))
  }

  test("tokenCount and bpeTokenCount") {
    assert(one[Int](tokenCount(col("t")), "a b c") == 3)
    // "don't stop2" -> don + ' + t | stop + 2
    assert(one[Int](bpeTokenCount(col("t")), "don't stop2") == 5)
  }

  test("ratios") {
    assert(one[Double](punctRatio(col("t")), "ab!!") == 0.5)
    assert(one[Double](digitRatio(col("t")), "a1b2") == 0.5)
    assert(one[Double](alphaRatio(col("t")), "ab12") == 0.5)
    assert(one[Double](stopwordRatio(col("t")), "the cat sat on a mat") == 0.5)
  }

  test("native char-class/stopword counters == regex/HOF formulations on real docs") {
    val docs = Tables.load(spark, sf, "documents")
    def regexCount(c: org.apache.spark.sql.Column, cls: String) =
      length(c) - length(regexp_replace(c, cls, ""))
    val sw = Seq("the", "a", "an", "and", "or", "of", "to",
      "in", "is", "it", "that", "for", "on", "with", "as", "this", "by")
    val swArr = array(sw.map(lit): _*)
    val cmp = docs.select(
      graft.functions.TextExpressions.charClassCounts(col("text")).as("cc"),
      regexCount(col("text"), "[\\p{Punct}]").as("r_punct"),
      regexCount(col("text"), "[0-9]").as("r_digit"),
      regexCount(col("text"), "[A-Za-z]").as("r_alpha"),
      regexCount(col("text"), "[A-Z]").as("r_upper"),
      length(col("text")).as("r_len"),
      graft.functions.TextExpressions.memberCount(tokens(col("text")), sw).as("n_sw"),
      size(filter(tokens(col("text")), t => array_contains(swArr, t))).as("r_sw"))
    val bad = cmp.filter(
      col("cc.punct") =!= col("r_punct") || col("cc.digit") =!= col("r_digit") ||
      col("cc.alpha") =!= col("r_alpha") || col("cc.upper") =!= col("r_upper") ||
      col("cc.len") =!= col("r_len") || col("n_sw") =!= col("r_sw")).count()
    assert(bad == 0)
    // unicode edge: non-ASCII chars count toward len only (as with the
    // ASCII-only regex classes), astral chars count once (code points)
    val edge = Seq("Héllo, Wörld! 42 😀").toDF("t").select(
      graft.functions.TextExpressions.charClassCounts(col("t")).as("cc"))
      .select("cc.len", "cc.punct", "cc.digit", "cc.alpha", "cc.upper")
      .as[(Int, Int, Int, Int, Int)].collect().head
    assert(edge == ((18, 2, 2, 8, 2)))
  }

  test("qualityScore orders clean text above junk") {
    val clean = "the quick brown fox jumps over the lazy dog and runs on through the field"
    val junk = "@@@ ### !!! $$$ %%% ^^^ &&&"
    assert(one[Double](qualityScore(col("t")), clean) >
      one[Double](qualityScore(col("t")), junk))
  }

  test("wordNgrams: every occurrence, in order; short docs give empty") {
    val g = oneSeq[String](
      graft.functions.TextExpressions.wordNgrams(col("t"), 2), "a b a b")
    assert(g == Seq("a b", "b a", "a b")) // non-distinct, ordered
    assert(oneSeq[String](
      graft.functions.TextExpressions.wordNgrams(col("t"), 3), "x y").isEmpty)
  }

  test("dupNgramFraction: repeats score high, unique text scores 0") {
    assert(one[Double](dupNgramFraction(col("t"), 2), "a b a b") == 0.333333)
    assert(one[Double](dupNgramFraction(col("t"), 2), "a b c d") == 0.0)
    assert(one[Double](dupNgramFraction(col("t"), 3), "x") == 0.0) // short doc
  }

  test("redactPii replaces emails and long digit runs, counts match") {
    val in = "mail bob.smith+x@corp.example.org or call 5551234567 ext 12"
    assert(one[String](redactPii(col("t")), in) ==
      "mail <EMAIL> or call <NUM> ext 12")
    val counts = Seq(in).toDF("t")
      .select(piiCounts(col("t")).as("pc"))
      .select("pc.n_emails", "pc.n_digit_runs")
      .as[(Int, Int)].collect().head
    assert(counts == ((1, 1))) // short digit run ("12") untouched
  }

  test("langId identifies real-language samples") {
    assert(one[String](langId(col("t")), "the cat is in the house and it is warm") == "en")
    assert(one[String](langId(col("t")), "der Hund ist nicht in dem Haus und die Katze") == "de")
    assert(one[String](langId(col("t")), "le chat est dans la maison et le chien") == "fr")
    assert(one[String](langId(col("t")), "el perro es grande y la casa es bonita") == "es")
    assert(one[String](langId(col("t")), "你好世界这是一个测试文档") == "zh")
    assert(one[String](langId(col("t")), "xyzzy plugh") == "und")
  }

  test("fingerprints: exact differs on case, normalized does not") {
    val a = one[String](fingerprintMd5(col("t")), "Hello World")
    val b = one[String](fingerprintMd5(col("t")), "hello world")
    assert(a != b)
    val na = one[String](fingerprintNormalized(col("t")), "Hello   World")
    val nb = one[String](fingerprintNormalized(col("t")), "hello world")
    assert(na == nb)
  }

  test("shingles builds word n-grams, short docs degrade to whole-doc") {
    assert(oneSeq[String](shingles(col("t"), 2), "a b c") == Seq("a b", "b c"))
    assert(oneSeq[String](shingles(col("t"), 5), "a b") == Seq("a b"))
  }

  test("phraseMatch finds consecutive tokens only, at any position") {
    for (f <- Seq(phraseMatch _, phraseMatchHof _)) {
      assert(one[Boolean](f(col("t"), Seq("b", "c")), "a b c d"))
      assert(!one[Boolean](f(col("t"), Seq("b", "d")), "a b c d"))
      assert(one[Boolean](f(col("t"), Seq("c", "d")), "a b c d")) // at end
      assert(one[Boolean](f(col("t"), Seq("a")), "A b"))          // lowercased
      assert(!one[Boolean](f(col("t"), Seq("a", "b", "c")), "a b")) // longer than doc
      assert(!one[Boolean](f(col("t"), Seq("x")), ""))           // empty doc
    }
  }

  test("native phraseMatch ≡ HOF phraseMatch on the documents table") {
    val d = graft.Tables.load(spark, sf, "documents")
    val mism = d.select(
      phraseMatch(col("text"), Seq("spark", "hash")).as("a"),
      phraseMatchHof(col("text"), Seq("spark", "hash")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mism == 0)
  }

  test("winnowing fingerprints: shared-prefix docs share fingerprints") {
    val base = "one two three four five six seven eight nine ten"
    val extended = base + " eleven twelve"
    val fa = oneSeq[Long](winnowingFingerprints(col("t")), base).toSet
    val fb = oneSeq[Long](winnowingFingerprints(col("t")), extended).toSet
    assert((fa & fb).nonEmpty) // overlapping content → overlapping prints
    val other = oneSeq[Long](winnowingFingerprints(col("t")),
      "alpha beta gamma delta epsilon zeta eta theta iota kappa").toSet
    assert((fa & other).isEmpty)
  }
}
