package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark engine"),      // high tf on one term
    (2L, "spark hash join"),               // two distinct query terms
    (3L, "sort merge join strategy"),      // no query terms
    (4L, "hash"),                          // short doc, one term
    (5L, "the quick brown fox jumps over the lazy dog entirely unrelated")
  ).toDF("doc_id", "text")

  test("bm25 excludes documents with no query terms") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark", "hash"))
      .as[(Long, Double)].collect().toMap
    assert(!out.contains(3L) && !out.contains(5L))
    assert(out.keySet == Set(1L, 2L, 4L))
  }

  test("bm25 ranks multi-term matches above repeated single terms") {
    // tf saturation: doc 2 matches both terms, doc 1 has tf=3 on one —
    // BM25's tf curve saturates so coverage beats repetition
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark", "hash"))
      .as[(Long, Double)].collect()
    assert(top.head._1 == 2L, s"expected doc 2 first, got ${top.toSeq}")
  }

  test("bm25 scores decrease down the returned list and respect k") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "hash"), k = 2).as[(Long, Double)].collect()
    assert(out.length == 2)
    assert(out.sliding(2).forall { case Array(a, b) => a._2 >= b._2; case _ => true })
  }

  test("bm25 rewards rarer terms via idf") {
    // "hash" appears in 2 docs, "spark" in 2 docs; add docs to skew df
    val skewed = docs.union(Seq(
      (6L, "spark pipelines"), (7L, "spark streaming")).toDF("doc_id", "text"))
    // one doc with only "spark" (common), one with only "hash" (rarer);
    // equal tf and dl => the rarer term must score higher
    val probe = Seq((10L, "spark alpha"), (11L, "hash alpha"))
      .toDF("doc_id", "text").union(skewed)
    val out = Retrieval.bm25TopK(probe, "doc_id", "text", Seq("spark", "hash"))
      .as[(Long, Double)].collect().toMap
    assert(out(11L) > out(10L))
  }

  test("invertedIndex computes df and impact-truncated doc-ordered postings") {
    val d = Seq((1L, "x x y"), (2L, "x z"), (3L, "y")).toDF("doc_id", "text")
    val out = Retrieval.invertedIndex(d, "doc_id", "text", maxPostings = 1)
      .as[(String, Long, Seq[(Long, Long)])].collect()
      .map { case (t, df, p) => t -> ((df, p)) }.toMap
    // df counts ALL matching docs even when the postings are truncated
    assert(out("x") == ((2L, Seq((1L, 2L)))))  // tf desc: d1 (tf=2) wins
    assert(out("y") == ((2L, Seq((1L, 1L)))))  // tf tie: doc_id asc wins
    assert(out("z") == ((1L, Seq((2L, 1L)))))
  }

  test("invertedIndex postings are doc_id-sorted regardless of impact rank") {
    val d = Seq((5L, "w"), (1L, "w w"), (3L, "w w w")).toDF("doc_id", "text")
    val out = Retrieval.invertedIndex(d, "doc_id", "text", maxPostings = 10)
      .as[(String, Long, Seq[(Long, Long)])].collect().head
    assert(out._3 == Seq((1L, 2L), (3L, 3L), (5L, 1L)))
  }

  test("chunkDocuments produces overlapping windows with a short tail") {
    val d = Seq((1L, "a b c d e"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val out = Retrieval.chunkDocuments(d, "doc_id", "text",
      chunkSize = 3, stride = 2)
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "c d e"), (1L, 2, 1, "e"),
      (3L, 0, 1, "x")))  // empty doc 2 yields no chunks
  }

  test("chunkDocuments with stride == chunkSize partitions exactly") {
    val d = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = Retrieval.chunkDocuments(d, "doc_id", "text",
      chunkSize = 2, stride = 2)
      .as[(Long, Int, Int, String)].collect().sortBy(_._2)
    assert(out.map(_._4).toSeq == Seq("a b", "c d"))
  }

  test("unigramLogProb scores by corpus-trained MLE frequencies") {
    // corpus: a=2, b=2, c=1, total=5
    val d = Seq((1L, "a a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    val out = Retrieval.unigramLogProb(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out.toSeq == Seq(
      (1L, 3L, r4(math.log(0.4))),                        // all tokens p=2/5
      (2L, 2L, r4((math.log(0.4) + math.log(0.2)) / 2)))) // empty doc 3 dropped
  }

  test("bigramLogProb scores by smoothed corpus bigram frequencies") {
    // corpus bigrams: "a b" ×2 (docs 1,2), "b a" ×1 (doc 1); V = 2
    // ctx: c(a·)=2, c(b·)=1; α=0.5 ⇒ P(b|a)=(2+.5)/(2+1)=5/6,
    // P(a|b)=(1+.5)/(1+1)=3/4
    val d = Seq((1L, "a b a"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val out = Retrieval.bigramLogProb(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out.toSeq == Seq(
      (1L, 2L, r4((math.log(5.0 / 6) + math.log(3.0 / 4)) / 2)),
      (2L, 1L, r4(math.log(5.0 / 6))))) // 1-token doc 3 dropped
  }

  test("sourceKlDivergence: 0 for corpus-identical source, >0 for skew") {
    // A: a=2,b=1 (n=3); B: a=1,b=2 (n=3); corpus: a=3,b=3 (N=6) →
    // p_c = (1/2, 1/2); KL_A = 2/3·ln(4/3) + 1/3·ln(2/3), KL_B same by
    // symmetry; C: "a b" matches the corpus distribution exactly → 0
    val d = Seq(("A", "a a b"), ("B", "a b b"), ("C", "a b"))
      .toDF("source", "text")
    val out = Retrieval.sourceKlDivergence(d, "source", "text")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val ab = r4(2.0 / 3 * math.log(4.0 / 3) + 1.0 / 3 * math.log(2.0 / 3))
    // C's corpus now has a=4,b=4 of 8 — still uniform, C still exact
    val withC = Seq(("A", 3L, ab), ("B", 3L, ab), ("C", 2L, 0.0))
    // recompute A/B against the 3-source corpus: a=4,b=4 (N=8), p_c
    // still (1/2,1/2) — the hand values above hold unchanged
    assert(out.toSeq == withC, out.toSeq)
  }

  test("tfIdfTopTerms: ubiquitous terms score 0, rare repeats rank first") {
    // N=3; "the" in every doc (idf=ln(1)=0); "cat" only in doc 1 twice
    val d = Seq((1L, "the cat cat"), (2L, "the dog"), (3L, "the fish"))
      .toDF("doc_id", "text")
    val out = Retrieval.tfIdfTopTerms(d, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    // doc 1: cat tf=2 df=1 score=2·ln3; the tf=1 df=3 score=0
    val cat = out.find(r => r._1 == 1L && r._2 == "cat").get
    assert(cat == ((1L, "cat", 2L, 1L, r4(2 * math.log(3.0)))))
    val the1 = out.find(r => r._1 == 1L && r._2 == "the").get
    assert(the1._5 == 0.0)
    // k=2 cap holds per doc, every doc represented
    assert(out.groupBy(_._1).forall(_._2.length <= 2))
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("vocabCoverage: OOV rates against the top-k vocab with tie rule") {
    val docs = Seq(("A", "x x x y"), ("B", "x z")).toDF("src", "txt")
    val got = Retrieval.vocabCoverage(docs, "src", "txt", vocabSize = 1)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // vocab = {x} (count 4); A: 3/4 in-vocab, B: 1/2
    assert(got == Seq(("A", 4L, 3L, 0.25), ("B", 2L, 1L, 0.5)))
    // ties at the boundary break token-asc: y and z both count 1, so
    // vocabSize=2 admits y (not z)
    val got2 = Retrieval.vocabCoverage(docs, "src", "txt", vocabSize = 2)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(got2 == Seq(("A", 0.0), ("B", 0.5)))
  }

  test("retrievalEval: hand-computed MRR/precision/recall, zero-relevant query") {
    // docs 1,2 contain both probe terms (relevant); 3 has one term
    // (retrieved by BM25 but NOT relevant); 4 is noise
    val docs = Seq(
      (1L, "cat dog bird"),
      (2L, "cat dog fish fish"),
      (3L, "cat mouse mouse"),
      (4L, "zebra yak emu")
    ).toDF("doc_id", "text")
    val out = Retrieval.retrievalEval(docs, "doc_id", "text",
      Seq(Seq("cat", "dog"), Seq("unicorn")), k = 2)
      .collect().map(r => r.getAs[Int]("query_id") -> r).toMap
    val q0 = out(0)
    assert(q0.getAs[Long]("n_rel") == 2L)
    // k=2: both top slots must be the two relevant docs (they match two
    // terms vs doc 3's one), so hits=2, first rank 1
    assert(q0.getAs[Long]("n_hits") == 2L)
    assert(q0.getAs[Double]("mrr") == 1.0)
    assert(q0.getAs[Double]("precision_k") == 1.0)
    assert(q0.getAs[Double]("recall_k") == 1.0)
    // a query with NO relevant docs: all metrics zero, no NULL leakage
    val q1 = out(1)
    assert(q1.getAs[Long]("n_rel") == 0L && q1.getAs[Long]("n_hits") == 0L)
    assert(q1.getAs[Double]("mrr") == 0.0 &&
      q1.getAs[Double]("recall_k") == 0.0)
  }

  test("rrfFuse: both-list docs outrank single-list docs; hand values") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b, "doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2 in both lists: 1/62 + 1/61; docs 1 and 3 single-list
    assert(got == Seq(
      2L -> r6(1.0 / 62 + 1.0 / 61),
      1L -> r6(1.0 / 61),
      3L -> r6(1.0 / 62)))
    // ranks survive as nullable columns
    val row3 = Retrieval.rrfFuse(a, b, "doc_id", "rank")
      .filter($"id" === 3L).head()
    assert(row3.isNullAt(1) && row3.getInt(2) == 2)
  }

  test("prfExpandedTopK surfaces vocabulary-mismatch docs plain BM25 cannot") {
    // doc 1 matches the query and repeatedly uses 'gradient'; doc 2
    // never contains a query term but is rich in 'gradient' — only the
    // expanded query can score it. Short filler docs keep idf sane.
    val docs = (Seq(
      (1L, "training loss training gradient gradient gradient descent"),
      (2L, "gradient gradient gradient clipping stabilizes deep nets"),
      (3L, "cats sleep on warm windowsills every afternoon"),
      (4L, "the stock market closed mixed on tuesday")) ++
      (5L to 12L).map(i => (i, s"filler document number $i about nothing")))
      .toDF("doc_id", "text")
    val plain = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("training"), k = 12)
      .select("doc_id").as[Long].collect().toSet
    assert(!plain.contains(2L), "premise broken: plain BM25 already finds doc 2")
    val prf = Retrieval.prfExpandedTopK(docs, "doc_id", "text",
      Seq("training"), fbDocs = 1, fbTerms = 2, beta = 0.5, k = 12)
    val ids = prf.select("doc_id").as[Long].collect()
    assert(ids.contains(2L), s"expansion failed to surface doc 2: ${ids.toSeq}")
    // original-query docs still rank first (weight 1.0 vs beta)
    assert(ids.head == 1L)
    // deterministic replay
    val again = Retrieval.prfExpandedTopK(docs, "doc_id", "text",
      Seq("training"), fbDocs = 1, fbTerms = 2, beta = 0.5, k = 12)
    assert(prf.collect().toSeq == again.collect().toSeq)
  }

  test("logOddsTerms: source-exclusive term tops its source, z replays by hand") {
    import spark.implicits._
    // source a: 'alpha' x6 + 'the' x4; source b: 'beta' x6 + 'the' x4
    val docs = Seq(
      ("a", "alpha alpha alpha the the"), ("a", "alpha alpha alpha the the"),
      ("b", "beta beta beta the the"), ("b", "beta beta beta the the"))
      .toDF("source", "text")
    val r = Retrieval.logOddsTerms(docs, "text", "source",
      alpha = 0.5, minCount = 1, k = 1).orderBy("source").collect()
    assert(r.map(_.getAs[String]("term")).toSeq == Seq("alpha", "beta"))
    assert(r.forall(_.getAs[Long]("c_sw") == 6L))
    // hand replay for 'alpha' in a: c_sw=6, c_rest=0, n_s=10, n_r=10,
    // V=3, a0=1.5
    val cs = 6.5; val cr = 0.5
    val d = math.log(cs / (10.0 + 1.5 - cs)) - math.log(cr / (10.0 + 1.5 - cr))
    val z = d / math.sqrt(1.0 / cs + 1.0 / cr)
    val r6 = BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getAs[Double]("z") == r6)
    // symmetric corpus → symmetric scores
    assert(r(0).getAs[Double]("z") == r(1).getAs[Double]("z"))
  }
}
