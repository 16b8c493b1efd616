package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Lexical retrieval over a document corpus: BM25 scoring against a fixed
  * term set — the standard pre-neural ranking function and the usual
  * first-stage filter in a training-data curation stack (e.g. "pull the
  * top-k documents matching this probe query" before an embedding pass).
  *
  * Scale shape: one explode of only the MATCHING tokens (the `isin`
  * filter runs before the tf aggregation, so the shuffle carries
  * (doc, term) pairs for query terms only — not the whole token stream);
  * document-frequency and corpus statistics are tiny aggregates that
  * broadcast back. No all-pairs anything, no driver-side state.
  */
object Retrieval {

  /** Top-k documents by BM25 score for `queryTerms`.
    *
    * score(d) = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Robertson/Sparck-Jones)
    *
    * This is the Lucene-style variant that drops the classic (k1+1)
    * numerator factor — a per-term positive constant, so document
    * ranking is identical; dropping it also keeps every constant in the
    * formula a plain literal both engines parse to the same double
    * (k1+1 computed in Scala vs parsed as a literal can differ in the
    * last ulp).
    *
    * Tokenization is the repo-standard whitespace/lowercase pass
    * (TextExpressions.tokenize) so cross-engine oracles can replay it.
    * Output ranks on the ROUNDED score (4 dp) with id tiebreak — the
    * repo's determinism rule for cross-engine float comparison.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextExpressions.wordTokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))

    // corpus stats: one tiny agg, broadcast into the scoring join
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))

    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

    // per-doc distinct terms ⇒ rows per term = document frequency
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))

    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("part",
        col("idf") * col("tf") /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum("part"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Pseudo-relevance-feedback query expansion (RM3-lite, Lavrenko &
    * Croft's relevance-model family): run BM25 once, harvest the most
    * frequent terms of the top-`fbDocs` feedback documents (minimum
    * length 4, original query terms excluded — the cheap stoplist), and
    * re-score with the expanded weighted query — original terms weight
    * 1.0, expansion terms weight `beta`. The classic recall lever when
    * queries are short and vocabulary mismatch hides relevant docs.
    *
    * Everything is deterministic and oracle-replayable: feedback docs
    * come from [[bm25TopK]]'s rounded-score/id ranking, expansion terms
    * tie-break (count desc, term asc) on integer counts, and the final
    * ranking is on the rounded weighted score. Scale shape: two BM25
    * passes (each one token-explode + bounded aggs) plus one bounded
    * top-`fbTerms` TakeOrdered; the term-weight table (≤ |query| +
    * fbTerms rows) broadcasts into the scoring join — no driver-side
    * collect anywhere. */
  def prfExpandedTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], fbDocs: Int = 5, fbTerms: Int = 5,
      beta: Double = 0.5, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fb = bm25TopK(docs, idCol, textCol, queryTerms, fbDocs, k1, b)
      .select(col("doc_id"))
    val expansion = docs
      .join(fb.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_semi")
      .select(explode(TextExpressions.wordTokens(col(textCol))).as("term"))
      .filter(length(col("term")) >= 4 && !col("term").isin(queryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(fbTerms)
      .select(col("term"), lit(beta).as("w"))
    val weights = queryTerms.toDF("term")
      .select(col("term"), lit(1.0).as("w"))
      .unionByName(expansion)

    // second BM25 pass, per-term parts weighted by the expanded query
    val toks = docs.select(col(idCol).as("doc_id"),
      TextExpressions.wordTokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = toks.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(weights), Seq("term"))
      .groupBy("doc_id", "dl", "term", "w").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("part",
        col("w") * col("idf") * col("tf") /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum("part"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Per-source vocabulary coverage against the corpus top-`vocabSize`
    * tokens — the OOV-rate report that sizes tokenizer vocabularies and
    * flags sources whose token distribution a fixed vocab serves badly
    * (code, other languages, encoding damage). Vocab selection ties
    * break (count desc, token asc) so the boundary is identical across
    * engines. Scale shape: one token-count agg, a bounded top-k
    * (TakeOrdered, never a global sort of the corpus), then the vocab —
    * tiny by construction — broadcasts into a map-side membership join.
    */
  def vocabCoverage(docs: DataFrame, sourceCol: String, textCol: String,
      vocabSize: Int = 100): DataFrame = {
    require(vocabSize > 0, s"need vocabSize > 0, got $vocabSize")
    val toks = docs.select(col(sourceCol).as("source"),
      explode(TextExpressions.wordTokens(col(textCol))).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(vocabSize)
      .select(col("w"), lit(1).as("__in_v"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        count(col("__in_v")).as("n_in_vocab"),
        round(lit(1.0) -
          count(col("__in_v")).cast("double") / count(lit(1)), 6)
          .as("oov_rate"))
  }

  /** Reciprocal-rank fusion of two bounded rankings — the standard
    * hybrid-retrieval combiner (lexical BM25 list ⊕ dense embedding
    * list): rrf(d) = Σ 1/(c + rank_i(d)) over the lists containing d,
    * c = 60 per Cormack et al. Rank-based, so the two lists' scores
    * never need calibrating against each other — exactly why RRF is
    * the default fusion in hybrid search.
    *
    * Determinism: each contribution is one double division; the sum is
    * two terms in fixed column order; ties on the ROUNDED fused score
    * break by id. Scale shape: both inputs are top-k lists (bounded by
    * construction), so the full-outer join and the final sort are
    * driver-trivial; the heavy lifting happened in the rankers. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
      c: Int = 60, k: Int = 10): DataFrame = {
    val ra = a.select(col(idCol).as("id"), col(rankCol).as("rank_a"))
    val rb = b.select(col(idCol).as("id"), col(rankCol).as("rank_b"))
    ra.join(rb, Seq("id"), "full_outer")
      .select(col("id"), col("rank_a"), col("rank_b"),
        round(coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }

  /** Ranking-quality evaluation of the BM25 retriever against a
    * replayable relevance rule: a document is RELEVANT to a query iff
    * its token set contains every query term (boolean-AND — the
    * strictest lexical ground truth derivable without labels, and
    * exactly replayable by another engine). Per query: relevant-set
    * size, hits in the top-k, and the division-only IR metrics — MRR
    * (1/rank of the first relevant result, 0 when none), precision@k,
    * recall@k. nDCG is deliberately absent: its log2 gain chain is
    * libm-shaped and engine-dependent, while these three are single
    * exact divisions.
    *
    * `queries` is a bounded driver-side probe list (the evalPatterns
    * precedent) — one ranking job per query, each fully distributed;
    * the per-query metric rows are single-row aggregates attached via
    * broadcast. */
  def retrievalEval(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[Seq[String]], k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "retrievalEval needs at least one query")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      TextExpressions.wordTokens(col(textCol)).as("toks"))
    queries.zipWithIndex.map { case (terms, qi) =>
      val ranked = bm25TopK(docs, idCol, textCol, terms, k)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
      val rel = toks.filter(
        terms.map(t => array_contains(col("toks"), t)).reduce(_ && _))
        .select("doc_id")
      val hits = ranked.join(rel, Seq("doc_id"), "left_semi")
      rel.agg(count(lit(1)).as("n_rel"))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"),
          min(col("rank")).as("first_rank"))))
        .select(lit(qi).as("query_id"),
          lit(terms.mkString(" ")).as("query"),
          col("n_rel"), col("n_hits"),
          round(coalesce(lit(1.0) / col("first_rank"), lit(0.0)), 6)
            .as("mrr"),
          round(col("n_hits") / lit(k.toDouble), 6).as("precision_k"),
          round(when(col("n_rel") > 0,
            col("n_hits").cast("double") / col("n_rel"))
            .otherwise(lit(0.0)), 6).as("recall_k"))
    }.reduce(_ unionByName _).orderBy("query_id")
  }

  /** Inverted index: `(term, df, postings)` where `postings` is the top
    * `maxPostings` documents for the term by (tf desc, doc_id asc),
    * stored sorted by doc_id — the impact-truncated, merge-friendly
    * layout a first-stage retriever serves from.
    *
    * Scale shape: the (term, doc) explode is the inherent linear cost of
    * index construction; everything after is keyed by term. The posting
    * list is truncated with a row_number window BEFORE collect_list, so
    * per-term state is bounded by `maxPostings` even for stop-words —
    * an unbounded collect_list over a hot term is exactly the per-group
    * memory blowup that kills index builds at corpus scale. df is a
    * count window over the same term partitioning (same shuffle).
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextExpressions.wordTokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val byTerm = Window.partitionBy("term")
    tf
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rn", row_number().over(
        byTerm.orderBy(col("tf").desc, col("doc_id").asc)))
      .filter(col("rn") <= maxPostings)
      .groupBy("term", "df")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf"))))
        .as("postings"))
  }

  /** Token-window document chunking — the standard RAG / pretraining
    * preprocessing step: overlapping windows of `chunkSize` tokens taken
    * every `stride` tokens (stride < chunkSize ⇒ overlap). The final
    * window of a document may be shorter; empty documents produce no
    * chunks. `chunk_idx` is the 0-based window ordinal (= start/stride).
    *
    * Scale shape: pure map-side — one tokenize pass and a posexplode of
    * the per-document start offsets; no shuffle at any corpus size, so
    * it parallelizes perfectly and composes with downstream repartition/
    * packing stages without imposing a partitioning of its own.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    docs
      .select(col(idCol).as("doc_id"),
        TextExpressions.wordTokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(chunkSize), col("n") - col("start")).as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Unigram language-model quality signal: train token frequencies on
    * the corpus itself, then score each document by its mean token
    * log-probability, ln(c_w / total_tokens) averaged over the document's
    * tokens. Low scores flag documents full of corpus-atypical tokens
    * (mojibake, boilerplate hex, wrong language) — the cheap first rung of
    * the perplexity-filter ladder used in pretraining curation, with the
    * corpus itself as the reference model so no external LM is needed.
    * No smoothing: every scored token is in the training counts by
    * construction (train corpus = scored corpus).
    *
    * Output: (doc_id, n_tokens, avg_logprob) — avg_logprob rounded to 4 dp
    * (the repo's cross-engine float rule). Empty documents are dropped.
    *
    * Scale shape: one explode → token-count agg (map-side partials over
    * the token stream), a corpus-total tiny agg broadcast back, and a
    * shuffle join of the token stream against the count table keyed by
    * token — all linear; vocabulary never collects to the driver.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextExpressions.wordTokens(col(textCol))).as("w"))
    val counts = toks.groupBy("w").agg(count(lit(1)).as("c_w"))
    val total = counts.agg(sum("c_w").as("n_total"))
    toks.join(counts, Seq("w"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        round(avg(log(col("c_w").cast("double") / col("n_total"))), 4)
          .as("avg_logprob"))
  }

  /** Bigram-LM quality signal — the rung above [[unigramLogProb]] on
    * the perplexity-filter ladder: P(w₂|w₁) with add-α smoothing,
    * α·|V| in the denominator, each document scored by its mean bigram
    * log-probability. Catches locally-incoherent text (shuffled or
    * templated token salad) that unigram frequencies can't, still with
    * the corpus itself as the model — no external LM.
    *
    * Context count c(w₁·) is the sum of bigram counts starting with w₁
    * (self-consistent with the numerator), |V| is the distinct unigram
    * count. α = 0.5 keeps every arithmetic term exactly representable
    * (int + 0.5), so the only cross-engine float surface is ln/avg —
    * handled by the repo's round-4dp rule like unigramLogProb.
    * Documents with fewer than 2 tokens are dropped. Scale shape: one
    * bigram explode, counts co-partitioned on the bigram, context
    * counts derived FROM the bigram counts (no second corpus pass),
    * |V| a single-row broadcast.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    val bi = docs.select(col(idCol).as("doc_id"),
      explode(TextExpressions.wordNgrams(col(textCol), 2)).as("bg"))
    val biCounts = bi.groupBy("bg").agg(count(lit(1)).as("c_bg"))
    val ctx = biCounts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c_bg").as("c_ctx"))
    val vocab = docs
      .select(explode(TextExpressions.wordTokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    bi.join(biCounts, Seq("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c_bg") + lit(alpha)) /
          (col("c_ctx") + lit(alpha) * col("v")))), 4).as("avg_logprob"))
  }

  /** Per-source KL divergence from the corpus token distribution —
    * the distribution-drift diagnostic of a multi-source curation
    * pipeline: KL(P_source ‖ P_corpus) = Σ_w p_s(w)·ln(p_s(w)/p_c(w)),
    * high for sources whose vocabulary usage diverges from the blend
    * (templated boilerplate, wrong domain, encoding damage). Always
    * finite: every source token is in the corpus by construction.
    *
    * Cross-engine determinism: the log ratio is computed as
    * ln((c_sw/c_w)·(N/n_s)) — two double divisions and one multiply in
    * a fixed order, so both engines produce the bit-identical IEEE754
    * value with NO integer products (c_sw·N as a Long would silently
    * wrap past ~3e9 corpus tokens under non-ANSI Spark while DuckDB's
    * BIGINT errors loudly, desynchronizing the oracle) — and
    * the weighted sum rounds to 4 dp like every LM score here. Scale
    * shape: one token explode, (source, word) counts co-partitioned,
    * corpus counts derived FROM the per-source counts (no second
    * pass), totals a single-row broadcast.
    */
  def sourceKlDivergence(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val sw = docs.select(col(srcCol).as("source"),
        explode(TextExpressions.wordTokens(col(textCol))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
    val perSource = sw.groupBy("source").agg(sum("c_sw").as("n_s"))
    val cw = sw.groupBy("w").agg(sum("c_sw").as("c_w"))
    val tot = cw.agg(sum("c_w").as("n"))
    sw.join(cw, Seq("w"))
      .join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"),
        round(sum((col("c_sw").cast("double") / col("n_s")) *
          log((col("c_sw").cast("double") / col("c_w")) *
            (col("n").cast("double") / col("n_s")))), 4).as("kl"))
  }

  /** Classic TF–IDF keyword extraction: the top-`k` terms of each
    * document by `tf · ln(N/df)`, the standard "what is this document
    * about" signal (and the weighting BM25 refines). Complements
    * [[bm25TopK]]: BM25 ranks documents for a fixed query; this ranks
    * terms within every document, no query needed.
    *
    * Ranking uses the ROUNDED score (4 dp) with a term tiebreak so the
    * kept set is identical across engines (the repo's determinism rule —
    * ranking on the raw double would let a last-ulp ln() difference
    * flip a boundary row). Scale shape: the tf agg shuffles (doc,term)
    * pairs once; document frequency is a second agg on the tf output
    * co-partitioned by term; N is a single-row broadcast; the top-k is a
    * doc-partitioned window (WindowGroupLimit pushes the rank filter
    * map-side). Nothing global, nothing all-pairs.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"need k > 0, got $k")
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(TextExpressions.wordTokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("doc_id", "term", "tf", "df", "score")
  }

  /** Distinctive terms per source via log-odds with a Dirichlet prior
    * (Monroe, Colaresi & Quinn 2008, "Fightin' Words"): for each
    * retained term, the z-scored log-odds of its rate in source s vs
    * the rest of the corpus, δ = ln((c_sw+α)/(n_s+α₀−c_sw−α)) −
    * ln((c_rw+α)/(n_r+α₀−c_rw−α)), σ² = 1/(c_sw+α) + 1/(c_rw+α) —
    * the principled replacement for raw tf-idf contrast when comparing
    * corpora of very different sizes (rare-word variance is shrunk by
    * the prior instead of dominating the ranking).
    *
    * Vocabulary is restricted to terms with global count ≥ `minCount`
    * BEFORE totals are taken, so every quantity (c, n, V, α₀ = α·V) is
    * an integer-or-fixed-literal function of the filtered counts and
    * the score replays exactly. Shape: one token-count aggregate, a
    * term-frequency filter, two broadcast totals, a source-partitioned
    * top-k window. Output: top `k` terms per source by z (term
    * tiebreak). */
  def logOddsTerms(docs: DataFrame, textCol: String, sourceCol: String,
      alpha: Double = 0.5, minCount: Int = 20, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.select(col(sourceCol).as("source"),
        explode(TextExpressions.wordTokens(col(textCol))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c_sw"))
    val global = counts.groupBy("term").agg(sum("c_sw").as("c_w"))
      .filter(col("c_w") >= minCount)
    val kept = counts.join(global, Seq("term"))
    val bySource = kept.groupBy("source").agg(sum("c_sw").as("n_s"))
    val totals = kept.agg(sum("c_sw").as("n_tot"),
      countDistinct("term").as("v"))
    val a0 = lit(alpha) * col("v")
    val cs = col("c_sw").cast("double") + lit(alpha)
    val cr = (col("c_w") - col("c_sw")).cast("double") + lit(alpha)
    val delta =
      log(cs / (col("n_s").cast("double") + a0 - cs)) -
        log(cr / ((col("n_tot") - col("n_s")).cast("double") + a0 - cr))
    val z = delta / sqrt(lit(1.0) / cs + lit(1.0) / cr)
    val w = Window.partitionBy("source")
      .orderBy(col("z").desc, col("term").asc)
    kept.join(bySource, Seq("source"))
      .crossJoin(broadcast(totals))
      .withColumn("z", round(z, 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("source", "term", "c_sw", "z")
  }
}
