package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis function library for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is a pure `Column => Column` built from Catalyst built-ins
  * (split/regexp/higher-order functions) — no UDFs, so the whole pipeline
  * stays inside whole-stage codegen and scales linearly with input: every
  * function is row-local (no shuffle), making these map-side-only at any
  * data size.
  */
object TextFunctions {

  /** Whitespace tokenization, lowercased, empty tokens dropped.
    * Native single pass (graft.functions.WordTokens); semantics pinned by
    * the DuckDB oracle's string_split_regex(lower(trim(x)),'\s+') twin. */
  def tokens(c: Column): Column = TextExpressions.wordTokens(c)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * other non-space chars each count as one token — a cheap proxy for
    * subword tokenizer counts. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Count of characters matching a regex character class (regex form —
    * kept for the composable reference formulations like [[langIdHof]]). */
  private def charCount(c: Column, cls: String): Column =
    length(c) - length(regexp_replace(c, cls, ""))

  /** One native scan yielding all character-class counts
    * (graft.functions.CharClassCounts) — each ratio below reads a field;
    * identical trees collapse to one pass under codegen subexpression
    * elimination. The regexp formulation rescans and materializes a
    * stripped copy of the string per class. */
  private def cc(c: Column, field: String): Column =
    TextExpressions.charClassCounts(c).getField(field)

  private def ccLen(c: Column): Column = greatest(cc(c, "len"), lit(1))

  def punctRatio(c: Column): Column = cc(c, "punct") / ccLen(c)

  def digitRatio(c: Column): Column = cc(c, "digit") / ccLen(c)

  def alphaRatio(c: Column): Column = cc(c, "alpha") / ccLen(c)

  def upperRatio(c: Column): Column = cc(c, "upper") / ccLen(c)

  private val enStopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "this", "by")

  /** Fraction of tokens that are (English) stopwords — a fluency signal.
    * Native set-probe count (graft.functions.MemberCount); the filter-HOF
    * form re-enters the interpreted lambda evaluator per token. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = enStopwords): Column =
    TextExpressions.memberCount(tokens(c), stopwords) /
      greatest(tokenCount(c), lit(1))

  /** Heuristic document quality score in [0,1] — the C4/Gopher-style
    * length/punctuation/stopword signals combined. Tunable but
    * deterministic. Cost per row: one tokenize pass + one char-class
    * pass, no regexes (semantics pinned by the q_text_quality oracle). */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c)
    val lengthOk = when(n.between(10, 100000), lit(1.0))
      .when(n.between(3, 9), lit(0.5)).otherwise(lit(0.0))
    val punctOk = lit(1.0) - least(punctRatio(c) * 4, lit(1.0))
    val fluency = least(stopwordRatio(c) * 5, lit(1.0))
    val alpha = alphaRatio(c)
    round(lengthOk * 0.3 + punctOk * 0.3 + fluency * 0.2 + alpha * 0.2, 4)
  }

  /** Model-based quality score: a fixed linear model over the same
    * replayable text features, squashed through a sigmoid — the
    * distributed-scoring plumbing of a fasttext/logreg quality
    * classifier, with the learned weights frozen as literals so the
    * result is a pure deterministic function of the text (swap the
    * constants for trained weights in a real deployment; the plan shape
    * — one char-class pass + one tokenize pass per row, no shuffle —
    * is the part that matters at corpus scale).
    *
    * z = −1.0 + 1.2·lengthOk − 2.0·punct + 1.5·alpha + 2.0·stop − 1.0·digit
    * score = round(1 / (1 + e^−z), 6)
    */
  def qualityLogit(c: Column): Column = {
    val n = tokenCount(c)
    val lengthOk = when(n.between(10, 100000), lit(1.0))
      .when(n.between(3, 9), lit(0.5)).otherwise(lit(0.0))
    val z = lit(-1.0) + lit(1.2) * lengthOk - lit(2.0) * punctRatio(c) +
      lit(1.5) * alphaRatio(c) + lit(2.0) * stopwordRatio(c) -
      lit(1.0) * digitRatio(c)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** True when the token stream contains `phrase` as CONSECUTIVE tokens —
    * positional phrase matching without an index, the ad-hoc complement
    * of `Retrieval.invertedIndex`. Row-local (one native tokenize + one
    * tight scan, graft.functions.PhraseMatch), so it composes with any
    * scan as a pushable filter and costs no shuffle at any corpus size.
    * The HOF twin below re-enters the interpreted lambda evaluator
    * |phrase|×|starts| times per row (~6× slower on the corpus path);
    * TextFunctionsSpec pins native ≡ HOF. */
  def phraseMatch(c: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty)
    TextExpressions.phraseMatch(c, phrase)
  }

  /** Composable-built-ins formulation of [[phraseMatch]] — the reference
    * semantics the native expression is parity-tested against.
    * `try_element_at` keeps the probe ANSI-safe past the array end; a
    * null comparison never satisfies `exists`, so truncated windows
    * simply fail to match. */
  def phraseMatchHof(c: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty)
    val t = tokens(c)
    val m = phrase.length
    val lastStart = greatest(org.apache.spark.sql.functions.size(t) - (m - 1), lit(1))
    val hit = exists(sequence(lit(1), lastStart),
      i => phrase.zipWithIndex.map { case (w, j) =>
        try_element_at(t, i + lit(j)) === lit(w)
      }.reduce(_ && _))
    coalesce(hit, lit(false))
  }

  private val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "de", "que", "es", "un", "por"))

  /** N-gram/stopword-heuristic language ID over {en,de,fr,es,zh}.
    * CJK-dominant text → zh; otherwise the language whose stopword list
    * hits the most tokens (lexicographic tiebreak); 'und' (undetermined)
    * when nothing hits. Native single pass (graft.functions.LangId) —
    * the HOF formulation re-enters the interpreted lambda evaluator
    * 4×|tokens| times per row; semantics pinned by the DuckDB oracle. */
  def langId(c: Column): Column = TextExpressions.langIdNative(c)

  /** The HOF formulation of [[langId]] — kept as the composable reference
    * implementation; LangIdParitySpec asserts it agrees with the native
    * expression on the documents table. */
  def langIdHof(c: Column): Column = {
    val toks = tokens(c)
    val nTok = greatest(size(toks), lit(1))
    val cjk = charCount(c, "[\\u4e00-\\u9fff\\u3040-\\u30ff]") / greatest(length(c), lit(1))
    // score per language = stopword-hit fraction; argmax via sorted struct array
    val scored = array(langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val sw = array(words.map(lit): _*)
      struct(
        (size(filter(toks, t => array_contains(sw, t))).cast("double") / nTok).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = element_at(array_sort(scored,
      (l, r) => when(l("score") > r("score"), -1)
        .when(l("score") < r("score"), 1)
        .otherwise(when(l("lang") < r("lang"), -1).when(l("lang") > r("lang"), 1).otherwise(0))), 1)
    when(cjk > 0.2, lit("zh"))
      .when(best("score") > 0, best("lang"))
      .otherwise(lit("und"))
  }

  /** Gopher-style within-document repetition signal: the fraction of word
    * n-gram OCCURRENCES that are repeats (1 - distinct/total). 0 = no
    * repetition; boilerplate and looping generations score high and get
    * filtered before training. One native WordNgrams pass per row. */
  def dupNgramFraction(c: Column, n: Int = 3): Column = {
    val all = TextExpressions.wordNgrams(c, n)
    when(size(all) === 0, lit(0.0)).otherwise(
      round(lit(1.0) - size(array_distinct(all)).cast("double") / size(all), 6))
  }

  /** PII patterns kept RE2-compatible (no backrefs/lookaround) so the
    * DuckDB oracle evaluates them identically. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val DigitRunRe = "[0-9]{7,}"

  /** PII scrub for training corpora: replace emails and long digit runs
    * (phone/account numbers) with typed placeholder tokens. Pure
    * codegen'd RegExpReplace — row-local, map-side at any scale. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), DigitRunRe, "<NUM>")

  /** Count of email / long-digit-run matches (the audit counterpart of
    * [[redactPii]]). Returns a struct {n_emails, n_digit_runs}. */
  def piiCounts(c: Column): Column = struct(
    size(regexp_extract_all(c, lit(EmailRe), lit(0))).as("n_emails"),
    size(regexp_extract_all(c, lit(DigitRunRe), lit(0))).as("n_digit_runs"))

  /** Content fingerprint: md5 hex of the raw text — exact-dedup key that
    * also matches DuckDB's md5() for oracle checks. */
  def fingerprintMd5(c: Column): Column = md5(c.cast("binary"))

  /** Normalized fingerprint: md5 of lowercase, whitespace-collapsed text —
    * catches trivially-reformatted duplicates. */
  def fingerprintNormalized(c: Column): Column =
    md5(concat_ws(" ", tokens(c)).cast("binary"))

  /** Word n-gram shingles (the MinHash/Jaccard unit), distinct. Docs
    * shorter than n tokens yield one shingle of the whole doc. Native
    * single pass (graft.functions.WordShingles). */
  def shingles(c: Column, n: Int): Column = TextExpressions.wordShingles(c, n)

  /** Rolling-hash document fingerprint (winnowing, Schleimer et al.):
    * hash every n-shingle, keep the min hash of each sliding window of
    * `w` hashes, dedupe. Robust partial-overlap detection at ~1/w the
    * storage of full shingle sets. Native single pass
    * (graft.functions.WinnowHashes). */
  def winnowingFingerprints(c: Column, n: Int = 3, w: Int = 4): Column =
    TextExpressions.winnowHashes(shingles(c, n), w)
}
