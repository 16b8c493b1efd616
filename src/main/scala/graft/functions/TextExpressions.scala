package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer/shingler for the text hot path.
  *
  * Semantics match the composable built-in forms exactly (lowercase, trim,
  * split on whitespace, drop empties; shingles = space-joined word n-grams,
  * distinct, whole-doc fallback for short docs) — the DuckDB oracle
  * replicates those semantics in SQL, so they are pinned by the
  * correctness gate. The HOF chain (split → filter → transform → slice →
  * concat_ws → array_distinct) evaluates interpreted with per-element
  * allocation: ~50 ms/doc on 500-char docs; these do one pass in ~µs.
  */

/** Lowercased whitespace tokens of a string column. */
case class WordTokens(child: Expression)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tokens needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextExpressions.tokenize(v.asInstanceOf[UTF8String])
      .map(_.asInstanceOf[Any]))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles of a string column (whole-doc fallback
  * below n tokens), first-occurrence order. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = TextExpressions.tokenize(v.asInstanceOf[UTF8String])
    val out =
      if (toks.length >= n) {
        val seen = mutable.LinkedHashSet.empty[UTF8String]
        var i = 0
        while (i + n <= toks.length) {
          seen += UTF8String.concatWs(TextExpressions.SPACE,
            toks.slice(i, i + n).toIndexedSeq: _*)
          i += 1
        }
        seen.toArray
      } else Array(UTF8String.concatWs(TextExpressions.SPACE, toks.toIndexedSeq: _*))
    new GenericArrayData(out.map(_.asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ALL word n-grams of a string (space-joined, NON-distinct, in order) —
  * the counting unit for collocation statistics like PMI, where every
  * occurrence matters (contrast [[WordShingles]]: distinct, whole-doc
  * fallback — the set unit for Jaccard). Docs with fewer than n tokens
  * yield an empty array. One pass; the HOF formulation
  * (transform(sequence(...), i -> struct(element_at...))) re-enters the
  * interpreted lambda evaluator and allocates a struct per position. */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ngrams needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = TextExpressions.tokenize(v.asInstanceOf[UTF8String])
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        out(i) = UTF8String.concatWs(TextExpressions.SPACE,
          toks.slice(i, i + n).toIndexedSeq: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprint selection (Schleimer et al.): XXH64 each shingle,
  * take the min hash of every sliding window of `w` hashes, dedupe
  * (first-occurrence order). Input is the precomputed shingle array;
  * single native pass instead of the transform/sequence/slice/array_min
  * HOF chain (which re-enters the interpreter O(|shingles|·w) times and
  * recomputes the hash array per reference). */
case class WinnowHashes(child: Expression, w: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow needs array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      hashes(i) = if (s == null) 0L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      i += 1
    }
    val out = mutable.LinkedHashSet.empty[Long]
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n < w) {
      var m = Long.MaxValue
      hashes.foreach(h => if (h < m) m = h)
      out += m
    } else {
      i = 0
      while (i + w <= n) {
        var m = Long.MaxValue
        var j = i
        while (j < i + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
        out += m
        i += 1
      }
    }
    new GenericArrayData(out.toArray.map(_.asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Heuristic language ID in one native pass: stopword-hit argmax over
  * {de,en,es,fr} (lexicographic tiebreak) with a CJK-character-ratio
  * override to "zh", "und" when nothing hits. Exact twin of the composable
  * HOF formulation and of the DuckDB oracle SQL (q_lang_id), which pins
  * the semantics; the HOF chain re-enters the interpreted lambda evaluator
  * 4×|tokens| times per row, this does one tokenize + 4 set probes. */
case class LangId(child: Expression)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lang_id needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    // CJK ratio over code points (Spark length() counts code points)
    var total = 0
    var cjk = 0
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3040 && cp <= 0x30ff)) cjk += 1
    }
    if (cjk.toDouble / math.max(1, total) > 0.2) TextExpressions.ZH
    else {
      val toks = TextExpressions.tokenize(s)
      val nTok = math.max(1, toks.length)
      val hits = new Array[Int](TextExpressions.langSets.length)
      toks.foreach { t =>
        var l = 0
        while (l < TextExpressions.langSets.length) {
          if (TextExpressions.langSets(l)._2.contains(t)) hits(l) += 1
          l += 1
        }
      }
      // argmax in lexicographic lang order: first strict max wins ties —
      // identical to the sorted-struct-array formulation and the oracle
      var bestLang: UTF8String = null
      var bestScore = -1.0
      var l = 0
      while (l < TextExpressions.langSets.length) {
        val score = hits(l).toDouble / nTok
        if (score > bestScore) { bestScore = score; bestLang = TextExpressions.langSets(l)._1 }
        l += 1
      }
      if (bestScore > 0) bestLang else TextExpressions.UND
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass character-class counter: code-point length plus counts of
  * ASCII punctuation (Java regex \p{Punct} = POSIX, ASCII-only), digits,
  * letters, and uppercase letters in a single scan. The fused twin of
  * four `length(x) - length(regexp_replace(x, cls, ""))` passes, each of
  * which rescans the string AND materializes a stripped copy — this
  * allocates nothing per class. Field semantics are pinned by the
  * q_text_quality / q_corpus_pipeline DuckDB oracles. */
case class CharClassCounts(child: Expression)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("digit", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("upper", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_class_counts needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val str = v.asInstanceOf[UTF8String].toString
    var len = 0; var punct = 0; var digit = 0; var alpha = 0; var upper = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      len += 1
      if (cp < 128) {
        if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
            (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) punct += 1
        else if (cp >= '0' && cp <= '9') digit += 1
        else if (cp >= 'A' && cp <= 'Z') { alpha += 1; upper += 1 }
        else if (cp >= 'a' && cp <= 'z') alpha += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(len, punct, digit, alpha, upper)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of array<string> elements contained in a fixed word set — the
  * native twin of size(filter(arr, t -> array_contains(set, t))), whose
  * lambda re-enters the interpreted evaluator per element. One hash-set
  * probe per element. */
case class MemberCount(child: Expression, words: Seq[String])
    extends UnaryExpression with RefEvalCodegen {

  @transient private lazy val set: Set[UTF8String] =
    words.map(UTF8String.fromString).toSet

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"member_count needs array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var hits = 0
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null && set.contains(s)) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Consecutive-token phrase probe in one native pass: tokenize (the
  * repo-standard lowercase/whitespace pass) and scan for `phrase` as
  * adjacent tokens. Exact twin of the HOF formulation
  * (TextFunctions.phraseMatchHof — parity-pinned in TextFunctionsSpec)
  * and of the q_phrase DuckDB oracle; the HOF re-enters the interpreted
  * lambda evaluator |phrase|×|starts| times per row, this does one
  * tokenize + one tight scan. */
case class PhraseMatch(child: Expression, phrase: Seq[String])
    extends UnaryExpression with RefEvalCodegen {

  @transient private lazy val p: Array[UTF8String] =
    phrase.map(w => UTF8String.fromString(w.toLowerCase)).toArray

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"phrase_match needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = TextExpressions.tokenize(v.asInstanceOf[UTF8String])
    val n = toks.length
    val m = p.length
    if (m == 0 || n < m) return false
    var i = 0
    while (i + m <= n) {
      var j = 0
      while (j < m && toks(i + j) == p(j)) j += 1
      if (j == m) return true
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multi-pattern exact-substring scan: which of `patterns` occur in the
  * input string (raw case-sensitive `contains`, same as the SQL built-in).
  * Returns the sorted distinct pattern indices that matched.
  *
  * One Aho–Corasick pass over the UTF-8 bytes regardless of pattern-set
  * size — the canonical shape for benchmark decontamination, where a
  * corpus is screened against many eval-set strings: N separate
  * `contains` probes re-scan the document N times, this scans it once.
  * What ships with the serialized plan is the pattern list (total
  * pattern bytes); the automaton is rebuilt lazily per executor. The
  * in-memory automaton uses DENSE 256-way transition rows — the fastest
  * scan form, at ~1 KB of heap per trie state (state count <= total
  * pattern bytes). That is the right trade up to pattern sets in the
  * tens of thousands of bytes; for decontamination against millions of
  * pattern bytes, shard the pattern list across several expression
  * columns (union the index arrays) so each automaton stays bounded.
  * Byte-level matching is exact for UTF-8: a pattern's byte sequence
  * occurs iff the character sequence occurs (UTF-8 is
  * self-synchronizing).
  */
case class MultiPatternMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression with RefEvalCodegen {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_pattern_match needs a non-empty list of non-empty patterns")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_match needs string, got ${t.simpleString}")
  }

  // goto(state)(byte) transitions; fail(state) links; out(state) = pattern
  // indices ending at state (own + inherited from the fail chain).
  @transient private lazy val (goto, fail, out) = {
    val gotoB = mutable.ArrayBuffer(Array.fill(256)(-1))
    val outB = mutable.ArrayBuffer(mutable.BitSet.empty)
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (gotoB(s)(c) < 0) {
          gotoB(s)(c) = gotoB.size
          gotoB += Array.fill(256)(-1)
          outB += mutable.BitSet.empty
        }
        s = gotoB(s)(c)
      }
      outB(s) += pi
    }
    val failB = Array.fill(gotoB.size)(0)
    val queue = mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val s = gotoB(0)(c)
      if (s < 0) gotoB(0)(c) = 0 else queue += s
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outB(s) |= outB(failB(s))
      (0 until 256).foreach { c =>
        val t = gotoB(s)(c)
        if (t < 0) gotoB(s)(c) = gotoB(failB(s))(c)
        else { failB(t) = gotoB(failB(s))(c); queue += t }
      }
    }
    (gotoB.map(_.clone()).toArray, failB, outB.map(_.toArray.sorted).toArray)
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val hit = new java.util.BitSet(patterns.size)
    var nHit = 0 // O(1) early-exit counter (cardinality() is O(n/64))
    var s = 0
    var i = 0
    val n = bytes.length
    val all = patterns.size
    while (i < n && nHit < all) {
      s = goto(s)(bytes(i) & 0xff)
      val o = out(s)
      var j = 0
      while (j < o.length) {
        if (!hit.get(o(j))) { hit.set(o(j)); nHit += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Any](hit.cardinality())
    var k = 0
    var b = hit.nextSetBit(0)
    while (b >= 0) { res(k) = b; k += 1; b = hit.nextSetBit(b + 1) }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All distinct strings reachable from the input by deleting up to `tau`
  * characters (the input itself included) — the SymSpell-style signature
  * for edit-distance blocking: ed(a, b) <= tau implies the deletion
  * neighborhoods of a and b intersect, so an equi-join on exploded
  * variants is a COMPLETE candidate generator for a Levenshtein join.
  * Neighborhood size is O(C(len, tau)) — meant for short entity strings
  * (names, titles, codes), where it beats scanning: candidates come from
  * a hash join instead of an all-pairs comparison. Operates on Unicode
  * code points, matching what `levenshtein` counts as one edit.
  */
case class DeletionNeighborhood(child: Expression, tau: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(tau >= 1 && tau <= 3, s"deletion_neighborhood tau must be 1..3, got $tau")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deletion_neighborhood needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val seen = mutable.LinkedHashSet(s)
    var frontier = List(cps)
    var d = 0
    while (d < tau && frontier.nonEmpty) {
      val next = mutable.ListBuffer.empty[Array[Int]]
      frontier.foreach { f =>
        var i = 0
        while (i < f.length) {
          val del = new Array[Int](f.length - 1)
          System.arraycopy(f, 0, del, 0, i)
          System.arraycopy(f, i + 1, del, i, f.length - i - 1)
          val str = new String(del, 0, del.length)
          if (seen.add(str)) next += del
          i += 1
        }
      }
      frontier = next.toList
      d += 1
    }
    new GenericArrayData(seen.toArray.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Rolling polynomial hash of every `n`-codepoint character gram of a
  * string — the anchor stage of exact substring-level dedup (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better"):
  * any duplicated substring of length >= n contains a duplicated
  * n-gram, so colliding these 8-byte window hashes finds every
  * candidate anchor in ONE O(len) pass (vs the O(len·n)
  * substring-per-position HOF chain, which would also shuffle n chars
  * per position instead of one long). Callers re-verify candidates
  * against the real substrings, so a hash collision costs work, never
  * correctness. Array index i is the hash of the gram at 1-based
  * codepoint position i+1 — matching `substring(text, i+1, n)`
  * semantics on both Spark and DuckDB (both index by codepoint). */
case class GramRollingHashes(child: Expression, n: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"gram_hashes needs string, got ${t.simpleString}")
  }

  private val B = 1000003L
  private val Bpow: Long = { // B^(n-1) mod 2^64, the outgoing-char weight
    var p = 1L; var i = 1
    while (i < n) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(v: Any): Any = {
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val len = cps.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var h = 0L
    var i = 0
    while (i < n) { h = h * B + cps(i); i += 1 }
    out(0) = h
    i = n
    while (i < len) {
      h = (h - cps(i - n) * Bpow) * B + cps(i)
      out(i - n + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressions {
  private[functions] val SPACE = UTF8String.fromString(" ")
  private[functions] val ZH = UTF8String.fromString("zh")
  private[functions] val UND = UTF8String.fromString("und")

  /** (lang, stopword set) in lexicographic lang order — must stay in sync
    * with TextFunctions.langStopwords and the q_lang_id oracle SQL. */
  private[functions] val langSets: Array[(UTF8String, Set[UTF8String])] = Array(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "y", "de", "que", "es", "un", "por"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour")
  ).map { case (l, ws) =>
    UTF8String.fromString(l) -> ws.map(UTF8String.fromString).toSet
  }

  /** Lowercase + split on whitespace (chars ≤ 0x20) + drop empties —
    * the native twin of split(lower(trim(c)), "\\s+") with empty filter. */
  private[functions] def tokenize(s: UTF8String): Array[UTF8String] = {
    val str = s.toLowerCase.toString
    val out = mutable.ArrayBuffer.empty[UTF8String]
    var start = -1
    var i = 0
    while (i < str.length) {
      val ws = str.charAt(i) <= ' '
      if (!ws && start < 0) start = i
      if (ws && start >= 0) { out += UTF8String.fromString(str.substring(start, i)); start = -1 }
      i += 1
    }
    if (start >= 0) out += UTF8String.fromString(str.substring(start))
    out.toArray
  }

  def wordTokens(c: Column): Column =
    GraftColumnBridge.column(WordTokens(GraftColumnBridge.expression(c)))

  def wordShingles(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(c), n))

  def winnowHashes(shingles: Column, w: Int): Column =
    GraftColumnBridge.column(WinnowHashes(GraftColumnBridge.expression(shingles), w))

  def langIdNative(c: Column): Column =
    GraftColumnBridge.column(LangId(GraftColumnBridge.expression(c)))

  def wordNgrams(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(c), n))

  def charClassCounts(c: Column): Column =
    GraftColumnBridge.column(CharClassCounts(GraftColumnBridge.expression(c)))

  def memberCount(arr: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(MemberCount(GraftColumnBridge.expression(arr), words))

  def phraseMatch(c: Column, phrase: Seq[String]): Column =
    GraftColumnBridge.column(PhraseMatch(GraftColumnBridge.expression(c), phrase))

  def multiPatternMatch(c: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.column(MultiPatternMatch(GraftColumnBridge.expression(c), patterns))

  /** [[multiPatternMatch]] over a pattern set too large for one dense
    * automaton (see the memory note on [[MultiPatternMatch]]): the
    * patterns are split into `shardSize` shards, each its own bounded
    * automaton, and the per-shard index arrays are re-based and merged —
    * identical output to the single-automaton form, heap bounded by the
    * shard size, still one pass per shard (P/shardSize passes total
    * instead of P contains-probes). */
  def multiPatternMatchSharded(c: Column, patterns: Seq[String],
      shardSize: Int): Column = {
    import org.apache.spark.sql.functions.{array_sort, flatten, array => farray, lit, transform}
    require(shardSize > 0)
    val shards = patterns.grouped(shardSize).toSeq
    if (shards.size <= 1) multiPatternMatch(c, patterns)
    else array_sort(flatten(farray(shards.zipWithIndex.map {
      case (shard, i) =>
        transform(multiPatternMatch(c, shard), x => x + lit(i * shardSize))
    }: _*)))
  }

  def deletionNeighborhood(c: Column, tau: Int): Column =
    GraftColumnBridge.column(DeletionNeighborhood(GraftColumnBridge.expression(c), tau))

  def gramHashes(c: Column, n: Int): Column =
    GraftColumnBridge.column(GramRollingHashes(GraftColumnBridge.expression(c), n))
}
