package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer: learned merge table + distributed encode.
  *
  * Division of labor follows tokenizer practice (HF/sentencepiece train
  * single-node on a sample; Spark's own ML fit()s collect to the driver):
  * [[Bpe.train]] is pure driver-side Scala over a BOUNDED corpus sample —
  * deterministic (count-desc, then lexicographic tie-break), no RNG — and
  * the ENCODE side is where the data volume lives: [[BpeEncode]] applies
  * the learned ranks row-locally in one native pass, so tokenization of
  * the full corpus is embarrassingly parallel and stays inside
  * whole-stage codegen. Token counts from a learned subword vocabulary
  * are the unit of every training-data budget decision (dataset sizing,
  * packing, mixture weights), which is why the real algorithm is here and
  * not a whitespace approximation.
  *
  * Word-level BPE: text is tokenized with lowercase + a `\s+`-class
  * split ([[BpeEncode.bpeTokenize]] — the exact split the relational
  * oracle replays), merges apply within words only. No end-of-word
  * marker — subwords from different positions that spell the same
  * string share identity, the simplest of the standard variants.
  */
object Bpe {

  /** Learn `numMerges` merge rules from a word sample.
    *
    * Classic algorithm (Sennrich et al. 2016): start from single
    * characters, repeatedly merge the most frequent adjacent symbol pair.
    * Ties break lexicographically on the pair, so the merge table is a
    * pure function of the sample multiset — independent of input order,
    * partitioning, or any RNG.
    */
  def train(words: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var seqs: Map[Vector[String], Long] = words
      .groupBy(identity).view.mapValues(_.size.toLong)
      .map { case (w, c) => w.map(_.toString).toVector -> c }
      .toMap
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((seq, c) <- seqs; j <- 0 until seq.length - 1)
        counts.updateWith((seq(j), seq(j + 1)))(v => Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        seqs = seqs.groupMapReduce(kv => mergePair(kv._1, best))(_._2)(_ + _)
        i += 1
      }
    }
    merges.toSeq
  }

  private def mergePair(seq: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < seq.length) {
      if (j < seq.length - 1 && seq(j) == p._1 && seq(j + 1) == p._2) {
        out += (p._1 + p._2); j += 2
      } else { out += seq(j); j += 1 }
    }
    out.result()
  }

  /** Encode one word with a rank table (lower rank = earlier-learned =
    * applied first) — the standard greedy BPE encode. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var seq: Vector[String] = word.map(_.toString).toVector
    var done = seq.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < seq.length - 1) {
        val r = ranks.getOrElse((seq(j), seq(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        seq = seq.patch(bestAt, Seq(seq(bestAt) + seq(bestAt + 1)), 2)
        done = seq.length < 2
      }
    }
    seq
  }

  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeEncode(GraftColumnBridge.expression(c), merges))

  /** Persist a merge table (one `left<TAB>right` line per merge, rank =
    * line order) — the interchange format other tokenizer stacks use for
    * merges.txt, so a table trained here loads elsewhere and vice versa. */
  def saveMerges(path: String, merges: Seq[(String, String)]): Unit = {
    require(merges.forall { case (a, b) =>
      Seq(a, b).forall(s =>
        !s.contains("\t") && !s.contains("\n") && !s.contains("\r")) },
      "merge symbols must not contain tab/newline/carriage-return " +
        "(readAllLines treats \\r as a terminator too)")
    val p = java.nio.file.Paths.get(path)
    Option(p.toAbsolutePath.getParent)
      .foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p,
      merges.map { case (a, b) => s"$a\t$b" }.mkString("", "\n", "\n"))
  }

  def loadMerges(path: String): Seq[(String, String)] =
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .toArray(Array.empty[String]).toSeq
      .filter(_.nonEmpty)
      .map { line =>
        line.split("\t", -1) match {
          case Array(a, b) => (a, b)
          case other => throw new IllegalArgumentException(
            s"bad merges line (${other.length} fields): $line")
        }
      }
}

/** Subword tokens of a string under a learned BPE merge table: lowercase
  * + `\s+`-class word split (see [[BpeEncode.bpeTokenize]]), then greedy
  * rank-ordered merges per word, concatenated in document order. One
  * native pass per row; the rank map ships with the serialized
  * expression like any literal. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with RefEvalCodegen {

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val words = BpeEncode.bpeTokenize(v.asInstanceOf[UTF8String])
    val out = mutable.ArrayBuffer.empty[Any]
    words.foreach { w =>
      Bpe.encodeWord(w, ranks)
        .foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeEncode {
  /** True for exactly the regex `\s` class (RE2 and java.util.regex
    * agree): space, tab, newline, vertical tab, form feed, carriage
    * return. NOT `c <= ' '` — control characters \x00-\x08 and
    * \x0e-\x1f are word bytes to a `\s+` splitter. */
  private def isWsClass(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** BPE's word split: lowercase (UTF8String's locale-independent
    * mapping), split on the `\s` class. Deliberately NOT
    * [[TextExpressions.tokenize]] (which splits on any char <= ' '):
    * the learned-BPE oracle replays the encode relationally with
    * `string_split_regex(lower(text), '\s+')`, and the two splitters
    * diverge on control characters — the training sample, this encode,
    * and the oracle must share one split class or texts containing
    * \x00-\x08/\x0e-\x1f tokenize differently per engine. */
  private[functions] def bpeTokenize(s: UTF8String): Array[String] = {
    val str = s.toLowerCase.toString
    val out = mutable.ArrayBuffer.empty[String]
    var start = -1
    var i = 0
    while (i < str.length) {
      val ws = isWsClass(str.charAt(i))
      if (!ws && start < 0) start = i
      if (ws && start >= 0) { out += str.substring(start, i); start = -1 }
      i += 1
    }
    if (start >= 0) out += str.substring(start)
    out.toArray
  }
}
