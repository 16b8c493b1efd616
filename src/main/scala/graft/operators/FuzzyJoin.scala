package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Edit-distance (Levenshtein) joins for entity resolution: find pairs of
  * short strings — names, titles, product codes — within `tau` edits,
  * without comparing all pairs.
  *
  * Scale design follows the repo's dedup shape (signature → bucket →
  * equi-join → exact verify):
  *   1. signature: each string's deletion neighborhood (all variants with
  *      up to tau characters deleted; native one-pass expression). The
  *      SymSpell guarantee makes this blocking COMPLETE: ed(a,b) <= tau
  *      implies the neighborhoods share a variant.
  *   2. bucket: explode variants; an equi-join on the variant string is
  *      the candidate generator. Cost is sum of bucket², never |df|².
  *   3. prune: |len(a) - len(b)| <= tau (necessary condition), a < b,
  *      distinct pairs — so the expensive verify runs once per pair.
  *   4. verify: the threshold form `levenshtein(a, b, tau)` (early-exits
  *      the DP once the running minimum exceeds tau).
  *
  * Degenerate buckets: variants shared by a large fraction of the corpus
  * (e.g. the empty string, when inputs are shorter than tau) quadratically
  * blow up the candidate set; `maxBucketSize` drops them explicitly, same
  * contract as Dedup's banding caps. The cap is a RECALL trade, not a
  * free lunch: a pair is lost iff EVERY variant the two strings share is
  * over the cap — which takes more than `maxBucketSize` near-identical
  * strings (near-dups share many variants, so usually several must all
  * blow up at once), but can genuinely happen in pathological corpora
  * (>10k near-identical catalog entries). Callers needing completeness
  * set maxBucketSize = Int.MaxValue and pay the quadratic bucket.
  *
  * Neighborhood size is O(C(len, tau)) per string — this is the
  * short-string operator. For long strings (documents) use the n-gram /
  * MinHash family in [[Dedup]], which this deliberately does not replace.
  */
object FuzzyJoin {

  /** All pairs (a_id, b_id, a_str, b_str, dist) with a_id < b_id and
    * levenshtein(a_str, b_str) <= tau. Strings ride along through the
    * bucket join (they are short by contract), so no second join back to
    * the input is needed.
    */
  def selfJoin(df: DataFrame, idCol: String, strCol: String, tau: Int,
      maxBucketSize: Int = 10000): DataFrame = {
    val sig = df.select(
        col(idCol).as("id"), col(strCol).as("s"),
        length(col(strCol)).as("len"),
        explode(TextExpressions.deletionNeighborhood(col(strCol), tau)).as("v"))
    val capped = sig
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("v")))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    val a = capped.select(col("id").as("a_id"), col("s").as("a_str"),
      col("len").as("a_len"), col("v"))
    val b = capped.select(col("id").as("b_id"), col("s").as("b_str"),
      col("len").as("b_len"), col("v"))
    a.join(b, Seq("v"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("a_len") - col("b_len")) <= tau)
      .select("a_id", "b_id", "a_str", "b_str")
      .distinct()
      .withColumn("dist", levenshtein(col("a_str"), col("b_str"), tau))
      .filter(col("dist") >= 0)
  }

  /** Candidate pairs for the Jaro–Winkler self-join, blocked on
    * (2-char prefix × length band): two strings are candidates iff they
    * share their first two characters AND floor(len / lenBand). Output
    * (name1, name2) with name1 < name2, each unordered pair once.
    *
    * Why this key and not first-char: a 1-char key over a K-letter
    * alphabet yields ~n²/(2K) candidate pairs — bucket sizes grow
    * linearly with the corpus, within-bucket pairs quadratically. The
    * compound key multiplies the distinct-block count (second char ×
    * length bands), dividing every bucket, and is still a pure
    * equi-join — shuffle on the key, no all-pairs scan. Like all
    * blocking this bounds RECALL by construction: a pair differing in
    * its first two chars, or split across adjacent length bands, is not
    * a candidate. Jaro–Winkler's prefix boost (the measure's own bias)
    * makes shared-prefix blocking the standard choice for it.
    */
  def jaroCandidates(df: DataFrame, strCol: String,
      lenBand: Int = 4): DataFrame = {
    def keyed(nm: String) = df.select(col(strCol).as(nm),
      substring(col(strCol), 1, 2).as("blk_pfx"),
      floor(length(col(strCol)) / lenBand).as("blk_len"))
    keyed("name1").join(keyed("name2"), Seq("blk_pfx", "blk_len"))
      .filter(col("name1") < col("name2"))
      .select("name1", "name2")
  }

  /** Jaro–Winkler name-similarity self-join over the blocked candidates:
    * (name1, name2, sim) with sim = round(jw, 6) >= minSim. Rounding
    * before the threshold keeps boundary rows identical across engines
    * (last-ulp double drift can't flip a comparison on the rounded
    * value). The native expression stays inside codegen.
    */
  def jaroSelfJoin(df: DataFrame, strCol: String, minSim: Double,
      lenBand: Int = 4): DataFrame =
    jaroCandidates(df, strCol, lenBand)
      .withColumn("sim", round(graft.functions.StringSimilarity
        .jaroWinklerCol(col("name1"), col("name2")), 6))
      .filter(col("sim") >= minSim)

  /** Left-to-right variant: for every left row, the right rows within
    * `tau` edits (dirty-record → clean-catalog match). Output
    * (left_id, right_id, left_str, right_str, dist).
    */
  def join(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String, tau: Int,
      maxBucketSize: Int = 10000): DataFrame = {
    def sig(df: DataFrame, id: String, s: String, pfx: String) =
      df.select(col(id).as(s"${pfx}_id"), col(s).as(s"${pfx}_str"),
        length(col(s)).as(s"${pfx}_len"),
        explode(TextExpressions.deletionNeighborhood(col(s), tau)).as("v"))
    val l = sig(left, leftId, leftStr, "left")
    // cap on the right (catalog) side, where boilerplate lives
    val r0 = sig(right, rightId, rightStr, "right")
    val r = r0
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("v")))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    l.join(r, Seq("v"))
      .filter(abs(col("left_len") - col("right_len")) <= tau)
      .select("left_id", "right_id", "left_str", "right_str")
      .distinct()
      .withColumn("dist", levenshtein(col("left_str"), col("right_str"), tau))
      .filter(col("dist") >= 0)
  }
}
