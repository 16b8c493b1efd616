package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every variant is built as
  *   row-local signature (map-only, codegen'd HOFs)
  *   → bucket key (band / band-hash / LSH prefix)
  *   → self-equi-join on the bucket key (shuffle on bucket, never all-pairs)
  *   → exact verify on the candidate pairs only.
  * The cross product never materializes; cost is O(sum of bucket² sizes),
  * which banding keeps near-linear. Skewed buckets (boilerplate docs) are
  * the known hazard — AQE skew-join handles moderate skew, and a bucket
  * size cap (`maxBucketSize`) drops degenerate buckets explicitly, the
  * standard trick in web-scale dedup.
  */
object Dedup {

  /** Exact dedup by content fingerprint: one survivor (min id) per
    * identical text. Hash-groupBy: single shuffle on a 32-char key rather
    * than the full text. */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprintMd5(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Rows that survive exact dedup (normalized-text variant). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df
      .select(col(idCol).as("__id"), fingerprintNormalized(col(textCol)).as("fp"))
      .groupBy("fp").agg(min("__id").as(idCol))
      .drop("fp")
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signature: k hash functions h_s(x) = xxhash64(s, x); the
    * signature is [min_x h_s(x) for s in 0..k). Row-local, built-in HOFs. */
  def minhashSignature(textCol: Column, shingleN: Int = 3, k: Int = 64): Column = {
    val sh = shingles(textCol, shingleN)
    array((0 until k).map(s => array_min(transform(sh, x => xxhash64(lit(s), x)))): _*)
  }

  /** MinHash + LSH banding candidate pairs.
    *
    * Signature of k minhashes split into `bands` bands of k/bands rows;
    * docs sharing any band hash become candidates; candidates are verified
    * with exact shingle-Jaccard and filtered at `threshold`.
    * With k=64, bands=16 (r=4) the S-curve midpoint is ~(1/16)^(1/4)≈0.5.
    *
    * Output: (a_id, b_id, jaccard) with a_id < b_id, distinct.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucketSize: Int = 1000): DataFrame = {
    val r = k / bands
    val sigd = df.select(col(idCol).as("id"), col(textCol).as("text"),
      minhashSignature(col(textCol), shingleN, k).as("sig"))
    // one row per (doc, band): bucket = (band index, hash of the band slice)
    val banded = sigd.select(col("id"), col("text"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(lit("band"), b, slice(col("sig"), b * r + 1, lit(r)).cast("string")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // cap degenerate buckets (boilerplate) before the self-join
    val capped = banded.withColumn("bsize",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("bsize") <= maxBucketSize).drop("bsize")
    val a = capped.select(col("band"), col("bucket"), col("id").as("a_id"), col("text").as("a_text"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("b_id"), col("text").as("b_text"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_text", "b_text").distinct()
    cand
      .withColumn("jaccard", round(shingleJaccard(col("a_text"), col("b_text"), shingleN), 6))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Exact n-gram (shingle) Jaccard similarity between two text columns. */
  def shingleJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter)
  }

  /** All-pairs n-gram Jaccard above a threshold, with cheap length
    * blocking (docs whose token counts differ by >2× can't reach 0.5
    * Jaccard). For bounded corpora / verification; LSH is the scale path. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val t = df.select(col(idCol).as("id"), col(textCol).as("text"),
      tokenCount(col(textCol)).as("ntok"))
    val a = t.select(col("id").as("a_id"), col("text").as("a_text"), col("ntok").as("a_n"))
    val b = t.select(col("id").as("b_id"), col("text").as("b_text"), col("ntok").as("b_n"))
    a.join(b, col("a_id") < col("b_id") &&
        col("b_n").between(col("a_n") / 2, col("a_n") * 2))
      .withColumn("jaccard", round(shingleJaccard(col("a_text"), col("b_text"), n), 6))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** 64-bit SimHash: per token-hash bit, +1 if set else -1, summed over
    * tokens; sign of each sum is the fingerprint bit. Near-dups differ in
    * few bits (Hamming). Row-local: one aggregate over token hashes whose
    * accumulator is the 64-vote array (bit index is a Scala constant, so
    * the shifts stay codegen-able). */
  def simhash64(textCol: Column): Column = {
    val bitVotes = aggregate(
      transform(tokens(textCol), t => xxhash64(t)),
      array_repeat(lit(0), 64),
      (acc, h) => array((0 until 64).map(i =>
        element_at(acc, i + 1) +
          when(shiftrightunsigned(h, i).bitwiseAND(1) === 1, 1).otherwise(-1)): _*))
    (0 until 64).map { i =>
      val mask = if (i == 63) Long.MinValue else 1L << i
      when(element_at(bitVotes, i + 1) > 0, lit(mask)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup candidates: split the 64-bit fingerprint into
    * `bands` chunks; by pigeonhole, docs within Hamming distance
    * `bands-1` share at least one exact chunk → bucket-join on chunks,
    * then verify exact Hamming ≤ maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val chunk = 64 / bands
    val withSim = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val banded = withSim.select(col("id"), col("sim"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("sim"), b * chunk)
            .bitwiseAND(lit((1L << chunk) - 1))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.select(col("band"), col("chunk"), col("id").as("a_id"), col("sim").as("a_sim"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("b_id"), col("sim").as("b_sim"))
    a.join(b, Seq("band", "chunk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicates: LSH-bucket (hyperplane signature
    * prefix) → join within buckets → exact cosine verify. `lshBits=0`
    * degrades to brute force (small corpora / recall measurement). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, lshBits: Int = 8): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bucketed =
      if (lshBits <= 0) base.withColumn("bucket", lit(0L))
      else base.withColumn("bucket",
        VectorFunctions.packBits(VectorFunctions.lshBits(col("v"), lshBits, dim)))
    val a = bucketed.select(col("bucket"), col("id").as("a_id"), col("v").as("a_v"))
    val b = bucketed.select(col("bucket"), col("id").as("b_id"), col("v").as("b_v"))
    a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(VectorFunctions.cosine(col("a_v"), col("b_v")), 6).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
  }
}
