package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k of a bounded query set against
  *    the full corpus. The query side is broadcast (bounded by contract);
  *    the corpus is scanned once, partition-locally. Top-k per query is
  *    computed with [[TopKAgg]], a typed Aggregator with a bounded buffer —
  *    partial aggregation does map-side top-k, so the shuffle carries at
  *    most k rows per (query, partition), never the full score matrix.
  *    This is the 100 TB-safe shape (a window over all pairs would shuffle
  *    |corpus|×|queries| rows).
  *  - [[lshTopK]]: IVF-style scale path — corpus bucketed by deterministic
  *    hyperplane LSH signature; queries probe only their own bucket
  *    (multiprobe = flip up to `probeBits` signature bits), then exact
  *    cosine + top-k within candidates.
  */
object Similarity {

  /** (neighbor id, score) pair carried through aggregation. */
  case class Scored(id: Long, score: Double)

  /** Bounded top-k typed Aggregator: buffer holds at most k elements, so
    * map-side combine keeps shuffle volume at O(k) per group-partition. */
  class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    def zero: List[Scored] = Nil
    private def trim(l: List[Scored]): List[Scored] =
      l.sortBy(s => (-s.score, s.id)).take(k)
    def reduce(buf: List[Scored], a: Scored): List[Scored] = trim(a :: buf)
    def merge(b1: List[Scored], b2: List[Scored]): List[Scored] = trim(b1 ::: b2)
    def finish(r: List[Scored]): Seq[Scored] = r
    def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Exact top-k neighbors for each query vector.
    *
    * @param queries bounded DataFrame(idCol, vecCol) — broadcast side
    * @param corpus  DataFrame(idCol, vecCol) — scanned side
    * @return (query_id, neighbor_id, rank, cos) — excludes self-matches
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      normalize(col(vecCol)).as("q_v")))
    val c = corpus.select(col(idCol).as("neighbor_id"), normalize(col(vecCol)).as("c_v"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_v"), col("c_v")), 6).as("cos"))
    topKPerGroup(scored, k)
  }

  /** Hard-negative mining for contrastive training: for each query item,
    * the k most-similar corpus items with a DIFFERENT label — the items a
    * two-tower/embedding model most confuses, and the standard negatives
    * for its next training round. Same bounded shape as
    * [[bruteForceTopK]] (broadcast query side, O(k) state per group via
    * the TopK aggregator); at corpus scale compose [[lshTopK]]/[[ivfTopK]]
    * with the label filter instead of the brute pass. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), normalize(col(vecCol)).as("q_v")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("n_label"), normalize(col(vecCol)).as("c_v"))
    val scored = c.join(q, col("q_label") =!= col("n_label"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_v"), col("c_v")), 6).as("cos"))
    topKPerGroup(scored, k)
  }

  /** LSH-bucketed ANN: probe the query's bucket plus `probeBits`-bit-flip
    * neighbors. Recall < 1 by construction; candidates verified exactly.
    *
    * `probeBits >= bits` is the FULL-probe mode: every one of the
    * 2^bits buckets is probed, so the candidate set is the whole corpus
    * and the result provably equals [[bruteForceTopK]] (each corpus row
    * lives in exactly one bucket — every (query, neighbor) pair is
    * scored once, with the identical rounding and tie-break). That mode
    * is the correctness oracle for this plan shape, the same
    * full-probe ≡ brute-force argument as [[graft.table.AnnIndex]]'s
    * nProbe = nCells; production uses probeBits < bits and accepts the
    * measured recall (RecallSpec). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, bits: Int = 8, probeBits: Int = 1): DataFrame = {
    // the full-probe branch materializes a 2^bits-element array PER
    // QUERY ROW — the exactness lever is only meant for oracle-scale
    // bucket counts; fail loudly before sequence() tries to build a
    // multi-billion-element array (bits=16 → 65,536/row, the sane cap)
    require(probeBits < bits || bits <= 16,
      s"full-probe mode (probeBits=$probeBits >= bits=$bits) explodes " +
        s"2^$bits buckets per query row — use bits <= 16 for the exact " +
        "mode, or probeBits < bits for multiprobe")
    val c = corpus.select(col(idCol).as("neighbor_id"), normalize(col(vecCol)).as("c_v"))
      .withColumn("bucket", lshBucket(col("c_v"), bits))
    val qBase = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("q_v"))
      .withColumn("bucket0", lshBucket(col("q_v"), bits))
    // multiprobe: the bucket itself + each single-bit flip (probeBits=1);
    // probeBits >= bits → all 2^bits buckets (exact full-probe mode)
    val probes =
      if (probeBits >= bits)
        qBase.withColumn("bucket",
          explode(sequence(lit(0L), lit((1L << bits) - 1))))
      else if (probeBits <= 0) qBase.withColumn("bucket", col("bucket0"))
      else qBase.withColumn("bucket",
        explode(array_union(array(col("bucket0")),
          array((0 until bits).map(i =>
            col("bucket0").bitwiseXOR(lit(1L << i))): _*))))
    // probes are distinct buckets and each corpus id lives in exactly one
    // bucket, so (query, neighbor) pairs are already unique — no distinct
    val scored = broadcast(probes.drop("bucket0"))
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_v"), col("c_v")), 6).as("cos"))
    topKPerGroup(scored, k)
  }

  /** IVF (inverted-file) ANN — the other classic scale path besides LSH:
    * the corpus is partitioned into `nCells` Voronoi cells around k-means
    * centroids and each query probes only its `nProbe` nearest cells, so
    * the scan fraction is ~nProbe/nCells instead of the full corpus.
    *
    * Centroids are trained with a deterministic mini k-means: seeds are
    * the `nCells` corpus vectors with the smallest xxhash64(id) (a stable
    * pseudo-random sample — no RNG state), then `iters` Lloyd rounds run
    * as DataFrame aggregations. The only driver-side state is the
    * centroid table (nCells × dim doubles, collected from a bounded
    * groupBy), re-broadcast as literals — no model file, identical plan
    * on every executor. Candidates get exact cosine verification and
    * bounded top-k, like every other ANN path here. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    val cBase = corpus.select(col(idCol).as("neighbor_id"),
      normalize(col(vecCol)).as("c_v"))
    // cache ONLY for the eager multi-pass training phase, released
    // deterministically — a suite-long session must not keep paying for
    // this block (the lazy tail below scans the corpus exactly once, so
    // it needs no cache at all)
    val cached = cBase.cache()
    val centroids =
      try trainCentroids(cached, "neighbor_id", "c_v", nCells, iters)
      finally cached.unpersist(blocking = true)
    val index = cBase.withColumn("cell", cellOf(centroids, col("c_v")))
    val q = queries.select(col(idCol).as("query_id"), normalize(col(vecCol)).as("q_v"))
    // nProbe nearest cells per query (score desc, cell asc on ties)
    val sortedCells = array_sort(cellScores(centroids, col("q_v")),
      (l, r) => when(l("s") > r("s"), -1).when(l("s") < r("s"), 1)
        .otherwise((l("cell") - r("cell")).cast("int")))
    val probes = q.withColumn("cell",
      explode(transform(slice(sortedCells, 1, nProbe), s => s("cell"))))
    val scored = broadcast(probes).join(index, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_v"), col("c_v")), 6).as("cos"))
    topKPerGroup(scored, k)
  }

  /** Top-k under fixed-scale int8 quantization of unit vectors: both
    * sides are normalized then quantized with
    * [[VectorFunctions.int8CodesUnit]] and ranked by the raw integer
    * dot product of the codes — the production trick that cuts
    * embedding-scan memory/bandwidth 4× (int8 codes instead of float32)
    * at a small, measured ranking-quality cost (RecallSpec pins recall
    * vs float cosine, like the other approximate paths). Every
    * arithmetic step is exact integer math (|q_i·c_i| ≤ 127², 64-dim
    * sums ≪ 2^53 in double), so unlike the seeded LSH/IVF paths this
    * approximate method has an EXACT cross-engine oracle (ties broken
    * on neighbor id). Same scale shape as [[bruteForceTopK]]: bounded
    * broadcast query side, one corpus scan, O(k) shuffle state via
    * [[TopKAgg]]. */
  def int8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.int8CodesUnit
    val codes = (d: DataFrame, as: String, vAs: String) =>
      d.select(col(idCol).as(as),
        transform(int8CodesUnit(normalize(col(vecCol))), _.cast("double")).as(vAs))
    val q = broadcast(codes(queries, "query_id", "q_v"))
    val c = codes(corpus, "neighbor_id", "c_v")
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("q_v"), col("c_v")).as("cos"))
    topKPerGroup(scored, k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos").cast("long").as("dot_q"))
  }

  /** Per-cell best-match scores against the centroid table (broadcast as
    * plan literals — nCells × dim doubles). */
  private[graft] def cellScores(centroids: Array[Seq[Double]],
      vcol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array(centroids.indices.map(i =>
      struct(dot(vcol, typedLit(centroids(i))).as("s"), lit(i).as("cell"))): _*)

  private[graft] def cellOf(centroids: Array[Seq[Double]],
      vcol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_max(cellScores(centroids, vcol)).getField("cell")

  /** Deterministic mini k-means over unit vectors: seeds are the `nCells`
    * rows with smallest xxhash64(id) (stable pseudo-random sample, no RNG
    * state), then `iters` Lloyd rounds as DataFrame aggregations. The only
    * driver-side state is the centroid table (nCells × dim doubles from a
    * bounded groupBy); empty cells keep their previous centroid. */
  private[graft] def trainCentroids(c: DataFrame, idC: String, vC: String,
      nCells: Int, iters: Int): Array[Seq[Double]] = {
    var centroids: Array[Seq[Double]] = c
      .withColumn("h", xxhash64(col(idC)))
      .orderBy("h").limit(nCells).select(vC).collect()
      .map(_.getSeq[Double](0))
    for (_ <- 0 until iters) {
      val means = c.withColumn("cell", cellOf(centroids, col(vC)))
        .select(col("cell"), posexplode(col(vC)))
        .groupBy("cell", "pos").agg(avg("col").as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { i =>
        byCell.get(i).map { rows =>
          val arr = new Array[Double](centroids(i).length)
          rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          val n = math.max(math.sqrt(arr.map(x => x * x).sum), 1e-12)
          arr.map(_ / n).toSeq
        }.getOrElse(centroids(i))
      }.toArray
    }
    centroids
  }

  /** SemDeDup (semantic dedup, Abbas et al. 2023): cluster the corpus with
    * deterministic k-means, then within each cluster drop every row whose
    * cosine similarity to a LOWER-id row of the same cluster reaches
    * `threshold` — the set-parallel keep-min-id variant of the paper's
    * per-cluster greedy, and the same survivor rule as the repo's other
    * near-dup families. Embedding-level near-duplicates (paraphrases,
    * re-encodes, templated text) land in the same Voronoi cell, so the
    * pairwise pass runs per cell: cost is Σ cell², never corpus² — the
    * paper's own trick for making semantic dedup tractable; `nCells`
    * scales with the corpus to keep cells bounded. Cross-cell near-dups
    * are missed by construction (quantified in RecallSpec, same contract
    * as the LSH/IVF paths).
    *
    * Returns (id, cell, kept): full assignment with the survivor flag, so
    * callers can either keep survivors or audit what was dropped.
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, iters: Int = 2): DataFrame = {
    val cBase = corpus.select(col(idCol).as("id"),
      normalize(col(vecCol)).as("v"))
    // training cache released deterministically (see ivfTopK); the index
    // is scanned three times below (both self-join sides + the survivor
    // join), so materialize it ONCE via localCheckpoint — lineage
    // truncated, blocks ContextCleaner-managed instead of session-pinned
    // (the same policy as the iterative graph ops)
    val cached = cBase.cache()
    val centroids =
      try trainCentroids(cached, "id", "v", nCells, iters)
      finally cached.unpersist(blocking = true)
    val index = cBase.withColumn("cell", cellOf(centroids, col("v")))
      .localCheckpoint(eager = true)
    val a = index.select(col("cell"), col("id").as("a_id"), col("v").as("a_v"))
    val b = index.select(col("cell"), col("id").as("b_id"), col("v").as("b_v"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id") &&
        round(dot(col("a_v"), col("b_v")), 6) >= threshold)
      .select(col("b_id").as("id")).distinct()
    index.join(dropped.withColumn("kept", lit(false)), Seq("id"), "left_outer")
      .select(col("id"), col("cell"),
        coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** Top-k rows per query_id from (query_id, neighbor_id, cos) using the
    * bounded typed Aggregator (map-side combine), then re-flattened with
    * a deterministic rank. */
  def topKPerGroup(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    val ds = scored.select(col("query_id"),
        col("neighbor_id").cast("long").as("id"), col("cos").as("score"))
      .as[(Long, Long, Double)]
      .map { case (q, id, s) => (q, Scored(id, s)) }
    ds.groupByKey(_._1).mapValues(_._2).agg(agg.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))
  }

  /** Window-based reference implementation of per-group top-k (shuffles
    * the full score set — verification-only; the Aggregator is the scale
    * path). */
  def topKPerGroupWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
