package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(0.7f, 0.7f)),
    (4L, Array(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self") {
    val out = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0L), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 3L, 2L)) // by descending cosine to (1,0)
  }

  test("aggregator top-k agrees with window top-k") {
    val q = vecs.filter($"vec_id" < 2L)
    val scored = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", k = 2)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    // reference implementation via window
    val qn = q.select(col("vec_id").as("query_id"),
      graft.functions.VectorFunctions.normalize(col("embedding")).as("qv"))
    val cn = vecs.select(col("vec_id").as("neighbor_id"),
      graft.functions.VectorFunctions.normalize(col("embedding")).as("cv"))
    val ref = Similarity.topKPerGroupWindow(
      qn.crossJoin(cn).filter($"query_id" =!= $"neighbor_id")
        .select($"query_id", $"neighbor_id",
          round(graft.functions.VectorFunctions.dot($"qv", $"cv"), 6).as("cos")), 2)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(scored == ref)
  }

  test("lshTopK returns ranked neighbors from probed buckets") {
    val out = Similarity.lshTopK(vecs.filter($"vec_id" === 0L), vecs,
      "vec_id", "embedding", k = 2, dim = 2, bits = 4, probeBits = 1)
    val got = out.select("neighbor_id").as[Long].collect().toSet
    assert(got.nonEmpty && !got.contains(0L)) // no self-match
  }

  test("hardNegatives excludes same-label items even when they are nearest") {
    // q(label 0); n1 is an exact duplicate with label 0 (cos=1, same
    // class => NOT a negative); n2/n3 have label 1
    val d = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(-1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(d.filter($"vec_id" === 0L), d,
      "vec_id", "embedding", "label", k = 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1, 2L), (2, 3L))) // n1 excluded, n2 ranks first
  }

  test("semDedup: kept iff no lower-id same-cell neighbor at threshold") {
    val threshold = 0.4
    val e = Tables.load(spark, sf, "embeddings")
    val out = Similarity.semDedup(e, "vec_id", "embedding",
      threshold = threshold, nCells = 8)
      .select("id", "cell", "kept").as[(Long, Int, Boolean)].collect()
    val n = e.count()
    assert(out.length == n && out.map(_._1).distinct.length == n) // partition

    // independent replay: normalized vectors in Scala, exact cell-local rule
    val vecs = e.select($"vec_id",
        graft.functions.VectorFunctions.normalize($"embedding").as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos6(a: Seq[Double], b: Seq[Double]): Double =
      BigDecimal(a.zip(b).map { case (x, y) => x * y }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byCell = out.groupBy(_._2)
    for ((_, members) <- byCell; (id, _, kept) <- members) {
      val hasEarlierDup = members.exists { case (oid, _, _) =>
        oid < id && cos6(vecs(oid), vecs(id)) >= threshold }
      assert(kept == !hasEarlierDup, s"id=$id kept=$kept")
    }
    // the synthetic corpus HAS near-dups: something must actually drop
    assert(out.exists(!_._3))
  }

  test("ivfTopK and semDedup leave no cached blocks behind") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter($"vec_id" < 4L)
    Similarity.ivfTopK(q, e, "vec_id", "embedding", k = 3,
      nCells = 4, nProbe = 2).count()
    // training cache is released in a finally with blocking=true, so the
    // DataFrame cache registry must be empty the moment the call returns
    assert(spark.sharedState.cacheManager.isEmpty,
      "ivfTopK leaked a cached DataFrame")
    Similarity.semDedup(e, "vec_id", "embedding",
      threshold = 0.4, nCells = 4).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "semDedup leaked a cached DataFrame")
    // semDedup's index is a localCheckpoint: ContextCleaner-managed, not
    // registered in the cache manager — the suite-long pin is gone either
    // way, which is what this guards.
  }

  test("int8 quantization: hand-checked codes, clamping, zero vector") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions.{col, typedLit}
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-2.0f, 1.0f, 0.5f, -0.25f))).toDF("id", "v")
    val got = df.select(col("id"), int8Scale(col("v")).as("s"),
        int8Codes(col("v")).as("q"))
      .as[(Long, Double, Seq[Int])].collect().sortBy(_._1)
    // scale = max|x|; codes = floor(x·127/scale + 0.5):
    // (1, -0.5, 0.25, 0) → scale 1 → (127, floor(-63.0)= -63, 32, 0)
    assert(got(0) == ((1L, 1.0, Seq(127, -63, 32, 0))))
    // zero vector: scale 0, all codes 0 (no NaN division)
    assert(got(1) == ((2L, 0.0, Seq(0, 0, 0, 0))))
    // scale 2: (-127, 64, 32, floor(-15.375)= -16)
    assert(got(2) == ((3L, 2.0, Seq(-127, 64, 32, -16))))
    // unit-scale codes clamp out-of-range values instead of wrapping
    val clamped = df.filter(col("id") === 3L)
      .select(int8CodesUnit(col("v")).as("q")).as[Seq[Int]].head()
    assert(clamped == Seq(-127, 127, 64, -32)) // floor(-31.25) = -32
  }
}
