package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measured recall of the LSH ANN path against exact brute force on the
  * real embeddings table — the quantified version of "approximate". */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  test("simhashPairs: contained in exact near-dups, full recall on planted dups") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, sf, "documents")
    // exact all-pairs shingle Jaccard — the ground truth the hash-seeded
    // SimHash path is judged against (same oracle as the minhash sibling)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
    val strongTrue = exact.filter(_._3 >= 0.9).map(t => (t._1, t._2)).toSet
    val anyOverlap = exact.map(t => (t._1, t._2)).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // containment: Hamming ≤ 3 on 64-bit simhash must imply real textual
    // overlap — a wrong-but-plausible pair set would fail here
    assert(sim.subsetOf(anyOverlap),
      s"simhash emitted pairs with no textual overlap: ${(sim -- anyOverlap).take(5)}")
    // recall: every planted strong near-dup (j ≥ 0.9) must be found
    val recall = if (strongTrue.isEmpty) 1.0
      else (sim & strongTrue).size.toDouble / strongTrue.size
    info(f"simhash recall on j≥0.9 pairs = $recall%.3f (${strongTrue.size} true pairs)")
    assert(recall >= 0.9)
  }

  test("embeddingNearDupPairs LSH: contained in brute force, bounded recall") {
    import graft.operators.Dedup
    val e = Tables.load(spark, sf, "embeddings")
    val brute = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
      dim = 64, threshold = 0.4, lshBits = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
      dim = 64, threshold = 0.4, lshBits = 6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // containment is structural (bucket candidates are exact-verified),
    // but pin it so a future refactor can't silently break it
    assert(lsh.subsetOf(brute), s"LSH emitted non-pairs: ${(lsh -- brute).take(5)}")
    val recall = if (brute.isEmpty) 1.0 else (lsh & brute).size.toDouble / brute.size
    info(f"embedding LSH recall = $recall%.3f (${brute.size} exact pairs)")
    // 6 hyperplane bits over 64 dims: same-bucket probability for a
    // cos≥0.4 pair is (1 - θ/π)^6 — measured ≫ this floor on testdata
    assert(recall >= 0.3)
  }

  test("deterministic md5-Rademacher LSH: contained in brute force, " +
      "recall comparable to the seeded planes") {
    import graft.operators.Dedup
    val e = Tables.load(spark, sf, "embeddings")
    val brute = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
      dim = 64, threshold = 0.4, lshBits = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val det = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
      dim = 64, threshold = 0.4, lshBits = 6, deterministic = true)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(det.subsetOf(brute), s"det LSH emitted non-pairs: ${(det -- brute).take(5)}")
    val recall = if (brute.isEmpty) 1.0 else (det & brute).size.toDouble / brute.size
    info(f"det md5-Rademacher LSH recall = $recall%.3f (${brute.size} exact pairs)")
    // ±1 Rademacher planes are a valid sign-LSH family (Achlioptas'01):
    // same (1 - θ/π)^bits per-table collision law as Gaussian planes,
    // so the same measured floor applies — the determinism trades
    // nothing but the plane distribution's smoothness
    assert(recall >= 0.3)
  }

  test("ivfTopK recall vs brute force on real embeddings") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 32)
    val k = 5
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(q, e, "vec_id", "embedding", k,
      nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF recall@$k = $recall%.3f (nProbe/nCells = 4/16)")
    assert(recall > 0.5) // probing 1/4 of cells; near neighbors cluster
    assert(approx.forall { case (a, b) => a != b })
  }

  test("lshTopK multiprobe recall vs brute force on real embeddings") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 32)
    val k = 5
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, e, "vec_id", "embedding", k,
      dim = 64, bits = 4, probeBits = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"LSH recall@$k = $recall%.3f (candidates from 1-bit multiprobe)")
    assert(recall > 0.25) // 4 bits/1-bit probe: ~31% of corpus probed
    // every approx result must be a real (non-self) neighbor pair
    assert(approx.forall { case (a, b) => a != b })
  }

  test("semDedup: drops only true near-dups; cross-cell miss rate measured") {
    import graft.operators.Dedup
    val e = Tables.load(spark, sf, "embeddings")
    val threshold = 0.4
    // ground truth: every doc with a LOWER-id global cosine near-dup
    val brute = Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
      dim = 64, threshold = threshold, lshBits = 0)
      .select("a_id", "b_id", "cos").as[(Long, Long, Double)].collect()
    val trueDup = brute.map(_._2).toSet // b_id always the higher id
    val dropped = Similarity.semDedup(e, "vec_id", "embedding",
      threshold, nCells = 16)
      .filter(!col("kept")).select("id").as[Long].collect().toSet
    // precision is structural (same verify rule, within-cell): every drop
    // must be a genuine global near-dup
    assert(dropped.subsetOf(trueDup),
      s"semDedup dropped non-dups: ${(dropped -- trueDup).take(5)}")
    val recall = if (trueDup.isEmpty) 1.0
      else (dropped & trueDup).size.toDouble / trueDup.size
    info(f"semDedup drop recall = $recall%.3f on cos>=0.4 " +
      f"(${trueDup.size} docs with a global near-dup; misses = cross-cell " +
      "pairs 66 degrees apart — NOT the dedup regime, see planted check)")

    // the paper's operating regime is near-parallel vectors (the corpus
    // tops out at cos~0.55, so PLANT strong dups): an identical twin maps
    // to the same Voronoi cell by construction and must always drop
    val planted = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"),
        col("label"))
    val dropped2 = Similarity.semDedup(e.unionByName(planted),
      "vec_id", "embedding", threshold, nCells = 16)
      .filter(!col("kept")).select("id").as[Long].collect().toSet
    val plantedIds = (10000L until 10010L).toSet
    assert(plantedIds.subsetOf(dropped2),
      s"planted exact dups survived: ${(plantedIds -- dropped2).take(5)}")
  }

  test("int8TopK recall vs float brute force on real embeddings") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") < 32)
    val k = 5
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.int8TopK(q, e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (quant & exact).size.toDouble / exact.size
    info(f"int8 recall@$k = $recall%.3f (${exact.size} exact pairs)")
    // int8 quantization of unit vectors perturbs each cosine by ≤ ~1e-2;
    // only genuinely near-tied neighbors can swap — recall stays high
    assert(recall >= 0.85, f"int8 ranking degraded: recall $recall%.3f")
  }
}
