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
}
