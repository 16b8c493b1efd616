package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measured recall of the LSH ANN path against exact brute force on the
  * real embeddings table — the quantified version of "approximate". */
class RecallSpec extends SparkSpec {
  import spark.implicits._

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
