package graft

import org.apache.spark.sql.functions._

/** CI-light re-run of one row of the ARCHITECTURE §5 scaling table, so the
  * recorded ×2..×64 measurements can't silently rot as operators change:
  * under ScaleProbe's shingle-disjoint inflation the TRUE near-dup pair
  * count provably scales ×n, and this spec asserts the LSH pipeline
  * recovers exactly that at ×8, inside a generously sub-quadratic time
  * budget. Uses the identical `ScaleProbe.inflate` the manual probe runs.
  */
class ScaleProbeSpec extends SparkSpec {

  test("×8 shingle-disjoint inflation: pairs scale exactly ×8, sub-quadratic time") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text", "lang")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1

    def pairsAt(n: Int): (Long, Double) = {
      val d = ScaleProbe.inflate(docs, maxId, n).localCheckpoint(true)
      val t0 = System.nanoTime()
      val c = graft.operators.Dedup.minhashLshPairs(
        d, "doc_id", "text", shingleN = 3, k = 64, bands = 16,
        threshold = 0.7).count()
      (c, (System.nanoTime() - t0) / 1e9)
    }

    val (base, baseSec) = pairsAt(1)
    assert(base > 0, "corpus has no near-dup pairs — inflation ratio is vacuous")
    val (inflated, inflatedSec) = pairsAt(8)
    // replicas are shingle-disjoint, so each contributes exactly the base
    // pair set; banding recall at j≥0.7 on this corpus is 1 (fixed seeds,
    // deterministic) — any deviation means a pair was lost or invented
    assert(inflated == 8 * base, s"pairs: base=$base ×8=$inflated")
    // Wall-clock on a shared CI host flakes (BASELINE.md documents 15–21%
    // ambient windows with clean-looking probes; a spike during only the
    // ×8 run would trip any fixed ratio), so the sub-quadratic TIMING
    // assertion is opt-in for idle-machine runs; the exact pair-count
    // check above is the unconditional correctness pin (ADVICE r6).
    val msg =
      f"×8 wall-time $inflatedSec%.1fs vs base $baseSec%.1fs (budget 16×, floor 2 s)"
    if (sys.env.get("SPARK_GRAFT_STRICT_TIMING").contains("1"))
      // generous sub-quadratic budget: 8× data quadratically would be 64×;
      // the floor term absorbs fixed per-job scheduling at tiny scale
      assert(inflatedSec < 16 * math.max(baseSec, 2.0),
        s"$msg — super-linear drift")
    else info(msg)
  }
}
