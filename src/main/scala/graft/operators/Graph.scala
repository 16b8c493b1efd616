package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge-list DataFrames — the link-analysis side of a
  * training-data pipeline (source authority weighting, crawl frontier
  * prioritization). Same iterative-join shape as [[Dedup.dedupFamilies]]:
  * per-round localCheckpoint lineage truncation, O(E) shuffle per round,
  * no driver-side state beyond the loop counter — the shape that survives
  * a 1000-executor deployment (reliable checkpointing would replace
  * executor-local blocks there).
  */
object Graph {

  /** Fixed-iteration PageRank over an edge list.
    *
    * `undirected = true` (the default) mirrors every edge, so every node
    * has out-degree ≥ 1 and no dangling-mass redistribution is needed —
    * rank mass is exactly conserved (Σ rank = |V| at every iteration,
    * pinned by GraphSpec). With `undirected = false` dangling nodes leak
    * their mass (documented simplification; the fixed iteration count
    * keeps the result deterministic either way, which is what makes the
    * operator oracle-checkable cross-engine).
    *
    * r₀(v) = 1;  r_{t+1}(v) = (1-d) + d · Σ_{(u,v)∈E} r_t(u) / deg(u)
    *
    * Scale shape: degree table and rank vector are both keyed by node —
    * the per-round plan is two hash joins + one aggregation on the edge
    * relation, all shuffle-partitioned on node id; lineage is truncated
    * per round so the plan stays O(1) deep regardless of iterations.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85,
      undirected: Boolean = true): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val e = (if (undirected)
      e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    else e0).distinct().cache()

    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var ranks = nodes.withColumn("pr", lit(1.0)).localCheckpoint(true)

    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.select(col("node").as("src"), col("pr")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      i += 1
    }
    e.unpersist()
    ranks
  }
}
