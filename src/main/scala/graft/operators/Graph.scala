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
    * Scale shape: the out-degree is fused into the edge list ONCE
    * (`(src, dst, deg)`, materialized src-partitioned), so each round is
    * exactly one hash join + one aggregation, both shuffle-partitioned on
    * node id — not the naive per-round recompute of degree and node
    * tables, which triples the join count and re-runs a distinct over the
    * edges every iteration. In undirected mode every node is some edge's
    * dst, so the rank vector needs no reconciling outer join with a node
    * table either. Lineage is truncated per round so the plan stays O(1)
    * deep regardless of iterations.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85,
      undirected: Boolean = true): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    // materialize the canonical edge set ONCE — the upstream edge
    // derivation (often a fact-table join) is the expensive part, and
    // both sides of the deg-fusion join below read it
    val e = (if (undirected)
      e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    else e0).distinct().localCheckpoint(true)

    // deg fused once; the join output is already hash-partitioned on src,
    // so every round's rank join reuses this side's partitioning
    val ew = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src"))
      .localCheckpoint(true)
    // full node table only needed where a node can receive zero
    // contributions (directed graphs — mirrored edges make every node a
    // dst, so undirected r_{t+1} covers all nodes by construction)
    lazy val nodes = ew.select(col("src").as("node"))
      .unionByName(ew.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var ranks =
      (if (undirected) e.select(col("src").as("node")).distinct() else nodes)
        .withColumn("pr", lit(1.0)).localCheckpoint(true)

    var i = 0
    while (i < iterations) {
      val contribs = ew
        .join(ranks.select(col("node").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("in_mass"))
      val next =
        if (undirected) contribs
        else nodes.join(contribs, Seq("node"), "left")
      ranks = next
        .select(col("node"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Fixed-iteration HITS (Kleinberg hubs & authorities) over a directed
    * edge list, L1-normalized each half-step so the scores are scale-free
    * and the arithmetic replays exactly on another engine:
    *
    * a_{t+1}(v) = Σ_{(u,v)∈E} h_t(u) / ‖·‖₁ ;  h_{t+1}(u) = Σ_{(u,v)∈E} a_{t+1}(v) / ‖·‖₁
    *
    * Nodes with no in-edges get authority 0 (and symmetrically hub 0) via
    * the final reconciling left join — they drop out of the iteration
    * entirely, so the per-round working set is only the reachable side.
    *
    * Scale shape: per half-step, one hash join of the edge list against a
    * node-keyed score vector + one aggregation; the L1 total is a
    * single-row aggregate broadcast back (no driver collect). The edge
    * set is materialized once; lineage truncates per half-step.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)

    def l1Normalize(df: DataFrame, c: String): DataFrame =
      df.crossJoin(broadcast(df.agg(sum(col(c)).as("_tot"))))
        .select(col("node"), (col(c) / col("_tot")).as(c))
        .localCheckpoint(true)

    var hub = nodes.withColumn("h", lit(1.0)).localCheckpoint(true)
    var auth: DataFrame = null
    var i = 0
    while (i < iterations) {
      val aRaw = e
        .join(hub.select(col("node").as("src"), col("h")), Seq("src"))
        .select(col("dst").as("node"), col("h"))
        .groupBy("node").agg(sum("h").as("a"))
        .localCheckpoint(true)
      auth = l1Normalize(aRaw, "a")
      val hRaw = e
        .join(auth.select(col("node").as("dst"), col("a")), Seq("dst"))
        .select(col("src").as("node"), col("a"))
        .groupBy("node").agg(sum("a").as("h"))
        .localCheckpoint(true)
      hub = l1Normalize(hRaw, "h")
      i += 1
    }
    nodes
      .join(auth, Seq("node"), "left")
      .join(hub, Seq("node"), "left")
      .select(col("node"),
        round(coalesce(col("a"), lit(0.0)), 6).as("auth"),
        round(coalesce(col("h"), lit(0.0)), 6).as("hub"))
  }

  /** Synchronous label propagation (community detection): every node
    * starts labeled with its own id; each round every node adopts the
    * most frequent label among its neighbors, ties broken by smallest
    * label. The synchronous update + total tie order make the result a
    * pure function of the edge set — deterministic and replayable
    * cross-engine, unlike the usual async/randomized LPA.
    *
    * Edges are mirrored (undirected), so every node is some edge's src
    * and keeps receiving a label each round.
    *
    * Scale shape: per round, one hash join edge⋈labels, one (node,label)
    * count aggregation, and one row_number window partitioned by node —
    * all shuffle-keyed by node id, no driver state, lineage truncated
    * per round.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val e = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val neigh = e
        .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
      labels = neigh
        .withColumn("rn", row_number().over(
          Window.partitionBy("src").orderBy(col("cnt").desc, col("label").asc)))
        .filter(col("rn") === 1)
        .select(col("src").as("node"), col("label"))
        .localCheckpoint(true)
      i += 1
    }
    labels
  }
}
