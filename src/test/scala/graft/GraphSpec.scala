package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a regular graph is uniform (triangle stays at 1.0)") {
    // every node of a regular undirected graph has identical in/out mass,
    // so r=1 is the fixed point at any damping
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val out = Graph.pageRank(edges, "s", "d", iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(out.keySet == Set("a", "b", "c"))
    out.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("pageRank conserves total mass on undirected graphs") {
    // undirected => no dangling nodes => sum(pr) == |V| every iteration
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "e"))
      .toDF("s", "d")
    val pr = Graph.pageRank(edges, "s", "d", iterations = 4)
    val total = pr.agg(sum("pr")).head().getDouble(0)
    assert(math.abs(total - 5.0) < 1e-9, s"mass drifted: $total")
  }

  test("pageRank ranks the hub of a star graph highest") {
    val edges = Seq(("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("hub", "s4"))
      .toDF("s", "d")
    val out = Graph.pageRank(edges, "s", "d", iterations = 3)
      .as[(String, Double)].collect().toMap
    val spokes = out.filter(_._1 != "hub").values
    assert(spokes.forall(out("hub") > _))
    // spokes are symmetric => identical ranks
    assert(spokes.toSet.size == 1)
  }

  test("pageRank one directed iteration matches the hand formula") {
    // a->b, a->c, b->c directed; deg(a)=2, deg(b)=1; c is dangling (mass
    // leaks by design, documented). After 1 iter from r0=1:
    // r(a) = 0.15 (no in-edges)
    // r(b) = 0.15 + 0.85 * (1/2)         = 0.575
    // r(c) = 0.15 + 0.85 * (1/2 + 1/1)   = 1.425
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("s", "d")
    val out = Graph.pageRank(edges, "s", "d", iterations = 1,
      undirected = false).as[(String, Double)].collect().toMap
    assert(math.abs(out("a") - 0.15) < 1e-12)
    assert(math.abs(out("b") - 0.575) < 1e-12)
    assert(math.abs(out("c") - 1.425) < 1e-12)
  }
}
