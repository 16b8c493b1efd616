package graft

import graft.table.Bucketed

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without a shuffle exchange") {
    val a = Seq.tabulate(100)(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = Seq.tabulate(100)(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Bucketed.writeBucketed(a, "bkt_a", "k", 4)
    Bucketed.writeBucketed(b, "bkt_b", "k", 4)
    try {
      val joined = Bucketed.colocatedJoin(spark, "bkt_a", "bkt_b", Seq("k"))
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join, got:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("bucketed aggregation on the bucket key avoids the exchange") {
    val a = Seq.tabulate(100)(i => (i.toLong % 10, s"a$i")).toDF("k", "va")
    Bucketed.writeBucketed(a, "bkt_agg", "k", 4)
    try {
      val agg = spark.table("bkt_agg").groupBy("k").count()
      assert(agg.count() == 10)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed agg, got:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }
}
