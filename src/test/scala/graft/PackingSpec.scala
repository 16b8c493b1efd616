package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy packing: batches respect the budget, oversized docs stand alone") {
    val docs = Seq((0L, 500L), (1L, 900L), (2L, 700L), (3L, 2500L),
      (4L, 100L), (5L, 1999L), (6L, 2L)).toDF("doc_id", "n_tok")
    val out = Packing.packGreedy(docs, "doc_id", "n_tok", budgetTokens = 2000)
      .select("doc_id", "batch").as[(Long, Long)].collect().toMap
    // walk: 500+900=1400 | +700 would be 2100 → batch1: 700 | +2500 → batch2
    // (oversized alone) | batch3: 100+1999? 100, then +1999=2099 → batch4:
    // 1999, +2=2001 → batch5: 2
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L,
      4L -> 3L, 5L -> 4L, 6L -> 5L))
  }

  test("every batch fits the budget unless it is a single oversized doc") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
    val packed = Packing.packGreedy(docs, "doc_id", "n_tok", budgetTokens = 300, shards = 4)
    val bad = packed.groupBy("shard", "batch")
      .agg(sum("n_tok").as("tot"), count(lit(1)).as("n"))
      .filter(col("tot") > 300 && col("n") > 1)
    assert(bad.isEmpty)
    // exactly-once: every doc packed exactly once
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // sharding is deterministic: id mod shards
    assert(packed.filter(pmod(col("doc_id"), lit(4)) =!= col("shard")).isEmpty)
  }
}
