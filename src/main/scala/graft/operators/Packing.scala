package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: walk documents in id
  * order and accumulate token counts greedily, starting a new batch when
  * adding the next document would overflow `budgetTokens`. A document
  * larger than the budget gets a batch of its own. This is the standard
  * "pack documents into fixed-token training examples" step of an LLM
  * data pipeline.
  *
  * Scale shape: packing is inherently sequential WITHIN a shard and
  * embarrassingly parallel ACROSS shards — exactly how production
  * pipelines run it (each worker packs its own shard). `shards` controls
  * that parallelism with deterministic assignment (id mod shards); the
  * per-partition pass is O(1) state (running total), so a shard of any
  * size streams. Batch ids are per-shard; (shard, batch) is globally
  * unique.
  *
  * mapPartitions is justified here (build-rule preference (d)): the
  * operator is a stateful sequential fold that no built-in window
  * expresses — a running sum with conditional reset is not a cumsum.
  */
object Packing {

  /** @param df        input with an id column and a token-count column
    * @param idCol     orders the walk within each shard (deterministic)
    * @param tokCol    token count per document
    * @param budgetTokens max tokens per packed batch
    * @param shards    parallel packing lanes (1 = one global sequence)
    * @return (doc_id, n_tok, shard, batch) — batch numbered within shard
    */
  def packGreedy(df: DataFrame, idCol: String, tokCol: String,
      budgetTokens: Long, shards: Int = 1): DataFrame = {
    require(shards >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
        col(tokCol).cast("long").as("n_tok"),
        pmod(col(idCol).cast("long"), lit(shards.toLong)).cast("int").as("shard"))
    // several shards may share a partition after the exchange, so the
    // fold resets its state on every shard boundary of the sorted stream
    val arranged = base.repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Long, Int)]
    arranged.mapPartitions { it =>
      var curShard = Int.MinValue
      var batch = 0L
      var acc = 0L
      it.map { case (id, n, sh) =>
        if (sh != curShard) { curShard = sh; batch = 0L; acc = 0L }
        if (acc + n > budgetTokens && acc > 0) { batch += 1; acc = 0L }
        acc += n
        (id, n, sh, batch)
      }
    }.toDF("doc_id", "n_tok", "shard", "batch")
  }
}
