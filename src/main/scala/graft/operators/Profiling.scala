package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-planning diagnostics — the profiling pass a 100 TB job runs
  * BEFORE committing to a partitioning strategy. Every shuffle operator
  * in this repo (joins, aggs, the salted variants) assumes something
  * about the key distribution; these operators measure it, cheaply, so
  * the assumption is checked instead of guessed:
  *
  *  - [[keySkewProfile]]: one-row frequency-distribution profile of a
  *    key column (row/key counts, max/avg frequency, top-1 share, exact
  *    frequency percentiles). A p99/avg ratio near 1 means hash
  *    partitioning balances; a top-1 share near 1/partitions means one
  *    straggler task no matter how many partitions — reach for the
  *    salted two-phase shapes (ScaleOps.saltedAggregate, q_salted_join).
  *  - [[saltPlan]]: the concrete per-key salt factors for keys whose
  *    frequency exceeds a per-task row budget — the skewed-key sidecar a
  *    salted join broadcasts (small by construction: only keys above the
  *    budget appear; a uniform corpus yields an EMPTY plan).
  *
  * Scale shape: one count aggregation on the key (the same shuffle the
  * real job would do, but carrying only a count), then either a
  * single-row reduce (profile) or a filter of the tiny heavy-key set
  * (plan). Frequency percentiles use exact `percentile` over the per-key
  * counts — one row per DISTINCT key, not per input row, so "exact" here
  * is cheap even when the input is not.
  *
  * Cross-engine determinism: counts and integer ceil-division are exact;
  * the only doubles are avg/shares, rounded before comparison (the
  * repo's rule). Reference analogue: the per-stage count metrics of the
  * ETL jobs (order_glue_job.py's count-per-stage logging) generalized to
  * distribution shape.
  */
object Profiling {

  /** Per-key frequencies — the shared first stage (exposed for specs). */
  def keyFrequencies(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("freq"))

  /** One-row skew profile of `keyCol`'s frequency distribution. */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame =
    keyFrequencies(df, keyCol).agg(
      sum("freq").as("n_rows"),
      count(lit(1)).as("n_keys"),
      max("freq").as("max_freq"),
      round(avg("freq"), 4).as("avg_freq"),
      round(max("freq").cast("double") / sum("freq"), 6).as("top1_share"),
      round(expr("percentile(freq, 0.5)"), 4).as("freq_p50"),
      round(expr("percentile(freq, 0.9)"), 4).as("freq_p90"),
      round(expr("percentile(freq, 0.99)"), 4).as("freq_p99"))

  /** Log₂-bucketed histogram of a per-row length/count column — the
    * sequence-length distribution report that sizes packing
    * (Packing.packSequences' maxLen), truncation budgets, and shuffle
    * partition counts before a training-data run. Bucket = the bit
    * length of the value (`length(bin(v))` — integer-exact and
    * identical on any engine with a binary-string function; no
    * floating log2 whose last-ulp could flip an exact power of two).
    * Output per bucket: doc count, total/min/max length. One map-side
    * projection + one tiny agg (≤ 64 buckets), no data shuffle. */
  def lengthHistogram(df: DataFrame, lenCol: org.apache.spark.sql.Column): DataFrame =
    df.select(length(bin(lenCol.cast("long"))).as("bucket"),
        lenCol.cast("long").as("__len"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("__len").as("total_len"),
        min("__len").as("min_len"),
        max("__len").as("max_len"))

  /** Salt factors for keys above `rowsPerTask`: key, freq, and
    * salt = ceil(freq / rowsPerTask) computed as exact integer
    * arithmetic (`(freq + r - 1) div r`). Keys at or under the budget
    * are absent — the plan IS the heavy-key sidecar. */
  def saltPlan(df: DataFrame, keyCol: String, rowsPerTask: Long): DataFrame = {
    require(rowsPerTask > 0, s"need rowsPerTask > 0, got $rowsPerTask")
    keyFrequencies(df, keyCol)
      .filter(col("freq") > rowsPerTask)
      .select(col("key"), col("freq"),
        expr(s"(freq + ${rowsPerTask - 1}) div $rowsPerTask")
          .cast("int").as("salt"))
  }
}
