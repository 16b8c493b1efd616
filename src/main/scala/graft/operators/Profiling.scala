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

  /** One-row skew profile of `keyCol`'s frequency distribution.
    *
    * Percentiles are EXACT while the distinct-key count stays at or
    * under `exactPercentilesUpTo`, and switch to `approx_percentile`
    * above it: exact `percentile` buffers every distinct frequency in
    * one aggregation buffer, which at billions of keys would make the
    * diagnostic itself the bottleneck it exists to prevent. The
    * frequency table is materialized once (localCheckpoint) so the
    * key count probe and the profile share the expensive shuffle; the
    * probe moves one scalar to the driver. Either way the output
    * schema is identical (double percentiles, rounded). */
  def keySkewProfile(df: DataFrame, keyCol: String,
      exactPercentilesUpTo: Long = 4194304L): DataFrame = {
    val freq = keyFrequencies(df, keyCol).localCheckpoint(true)
    val pct =
      if (freq.count() <= exactPercentilesUpTo) "percentile"
      else "approx_percentile"
    freq.agg(
      sum("freq").as("n_rows"),
      count(lit(1)).as("n_keys"),
      max("freq").as("max_freq"),
      round(avg("freq"), 4).as("avg_freq"),
      round(max("freq").cast("double") / sum("freq"), 6).as("top1_share"),
      round(expr(s"$pct(freq, 0.5)").cast("double"), 4).as("freq_p50"),
      round(expr(s"$pct(freq, 0.9)").cast("double"), 4).as("freq_p90"),
      round(expr(s"$pct(freq, 0.99)").cast("double"), 4).as("freq_p99"))
  }

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

  /** One-pass whole-table profile: for each named column, row count,
    * null count/rate, and a KMV distinct-count estimate — the "what is
    * in this table" report that precedes schema decisions (partition
    * column choice, dictionary-encoding candidates, join-key sanity)
    * without one job per column. Values are profiled via their string
    * cast (one explode of narrow (name, value) pairs → ONE shuffle for
    * all columns together); distinct counts use
    * [[graft.ops.ScaleOps.kmvDistinct]], so they are md5-deterministic,
    * cross-engine replayable, and EXACT for columns with fewer than `k`
    * distinct values. Integer/string columns cast stably on any engine;
    * floating/timestamp columns' renderings are engine-specific, so
    * profile those via an explicit normalization if cross-engine
    * comparison matters.
    */
  def tableProfile(df: DataFrame, cols: Seq[String], k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "tableProfile needs at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
    val base = stacked.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"))
    val dist = graft.ops.ScaleOps.kmvDistinct(stacked, Seq("col_name"), "v", k)
    base.join(dist, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        round(col("n_null").cast("double") / col("n_rows"), 6).as("null_rate"),
        // an all-null column has no sketch row: its distinct count is 0
        coalesce(col("est_distinct"), lit(0L)).as("est_distinct"))
  }

  /** Robust per-group outlier profile via median/MAD — the data-quality
    * screen that survives the heavy tails a mean/stddev z-score drowns
    * in: per group, the exact median, the median absolute deviation,
    * and how many rows sit more than `nMads` MADs from the median.
    *
    * Determinism: exact `percentile` medians (same linear-interpolation
    * definition as DuckDB's quantile_cont), and the outlier predicate
    * compares `abs(v - med) > nMads * mad` with the identical IEEE
    * operation order on both engines. Scale shape: two exact-percentile
    * aggs over the grouped values + broadcast joins of the tiny
    * per-group stats; exact percentiles hold a per-group value-count
    * map, so this targets BOUNDED group cardinality — for unbounded
    * domains use hashSampledQuantilesPerGroup's sampled medians.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      nMads: Double = 3.0): DataFrame = {
    val g = col(groupCol)
    val med = df.groupBy(g.as("__g"))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.join(broadcast(med), g === col("__g"))
      .withColumn("adev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(col("__g").as("__g2"))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), col("__g") === col("__g2"))
      .groupBy(g)
      .agg(count(lit(1)).as("n"),
        round(max("med"), 4).as("med"),
        round(max("mad"), 4).as("mad"),
        count(when(col("adev") > lit(nMads) * col("mad"), 1)).as("n_outliers"),
        round(count(when(col("adev") > lit(nMads) * col("mad"), 1))
          .cast("double") / count(lit(1)), 6).as("outlier_rate"))
  }

  /** Exact join-output cardinality WITHOUT running the join: matched
    * key count, the exact output row count Σ f_left(k)·f_right(k), and
    * the worst single-key fan-out — the pre-flight check that tells you
    * whether an equi-join (or a self-join pair expansion like the
    * co-purchase queries) will explode before you pay for it. Cost is
    * two frequency aggs + a join of the (small) frequency tables —
    * never the join itself.
    *
    * Per-key products multiply decimal(19,0) operands — Spark's
    * precision promotion makes the product decimal(38,0) — so a hot key
    * times a hot key can't silently wrap a Long (the overflow class the
    * round-7 review purged). The final sum/max cast back to long, which
    * bounds the usable estimate at ~9.2e18 output rows — beyond any
    * join you'd actually run; past that bound (or past decimal(38,0) in
    * the sum) non-ANSI Spark yields NULL rather than saturating, so a
    * NULL join_rows reads as "too big to run", not zero. */
  def joinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val fl = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("fl"))
    val fr = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("fr"))
    val prod = col("fl").cast("decimal(19,0)") * col("fr").cast("decimal(19,0)")
    fl.join(fr, Seq("k"))
      .agg(count(lit(1)).as("n_matched_keys"),
        sum(prod).cast("long").as("join_rows"),
        max(prod).cast("long").as("max_key_fanout"))
  }

  /** Winsorized per-group stats: exact percentile bounds [pLo, pHi],
    * how many rows clip at each side, and the mean AFTER clipping — the
    * standard tail-taming transform reported as data (apply the same
    * `least(greatest(...))` expression to transform rows). Determinism:
    * exact percentiles; the clipped mean goes through round(4) then an
    * exact decimal(20,4) sum before one double division, the repo's
    * deterministic-mean pattern. */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad bounds [$pLo, $pHi]")
    val g = col(groupCol)
    val bounds = df.groupBy(g.as("__g"))
      .agg(expr(s"percentile($valueCol, $pLo)").as("lo"),
        expr(s"percentile($valueCol, $pHi)").as("hi"))
    val clipped = df.join(broadcast(bounds), g === col("__g"))
      .withColumn("__clip",
        least(greatest(col(valueCol), col("lo")), col("hi")))
    clipped.groupBy(g)
      .agg(count(lit(1)).as("n"),
        round(max("lo"), 4).as("lo"),
        round(max("hi"), 4).as("hi"),
        count(when(col(valueCol) < col("lo"), 1)).as("n_clipped_lo"),
        count(when(col(valueCol) > col("hi"), 1)).as("n_clipped_hi"),
        round(sum(round(col("__clip"), 4).cast("decimal(20,4)"))
          .cast("double") / count(lit(1)), 4).as("mean_wins"))
  }

  /** Equi-width numeric histogram: `nBuckets` buckets spanning
    * [min, max], one agg for the bounds (single-row broadcast) + one
    * map-side bucketing pass + one tiny agg. Bucket index is
    * `floor((v - min) / width)` clamped to the top bucket (the max
    * value itself) — the same IEEE division on any engine, so the
    * boundary assignment replays exactly. Null-safe (nulls dropped),
    * degenerate min==max collapses to one bucket. The classic value-
    * distribution profile for choosing range-partition boundaries and
    * spotting truncated/spiked columns. */
  def numericHistogram(df: DataFrame, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"need nBuckets > 0, got $nBuckets")
    val v = col(valueCol).cast("double")
    val bounds = df.filter(v.isNotNull)
      .agg(min(v).as("lo"), max(v).as("hi"))
    df.filter(v.isNotNull).crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((v - col("lo")) /
              ((col("hi") - col("lo")) / nBuckets)).cast("int"))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(v), 4).as("bucket_min"),
        round(max(v), 4).as("bucket_max"))
  }

  /** Functional-dependency profile: does `detCol` determine `depCol`?
    * One row: key count, how many keys map to MORE than one distinct
    * dependent value (violations), the violation rate, and the worst
    * key's fan-out. The schema-inference / data-quality primitive
    * behind "is this a safe join key", "can I denormalize this pair",
    * and "did upstream duplicate-with-drift corrupt the dimension".
    * One distinct-agg shuffle on the determinant, then a single-row
    * reduce — exact, engine-portable counting throughout. */
  def functionalDependency(df: DataFrame, detCol: String,
      depCol: String): DataFrame =
    df.groupBy(col(detCol).as("k"))
      .agg(countDistinct(col(depCol)).as("nd"))
      .agg(count(lit(1)).as("n_keys"),
        count(when(col("nd") > 1, 1)).as("violating_keys"),
        round(count(when(col("nd") > 1, 1)).cast("double") /
          count(lit(1)), 6).as("violation_rate"),
        max("nd").as("max_dep_values"))

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

  /** Equal-frequency (equi-depth) histogram per group: `nBuckets`
    * equally-populated buckets of `valueCol` within each `groupCol`
    * value, via `ntile` over a fully-tiebroken order (value, then
    * `tieCol`) so bucket assignment is deterministic and replays
    * identically on any engine (ntile's ⌈n/k⌉-first-buckets split is
    * the SQL-standard rule both Spark and DuckDB implement). The
    * complement of [[numericHistogram]]: equi-width shows the shape,
    * equi-depth gives you usable range-partition boundaries when the
    * distribution is skewed.
    *
    * Scale shape: the window is PARTITIONED by the group column — each
    * group sorts independently, nothing global. For a single-group /
    * whole-table equi-depth at 100 TB, don't sort: sample quantile
    * cutpoints instead (ScaleOps.sampledQuantiles) and bucket by
    * comparison — this exact form is for per-group profiles where
    * groups are numerous and each fits a partition. */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"need nBuckets > 0, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val w = Window.partitionBy(groupCol).orderBy(v.asc, col(tieCol).asc)
    df.filter(v.isNotNull)
      .withColumn("bucket", ntile(nBuckets).over(w))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(v), 4).as("bucket_min"),
        round(max(v), 4).as("bucket_max"))
  }

  /** Declarative data-quality constraint suite (the Deequ-style gate a
    * pipeline runs before publishing a table): one report row per
    * constraint with its measured metric and pass/fail. Built-in
    * constraint kinds: non-empty row count, column completeness
    * (non-null fraction), key uniqueness (distinct/total), a numeric
    * lower bound, domain membership (fraction of values in an allowed
    * set), and referential integrity against a dimension keyset.
    *
    * Scale shape: every metric folds into ONE aggregate over a single
    * scan of the fact table (conditional sums; distinct-key count rides
    * the same pass as `count(DISTINCT …)`), with the RI probe attached
    * as a broadcast left join of the dimension KEYSET (dim keys are
    * assumed dimension-sized; for a fact-sized RI check use the
    * left_semi count shape instead). The report unfolds from the
    * single-row result — |constraints| rows, driver-free. All metrics
    * are exact integer ratios rounded at 6 dp. */
  def dqSuite(fact: DataFrame, dim: DataFrame, keyCol: String,
      completenessCol: String, boundCol: String, lowerBound: Double,
      domainCol: String, domain: Seq[String], fkCol: String,
      dimKeyCol: String): DataFrame = {
    val dimKeys = dim.select(col(dimKeyCol).as("__dim_key")).distinct()
    val joined = fact.join(broadcast(dimKeys),
      col(fkCol) === col("__dim_key"), "left")
    val m = joined.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(completenessCol).isNotNull, 1L).otherwise(0L))
        .as("n_complete"),
      countDistinct(col(keyCol)).as("n_distinct"),
      min(col(boundCol).cast("double")).as("min_bound"),
      sum(when(col(domainCol).isin(domain: _*), 1L).otherwise(0L))
        .as("n_in_domain"),
      sum(when(col("__dim_key").isNotNull, 1L).otherwise(0L))
        .as("n_ri_ok"))
    val frac = (c: org.apache.spark.sql.Column) =>
      round(c.cast("double") / col("n_rows"), 6)
    val rows = array(
      struct(lit("row_count_nonempty").as("constraint"),
        col("n_rows").cast("double").as("metric"),
        (col("n_rows") > 0).as("passed")),
      struct(lit(s"completeness_$completenessCol").as("constraint"),
        frac(col("n_complete")).as("metric"),
        (col("n_complete") === col("n_rows")).as("passed")),
      struct(lit(s"uniqueness_$keyCol").as("constraint"),
        frac(col("n_distinct")).as("metric"),
        (col("n_distinct") === col("n_rows")).as("passed")),
      struct(lit(s"min_bound_$boundCol").as("constraint"),
        round(col("min_bound"), 6).as("metric"),
        (col("min_bound") >= lowerBound).as("passed")),
      struct(lit(s"domain_$domainCol").as("constraint"),
        frac(col("n_in_domain")).as("metric"),
        (col("n_in_domain") === col("n_rows")).as("passed")),
      struct(lit(s"ri_${fkCol}_$dimKeyCol").as("constraint"),
        frac(col("n_ri_ok")).as("metric"),
        (col("n_ri_ok") === col("n_rows")).as("passed")))
    m.select(explode(rows).as("r"))
      .select("r.constraint", "r.metric", "r.passed")
  }
}
