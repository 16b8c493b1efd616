package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the `events` table (batch form;
  * graft.streaming.Streams holds the Structured Streaming variants).
  *
  * All window assignment is row-local (`window()` expands to arithmetic on
  * the timestamp); the only shuffle is the final groupBy on (window, key),
  * which AQE coalesces — the same plan shape a 1000-executor run needs.
  */
object EventOps {

  /** Tumbling event-time window aggregate (count + sum(value)). */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(20,4)")).cast("double"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time window aggregate: each event lands in
    * width/slide windows. */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user: events closer than `gap` merge into one
    * session. Output start = min event ts of the session. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(20,4)")).cast("double"), 2).as("sum_value"))
      .select(col("w.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** JSON property extraction from the `props` string column — the
    * semi-structured access path (`get_json_object` stays codegen'd). */
  def withJsonProp(events: DataFrame, field: String): DataFrame =
    events.withColumn(field, get_json_object(col("props"), s"$$.$field").cast("int"))

  /** Funnel analysis: users reaching each successive stage, where stage
    * i counts only events at-or-after that user's stage-(i-1) timestamp.
    * One aggregate + one join per stage on the user key — no window over
    * the full event stream, so it scales like the joins it is made of. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min("ts").as("t"))
    val perStage = scala.collection.mutable.ArrayBuffer((stages.head, reached))
    for (i <- 1 until stages.length) {
      reached = events.filter(col(typeCol) === stages(i))
        .join(reached.select(col(userCol), col("t").as("prev_t")), Seq(userCol))
        .filter(col("ts") >= col("prev_t"))
        .groupBy(col(userCol)).agg(min("ts").as("t"))
      perStage += ((stages(i), reached))
    }
    perStage.zipWithIndex.map { case ((st, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$st").as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention matrix: users grouped by first-activity week, then
    * counted per week offset they were active again — the standard
    * retention triangle. Week arithmetic stays on week-truncated dates so
    * the offset division is exact. */
  def cohortRetention(events: DataFrame, userCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min("ts"))).as("cohort"))
    val active = events
      .select(col(userCol), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    active.join(firstWeek, Seq(userCol))
      .select(col(userCol), col("cohort"),
        (datediff(col("w"), col("cohort")) / 7).cast("int").as("week_offset"))
      .groupBy("cohort", "week_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Time-series resample to an hourly grid with gap filling: for each
    * key, generate every hour between its first and last event
    * (`sequence` + explode — row-local grid generation, no driver loop),
    * left-join the hourly aggregates, fill missing counts with 0 and
    * carry the last observed sum forward (`last(ignoreNulls)` window).
    * One shuffle for the agg, one for the join, one sort for the carry —
    * the same shape at any scale; grid size is rows×hours, so cap or
    * bucket the key space for sparse multi-year keys. */
  def resampleHourly(events: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(20,4)")).cast("double"), 2).as("sv"))
    val grid = hourly.groupBy(keyCol)
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy(keyCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(last(col("sv"), ignoreNulls = true).over(w), lit(0.0)), 2)
          .as("carried"))
  }

  /** First-order event-transition matrix: counts and conditional
    * probabilities of (event_type → next event_type) within each user's
    * time-ordered stream — the Markov-chain view of behavior (what
    * follows a click?) and the base table for next-event prediction
    * features. `tieCol` makes the per-user ordering total (same-ts rows
    * would otherwise make `lead` engine-dependent, the repo's
    * determinism rule for every windowed query).
    *
    * Scale shape: one user-partitioned window (lead) — the partition key
    * is the user, so state per task is one user's stream — then a
    * (from, to) count agg whose output is |types|², tiny; probabilities
    * attach via a broadcast join of per-from totals rather than a second
    * window over the pairs. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum("n").as("n_from"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
  }

  /** Sequential-pattern support (PrefixSpan level 2, the practical
    * core): for each ordered type pair (a → b), the number of users
    * with SOME a-event strictly before SOME b-event — not-necessarily-
    * adjacent ordering, the thing [[transitionMatrix]]'s adjacent
    * bigrams cannot see. The classic behavioral-mining primitive
    * ("signup → purchase eventually", "error → churn").
    *
    * The trick that keeps it scale-safe: "∃ a before b" ⟺
    * `min_ts(a) < max_ts(b)` per user, so the raw stream reduces to one
    * (user, type, first_ts, last_ts) profile row per user-type — the
    * pair join is |types|² per user over that tiny profile, never a
    * self-join of raw events. a = b is meaningful (the type recurs). */
  def sequencePairSupport(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String): DataFrame = {
    val prof = events.groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts"))
    val a = prof.select(col("u"), col("t").as("a"), col("first_ts"))
    val b = prof.select(col("u"), col("t").as("b"), col("last_ts"))
    a.join(b, Seq("u"))
      .filter(col("first_ts") < col("last_ts"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
  }

  /** Length-3 sequential-pattern support (the PrefixSpan level-3
    * extension of [[sequencePairSupport]]): users with SOME a-event,
    * then SOME b-event strictly after it, then SOME c-event strictly
    * after that. The middle element breaks the pair trick's pure
    * profile-join — "∃ b between" needs b's actual timestamps — so the
    * reduction anchors on b: each b EVENT joins the per-user (type,
    * first_ts) profile on `first_ts(a) < ts(b)` and the (type, last_ts)
    * profile on `ts(b) < last_ts(c)`, then distinct (u,a,b,c) counts.
    *
    * Scale shape: both joins are user-equi-joins against the tiny
    * per-user type profile (≤ |types| rows per user), so the frontier
    * is events × |types|² — linear in the stream for a bounded type
    * vocabulary, partitioned by user throughout; never events². */
  def sequenceTripleSupport(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String): DataFrame = {
    val prof = events.groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts"))
    val aP = prof.select(col("u"), col("t").as("a"), col("first_ts"))
    val cP = prof.select(col("u"), col("t").as("c"), col("last_ts"))
    val bEv = events.select(col(userCol).as("u"),
      col(typeCol).as("b"), col(tsCol).as("ts"))
    bEv.join(aP, Seq("u")).filter(col("first_ts") < col("ts"))
      .join(cP, Seq("u")).filter(col("ts") < col("last_ts"))
      .select("u", "a", "b", "c").distinct()
      .groupBy("a", "b", "c").agg(count(lit(1)).as("support"))
  }

  /** CUSUM drift statistic per key (Page 1954): over the day-ordered
    * daily counts, S_t = max(0, S_{t−1} + (x_t − μ)) with μ the key's
    * own mean daily volume; the reported maximum of S is the classic
    * changepoint evidence — a LEVEL SHIFT accumulates where
    * [[rollingZScore]]'s pointwise test only sees isolated spikes.
    *
    * Computed WITHOUT the recursion via the prefix identity
    * `S_t = p_t − min(0, min_{j≤t} p_j)` where `p_t = Σ_{j≤t} (x_j − μ)
    * = P_t − t·μ` with P_t the INTEGER running count. That form is the
    * engine-portability trick: the only accumulation (P_t) is integer
    * and exact, every float op is a per-row expression on exact inputs,
    * and min/max are order-insensitive — so the oracle replays
    * bit-identically. (A sequential double fold is NOT portable:
    * DuckDB's list_reduce evaluates struct fields against the updated
    * accumulator.) Windows are partitioned per key over
    * calendar-bounded daily rows — never raw events. */
  def cusumDrift(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val tot = daily.groupBy(col(keyCol))
      .agg(sum("n").as("total"), count(lit(1)).as("n_days"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mu = col("total").cast("double") / col("n_days")
    val p = sum("n").over(w).cast("double") -
      count(lit(1)).over(w).cast("double") * mu
    daily.join(broadcast(tot), Seq(keyCol))
      .withColumn("mu", mu)
      .withColumn("s", p - least(lit(0.0d), min(p).over(w)))
      .groupBy(col(keyCol))
      .agg(max("n_days").as("n_days"), round(max("mu"), 4).as("mean_daily"),
        round(max("s"), 4).as("max_cusum"))
  }

  /** Day-of-week seasonal index per key: mean daily volume on each ISO
    * weekday divided by the key's overall mean daily volume — index > 1
    * means that weekday runs hot. The multiplicative seasonal profile
    * that deseasonalizes traffic before trend/anomaly logic (pairs with
    * [[rollingZScore]], whose plain z-scores would flag every weekend as
    * an anomaly on weekday-heavy traffic).
    *
    * Same reduction discipline as rollingZScore: raw events collapse to
    * (key, day) rows first; the per-(key, dow) and per-key aggregates
    * are integer sums, combined with ONE fixed division formula
    * `(s_dow/d_dow)/(s_all/d_all)` the oracle replays verbatim. ISO
    * weekday numbering (Mon=1..Sun=7) is used because both engines
    * expose it without locale dependence. */
  def seasonalIndex(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val byDow = daily
      .groupBy(col(keyCol), (weekday(col("day")) + 1).as("dow"))
      .agg(sum("n").as("s_dow"), count(lit(1)).as("d_dow"))
    val totals = daily.groupBy(col(keyCol))
      .agg(sum("n").as("s_all"), count(lit(1)).as("d_all"))
    byDow.join(broadcast(totals), Seq(keyCol))
      .select(col(keyCol), col("dow"), col("d_dow").as("n_days"),
        round(col("s_dow").cast("double") / col("d_dow"), 4).as("avg_n"),
        round((col("s_dow").cast("double") / col("d_dow")) /
          (col("s_all").cast("double") / col("d_all")), 4).as("seasonal_index"))
  }

  /** Rolling z-score anomaly detection over daily counts per key: each
    * (key, day) gets the mean/variance of the trailing `windowDays`-row
    * frame and a z-score flagging days whose volume deviates from the
    * recent trend (the standard ops-monitoring / data-drift primitive).
    *
    * Scale shape: the raw stream reduces to one row per (key, day)
    * FIRST (a plain partial/final count agg), so the window runs over
    * |keys|·|days| rows, partitioned by key — never over raw events.
    * Determinism contract: variance is derived from integer sum/sumsq
    * over the frame (`var = sumsq/n − mean²`, one fixed formula the
    * oracle replays verbatim), comparisons happen on the ROUNDED
    * z-score, and partial frames (fewer than `windowDays` rows) emit
    * NULL stats rather than misleading small-sample scores. */
  def rollingZScore(events: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int = 7, zThreshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    val nd = windowDays.toDouble
    val full = count(lit(1)).over(w) === windowDays
    val mean = sum("n").over(w).cast("double") / lit(nd)
    val variance = sum(col("n") * col("n")).over(w).cast("double") / lit(nd) -
      mean * mean
    val z = round((col("n").cast("double") - mean) /
      sqrt(variance), 4)
    daily
      .withColumn("mean_w", when(full, round(mean, 4)))
      .withColumn("z", when(full && variance > 0, z))
      .withColumn("is_anomaly",
        when(full, coalesce(abs(col("z")) >= zThreshold, lit(false))))
      .select(col(keyCol), col("day"), col("n"), col("mean_w"), col("z"),
        col("is_anomaly"))
  }

  /** Linear multi-touch attribution: every conversion event splits one
    * unit of credit equally across that user's non-conversion events
    * inside the trailing `windowDays` window (strictly before the
    * conversion) — the marketing-analytics primitive between
    * last-touch (all credit to one event) and data-driven models.
    * Reported per touch type: touch count and exact total credit.
    *
    * Scale shape: the touch×conversion pairing is a user-equi-join
    * with an interval predicate (per-user frontier, bounded by the
    * window — never a global range join); the per-conversion fan-out
    * count is a window PARTITIONED by conversion id. Credit 1/k is
    * rounded at 6 dp and summed as exact DECIMAL (1/3-style repeating
    * rationals must not ride float accumulation order). */
  def multiTouchAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String, convType: String,
      windowDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(idCol).as("conv_id"),
        col(tsCol).as("cts"))
    val touches = events.filter(col(typeCol) =!= convType)
      .select(col(userCol).as("u"), col(typeCol).as("touch_type"),
        col(tsCol).as("tts"))
    val pairs = touches.join(conv, Seq("u"))
      .filter(col("tts") < col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL $windowDays DAYS"))
    val k = Window.partitionBy("conv_id")
    pairs.withColumn("credit",
        round(lit(1.0) / count(lit(1)).over(k), 6).cast("decimal(18,6)"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_touches"),
        round(sum("credit").cast("double"), 4).as("total_credit"))
  }

  /** Seasonally-adjusted rolling z-score: [[rollingZScore]] after
    * dividing each (key, day) count by the key's [[seasonalIndex]] for
    * that ISO weekday — so a weekday-heavy key's weekend dip stops
    * reading as an anomaly and a genuinely anomalous Saturday spike
    * still trips. The deseasonalized series is rounded to 4 dp and
    * cast DECIMAL before the frame sums (the integer-count trick of
    * rollingZScore generalized: variance comes from exact decimal
    * Σx/Σx² in ONE fixed formula, never float accumulation).
    * NULL stats on partial frames, same as the plain detector. */
  def deseasonalizedZScore(events: DataFrame, keyCol: String,
      tsCol: String, windowDays: Int = 7,
      zThreshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val byDow = daily
      .groupBy(col(keyCol), (weekday(col("day")) + 1).as("dow"))
      .agg(sum("n").as("s_dow"), count(lit(1)).as("d_dow"))
    val totals = daily.groupBy(col(keyCol))
      .agg(sum("n").as("s_all"), count(lit(1)).as("d_all"))
    val idx = byDow.join(broadcast(totals), Seq(keyCol))
      .select(col(keyCol), col("dow"),
        round((col("s_dow").cast("double") / col("d_dow")) /
          (col("s_all").cast("double") / col("d_all")), 4).as("sidx"))
    val nd = round(col("n").cast("double") / col("sidx"), 4)
      .cast("decimal(18,4)")
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    val full = count(lit(1)).over(w) === windowDays
    val wd = windowDays.toDouble
    val mean = sum("nd").over(w).cast("double") / lit(wd)
    val variance = sum(col("nd") * col("nd")).over(w).cast("double") /
      lit(wd) - mean * mean
    val z = round((col("nd").cast("double") - mean) / sqrt(variance), 4)
    daily
      .withColumn("dow", weekday(col("day")) + 1)
      .join(broadcast(idx), Seq(keyCol, "dow"))
      .withColumn("nd", nd)
      .withColumn("deseasonalized", col("nd").cast("double"))
      .withColumn("z", when(full && variance > 0, z))
      .withColumn("is_anomaly",
        when(full, coalesce(abs(col("z")) >= zThreshold, lit(false))))
      .select(col(keyCol), col("day"), col("n"), col("deseasonalized"),
        col("z"), col("is_anomaly"))
  }

  /** Binary-segmentation changepoint per key: the split day minimizing
    * SSE_left + SSE_right of the daily count series — where
    * [[cusumDrift]] says a level shift EXISTS, this says WHERE, plus
    * the variance-reduction percentage as the shift's effect size.
    *
    * Every candidate's cost comes from integer prefix sums (ONE
    * key-partitioned window over calendar-bounded daily rows); the
    * argmin selects on the ROUNDED cost with a day tiebreak, so the
    * chosen split is cross-engine stable. O(days) per key, no
    * per-candidate rescans. */
  def binaryChangepoint(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.groupBy(col(keyCol))
      .agg(sum("n").as("tn"), sum(col("n") * col("n")).as("tq"),
        count(lit(1)).as("td"))
    val pre = daily
      .withColumn("p", sum("n").over(w))
      .withColumn("q", sum(col("n") * col("n")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .join(broadcast(tot), Seq(keyCol))
      .filter(col("k") < col("td")) // a split needs a non-empty right
    val sseL = col("q").cast("double") -
      col("p").cast("double") * col("p") / col("k")
    val sseR = (col("tq") - col("q")).cast("double") -
      (col("tn") - col("p")).cast("double") * (col("tn") - col("p")) /
        (col("td") - col("k"))
    val best = pre.withColumn("cost", round(sseL + sseR, 4))
      .groupBy(col(keyCol))
      .agg(min(struct(col("cost"), col("day"))).as("b"))
    best.select(col(keyCol), col("b.day").as("split_day"),
        col("b.cost").as("sse_split"))
      .join(broadcast(tot.select(col(keyCol),
        round(col("tq").cast("double") -
          col("tn").cast("double") * col("tn") / col("td"), 4)
          .as("sse_nosplit"))), Seq(keyCol))
      .withColumn("sse_drop_pct", when(col("sse_nosplit") > 0,
        round((col("sse_nosplit") - col("sse_split")) /
          col("sse_nosplit") * 100, 2))) // NULL for a flat series
  }

  /** Gaps-and-islands: per key, maximal runs of CONSECUTIVE active
    * calendar days (the classic streak/uptime primitive — "longest
    * usage streak", "continuous coverage windows"). Uses the standard
    * row_number difference trick: over a key's distinct active days in
    * order, `day − row_number · 1d` is constant exactly within a
    * consecutive run, so grouping on that anchor date splits islands
    * with no self-join and no iteration — pure integer date arithmetic,
    * exact on any engine.
    *
    * Scale shape: raw events reduce to distinct (key, day) rows first;
    * the window partitions by key (per-task state = one key's days,
    * calendar-bounded); islands then aggregate twice (per-island, then
    * per-key). Longest-streak ties break to the EARLIEST island. */
  def gapsIslands(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy("day")
    val islands = events
      .select(col(keyCol), to_date(col(tsCol)).as("day")).distinct()
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy(col(keyCol), col("anchor"))
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    islands
      .withColumn("max_len",
        max("len").over(Window.partitionBy(keyCol)))
      .groupBy(keyCol).agg(
        sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("longest_streak"),
        min(when(col("len") === col("max_len"), col("start_day")))
          .as("longest_start"))
  }
}
