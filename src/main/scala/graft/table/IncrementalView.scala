package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over [[LakeTable]] CDC feeds — the
  * pattern that keeps a 100 TB base table's aggregates fresh without
  * full recomputation: every (count, sum) group is a self-maintainable
  * view, so applying the signed per-key deltas of a change feed to the
  * stored view is EXACTLY equivalent to re-aggregating the whole base
  * (classic delta-rule IVM; the reference pipeline re-derives its
  * warehouse state from scratch per run — each Glue job under
  * `jobs/` rebuilds and re-counts its full table — which is the
  * O(base) cost this replaces with O(changes)).
  *
  * Cost shape: one pass over the CDC frame (inserts/deletes count ±1
  * and ±value; update pre/post images cancel to the net change), one
  * key-equi join of the (small) delta frame against the view, a MERGE
  * of only the changed keys, and a delete pass for groups whose count
  * reached zero. Nothing scans the base table. Sums are exact
  * DECIMAL(30,4) so maintenance never drifts from recomputation —
  * IncrementalViewSpec pins delta-maintained ≡ full recompute through
  * insert+update+delete batches, and the q_ivm oracle replays the
  * final state relationally.
  *
  * MIN/MAX views ([[minMaxView]] / [[maintainMinMaxView]]) are NOT
  * self-maintainable under deletes — the textbook IVM caveat: an
  * inserted value can only tighten an extremum
  * (new_min = least(old, inserted)), but deleting the current extremum
  * reveals the runner-up, which only the base knows. The standard
  * resolution implemented here: maintain insert-side extrema purely
  * from the delta, and rescan ONLY the groups whose current extremum
  * was deleted (one semi-join of the base against that — usually
  * empty — key set). The common batch touches no base data at all;
  * the worst case scans just the threatened groups' partitions, never
  * the table.
  *
  * Sync bookkeeping: both maintainers RETURN the base version they
  * synced the view to — record it and pass it as the next call's
  * `sinceVersion`. Re-deriving it from `availableVersions.min` is a
  * silent-wrong-answer trap: the oldest retained version shifts
  * forward as writes prune history, so after enough base writes it
  * stops being "the version the view last saw" while `changesSince`
  * still succeeds — with an incomplete delta.
  */
object IncrementalView {

  /** Broadcast a (usually tiny) key/build frame only while its MEASURED
    * row count stays under `limit`; past it, return the frame unhinted
    * so it shuffles as an ordinary join build instead of OOMing the
    * driver. The designed case for every call site here is a small set
    * (changed dim keys, threatened groups), but a pathological window —
    * a full-dim re-homing, a delete storm touching every extremum —
    * must DEGRADE, not fail (the `dedupFamilies` measured-|V| policy,
    * operators/Dedup.scala). The probe is a bounded limit+1 count over
    * an already-checkpointed or delta-sized frame, never a full scan. */
  /** Broadcast-gate row limit. Test-tunable (IncrementalViewSpec drops
    * it to force the shuffle fallback on small fixtures); production
    * default keeps builds comfortably under driver memory. */
  private[graft] var broadcastLimit: Int = 1000000

  /** Shared by the serving indexes too (AnnIndex.search's probe list,
    * DedupIndex.standingRows' batch-bucket set) — any designed-small
    * build side that a pathological batch could inflate. */
  private[table] def broadcastIfSmall(df: DataFrame): DataFrame =
    if (df.limit(broadcastLimit + 1).count() <= broadcastLimit)
      broadcast(df)
    else df

  /** The decision form of [[broadcastIfSmall]]: measure `probe` once,
    * return the hint to apply to it AND to frames whose cardinality it
    * bounds (so one probe covers several join sides, and frames whose
    * own evaluation is expensive are never executed just to be sized). */
  private def sizeHint(probe: DataFrame): DataFrame => DataFrame =
    if (probe.limit(broadcastLimit + 1).count() <= broadcastLimit)
      broadcast _
    else identity _

  private val zero30_4: Column = lit(0).cast("decimal(30,4)")

  // ---- shared Σv² decimal discipline (all moment-carrying maintainers) ----
  //
  // Stored Σv² is decimal(38,8); the merge ADD must happen at (37,8)
  // because a (38,8)+(38,8) add types as precision 39, which Spark
  // resolves by REDUCING the result scale to 7 — rounding the 8th
  // digit on every merge. And the delta terms must be SIGNED BY
  // NEGATION, never by multiplying a sign column: decimal(37,8) × LONG
  // types precision 58, truncated to scale 6, silently destroying
  // sub-1e-6 squares (both found empirically on Spark 4.1.2; pinned by
  // IncrementalViewSpec's 4-dp fixtures). The (38,8)→(37,8) narrowing
  // below is the one remaining hazard: a stored value past 29 integer
  // digits casts to NULL (non-ANSI), which a bare coalesce would
  // silently reset to 0 — so the helper distinguishes "group absent"
  // (NULL input → zero) from "cast overflow" (non-null input, null
  // cast → loud failure). Headroom: 29 integer digits hold any
  // realistic Σv² (10^10 rows × 10^11 per square ≈ 10^21).
  private val zero37_8: Column = lit(0).cast("decimal(37,8)")

  /** Narrow a Σv² term to the exact (37,8) addition space: NULL → 0
    * (group absent from view / no values in delta); a non-null value
    * that no longer fits 29 integer digits fails LOUDLY instead of
    * silently resetting the maintained Σv² to 0. */
  private def narrow37_8(c: Column): Column = {
    // try_cast, not cast: under ANSI the plain cast throws its own
    // (correctly loud, but formula-anonymous) error; under non-ANSI it
    // nulls silently. try_cast nulls in BOTH modes, so the guard below
    // is the single, mode-independent failure path.
    val narrowed = c.try_cast("decimal(37,8)")
    when(c.isNotNull && narrowed.isNull,
      raise_error(concat(lit("IVM sum_sq overflow: "), c.cast("string"),
        lit(" exceeds decimal(37,8) — recompute the view at a wider type")))
        .cast("decimal(37,8)"))
      .otherwise(coalesce(narrowed, zero37_8))
  }

  /** The guarded (37,8)-space add of two Σv² terms, cast back to the
    * stored decimal(38,8) — exact by construction (see above). */
  private def addSumSq(v: Column, d: Column): Column =
    (narrow37_8(v) + narrow37_8(d)).cast("decimal(38,8)")

  /** Full (count, exact-decimal-sum) aggregate of `df` — the view's
    * initial state, and the recomputation IVM must stay equal to. */
  def sumView(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("decimal(20,4)"))
        .cast("decimal(30,4)").as("sum_value"))

  /** [[sumView]] extended with per-group min/max (same exact
    * DECIMAL(20,4) value space, so maintained extrema compare
    * bit-for-bit against recomputed ones). */
  def minMaxView(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val vDec = col(valueCol).cast("decimal(20,4)")
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(vDec).cast("decimal(30,4)").as("sum_value"),
      min(vDec).as("min_value"),
      max(vDec).as("max_value"))
  }

  /** Apply the base table's changes since `sinceVersion` to the stored
    * view: signed per-key deltas → left join against current view rows
    * → MERGE the changed keys → drop zero-count groups. Returns the
    * base version the view is now synced to (pass it as the next
    * `sinceVersion`). */
  def maintainSumView(base: LakeTable, view: LakeTable, keyCols: Seq[String],
      valueCol: String, sinceVersion: Int,
      meta: Map[String, String] = Map.empty): Int = {
    val syncedTo = base.version
    val ch = base.changesSince(sinceVersion)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = ch.groupBy(keyCols.map(col): _*).agg(
      sum(sign).as("d_n"),
      sum(col(valueCol).cast("decimal(20,4)") * sign).as("d_sum"))
    mergeSumDelta(view, keyCols, delta, meta)
    syncedTo
  }

  /** Apply a (d_n, d_sum) per-group delta frame to a stored sum view:
    * left join against current rows → ONE atomic MERGE-with-DELETE of
    * the changed keys (groups whose count reached zero are removed in
    * the SAME commit as the surviving merges — no second publish, no
    * window where a zero-count zombie row is the durable state). A
    * delta group whose changed rows all carry NULL values has d_sum
    * NULL; coalesce so it can't null out the stored sum.
    *
    * Known SQL-semantics corner (all single-column sum/moments/minmax
    * maintainers): a surviving group whose non-null values are ALL
    * deleted while null-valued rows remain keeps sum 0 rather than
    * SQL's NULL — the view state can't distinguish "sums to zero"
    * from "no values" without a non-null count. [[fullStatsView]]
    * carries that signal (n_distinct) and reports the corner
    * correctly; use it where the distinction matters. */
  private def mergeSumDelta(view: LakeTable, keyCols: Seq[String],
      delta: DataFrame, meta: Map[String, String] = Map.empty): Unit = {
    val cur = view.read.select(
      keyCols.map(col) :+ col("n").as("v_n") :+
        col("sum_value").as("v_sum"): _*)
    val changed = delta.join(cur, keyCols, "left")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("v_n"), lit(0L)) + col("d_n")).as("n"),
        (coalesce(col("v_sum"), zero30_4) + coalesce(col("d_sum"), zero30_4))
          .cast("decimal(30,4)").as("sum_value")): _*)
      .localCheckpoint(true) // referenced twice inside the merge plan
    view.upsertWithDelete(changed, col("n") <= 0L, meta = meta)
  }

  /** [[maintainSumView]] for a [[minMaxView]]: count/sum by the exact
    * delta rule; min/max from insert-side extrema when safe, and a
    * per-group base rescan ONLY where a delete (or update pre-image)
    * removed a value tied with the group's current extremum — the one
    * case the delta cannot answer. Returns the synced base version.
    *
    * The change feed is a per-version EVENT LOG, not a net diff: over
    * a multi-write span with `changeFeed` on, a value inserted then
    * deleted (or updated away) appears on BOTH sides. Extrema must
    * therefore read the NET per-(group, value) signed weights — same
    * rule as [[maintainJoinMinMaxView]] — so a cancelled value can
    * never tighten an extremum (insert 200 @v2, delete it @v3 must NOT
    * report max 200) and only values whose multiplicity strictly
    * decreased threaten one. Signed count/sum need no netting (the
    * canceling events cancel arithmetically), but they ride the netted
    * frame anyway: one pass either way. */
  def maintainMinMaxView(base: LakeTable, view: LakeTable,
      keyCols: Seq[String], valueCol: String, sinceVersion: Int,
      meta: Map[String, String] = Map.empty): Int = {
    val syncedTo = base.version
    applyMinMaxDelta(base.changesSince(sinceVersion), base.read, view,
      keyCols, valueCol, meta)
    syncedTo
  }

  /** Apply ONE change-event frame to a stored min/max view against the
    * current base snapshot — the whole [[maintainMinMaxView]] rule
    * (netting, insert-side extrema, threatened-group rescan, atomic
    * merge-with-extinction), factored out so the streaming foreachBatch
    * subscriber ([[graft.streaming.Streams.maintainMinMaxViewFromChangeFeed]])
    * applies the IDENTICAL semantics per micro-batch with its
    * exactly-once `meta` marker riding the same commit. */
  private[graft] def applyMinMaxDelta(ch: DataFrame, baseNow: DataFrame,
      view: LakeTable, keyCols: Seq[String], valueCol: String,
      meta: Map[String, String] = Map.empty): Unit = {
    val keys = keyCols.map(col)
    val vDec = col(valueCol).cast("decimal(20,4)")
    val isIns = col("_change_type").isin("insert", "update_postimage")
    // net per (group, value) first; all-cancelled values (w=0) drop out
    // entirely. NULL values collapse into one group per key — they carry
    // the count/sum contribution but never enter min/max (Spark min/max
    // and least/greatest skip nulls).
    val net = ch.groupBy(keys :+ vDec.as("__v"): _*)
      .agg(sum(when(isIns, 1L).otherwise(-1L)).as("w"))
      .filter(col("w") =!= 0L)
    val delta = net.groupBy(keys: _*).agg(
      sum(col("w")).as("d_n"),
      sum(col("__v") * col("w")).as("d_sum"),
      min(when(col("w") > 0, col("__v"))).as("ins_min"),
      max(when(col("w") > 0, col("__v"))).as("ins_max"),
      min(when(col("w") < 0, col("__v"))).as("del_min"),
      max(when(col("w") < 0, col("__v"))).as("del_max"))
    val cur = view.read.select(
      keys :+ col("n").as("v_n") :+ col("sum_value").as("v_sum") :+
        col("min_value").as("v_min") :+ col("max_value").as("v_max"): _*)
    val newN = coalesce(col("v_n"), lit(0L)) + col("d_n")
    // an extremum is threatened only for a PRE-EXISTING, SURVIVING group
    // where some net-removed value ties the stored extremum (a
    // consistent view can't have net deletes beyond it; <=/>= also
    // self-heals drift). NULL values never participate in min/max, so
    // null-row deletes threaten nothing and the null-vs-null comparison
    // correctly evaluates to false here.
    val threatened: Column = col("v_n").isNotNull && newN > 0 &&
      ((col("del_min") <= col("v_min")) || (col("del_max") >= col("v_max")))
    val joined = delta.join(cur, keyCols, "left")
      .withColumn("n", newN)
      .withColumn("sum_value",
        (coalesce(col("v_sum"), zero30_4) + coalesce(col("d_sum"), zero30_4))
          .cast("decimal(30,4)"))
      .withColumn("__rescan", threatened)
      .localCheckpoint(true) // computed once: rescan-key probe AND merge
    // base rescan for threatened groups only — broadcast the (usually
    // empty) key set while it measures small so the scan side never
    // shuffles (degrading to a shuffle semi-join under a delete storm
    // touching every extremum), and mark rescanned rows so a
    // legitimately-NULL recomputed extremum (all remaining values null)
    // isn't mistaken for "not rescanned"
    val rescanKeys = joined.filter(col("__rescan")).select(keys: _*)
    // ONE bounded count over the checkpointed frame decides the hint for
    // both the key set and the (≤ one row per key) rescan result —
    // probing `rescanned` itself would execute the rescan join twice
    val hint = sizeHint(rescanKeys)
    val rescanned = baseNow
      .join(hint(rescanKeys), keyCols, "left_semi")
      .groupBy(keys: _*)
      .agg(min(vDec).as("r_min"), max(vDec).as("r_max"))
      .withColumn("__rescanned", lit(true))
    // least/greatest skip NULLs (Spark semantics), which is exactly the
    // delta rule: no inserts => keep the stored extremum; new group =>
    // insert-side extremum alone
    val changed = joined.join(hint(rescanned), keyCols, "left")
      .select(keys ++ Seq(col("n"), col("sum_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_min"))
          .otherwise(least(col("v_min"), col("ins_min"))).as("min_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_max"))
          .otherwise(greatest(col("v_max"), col("ins_max"))).as("max_value")): _*)
    view.upsertWithDelete(changed, col("n") <= 0L, meta = meta)
  }

  // ---- MOMENTS views (self-maintainable variance) ----
  //
  // Unlike min/max, the second moment IS self-maintainable: Σv² obeys
  // the same signed delta rule as Σv, so (n, Σv, Σv²) maintains in one
  // pass with no rescan ever, and population variance/stddev derive in
  // closed form at read time: var = (Σv² − (Σv)²/n)/n. Both sums are
  // exact decimals, so the derived doubles are identical across
  // engines (the textbook cancellation caveat of the two-sums formula
  // affects accuracy, not determinism — and the oracle recomputes with
  // the SAME formula over the same exact sums).

  /** (count, Σv, Σv²) per group — the self-maintainable moment state
    * behind mean/variance/stddev. */
  def momentsView(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val vDec = col(valueCol).cast("decimal(18,4)")
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(vDec).cast("decimal(30,4)").as("sum_value"),
      sum(vDec * vDec).cast("decimal(38,8)").as("sum_sq"))
  }

  /** Maintain a [[momentsView]] — the [[maintainSumView]] delta rule
    * extended with the Σv² column. Returns the synced base version.
    *
    * Prefer [[maintainStatsView]] for new views: it strictly subsumes
    * this maintainer (same one-feed-pass cost — its extra netting
    * aggregation reads the CHECKPOINTED feed, not the log again) and
    * adds min/max. This one stays for views that genuinely never want
    * extrema: it is the only moment maintainer with NO rescan path at
    * all — a hard O(changes) ceiling with zero base-read risk, where
    * the stats maintainer's threatened-extremum rescan can touch the
    * base under a delete storm. Kept, documented, not deprecated: the
    * no-rescan guarantee is a real contract, not redundancy
    * (ARCHITECTURE.md "choosing a maintainer" table). */
  def maintainMomentsView(base: LakeTable, view: LakeTable,
      keyCols: Seq[String], valueCol: String, sinceVersion: Int): Int = {
    val syncedTo = base.version
    val ch = base.changesSince(sinceVersion)
    val isIns = col("_change_type").isin("insert", "update_postimage")
    val vDec = col(valueCol).cast("decimal(18,4)")
    // sign the SQUARED term by negation, never multiplication: vDec*vDec
    // is decimal(37,8), and multiplying THAT by a LONG sign overflows
    // precision past 38, where Spark's precision-loss rule truncates to
    // decimal(38,6) — silently destroying sub-1e-6 squares (0.0003² →
    // 0.000000). Negation preserves decimal(37,8) exactly, matching the
    // create path's sum(vDec*vDec). Masked for 2-dp money; fatal for any
    // value column with >3 decimal digits (round-9 audit, confirmed
    // empirically on Spark 4.1.2; pinned by IncrementalViewSpec's 4-dp
    // fixture).
    val delta = ch.groupBy(keyCols.map(col): _*).agg(
      sum(when(isIns, 1L).otherwise(-1L)).as("d_n"),
      sum(when(isIns, vDec).otherwise(-vDec)).as("d_sum"),
      sum(when(isIns, vDec * vDec).otherwise(-(vDec * vDec))).as("d_sq"))
    val cur = view.read.select(
      keyCols.map(col) :+ col("n").as("v_n") :+
        col("sum_value").as("v_sum") :+ col("sum_sq").as("v_sq"): _*)
    // merge addition via the shared guarded (37,8) discipline — see
    // narrow37_8/addSumSq at the top of this object
    val changed = delta.join(cur, keyCols, "left")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("v_n"), lit(0L)) + col("d_n")).as("n"),
        (coalesce(col("v_sum"), zero30_4) + coalesce(col("d_sum"), zero30_4))
          .cast("decimal(30,4)").as("sum_value"),
        addSumSq(col("v_sq"), col("d_sq")).as("sum_sq")): _*)
      .localCheckpoint(true)
    view.upsertWithDelete(changed, col("n") <= 0L)
    syncedTo
  }

  // ---- FUSED STATS views (one feed pass, every aggregate) ----
  //
  // A dashboard view usually wants ALL of (count, sum, min, max,
  // variance) per group. Running the sum, min/max, and moments
  // maintainers separately costs three reads of the change feed and
  // three view merges; the fused maintainer reads the feed ONCE
  // (checkpointed, shared by both delta aggregations) and publishes
  // ONE merge. The two aggregations cannot fuse further because they
  // need different event treatments, both round-10 lessons:
  //  - extrema must read the NETTED per-(group, value) weights (the
  //    feed is an event log; a value inserted then deleted in the span
  //    is a phantom that must not tighten an extremum);
  //  - Σv² must come from RAW events signed by NEGATION — any Σ(v²·w)
  //    formulation multiplies decimal(37,8) by a LONG, overflows to
  //    precision 58, and Spark truncates the scale to 6, destroying
  //    sub-1e-6 squares. Netting cannot serve the moments.
  // Both delta frames are feed-sized; the worst-case base touch is the
  // min/max maintainers' threatened-group rescan, unchanged.

  /** Full per-group stats state — (count, Σv, min, max, Σv²) — the
    * union of [[minMaxView]] and [[momentsView]] in one aggregate;
    * mean/variance/stddev derive in closed form at read time from the
    * exact decimal state. */
  def statsView(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val vDec = col(valueCol).cast("decimal(18,4)")
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(vDec).cast("decimal(30,4)").as("sum_value"),
      min(vDec).as("min_value"),
      max(vDec).as("max_value"),
      sum(vDec * vDec).cast("decimal(38,8)").as("sum_sq"))
  }

  /** Maintain a [[statsView]] from ONE read of the change feed: the
    * raw signed events feed the moment deltas, the netted weights feed
    * the extrema, threatened groups rescan exactly as in
    * [[maintainMinMaxView]], and everything lands in one atomic
    * MERGE-with-DELETE. Returns the synced base version. */
  def maintainStatsView(base: LakeTable, view: LakeTable,
      keyCols: Seq[String], valueCol: String, sinceVersion: Int,
      meta: Map[String, String] = Map.empty): Int = {
    val syncedTo = base.version
    applyStatsDelta(base.changesSince(sinceVersion), base.read, view,
      keyCols, valueCol, meta)
    syncedTo
  }

  /** Apply ONE change-event frame to a stored stats view against the
    * current base snapshot — the whole [[maintainStatsView]] rule,
    * factored out (like [[applyMinMaxDelta]]) so the streaming
    * subscriber applies identical semantics per micro-batch with its
    * exactly-once `meta` marker riding the same commit. */
  private[graft] def applyStatsDelta(events: DataFrame, baseNow: DataFrame,
      view: LakeTable, keyCols: Seq[String], valueCol: String,
      meta: Map[String, String] = Map.empty): Unit = {
    val keys = keyCols.map(col)
    val vDec = col(valueCol).cast("decimal(18,4)")
    val isIns = col("_change_type").isin("insert", "update_postimage")
    // one feed read, checkpointed, shared by both delta aggregations
    val ch = events
      .select(keys :+ vDec.as("__v") :+ isIns.as("__ins"): _*)
      .localCheckpoint(true)
    val mom = ch.groupBy(keys: _*).agg(
      sum(when(col("__ins"), 1L).otherwise(-1L)).as("d_n"),
      sum(when(col("__ins"), col("__v")).otherwise(-col("__v"))).as("d_sum"),
      sum(when(col("__ins"), col("__v") * col("__v"))
        .otherwise(-(col("__v") * col("__v")))).as("d_sq"))
    val net = ch.groupBy(keys :+ col("__v"): _*)
      .agg(sum(when(col("__ins"), 1L).otherwise(-1L)).as("w"))
      .filter(col("w") =!= 0L)
    val ext = net.groupBy(keys: _*).agg(
      min(when(col("w") > 0, col("__v"))).as("ins_min"),
      max(when(col("w") > 0, col("__v"))).as("ins_max"),
      min(when(col("w") < 0, col("__v"))).as("del_min"),
      max(when(col("w") < 0, col("__v"))).as("del_max"))
    // all-cancelled groups are absent from ext (w=0 everywhere): the
    // left join leaves their ins_*/del_* null — no tighten, no threat
    val delta = mom.join(ext, keyCols, "left")
    val cur = view.read.select(
      keys :+ col("n").as("v_n") :+ col("sum_value").as("v_sum") :+
        col("min_value").as("v_min") :+ col("max_value").as("v_max") :+
        col("sum_sq").as("v_sq"): _*)
    val newN = coalesce(col("v_n"), lit(0L)) + col("d_n")
    val threatened: Column = col("v_n").isNotNull && newN > 0 &&
      ((col("del_min") <= col("v_min")) || (col("del_max") >= col("v_max")))
    val joined = delta.join(cur, keyCols, "left")
      .withColumn("n", newN)
      .withColumn("sum_value",
        (coalesce(col("v_sum"), zero30_4) + coalesce(col("d_sum"), zero30_4))
          .cast("decimal(30,4)"))
      .withColumn("sum_sq", addSumSq(col("v_sq"), col("d_sq")))
      .withColumn("__rescan", threatened)
      .localCheckpoint(true) // rescan-key probe AND merge
    val rescanKeys = joined.filter(col("__rescan")).select(keys: _*)
    val hint = sizeHint(rescanKeys)
    val rescanned = baseNow
      .join(hint(rescanKeys), keyCols, "left_semi")
      .groupBy(keys: _*)
      .agg(min(vDec).as("r_min"), max(vDec).as("r_max"))
      .withColumn("__rescanned", lit(true))
    val changed = joined.join(hint(rescanned), keyCols, "left")
      .select(keys ++ Seq(col("n"), col("sum_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_min"))
          .otherwise(least(col("v_min"), col("ins_min"))).as("min_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_max"))
          .otherwise(greatest(col("v_max"), col("ins_max"))).as("max_value"),
        col("sum_sq")): _*)
    view.upsertWithDelete(changed, col("n") <= 0L, meta = meta)
  }

  // ---- COUNT DISTINCT views (two-level / support-relation IVM) ----
  //
  // An exact distinct count is not self-maintainable from the top view
  // alone (deleting a value only changes the count if it was the LAST
  // instance — which only per-value multiplicities know). The classic
  // resolution, as in production IVM engines: maintain an auxiliary
  // SUPPORT relation of per-(group, value) row counts — itself an
  // ordinary self-maintainable count view — and derive the top view's
  // delta from its 0↔positive transitions. Both levels stay O(changes);
  // nothing ever rescans the base. Groups tracked are those with at
  // least one NON-NULL value (count-distinct semantics skip nulls, and
  // an all-null group has no support rows to witness its existence).

  /** Initial top view: per-group exact distinct count of `valueCol`
    * (null values skipped; all-null groups absent). */
  def distinctView(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("n_distinct"))

  /** Initial support relation: per-(group, value) multiplicities. Store
    * in a LakeTable whose mergeKeys are `keyCols :+ "__v"`. */
  def supportView(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col) :+ col(valueCol).as("__v"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Maintain BOTH levels from the base's changes since `sinceVersion`:
    * value-level count deltas update the support relation; its
    * 0↔positive transitions (±1 per (group, value)) roll up into the
    * top view's distinct-count delta. Returns the synced base version. */
  def maintainDistinctView(base: LakeTable, aux: LakeTable, view: LakeTable,
      keyCols: Seq[String], valueCol: String, sinceVersion: Int): Int = {
    val syncedTo = base.version
    val spanId = s"v$sinceVersion:v$syncedTo"
    if (view.exists && view.meta.get(SpanKey).contains(spanId))
      return syncedTo
    // same two-commit exactly-once as [[applyFullStatsDelta]]: the aux
    // merge is additive, so the crash window between the commits must
    // recover pre-merge counts as stored − d_n instead of re-applying
    val auxApplied = aux.exists && aux.meta.get(AuxSpanKey).contains(spanId)
    val keys = keyCols.map(col)
    val ch = base.changesSince(sinceVersion).filter(col(valueCol).isNotNull)
    val isIns = col("_change_type").isin("insert", "update_postimage")
    val delta = ch.groupBy(keys :+ col(valueCol).as("__v"): _*)
      .agg(sum(when(isIns, 1L).otherwise(-1L)).as("d_n"))
    val curAux = aux.read.select(keys :+ col("__v") :+ col("cnt").as("v_cnt"): _*)
    def alive(c: Column): Column = when(c > 0, 1L).otherwise(0L)
    val oldCnt =
      if (auxApplied) coalesce(col("v_cnt"), lit(0L)) - col("d_n")
      else coalesce(col("v_cnt"), lit(0L))
    val newCnt = oldCnt + col("d_n")
    val changedAux = delta.join(curAux, keyCols :+ "__v", "left")
      .select(keys ++ Seq(col("__v"), newCnt.as("cnt"),
        (alive(newCnt) - alive(oldCnt)).as("__tr")): _*)
      .localCheckpoint(true) // one computation: aux merge + rollup
    if (!auxApplied) aux.upsertWithDelete(changedAux.drop("__tr"),
      col("cnt") <= 0L, meta = Map(AuxSpanKey -> spanId))
    // top-view delta = sum of transitions per group; untouched groups
    // (d_d = 0) never enter the merge
    val dDist = changedAux.groupBy(keys: _*).agg(sum("__tr").as("d_d"))
      .filter(col("d_d") =!= 0L)
    val curView = view.read.select(keys :+ col("n_distinct").as("v_d"): _*)
    val changedView = dDist.join(curView, keyCols, "left")
      .select(keys :+
        (coalesce(col("v_d"), lit(0L)) + col("d_d")).as("n_distinct"): _*)
      .localCheckpoint(true)
    view.upsertWithDelete(changedView, col("n_distinct") <= 0L,
      meta = Map(SpanKey -> spanId))
    syncedTo
  }

  // ---- FULL stats views (aux-backed: no base rescan, ever) ----
  //
  // The support relation that makes COUNT DISTINCT maintainable also
  // solves min/max's one weakness: it IS the group's surviving value
  // multiset, so when a delete threatens a stored extremum the
  // runner-up comes from the AUX SLICE of the threatened groups — a
  // semi-join against a table of per-(group, value) multiplicities —
  // and the BASE IS NEVER TOUCHED. At 100 TB that upgrades the worst
  // case from "rescan the threatened groups' base partitions" to
  // "read a few aux rows": maintenance cost is O(changes) + O(aux
  // slice) unconditionally. The price is keeping the aux (size =
  // distinct (group, value) pairs, typically orders of magnitude
  // below the base; co-partitioned by its merge keys) in every write
  // window. One feed read maintains aux and view; extrema, distinct
  // count, and moments all ride the same two merges.

  /** Top view: (n, n_nonnull, Σv, Σv², min, max, n_distinct) per group.
    * `n`/Σ count every row; extrema and the distinct count skip null
    * values (SQL semantics); an all-null group shows n>0,
    * n_nonnull = n_distinct = 0, null extrema. `n_nonnull` — the count
    * of non-null values in the view's exact decimal space — is what
    * lets the MV rewrite serve `avg()` and `count(col)` correctly on
    * null-bearing groups (Average's count buffer counts NON-NULL
    * values, so `n` cannot stand in for it); it maintains by the same
    * signed delta rule as `n`, restricted to non-null-value events. */
  def fullStatsView(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val vDec = col(valueCol).cast("decimal(18,4)")
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      count(vDec).as("n_nonnull"),
      sum(vDec).cast("decimal(30,4)").as("sum_value"),
      min(vDec).as("min_value"),
      max(vDec).as("max_value"),
      sum(vDec * vDec).cast("decimal(38,8)").as("sum_sq"),
      countDistinct(vDec).as("n_distinct"))
  }

  /** Support relation for a [[fullStatsView]]: per-(group, DECIMAL
    * value) multiplicities — [[supportView]] over the same (18,4)
    * value space the view aggregates in, so aux-derived extrema
    * compare bit-for-bit. Store with mergeKeys `keyCols :+ "__v"`.
    *
    * `buckets > 0` adds a `__b` hash-bucket column over the GROUP keys
    * — create the aux LakeTable with `partitionCols = Seq("__b")` and
    * pass the same count to [[maintainFullStatsView]]. The aux is the
    * one IVM structure whose size tracks the base (distinct (group,
    * value) pairs), so at scale its per-batch merge must not be a
    * full rewrite: bucketing turns every aux read AND the pruned
    * merge into O(touched buckets), and a batch touching k groups
    * touches ≤ k buckets. Unbucketed (the default) is fine while the
    * aux comfortably fits a single rewrite. */
  def fullStatsSupportView(df: DataFrame, keyCols: Seq[String],
      valueCol: String, buckets: Int = 0): DataFrame = {
    val vDec = col(valueCol).cast("decimal(18,4)")
    val grouped = df.filter(vDec.isNotNull)
      .groupBy(keyCols.map(col) :+ vDec.as("__v"): _*)
      .agg(count(lit(1)).as("cnt"))
    if (buckets <= 0) grouped
    else grouped.withColumn("__b", bucketOf(keyCols, buckets))
  }

  /** Frozen aux bucket-modulus meta key — same rule as DocBuckets'
    * `docbuckets.parts` and the index families' layout keys: the
    * presence check in [[applyFullStatsDelta]] detects bucketed vs
    * unbucketed but is provably blind to a MODULUS change (stored
    * pmod(h,16) < 8 implies pmod(h,8) equals it for half the keys and
    * the `__b IN (...)` value filter silently drops the rest's current
    * counts — corrupting newCnt, not failing). Freeze at create via
    * [[createFullStatsAux]]; the maintainer validates and retro-freezes
    * legacy keyless auxes at their first merge. */
  val AuxBucketsKey = "ivm.aux_buckets"

  /** Create the aux table for [[maintainFullStatsView]] with the bucket
    * modulus frozen ATOMICALLY into the create commit (LakeTable.create
    * meta doc — create-then-annotate would leave a crash window where
    * the guard's absent-key tolerance accepts a mismatched maintainer). */
  def createFullStatsAux(aux: LakeTable, df: DataFrame,
      keyCols: Seq[String], valueCol: String, buckets: Int = 0): Unit =
    aux.create(fullStatsSupportView(df, keyCols, valueCol, buckets),
      Map(AuxBucketsKey -> buckets.toString))

  /** Deterministic group-key hash bucket (aux partitioning). INT-typed
    * like every other layout stamp (DocBuckets.bucket doc): non-empty
    * partitioned reads infer the directory column as int, so the
    * stamped type must match what a schema-applied read would flip. */
  private def bucketOf(keyCols: Seq[String], buckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets.toLong)).cast("int")

  /** Span markers making the TWO-COMMIT maintainers exactly-once under
    * crash replay: the aux merge is ADDITIVE, so without them a crash
    * between the aux and view commits re-applies the aux on retry and
    * the support counts drift silently. The aux records the span it
    * last absorbed (marker rides ITS commit); the view's marker rides
    * the FINAL commit. Replaying a span then hits one of three states —
    * view marker present (fully applied → no-op), aux marker present
    * (aux landed, view didn't → recover the PRE-MERGE aux counts as
    * `stored − w` and apply only the view merge), neither (normal). */
  val SpanKey = "ivm_span"
  val AuxSpanKey = "ivm_aux_span"

  /** Maintain aux AND view from one read of the change feed. Returns
    * the synced base version. Never reads the base: threatened extrema
    * re-derive from the post-merge aux slice, and because the aux is a
    * COMPLETE multiset, a threatened group with no surviving non-null
    * values correctly lands null extrema (no "rescanned?" marker
    * needed, unlike the base-rescan maintainers).
    *
    * `auxBuckets` MUST match the count the aux was created with
    * ([[fullStatsSupportView]]'s `buckets`; 0 = unbucketed). With a
    * bucketed aux, every aux read carries an IN-list over the delta's
    * (bounded, collected) bucket set — partition-pruned at the scan —
    * and the aux merge rewrites only touched bucket partitions, so
    * maintenance cost is O(changes + touched aux buckets) even when
    * the aux itself tracks the base's size.
    *
    * Crash-replay contract (the span markers above): RE-RUNNING the
    * SAME span converges exactly — including the crash window between
    * the aux and view commits, which double-applied the aux before
    * round 13. The marker keys the (sinceVersion, syncedTo) span, so
    * the guarantee requires retrying the crashed span BEFORE new base
    * writes widen it — the same single-writer discipline the table
    * layer already assumes. */
  def maintainFullStatsView(base: LakeTable, aux: LakeTable,
      view: LakeTable, keyCols: Seq[String], valueCol: String,
      sinceVersion: Int, auxBuckets: Int = 0,
      meta: Map[String, String] = Map.empty): Int = {
    val syncedTo = base.version
    applyFullStatsDelta(base.changesSince(sinceVersion), aux, view,
      keyCols, valueCol, auxBuckets,
      spanId = s"v$sinceVersion:v$syncedTo", meta = meta)
    syncedTo
  }

  /** Apply ONE change-event frame to a stored full-stats view+aux pair —
    * the whole [[maintainFullStatsView]] rule factored out (the
    * [[applyStatsDelta]] pattern) so the streaming CDC subscriber
    * applies identical semantics per micro-batch. `spanId` identifies
    * the event set for the exactly-once markers (batch: the version
    * span; streaming: the micro-batch id); `meta` rides the final
    * (view) commit. */
  private[graft] def applyFullStatsDelta(events: DataFrame,
      aux: LakeTable, view: LakeTable, keyCols: Seq[String],
      valueCol: String, auxBuckets: Int, spanId: String,
      meta: Map[String, String] = Map.empty): Unit = {
    if (view.exists && view.meta.get(SpanKey).contains(spanId)) return
    val auxApplied = aux.exists && aux.meta.get(AuxSpanKey).contains(spanId)
    val keys = keyCols.map(col)
    val vDec = col(valueCol).cast("decimal(18,4)")
    val isIns = col("_change_type").isin("insert", "update_postimage")
    // frozen-modulus check first (AuxBucketsKey doc): the presence
    // check below survives only as the legacy fallback for auxes
    // created before the key existed — it can't tell buckets=8 from 16
    val storedB = if (aux.exists) aux.meta.get(AuxBucketsKey) else None
    require(storedB.forall(_ == auxBuckets.toString),
      s"auxBuckets=$auxBuckets but the aux table was created with " +
        s"${storedB.getOrElse("<unknown>")} — the bucket-pruned aux " +
        "reads would silently drop current counts and corrupt the view")
    require(storedB.isDefined ||
      (auxBuckets > 0) == aux.read.columns.contains("__b"),
      s"auxBuckets=$auxBuckets disagrees with the aux table's layout " +
        "(created with a different fullStatsSupportView buckets value?)")
    val ch = events
      .select(keys :+ vDec.as("__v") :+ isIns.as("__ins"): _*)
      .localCheckpoint(true) // one feed read feeds both aggregations
    // top-level moment deltas over ALL rows (null values count in n;
    // n_nonnull's delta restricts the same ±1 rule to non-null values)
    val mom = ch.groupBy(keys: _*).agg(
      sum(when(col("__ins"), 1L).otherwise(-1L)).as("d_n"),
      sum(when(col("__v").isNotNull,
        when(col("__ins"), 1L).otherwise(-1L)).otherwise(0L)).as("d_nn"),
      sum(when(col("__ins"), col("__v")).otherwise(-col("__v"))).as("d_sum"),
      sum(when(col("__ins"), col("__v") * col("__v"))
        .otherwise(-(col("__v") * col("__v")))).as("d_sq"))
    // netted non-null multiplicity deltas → aux merge + transitions
    val net = ch.filter(col("__v").isNotNull)
      .groupBy(keys :+ col("__v"): _*)
      .agg(sum(when(col("__ins"), 1L).otherwise(-1L)).as("w"))
      .filter(col("w") =!= 0L)
    // bucketed aux: restrict every aux read to the delta's bucket set
    // (collected once, ≤ auxBuckets values) so partition pruning
    // reaches the scan
    def auxSlice(of: DataFrame): DataFrame =
      if (auxBuckets <= 0) aux.read
      else {
        val bs = of.select(bucketOf(keyCols, auxBuckets).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        aux.read.filter(col("__b").isin(bs: _*))
      }
    val curAux = auxSlice(net)
      .select(keys :+ col("__v") :+ col("cnt").as("v_cnt"): _*)
    def alive(c: Column): Column = when(c > 0, 1L).otherwise(0L)
    // crash-replay recovery: when THIS span's aux merge already landed
    // (marker match), the stored count is post-merge — recover the
    // pre-merge count as stored − w (a row the merge deleted reads back
    // as NULL → 0, and 0 − w recovers its pre-merge count exactly), so
    // the view delta derives from the SAME transitions as the original
    // run and the aux is not merged a second time
    val oldCnt =
      if (auxApplied) coalesce(col("v_cnt"), lit(0L)) - col("w")
      else coalesce(col("v_cnt"), lit(0L))
    val newCnt = oldCnt + col("w")
    val changedAux = net.join(curAux, keyCols :+ "__v", "left")
      .select(keys ++ Seq(col("__v"), col("w"), newCnt.as("cnt"),
        (alive(newCnt) - alive(oldCnt)).as("__tr")): _*)
      .localCheckpoint(true) // aux merge + extrema deltas + rollup
    val auxMerge = changedAux.select(keys :+ col("__v") :+ col("cnt"): _*)
    // the frozen modulus rides the merge like the span marker: a legacy
    // keyless aux retro-freezes at its first maintain, and any later
    // mismatched maintainer fails the check above instead of corrupting
    if (!auxApplied) aux.upsertWithDelete(
      if (auxBuckets <= 0) auxMerge
      else auxMerge.withColumn("__b", bucketOf(keyCols, auxBuckets)),
      col("cnt") <= 0L, meta = Map(AuxSpanKey -> spanId,
        AuxBucketsKey -> auxBuckets.toString))
    val ext = changedAux.groupBy(keys: _*).agg(
      min(when(col("w") > 0, col("__v"))).as("ins_min"),
      max(when(col("w") > 0, col("__v"))).as("ins_max"),
      min(when(col("w") < 0, col("__v"))).as("del_min"),
      max(when(col("w") < 0, col("__v"))).as("del_max"),
      sum(col("__tr")).as("d_d"))
    val delta = mom.join(ext, keyCols, "left")
    val cur = view.read.select(
      keys :+ col("n").as("v_n") :+ col("n_nonnull").as("v_nn") :+
        col("sum_value").as("v_sum") :+
        col("min_value").as("v_min") :+ col("max_value").as("v_max") :+
        col("sum_sq").as("v_sq") :+ col("n_distinct").as("v_d"): _*)
    val newN = coalesce(col("v_n"), lit(0L)) + col("d_n")
    val threatened: Column = col("v_n").isNotNull && newN > 0 &&
      ((col("del_min") <= col("v_min")) || (col("del_max") >= col("v_max")))
    val joined = delta.join(cur, keyCols, "left")
      .withColumn("n", newN)
      .withColumn("n_nonnull",
        coalesce(col("v_nn"), lit(0L)) + coalesce(col("d_nn"), lit(0L)))
      .withColumn("sum_value",
        (coalesce(col("v_sum"), zero30_4) + coalesce(col("d_sum"), zero30_4))
          .cast("decimal(30,4)"))
      .withColumn("sum_sq", addSumSq(col("v_sq"), col("d_sq")))
      .withColumn("n_distinct",
        coalesce(col("v_d"), lit(0L)) + coalesce(col("d_d"), lit(0L)))
      .withColumn("__rescan", threatened)
      .localCheckpoint(true) // rescan-key probe AND merge
    val rescanKeys = joined.filter(col("__rescan")).select(keys: _*)
    val hint = sizeHint(rescanKeys)
    // the aux-answered "rescan": post-merge aux slice (bucket-pruned
    // when the aux is bucketed), never the base
    val rescanned = auxSlice(rescanKeys)
      .join(hint(rescanKeys), keyCols, "left_semi")
      .groupBy(keys: _*)
      .agg(min(col("__v")).as("r_min"), max(col("__v")).as("r_max"))
    // SQL SUM/aggregate-over-no-rows semantics: a surviving group whose
    // non-null values are ALL deleted (only null-valued rows remain)
    // must report NULL sums, not the delta rule's arithmetic 0 — and
    // n_distinct = 0 is exactly that signal, for free from the aux.
    // (The single-column sum/moments maintainers lack the signal and
    // keep 0 in this corner; documented there.)
    val hasVals = col("n_distinct") > 0L
    val changed = joined.join(hint(rescanned), keyCols, "left")
      .select(keys ++ Seq(col("n"), col("n_nonnull"),
        when(hasVals, col("sum_value")).as("sum_value"),
        when(col("__rescan"), col("r_min"))
          .otherwise(least(col("v_min"), col("ins_min"))).as("min_value"),
        when(col("__rescan"), col("r_max"))
          .otherwise(greatest(col("v_max"), col("ins_max"))).as("max_value"),
        when(hasVals, col("sum_sq")).as("sum_sq"),
        col("n_distinct")): _*)
    view.upsertWithDelete(changed, col("n") <= 0L,
      meta = meta + (SpanKey -> spanId))
  }

  // ---- JOIN views (two-table delta rule) ----
  //
  // V = γ_groupKeys(count, sum(value)) over fact ⋈_joinKeys dim — the
  // enriched-aggregate every dashboard actually wants ("revenue by
  // customer segment"), where the group attribute lives on the
  // dimension. With F1 = F0 + dF and D1 = D0 + dD as signed bags, the
  // exact identity
  //
  //   Δ(F ⋈ D) = dF ⋈ D1  +  F1 ⋈ dD  −  dF ⋈ dD
  //
  // uses only the CURRENT snapshots plus the two change feeds — no
  // time travel, so maintenance keeps working after retention has
  // pruned the pre-batch snapshots (the trap a readVersion-based
  // formulation walks into). Cost shape: dF⋈D1 is a delta-sized probe
  // of the dim; F1⋈dD is the honest price of dimension churn — a fact
  // scan RESTRICTED to the changed join keys (broadcast semi-join
  // first, so partition/zone-map pruning applies and only matching
  // rows ever shuffle); dF⋈dD is delta×delta. A quiet dim — the
  // common case — costs O(|dF|) total. The identity also nets out the
  // subtle same-window interactions (fact insert + dim delete of its
  // key, dim attribute move re-homing freshly inserted facts), which
  // IncrementalViewSpec pins case by case.

  /** Full enriched aggregate — the join view's initial state and the
    * recomputation maintenance must stay equal to. `groupKeys` may
    * come from either side; `valueCol` lives on the fact. */
  def joinSumView(fact: DataFrame, dim: DataFrame, joinKeys: Seq[String],
      groupKeys: Seq[String], valueCol: String): DataFrame =
    fact.join(dim, joinKeys).groupBy(groupKeys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("decimal(20,4)"))
        .cast("decimal(30,4)").as("sum_value"))

  /** Per-side projections for a join view: each group key must be
    * resolvable from exactly one side post-join; keys present on both
    * sides (e.g. a join key) resolve via the fact. */
  private def joinSides(factNow: DataFrame, dimNow: DataFrame,
      joinKeys: Seq[String], groupKeys: Seq[String],
      valueCol: String): (Seq[String], Seq[String]) = {
    val factSide = factNow.columns.toSet
    val dGroup = groupKeys.filterNot(factSide)
    require(dGroup.forall(dimNow.columns.contains),
      s"group keys ${dGroup.filterNot(dimNow.columns.contains)} in neither table")
    val fGroup = groupKeys.filter(factSide)
    ((joinKeys ++ fGroup :+ valueCol).distinct, (joinKeys ++ dGroup).distinct)
  }

  /** The three delta terms of Δ(F⋈D) = dF⋈D₁ + F₁⋈dD − dF⋈dD as one
    * signed row frame (groupKeys…, __v, __w) — shared by the sum and
    * min/max join maintainers. A quiet side is ROUTINE in the
    * two-table case (most windows touch only the fact): its delta is
    * the empty change set, not an error. */
  private def joinDeltaRows(factT: LakeTable, dimT: LakeTable,
      joinKeys: Seq[String], groupKeys: Seq[String], valueCol: String,
      factSince: Int, dimSince: Int): DataFrame = {
    val factNow = factT.read
    val dimNow = dimT.read
    val (factProj, dimProj) =
      joinSides(factNow, dimNow, joinKeys, groupKeys, valueCol)
    val w = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val vDec = col(valueCol).cast("decimal(20,4)")
    val out = groupKeys.map(col) :+ vDec.as("__v") :+ col("__w")
    def changes(t: LakeTable, since: Int): DataFrame =
      if (since >= t.version)
        t.read.limit(0).withColumn("_change_type", lit("insert"))
      else t.changesSince(since)
    val dF = changes(factT, factSince).withColumn("__w", w)
    val dD = changes(dimT, dimSince)
      .select((dimProj.map(col) :+ w.as("__w")): _*)
    val p1 = dF.join(dimNow.select(dimProj.map(col): _*), joinKeys)
      .select(out: _*)
    // changed-dim keys: broadcast while measured-small (the designed,
    // bounded-churn case — the fact scan then prunes before any
    // shuffle); a pathological full-dim re-homing degrades to a shuffle
    // semi-join instead of OOMing the driver
    val dDKeys = dD.select(joinKeys.map(col): _*).distinct()
    val p2 = factNow.select(factProj.map(col): _*)
      .join(broadcastIfSmall(dDKeys), joinKeys, "left_semi")
      .join(dD, joinKeys)
      .select(out: _*)
    val p3 = dF.select((factProj.map(col) :+ col("__w").as("__wf")): _*)
      .join(dD.withColumnRenamed("__w", "__wd"), joinKeys)
      .select(groupKeys.map(col) :+ vDec.as("__v") :+
        (-col("__wf") * col("__wd")).as("__w"): _*)
    p1.unionByName(p2).unionByName(p3)
  }

  /** Maintain a [[joinSumView]] from BOTH base tables' changes since
    * their respective synced versions. Returns the (fact, dim) versions
    * the view is now synced to — record and pass them next time. */
  /** `meta` entries commit atomically WITH the view merge (the
    * exactly-once hook the two-feed streaming drain records its synced
    * versions through). */
  def maintainJoinSumView(factT: LakeTable, dimT: LakeTable, view: LakeTable,
      joinKeys: Seq[String], groupKeys: Seq[String], valueCol: String,
      factSince: Int, dimSince: Int,
      meta: Map[String, String] = Map.empty): (Int, Int) = {
    val syncedTo = (factT.version, dimT.version)
    val delta = joinDeltaRows(factT, dimT, joinKeys, groupKeys, valueCol,
        factSince, dimSince)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("__w")).as("d_n"),
        sum(col("__v") * col("__w")).as("d_sum"))
      // net-zero groups (e.g. an update that changed nothing the view
      // sees) never enter the merge
      .filter(col("d_n") =!= 0L ||
        coalesce(col("d_sum"), lit(0).cast("decimal(30,4)")) =!= lit(0).cast("decimal(30,4)"))
    mergeSumDelta(view, groupKeys, delta, meta)
    syncedTo
  }

  /** [[joinSumView]] extended with per-group min/max of the fact value
    * (same exact DECIMAL(20,4) space as [[minMaxView]]). */
  def joinMinMaxView(fact: DataFrame, dim: DataFrame, joinKeys: Seq[String],
      groupKeys: Seq[String], valueCol: String): DataFrame = {
    val vDec = col(valueCol).cast("decimal(20,4)")
    fact.join(dim, joinKeys).groupBy(groupKeys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(vDec).cast("decimal(30,4)").as("sum_value"),
      min(vDec).as("min_value"),
      max(vDec).as("max_value"))
  }

  /** Maintain a [[joinMinMaxView]]. Count/sum by the join delta rule;
    * min/max need one extra step the sum view doesn't: the signed
    * terms can CANCEL within a window (fact insert + dim delete of its
    * key nets to zero), so extrema must read the NET per-(group,
    * value) weights — a raw positive term is not proof the value
    * exists afterward. Net w>0 values tighten extrema (the group's
    * count of that value strictly increased, so it exists); net w<0
    * values tying the stored extremum threaten it, and ONLY those
    * groups rescan — THROUGH the join, with the dim first reduced to
    * the threatened group slice (broadcast) so the fact side joins a
    * shrunken build. Same caveat class as [[maintainMinMaxView]]'s
    * rescan: the common batch touches no base data. */
  def maintainJoinMinMaxView(factT: LakeTable, dimT: LakeTable,
      view: LakeTable, joinKeys: Seq[String], groupKeys: Seq[String],
      valueCol: String, factSince: Int, dimSince: Int,
      meta: Map[String, String] = Map.empty): (Int, Int) = {
    val syncedTo = (factT.version, dimT.version)
    applyJoinMinMaxRows(
      joinDeltaRows(factT, dimT, joinKeys, groupKeys, valueCol,
        factSince, dimSince),
      factT.read, dimT.read, view, joinKeys, groupKeys, valueCol, meta)
    syncedTo
  }

  /** Apply ONE signed delta-row frame (groupKeys…, `__v` decimal(20,4),
    * `__w` ±long) to a stored join min/max view against the CURRENT
    * fact/dim snapshots — the whole [[maintainJoinMinMaxView]] rule
    * factored out (the [[applyStatsDelta]] pattern) so the streaming
    * CDC subscriber applies identical semantics per micro-batch, with
    * its exactly-once `meta` marker riding the same atomic
    * merge-with-extinction commit. */
  private[graft] def applyJoinMinMaxRows(rows: DataFrame,
      factNow: DataFrame, dimNow: DataFrame, view: LakeTable,
      joinKeys: Seq[String], groupKeys: Seq[String], valueCol: String,
      meta: Map[String, String] = Map.empty): Unit = {
    val keys = groupKeys.map(col)
    val net = rows
      .groupBy(keys :+ col("__v"): _*)
      .agg(sum(col("__w")).as("w"))
      .filter(col("w") =!= 0L)
    val delta = net.groupBy(keys: _*).agg(
      sum(col("w")).as("d_n"),
      sum(col("__v") * col("w")).as("d_sum"),
      min(when(col("w") > 0, col("__v"))).as("ins_min"),
      max(when(col("w") > 0, col("__v"))).as("ins_max"),
      min(when(col("w") < 0, col("__v"))).as("del_min"),
      max(when(col("w") < 0, col("__v"))).as("del_max"))
    val cur = view.read.select(
      keys :+ col("n").as("v_n") :+ col("sum_value").as("v_sum") :+
        col("min_value").as("v_min") :+ col("max_value").as("v_max"): _*)
    val newN = coalesce(col("v_n"), lit(0L)) + col("d_n")
    val threatened: Column = col("v_n").isNotNull && newN > 0 &&
      ((col("del_min") <= col("v_min")) || (col("del_max") >= col("v_max")))
    val joined = delta.join(cur, groupKeys, "left")
      .withColumn("n", newN)
      .withColumn("sum_value",
        (coalesce(col("v_sum"), zero30_4) + coalesce(col("d_sum"), zero30_4))
          .cast("decimal(30,4)"))
      .withColumn("__rescan", threatened)
      .localCheckpoint(true) // rescan-key probe AND merge
    val rescanKeys = joined.filter(col("__rescan")).select(keys: _*)
    val (factProj, dimProj) =
      joinSides(factNow, dimNow, joinKeys, groupKeys, valueCol)
    // ONE bounded count over the checkpointed frame decides the hint for
    // the key set and the (≤ one row per key) rescan result; the dim
    // build — full dim when group keys live on the fact, threatened-
    // groups slice otherwise (whose cardinality is NOT bounded by the
    // key count: one threatened segment can hold millions of dim rows)
    // — gets its own measured gate. A delete storm touching every
    // extremum degrades every side to a shuffle semi-join instead of
    // OOMing the driver.
    val hint = sizeHint(rescanKeys)
    val dimSideKeys = groupKeys.filter(dimProj.contains)
    val dimR = broadcastIfSmall(
      if (dimSideKeys.isEmpty) dimNow.select(dimProj.map(col): _*)
      else dimNow.select(dimProj.map(col): _*).join(
        hint(rescanKeys.select(dimSideKeys.map(col): _*).distinct()),
        dimSideKeys, "left_semi"))
    val vDec = col(valueCol).cast("decimal(20,4)")
    val rescanned = factNow.select(factProj.map(col): _*)
      .join(dimR, joinKeys)
      .join(hint(rescanKeys), groupKeys, "left_semi")
      .groupBy(keys: _*)
      .agg(min(vDec).as("r_min"), max(vDec).as("r_max"))
      .withColumn("__rescanned", lit(true))
    val changed = joined.join(hint(rescanned), groupKeys, "left")
      .select(keys ++ Seq(col("n"), col("sum_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_min"))
          .otherwise(least(col("v_min"), col("ins_min"))).as("min_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_max"))
          .otherwise(greatest(col("v_max"), col("ins_max"))).as("max_value")): _*)
    view.upsertWithDelete(changed, col("n") <= 0L, meta = meta)
  }
}
