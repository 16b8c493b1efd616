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
      valueCol: String, sinceVersion: Int): Int = {
    val syncedTo = base.version
    val ch = base.changesSince(sinceVersion)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = ch.groupBy(keyCols.map(col): _*).agg(
      sum(sign).as("d_n"),
      sum(col(valueCol).cast("decimal(20,4)") * sign).as("d_sum"))
    mergeSumDelta(view, keyCols, delta)
    syncedTo
  }

  /** Apply a (d_n, d_sum) per-group delta frame to a stored sum view:
    * left join against current rows → MERGE only the changed keys →
    * drop zero-count groups. Groups whose last member was deleted go
    * through a table-level condition delete (no driver-side key list);
    * the probe on the SMALL changed frame skips the view rewrite
    * entirely in the common no-extinction batch, keeping maintenance
    * O(changes). */
  private def mergeSumDelta(view: LakeTable, keyCols: Seq[String],
      delta: DataFrame): Unit = {
    val cur = view.read.select(
      keyCols.map(col) :+ col("n").as("v_n") :+
        col("sum_value").as("v_sum"): _*)
    val changed = delta.join(cur, keyCols, "left")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("v_n"), lit(0L)) + col("d_n")).as("n"),
        (coalesce(col("v_sum"), lit(0).cast("decimal(30,4)")) + col("d_sum"))
          .cast("decimal(30,4)").as("sum_value")): _*)
      .localCheckpoint(true) // computed once: probed below AND merged
    view.upsert(changed)
    if (changed.filter(col("n") <= 0L).limit(1).count() > 0)
      view.delete(col("n") <= 0L)
  }

  /** [[maintainSumView]] for a [[minMaxView]]: count/sum by the exact
    * delta rule; min/max from insert-side extrema when safe, and a
    * per-group base rescan ONLY where a delete (or update pre-image)
    * removed a value tied with the group's current extremum — the one
    * case the delta cannot answer. Returns the synced base version. */
  def maintainMinMaxView(base: LakeTable, view: LakeTable,
      keyCols: Seq[String], valueCol: String, sinceVersion: Int): Int = {
    val syncedTo = base.version
    val keys = keyCols.map(col)
    val vDec = col(valueCol).cast("decimal(20,4)")
    val ch = base.changesSince(sinceVersion)
    val isIns = col("_change_type").isin("insert", "update_postimage")
    val delta = ch.groupBy(keys: _*).agg(
      sum(when(isIns, 1L).otherwise(-1L)).as("d_n"),
      sum(when(isIns, vDec).otherwise(-vDec)).as("d_sum"),
      min(when(isIns, vDec)).as("ins_min"),
      max(when(isIns, vDec)).as("ins_max"),
      min(when(!isIns, vDec)).as("del_min"),
      max(when(!isIns, vDec)).as("del_max"))
    val cur = view.read.select(
      keys :+ col("n").as("v_n") :+ col("sum_value").as("v_sum") :+
        col("min_value").as("v_min") :+ col("max_value").as("v_max"): _*)
    val newN = coalesce(col("v_n"), lit(0L)) + col("d_n")
    // an extremum is threatened only for a PRE-EXISTING, SURVIVING group
    // where some deleted value ties the stored extremum (a consistent
    // view can't have deletes beyond it; <=/>= also self-heals drift).
    // NULL values never participate in min/max, so null-row deletes
    // threaten nothing and the null-vs-null comparison correctly
    // evaluates to false here.
    val threatened: Column = col("v_n").isNotNull && newN > 0 &&
      ((col("del_min") <= col("v_min")) || (col("del_max") >= col("v_max")))
    val joined = delta.join(cur, keyCols, "left")
      .withColumn("n", newN)
      .withColumn("sum_value",
        (coalesce(col("v_sum"), lit(0).cast("decimal(30,4)")) + col("d_sum"))
          .cast("decimal(30,4)"))
      .withColumn("__rescan", threatened)
      .localCheckpoint(true) // computed once: rescan-key probe AND merge
    // base rescan for threatened groups only — broadcast the (usually
    // empty) key set so the scan side never shuffles, and mark rescanned
    // rows so a legitimately-NULL recomputed extremum (all remaining
    // values null) isn't mistaken for "not rescanned"
    val rescanKeys = joined.filter(col("__rescan")).select(keys: _*)
    val rescanned = base.read
      .join(broadcast(rescanKeys), keyCols, "left_semi")
      .groupBy(keys: _*)
      .agg(min(vDec).as("r_min"), max(vDec).as("r_max"))
      .withColumn("__rescanned", lit(true))
    // least/greatest skip NULLs (Spark semantics), which is exactly the
    // delta rule: no inserts => keep the stored extremum; new group =>
    // insert-side extremum alone
    val changed = joined.join(broadcast(rescanned), keyCols, "left")
      .select(keys ++ Seq(col("n"), col("sum_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_min"))
          .otherwise(least(col("v_min"), col("ins_min"))).as("min_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_max"))
          .otherwise(greatest(col("v_max"), col("ins_max"))).as("max_value")): _*)
    view.upsert(changed)
    if (changed.filter(col("n") <= 0L).limit(1).count() > 0)
      view.delete(col("n") <= 0L)
    syncedTo
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
    * extended with the Σv² column. Returns the synced base version. */
  def maintainMomentsView(base: LakeTable, view: LakeTable,
      keyCols: Seq[String], valueCol: String, sinceVersion: Int): Int = {
    val syncedTo = base.version
    val ch = base.changesSince(sinceVersion)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val vDec = col(valueCol).cast("decimal(18,4)")
    val delta = ch.groupBy(keyCols.map(col): _*).agg(
      sum(sign).as("d_n"),
      sum(vDec * sign).as("d_sum"),
      sum(vDec * vDec * sign).as("d_sq"))
    val cur = view.read.select(
      keyCols.map(col) :+ col("n").as("v_n") :+
        col("sum_value").as("v_sum") :+ col("sum_sq").as("v_sq"): _*)
    val changed = delta.join(cur, keyCols, "left")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("v_n"), lit(0L)) + col("d_n")).as("n"),
        (coalesce(col("v_sum"), lit(0).cast("decimal(30,4)")) + col("d_sum"))
          .cast("decimal(30,4)").as("sum_value"),
        (coalesce(col("v_sq"), lit(0).cast("decimal(38,8)")) + col("d_sq"))
          .cast("decimal(38,8)").as("sum_sq")): _*)
      .localCheckpoint(true)
    view.upsert(changed)
    if (changed.filter(col("n") <= 0L).limit(1).count() > 0)
      view.delete(col("n") <= 0L)
    syncedTo
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
    val keys = keyCols.map(col)
    val ch = base.changesSince(sinceVersion).filter(col(valueCol).isNotNull)
    val isIns = col("_change_type").isin("insert", "update_postimage")
    val delta = ch.groupBy(keys :+ col(valueCol).as("__v"): _*)
      .agg(sum(when(isIns, 1L).otherwise(-1L)).as("d_n"))
    val curAux = aux.read.select(keys :+ col("__v") :+ col("cnt").as("v_cnt"): _*)
    def alive(c: Column): Column = when(c > 0, 1L).otherwise(0L)
    val newCnt = coalesce(col("v_cnt"), lit(0L)) + col("d_n")
    val changedAux = delta.join(curAux, keyCols :+ "__v", "left")
      .select(keys ++ Seq(col("__v"), newCnt.as("cnt"),
        (alive(newCnt) - alive(coalesce(col("v_cnt"), lit(0L)))).as("__tr")): _*)
      .localCheckpoint(true) // one computation: aux merge + probe + rollup
    aux.upsert(changedAux.drop("__tr"))
    if (changedAux.filter(col("cnt") <= 0L).limit(1).count() > 0)
      aux.delete(col("cnt") <= 0L)
    // top-view delta = sum of transitions per group; untouched groups
    // (d_d = 0) never enter the merge
    val dDist = changedAux.groupBy(keys: _*).agg(sum("__tr").as("d_d"))
      .filter(col("d_d") =!= 0L)
    val curView = view.read.select(keys :+ col("n_distinct").as("v_d"): _*)
    val changedView = dDist.join(curView, keyCols, "left")
      .select(keys :+
        (coalesce(col("v_d"), lit(0L)) + col("d_d")).as("n_distinct"): _*)
      .localCheckpoint(true)
    view.upsert(changedView)
    if (changedView.filter(col("n_distinct") <= 0L).limit(1).count() > 0)
      view.delete(col("n_distinct") <= 0L)
    syncedTo
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
    val dDKeys = dD.select(joinKeys.map(col): _*).distinct()
    val p2 = factNow.select(factProj.map(col): _*)
      .join(broadcast(dDKeys), joinKeys, "left_semi")
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
  def maintainJoinSumView(factT: LakeTable, dimT: LakeTable, view: LakeTable,
      joinKeys: Seq[String], groupKeys: Seq[String], valueCol: String,
      factSince: Int, dimSince: Int): (Int, Int) = {
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
    mergeSumDelta(view, groupKeys, delta)
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
      valueCol: String, factSince: Int, dimSince: Int): (Int, Int) = {
    val syncedTo = (factT.version, dimT.version)
    val keys = groupKeys.map(col)
    val net = joinDeltaRows(factT, dimT, joinKeys, groupKeys, valueCol,
        factSince, dimSince)
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
        (coalesce(col("v_sum"), lit(0).cast("decimal(30,4)")) + col("d_sum"))
          .cast("decimal(30,4)"))
      .withColumn("__rescan", threatened)
      .localCheckpoint(true) // rescan-key probe AND merge
    val rescanKeys = joined.filter(col("__rescan")).select(keys: _*)
    val factNow = factT.read
    val dimNow = dimT.read
    val (factProj, dimProj) =
      joinSides(factNow, dimNow, joinKeys, groupKeys, valueCol)
    // dim reduced to the threatened groups' slice where group keys live
    // on the dim; the (usually empty) key set broadcasts either way
    val dimSideKeys = groupKeys.filter(dimProj.contains)
    val dimR =
      if (dimSideKeys.isEmpty) dimNow.select(dimProj.map(col): _*)
      else dimNow.select(dimProj.map(col): _*).join(
        broadcast(rescanKeys.select(dimSideKeys.map(col): _*).distinct()),
        dimSideKeys, "left_semi")
    val vDec = col(valueCol).cast("decimal(20,4)")
    val rescanned = factNow.select(factProj.map(col): _*)
      .join(broadcast(dimR), joinKeys)
      .join(broadcast(rescanKeys), groupKeys, "left_semi")
      .groupBy(keys: _*)
      .agg(min(vDec).as("r_min"), max(vDec).as("r_max"))
      .withColumn("__rescanned", lit(true))
    val changed = joined.join(broadcast(rescanned), groupKeys, "left")
      .select(keys ++ Seq(col("n"), col("sum_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_min"))
          .otherwise(least(col("v_min"), col("ins_min"))).as("min_value"),
        when(coalesce(col("__rescanned"), lit(false)), col("r_max"))
          .otherwise(greatest(col("v_max"), col("ins_max"))).as("max_value")): _*)
    view.upsert(changed)
    if (changed.filter(col("n") <= 0L).limit(1).count() > 0)
      view.delete(col("n") <= 0L)
    syncedTo
  }
}
