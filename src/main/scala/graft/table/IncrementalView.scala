package graft.table

import org.apache.spark.sql.DataFrame
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
  */
object IncrementalView {

  /** Full (count, exact-decimal-sum) aggregate of `df` — the view's
    * initial state, and the recomputation IVM must stay equal to. */
  def sumView(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("decimal(20,4)"))
        .cast("decimal(30,4)").as("sum_value"))

  /** Apply the base table's changes since `sinceVersion` to the stored
    * view: signed per-key deltas → left join against current view rows
    * → MERGE the changed keys → drop zero-count groups. */
  def maintainSumView(base: LakeTable, view: LakeTable, keyCols: Seq[String],
      valueCol: String, sinceVersion: Int): Unit = {
    val ch = base.changesSince(sinceVersion)
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = ch.groupBy(keyCols.map(col): _*).agg(
      sum(sign).as("d_n"),
      sum(col(valueCol).cast("decimal(20,4)") * sign).as("d_sum"))
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
    // groups whose last member was deleted: a table-level condition
    // delete (no driver-side key list). The probe on the SMALL changed
    // frame skips the view rewrite entirely in the common no-extinction
    // batch, keeping maintenance O(changes).
    if (changed.filter(col("n") <= 0L).limit(1).count() > 0)
      view.delete(col("n") <= 0L)
  }
}
