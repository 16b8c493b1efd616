package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row (same
  * key, right.ts <= left.ts) — the operator Spark's DataFrame API lacks
  * (pandas-on-Spark has merge_asof; Flink/kdb treat it as primitive).
  *
  * Implementation is the union-and-carry-forward composition (preference
  * (a) from the build rules — no custom physical operator needed):
  * tag both sides, union, sort within key by (ts, side), and carry the
  * last right-side values forward with `last(ignoreNulls) OVER rows
  * unbounded preceding`. Cost: ONE hash-partition exchange on the key +
  * one sort — identical shape to a single window aggregate, no range
  * cross-product, no per-key driver loop. At 100 TB this scales exactly
  * like any windowed op (state is one carried row per key); a skewed key
  * devolves to one big sorted partition, the standard window caveat.
  *
  * Ties (right.ts == left.ts): the right row sorts BEFORE the left row
  * (side 0 < side 1), so an exactly-simultaneous right row is visible —
  * matching DuckDB/pandas `>=` asof semantics.
  *
  * All attached values come ATOMICALLY from the single matched right row:
  * the right values travel as one non-null struct and a single
  * `last(ignoreNulls)` carries the whole struct forward. A genuinely NULL
  * field inside the matched right row stays NULL (carrying each value
  * column independently would instead resurrect an older non-null value
  * and could mix fields from different right rows).
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTs    left ordering column name
    * @param rightTs   right ordering column name
    * @param rightVals right value columns to attach (become nullable)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rvalsType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    // common event-time axis + side tag; the right values ride in ONE
    // struct (non-null on right rows even when every field is null, null
    // on left rows) so `last` picks an entire right row or nothing
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        struct(rightVals.map(col): _*).as("__rvals")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(
          left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).cast(right.schema(rightTs).dataType).as("__ts")
        :+ lit(1).as("__side") :+ lit(null).cast(rvalsType).as("__rvals")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val unioned = taggedRight.unionByName(taggedLeft)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__rvals",
      last(col("__rvals"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"__rvals.$c").as(s"asof_$c")): _*)
  }
}
