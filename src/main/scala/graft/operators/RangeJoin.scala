package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Interval/range join done the scale-correct way.
  *
  * A naive `a.join(b, a.ts between ...)` theta-join plans as a broadcast
  * nested loop — quadratic and undistributable on two big inputs. The
  * standard fix (used by Databricks' range-join optimization and
  * spatial engines) is binning: quantize the range dimension into
  * fixed-width bins, equi-join on (key, bin) — each left row probes only
  * the bins its window can overlap — then apply the exact range predicate.
  * Cost: shuffle on (key, bin) + |overlapping-bin pairs|, linear for
  * bounded windows.
  */
object RangeJoin {

  /** For each left row, all right rows with the same `keys` and
    * `right.ts ∈ [left.ts, left.ts + windowSeconds)`.
    *
    * `binSeconds` defaults to the window width (≤2 candidate bins/row).
    * Output: left columns + right value columns (prefixed `r_`).
    */
  def windowFollowing(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      windowSeconds: Long, binSecondsOpt: Option[Long] = None): DataFrame = {
    val binSeconds = binSecondsOpt.getOrElse(windowSeconds)
    def bin(c: Column): Column = floor(unix_timestamp(c) / binSeconds).cast("long")
    val nBins = (windowSeconds + binSeconds - 1) / binSeconds + 1
    // left row probes every bin its window [ts, ts+w) can reach
    val lExpanded = left.withColumn("__bin",
      explode(array((0L until nBins).map(i => bin(col(leftTs)) + i): _*)))
    val rTagged = right.select(
      (keys.map(col) :+ bin(col(rightTs)).as("__bin") :+
        col(rightTs).as("__r_ts")) ++ rightVals.map(c => col(c).as(s"r_$c")): _*)
    lExpanded.join(rTagged, keys :+ "__bin")
      .filter(col("__r_ts") >= col(leftTs) &&
        col("__r_ts") < col(leftTs) + expr(s"INTERVAL $windowSeconds SECOND"))
      .drop("__bin", "__r_ts")
      .select(left.columns.map(col) ++ rightVals.map(c => col(s"r_$c")): _*)
  }
}
