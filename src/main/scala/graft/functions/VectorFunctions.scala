package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns using
  * Catalyst higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs, so the expressions participate in codegen and column pruning.
  *
  * All math is done in double: float inputs are cast element-wise first so
  * results are engine-portable (same values in DuckDB oracle SQL).
  */
object VectorFunctions {

  /** Element-wise cast to double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Codegen'd native loop (VectorExpressions.DotProduct) — numerically
    * identical to the HOF form `aggregate(zip_with(a,b,*), 0.0, +)` (same
    * sequential double accumulation), but ~2 orders of magnitude faster in
    * all-pairs joins where Spark's interpreted lambdas dominate. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotNative(a, b)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Unit-normalize once upstream so downstream cosine = plain dot —
    * halves the per-pair cost in brute-force similarity scans. */
  def normalize(v: Column): Column = {
    val n = l2Norm(v)
    transform(toDouble(v), x => x / n)
  }

  /** Deterministic LSH bit signature via pseudo-random hyperplanes.
    * Plane j's i-th coordinate is derived from xxhash64(j, i) scaled to
    * [-1, 1] — no stored model, identical on every executor. Returns an
    * array of `bits` 0/1 ints; equal prefixes → likely-similar vectors.
    * This is the scale path for ANN: bucket by signature, join within
    * buckets (candidates only), verify with exact cosine. */
  def lshBits(v: Column, bits: Int, dim: Int, seed: Int = 42): Column = {
    val vd = toDouble(v)
    array((0 until bits).map { j =>
      // hyperplane_j · v  >= 0
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), lit(dim - 1)), (x, i) => x * planeCoord(j, i, seed)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, 1).otherwise(0)
    }: _*)
  }

  /** Pack an LSH bit array into a single long bucket id. */
  def packBits(bitsCol: Column): Column =
    aggregate(bitsCol, lit(0L), (acc, b) => acc * 2 + b.cast("long"))

  private def planeCoord(plane: Int, i: Column, seed: Int): Column =
    (pmod(xxhash64(lit(plane), i, lit(seed)), lit(2000001L)).cast("double") -
      lit(1000000.0)) / lit(1000000.0)
}
