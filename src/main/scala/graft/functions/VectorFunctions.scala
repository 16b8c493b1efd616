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

  /** Deterministic LSH bucket id via pseudo-random hyperplanes: bit j is
    * the sign of v · plane_j, plane coords derived from XXH64 — no stored
    * model, identical on every executor. This is the scale path for ANN:
    * bucket by signature, join within buckets (candidates only), verify
    * with exact cosine. Native single-pass expression
    * (graft.functions.LshBitsPacked). */
  def lshBucket(v: Column, bits: Int, seed: Long = 42L): Column =
    HashExpressions.lshBitsPacked(v, bits, seed)
}
