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

  /** Symmetric per-vector int8 scalar quantization: scale = max |x_i|,
    * q_i = floor(x_i·127/scale + 0.5) clamped to [-127, 127] (the
    * `floor(+0.5)` form is used instead of `round` so both engines run
    * the IDENTICAL IEEE expression — no dependence on an engine's
    * half-up-vs-banker's rounding of negative halves). A zero vector
    * quantizes to all zeros with scale 0. This is the classic 4×
    * memory/bandwidth reduction for embedding scans: store int8 + one
    * float scale per vector, score with exact integer dot products
    * (every |q_i·q_j| ≤ 127² and 64-dim sums stay far below 2^53, so
    * double arithmetic over the codes is EXACT — the quantized path is
    * fully oracle-checkable, unlike seeded LSH/IVF). */
  def int8Codes(v: Column): Column = {
    val d = toDouble(v)
    val scale = array_max(transform(d, x => abs(x)))
    transform(d, x =>
      when(scale === 0d, lit(0))
        .otherwise(greatest(lit(-127), least(lit(127),
          floor(x * lit(127.0) / scale + lit(0.5)))))
        .cast("int"))
  }

  /** The quantization scale paired with [[int8Codes]] (max |x_i|). */
  def int8Scale(v: Column): Column =
    array_max(transform(toDouble(v), x => abs(x)))

  /** Fixed-scale int8 codes for UNIT vectors: q_i = floor(x_i·127 + 0.5)
    * clamped. With one global scale (components of a normalized vector
    * lie in [-1, 1]) the integer dot product q·c is a consistent
    * monotone proxy of cosine ACROSS neighbors — per-vector scales (the
    * [[int8Codes]] form, right for storage/reconstruction) would warp
    * the ranking by each neighbor's own 1/scale factor. */
  def int8CodesUnit(v: Column): Column =
    transform(toDouble(v), x =>
      greatest(lit(-127), least(lit(127), floor(x * lit(127.0) + lit(0.5))))
        .cast("int"))

  /** Dequantized value of one code: q·scale/127 — shared by the
    * reconstruction-error profile and its oracle. */
  def dequant(q: Column, scale: Column): Column =
    q.cast("double") * scale / lit(127.0)

  /** Deterministic LSH bucket id via pseudo-random hyperplanes: bit j is
    * the sign of v · plane_j, plane coords derived from XXH64 — no stored
    * model, identical on every executor. This is the scale path for ANN:
    * bucket by signature, join within buckets (candidates only), verify
    * with exact cosine. Native single-pass expression
    * (graft.functions.LshBitsPacked). */
  def lshBucket(v: Column, bits: Int, seed: Long = 42L): Column =
    HashExpressions.lshBitsPacked(v, bits, seed)
}
