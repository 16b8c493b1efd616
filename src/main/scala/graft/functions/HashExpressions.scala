package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native signature expressions for the dedup hot path.
  *
  * The HOF formulations (k nested `transform`s for MinHash, a 64-wide
  * array-accumulator `aggregate` for SimHash) evaluate interpreted at
  * ~100 ns/element; over a 5k-doc corpus that is tens of millions of
  * lambda invocations. These expressions do the same arithmetic in one
  * native pass per row (XXH64 over the shingle/token bytes), dropping
  * signature computation from tens of seconds to sub-second at sf0.1.
  * They are deterministic and engine-local (signatures never cross into
  * the DuckDB oracle — verification always happens on exact
  * Jaccard/Hamming afterwards).
  */

/** MinHash signature: out[s] = min over shingles x of XXH64(x, seed=s). */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over an array of token strings: bit i of the result is
  * the sign of sum over tokens of ±1 by bit i of XXH64(token). */
case class SimHash64(child: Expression)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash + LSH banding fused: out[b] = XXH64 of band b's r consecutive
  * minhash values — the bucket ids directly, skipping the intermediate
  * signature array, slice, stringify, re-hash chain. */
case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(k % bands == 0, "k must be a multiple of bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands needs array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0x9E3779B97F4A7C15L + b
      var j = 0
      while (j < r) {
        acc = XXH64.hashLong(mins(b * r + j), acc)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hyperplane-LSH bit signature packed into a long: bit j is the sign of
  * v · plane_j, plane coords derived on the fly from XXH64(j*dim+i) scaled
  * to [-1, 1]. Native single pass (the HOF form re-enters the interpreter
  * bits×dim times per row). */
case class LshBitsPacked(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bits needs array<float|double>, got ${t.simpleString}")
  }

  // def, not val: dataType is illegal to query while the child is still
  // unresolved (analysis copies the node before binding)
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    var out = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var i = 0
      while (i < dim) {
        val h = XXH64.hashLong(j.toLong * 1000003L + i, seed)
        val coord = (math.floorMod(h, 2000001L) - 1000000L) / 1000000.0
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += x * coord
        i += 1
      }
      if (proj >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Deterministic CROSS-ENGINE SimHash: the same ±1-vote algorithm as
  * [[SimHash64]], but the per-feature 64-bit hash is derived from the MD5
  * hex digest instead of XXH64 — bit `4d+k` of the hash (d ∈ 0..15,
  * k ∈ 0..3) is bit k of hex digit d of `md5(feature)`. MD5 is a public
  * standard every engine exposes, so a DuckDB oracle recomputes the
  * fingerprint bit-for-bit from `md5()` + string ops (see
  * q_simhash_pairs) — this is the variant that moves SimHash from the
  * rows-only no_oracle floor to a fully hash-compared row. Same
  * native-single-pass shape as the XXH64 sibling; MD5 costs ~3× XXH64
  * per feature, which the signature stage amortizes over the corpus. */
case class SimHash64Md5(child: Expression)
    extends UnaryExpression with RefEvalCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64_md5 needs array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = SimHash64Md5.digests.get()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val digest = md.digest(s.getBytes) // md.digest resets the instance
        // hex digit d of the digest string = nibble d of the byte stream
        // (byte d/2, high nibble first); bits 4d..4d+3 are that digit's
        // bits 0..3 — the exact layout the DuckDB replay reads back via
        // strpos('0123456789abcdef', substr(md5(f), d+1, 1)) - 1
        var d = 0
        while (d < 16) {
          val byte = digest(d >> 1) & 0xff
          val digit = if ((d & 1) == 0) byte >> 4 else byte & 0xf
          var k = 0
          while (k < 4) {
            if (((digit >> k) & 1) == 1) votes(4 * d + k) += 1
            else votes(4 * d + k) -= 1
            k += 1
          }
          d += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64Md5 {
  // one digest instance per task thread, not per row — getInstance is a
  // JCA provider lookup + allocation, pure overhead on a per-document
  // hot path (md.digest resets the instance between uses)
  private[functions] val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Deterministic CROSS-ENGINE hyperplane-LSH signature: bit j is the sign
  * of Σ_i s(j,i) · floor(v_i · 10⁶), with Rademacher signs
  * s(j,i) ∈ {−1,+1} taken from bit 0 of the first hex digit of
  * `md5("lsh:<seed>:<j>:<i>")`. Two deliberate departures from
  * [[LshBitsPacked]] make the bucket replayable bit-for-bit in any engine
  * with `md5()`:
  *
  *  - ±1 components instead of scaled-hash reals (sign-LSH with
  *    Rademacher projections is standard — Achlioptas'01 sparse random
  *    projections), so the projection needs no float constants;
  *  - the projection is EXACT INTEGER arithmetic: `v_i` (a float32 read
  *    as double — exact) times 10⁶ is still exact in a double (24+20
  *    mantissa bits < 53), floor is unambiguous, and a sum of ±longs is
  *    associative — so no summation-order ULP can flip a sign at the
  *    boundary, which is what would silently desynchronize the two
  *    engines' buckets. Sign-LSH is scale-invariant, so quantizing the
  *    magnitude changes the hyperplane family, not its validity.
  *
  * Callers feed the RAW embedding (not the normalized form): raw floats
  * are bit-exact in both engines, while a normalized value inherits the
  * engines' sum-order ULP in the norm. */
case class LshBitsDet(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with RefEvalCodegen {
  require(bits > 0 && bits <= 63, s"bits=$bits must be in 1..63")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bits_det needs array<float|double>, got ${t.simpleString}")
  }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // Rademacher plane rows, built once per (expression, dim) on first use
  // (the plane is row-independent; md5 per (j, i) would otherwise run per
  // data row). Grow-on-demand keeps dim out of the constructor; a single
  // volatile (dim, rows) reference makes the lazy build safe when
  // local-mode tasks share the plan object (worst case: two threads
  // build the identical matrix and one wins).
  @transient @volatile private var planeCache: (Int, Array[Array[Int]]) = _

  private def planesFor(dim: Int): Array[Array[Int]] = {
    val cached = planeCache
    if (cached != null && cached._1 >= dim) cached._2
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val built = Array.tabulate(bits) { j =>
        Array.tabulate(dim) { i =>
          val digest = md.digest(s"lsh:$seed:$j:$i".getBytes("UTF-8"))
          if ((((digest(0) & 0xff) >> 4) & 1) == 1) 1 else -1
        }
      }
      planeCache = (dim, built)
      built
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val p = planesFor(dim)
    var out = 0L
    var j = 0
    while (j < bits) {
      val row = p(j)
      var proj = 0L
      var i = 0
      while (i < dim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        proj += row(i) * math.floor(x * 1000000.0).toLong
        i += 1
      }
      if (proj >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashExpressions {
  def minhashSig(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(shingles), k))

  def minhashBands(shingles: Column, k: Int, bands: Int): Column =
    GraftColumnBridge.column(MinHashBands(GraftColumnBridge.expression(shingles), k, bands))

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  def simhash64Md5(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64Md5(GraftColumnBridge.expression(tokens)))

  def lshBitsDet(vec: Column, bits: Int, seed: Long): Column =
    GraftColumnBridge.column(LshBitsDet(GraftColumnBridge.expression(vec), bits, seed))

  def lshBitsPacked(vec: Column, bits: Int, seed: Long = 42L): Column =
    GraftColumnBridge.column(LshBitsPacked(GraftColumnBridge.expression(vec), bits, seed))
}
