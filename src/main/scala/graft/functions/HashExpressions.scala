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

object HashExpressions {
  def minhashSig(shingles: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(shingles), k))

  def minhashBands(shingles: Column, k: Int, bands: Int): Column =
    GraftColumnBridge.column(MinHashBands(GraftColumnBridge.expression(shingles), k, bands))

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  def lshBitsPacked(vec: Column, bits: Int, seed: Long = 42L): Column =
    GraftColumnBridge.column(LshBitsPacked(GraftColumnBridge.expression(vec), bits, seed))
}
