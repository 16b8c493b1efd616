package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters aggregate: Misra–Gries summary over token arrays.
  *
  * `freq_items(tokens, k, capacity)` returns the top-k (token, cnt)
  * structs. Misra–Gries guarantees every true heavy hitter with frequency
  * > N/capacity survives, and counts are exact whenever the buffer never
  * evicts (capacity ≥ distinct tokens) — which makes the operator
  * oracle-checkable on bounded vocabularies while still being a true
  * streaming sketch: O(capacity) state per partition, mergeable, one pass.
  * This is the TypedImperativeAggregate surface — partial aggregation
  * works map-side exactly like built-in sketches (approx_count_distinct).
  */
case class FreqItems(child: Expression, k: Int, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("cnt", LongType))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_items needs array<string>, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], tok: String, n: Long): Unit = {
    buf.get(tok) match {
      case Some(c) => buf.update(tok, c + n)
      case None =>
        if (buf.size < capacity) buf.update(tok, n)
        else {
          // Misra–Gries decrement step: shrink everyone by the min needed
          val dec = math.min(n, buf.values.min)
          val dead = buf.filterInPlace((_, c) => c > dec)
          dead.mapValuesInPlace((_, c) => c - dec)
          if (n > dec) buf.update(tok, n - dec)
        }
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow):
      mutable.HashMap[String, Long] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        val s = arr.getUTF8String(i)
        if (s != null) add(buf, s.toString, 1L)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (t, c) => add(b1, t, c) }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): FreqItems =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): FreqItems =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItems =
    copy(child = c.head)
  override def prettyName: String = "freq_items"
}

/** Count-min sketch aggregate over a long key column.
  *
  * `count_min(key, depth, width)` returns the flat depth×width counter
  * array (row-major: cell (i, b) at index i·width + b). Point estimates
  * are then plain SQL over the array — `least(element_at(...), ...)`
  * across the depth rows — so the estimation side stays codegen'd and
  * cross-engine-replayable. The hash family is fixed-constant universal
  * hashing ((aᵢ·x + bᵢ) mod p) mod width with p = 2³¹−1, entirely in
  * integer arithmetic, so an external engine can replay the exact sketch
  * (CORRECTNESS oracle) — unlike seeded murmur sketches which are
  * engine-private. Mergeable (cell-wise add), O(depth·width) state per
  * partition, map-side partials like any TypedImperativeAggregate; the
  * standard CMS guarantee: estimates never under-count, over-count
  * ≤ 2N/width with probability 1 − 2⁻ᵈᵉᵖᵗʰ.
  */
case class CountMin(child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && depth <= CountMin.A.length,
    s"depth must be in [1, ${CountMin.A.length}]")
  require(width >= 2)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_min needs an integral key, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
      }
      var i = 0
      while (i < depth) {
        buf(i * width + CountMin.bucket(i, x, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(_.asInstanceOf[Any]))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(off: Int): CountMin =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMin =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMin =
    copy(child = c.head)
  override def prettyName: String = "count_min"
}

object CountMin {
  /** Mersenne prime 2³¹−1 — the classic universal-hashing modulus. */
  val P: Long = 2147483647L
  /** Fixed hash-family constants (primes); depth i uses (A(i), B(i)). */
  val A: Array[Long] = Array(1299721L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L)
  val B: Array[Long] = Array(7L, 101L, 1009L, 10007L, 100003L, 1000003L,
    10000019L, 100000007L)

  /** ((aᵢ·(x mod p) + bᵢ) mod p) mod width, with x folded non-negative
    * first so the products stay far inside Long range. */
  def bucket(i: Int, x: Long, width: Int): Int = {
    val xm = java.lang.Math.floorMod(x, P)
    (((A(i) * xm + B(i)) % P) % width).toInt
  }
}

/** Bounded bottom-k aggregate over a long column — the KMV sketch
  * builder: keeps the k SMALLEST distinct values with O(k) state per
  * aggregation buffer (a capped sorted set), map-side partial
  * aggregation, and a union-closure merge. `collect_set` + sort + slice
  * computes the same answer with O(distinct) state — fine at lab scale,
  * but the whole point of a bottom-k sketch is that per-group state
  * never exceeds k, and this operator actually delivers that bound.
  * Output: the ascending array of the ≤ k smallest distinct inputs.
  */
case class BottomK(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 1, s"bottom_k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bottom_k needs an integral column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) buf.add(v)
    else if (v < buf.last) { buf.add(v); if (buf.size > k) buf.pollLast() }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): BottomK =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BottomK =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomK =
    copy(child = c.head)
  override def prettyName: String = "bottom_k"
}

object SketchAggregates {
  /** Top-k frequent tokens over an array<string> column (Misra–Gries). */
  def freqItems(tokens: Column, k: Int, capacity: Int = 4096): Column =
    GraftColumnBridge.column(
      FreqItems(GraftColumnBridge.expression(tokens), k, capacity)
        .toAggregateExpression())

  /** Bounded bottom-k of an integral column: ascending array of the ≤ k
    * smallest distinct values, O(k) buffer state (see [[BottomK]]). */
  def bottomK(v: Column, k: Int): Column =
    GraftColumnBridge.column(
      BottomK(GraftColumnBridge.expression(v), k).toAggregateExpression())

  /** Count-min sketch over an integral key column: flat depth×width
    * counter array (see [[CountMin]]). */
  def countMin(key: Column, depth: Int = 4, width: Int = 64): Column =
    GraftColumnBridge.column(
      CountMin(GraftColumnBridge.expression(key), depth, width)
        .toAggregateExpression())

  /** Point estimate from a [[CountMin]] sketch column: min over the
    * depth rows of the probed cell. `probe` must be the same integral
    * key type the sketch was built over. Pure built-in expressions
    * (element_at/least) — codegen'd, and replayable by an external
    * engine with the same integer arithmetic. */
  def countMinEstimate(sketch: Column, probe: Column,
      depth: Int = 4, width: Int = 64): Column = {
    import org.apache.spark.sql.functions._
    val cells = (0 until depth).map { i =>
      val xm = pmod(probe.cast("long"), lit(CountMin.P))
      val bkt = pmod(pmod(lit(CountMin.A(i)) * xm + lit(CountMin.B(i)),
        lit(CountMin.P)), lit(width.toLong))
      element_at(sketch, (lit(i.toLong * width) + bkt + lit(1L)).cast("int"))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
