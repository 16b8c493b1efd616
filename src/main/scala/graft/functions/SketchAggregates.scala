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

object SketchAggregates {
  /** Top-k frequent tokens over an array<string> column (Misra–Gries). */
  def freqItems(tokens: Column, k: Int, capacity: Int = 4096): Column =
    GraftColumnBridge.column(
      FreqItems(GraftColumnBridge.expression(tokens), k, capacity)
        .toAggregateExpression())
}
