package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for data clustering — the lakehouse
  * OPTIMIZE ZORDER primitive: rows sorted by the interleaved bits of two
  * dimensions cluster multi-dimensionally, so min/max file statistics
  * prune scans filtered on EITHER column.
  *
  * Everything here is built-in bitwise arithmetic (shiftleft/and/or) —
  * fully codegen'd, no custom expression needed. Dimension values are
  * linearly binned to `bits` (default 16) between their min and max
  * (computed as one scalar aggregate, no global sort — the same
  * range-binning trade Delta's OPTIMIZE makes via sampling). */
object ZOrder {

  /** Spread the low 32 bits of `c` to the even bit positions (classic
    * Morton spreading by shift-or-mask rounds). */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** Morton code of two already-binned non-negative ints. */
  def interleave(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Morton code of N already-binned non-negative ints, `bits` bits each
    * (requires N * bits ≤ 63). The two-column case takes the
    * shift-or-mask fast path; the general case assembles the code bit by
    * bit — a large but pure bitwise expression that whole-stage codegen
    * compiles into straight-line long arithmetic. */
  def interleaveN(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "interleaveN needs at least one column")
    require(cols.size * bits <= 63,
      s"${cols.size} dims x $bits bits exceeds a long (63 usable bits)")
    if (cols.size == 1) cols.head
    else if (cols.size == 2 && bits <= 32) interleave(cols(0), cols(1))
    else {
      val n = cols.size
      val terms = for {
        (c, d) <- cols.zipWithIndex
        i <- 0 until bits
      } yield shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * n + d)
      terms.reduce(_.bitwiseOR(_))
    }
  }

  /** Linear bin of `c` into [0, 2^bits) given min/max columns. */
  def bin(c: Column, minC: Column, maxC: Column, bits: Int = 16): Column = {
    val span = (maxC - minC).cast("double")
    val scale = lit((1L << bits) - 1)
    when(span <= 0, lit(0L))
      .otherwise(((c - minC).cast("double") / span * scale).cast("long"))
  }
}
