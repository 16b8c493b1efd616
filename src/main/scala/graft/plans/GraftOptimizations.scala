package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, ByteType, DataType,
  DateType, IntegerType, LongType, ShortType, StringType, TimestampNTZType,
  TimestampType}

/** Catalyst optimizer extension: `size(array_intersect(a, b))` —
  * the inner loop of every Jaccard verification — materializes the
  * intersection ARRAY per pair only to take its length. [[IntersectCount]]
  * counts without building the array (hash set membership, one pass), and
  * [[RewriteIntersectSize]] swaps it in as a logical optimization, so
  * operator code keeps the declarative built-in form.
  *
  * Installed via `spark.experimental.extraOptimizations`
  * ([[GraftOptimizations.install]]) — no session rebuild required; the
  * same rule object would be registered through
  * `SparkSessionExtensions.injectOptimizerRule` when packaged as
  * `spark.sql.extensions` (graft.GraftExtensions).
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with graft.functions.RefEvalCodegenBinary {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _)) if l == r => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"intersect_count needs two arrays of the same element type, got " +
        s"${l.simpleString}, ${r.simpleString}")
  }

  private def elemType = left.dataType.asInstanceOf[ArrayType].elementType

  /** Matches size(array_intersect(a,b)) semantics exactly: the number of
    * DISTINCT elements of `a` that also occur in `b` (null counts once if
    * present in both). */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val et = elemType
    val inB = new java.util.HashSet[Any]()
    var bNull = false
    var i = 0
    while (i < b.numElements()) {
      val v = b.get(i, et)
      if (v == null) bNull = true else inB.add(v)
      i += 1
    }
    val counted = new java.util.HashSet[Any]()
    var count = 0
    var aNullCounted = false
    i = 0
    while (i < a.numElements()) {
      val v = a.get(i, et)
      if (v == null) {
        if (bNull && !aNullCounted) { count += 1; aNullCounted = true }
      } else if (inB.contains(v) && counted.add(v)) count += 1
      i += 1
    }
    count
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object RewriteIntersectSize extends Rule[LogicalPlan] {

  /** Element types whose java `equals` coincides with Spark SQL value
    * equality — the HashSet in [[IntersectCount]] is only correct for
    * these. Excluded on purpose: binary (Array[Byte] compares by
    * reference), float/double (-0.0 vs 0.0 differ where Spark normalizes),
    * decimal (scale-sensitive equals), and nested array/struct/map (can
    * mix Unsafe/Generic representations with incompatible equals). */
  private def hashSafeElem(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull-sensitive: Size(null)= -1 under legacy flag; the
      // rewritten form keeps null-in → null-out, which matches the
      // default (ansi-consistent) behavior this engine runs with.
      case Size(ArrayIntersect(a, b), false)
          if a.dataType.isInstanceOf[ArrayType] &&
            hashSafeElem(a.dataType.asInstanceOf[ArrayType].elementType) =>
        IntersectCount(a, b)
    }
}

object GraftOptimizations {
  /** Idempotently install the graft optimizer rules on a session. */
  def install(spark: SparkSession): Unit = {
    val rules: Seq[Rule[LogicalPlan]] = Seq(RewriteIntersectSize, MvRewrite)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
  }
}
