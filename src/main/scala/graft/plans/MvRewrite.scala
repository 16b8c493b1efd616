package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeReference, Cast, Coalesce, EqualTo, Expression, ExprId, Literal,
  NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  AggregateFunction, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.table.LakeTable

/** Transparent materialized-view rewrite (the Calcite/Snowflake/Databricks
  * MV-substitution pattern, expressed as a Catalyst optimizer rule).
  *
  * A maintained [[graft.table.IncrementalView]] sum/min-max/stats view is
  * an O(groups) table kept exact through the base table's change feed.
  * This rule makes it TRANSPARENT: a query that aggregates the 100 TB
  * base — `base.read.groupBy(keys).agg(sum(cast(v as decimal(20,4))), …)`
  * — is rewritten to read the view instead, so the scan is O(groups)
  * rather than O(base), with no query change. That's the whole point of
  * paying the IVM maintenance cost: at cluster scale the rewrite turns a
  * full-corpus shuffle-aggregate into a metadata-sized read.
  *
  * Three forms are rewritten (each only when EVERY aggregate in the
  * query maps onto view columns and the scanned base snapshot version
  * equals the view's recorded `mv.base_version` — freshness is checked
  * per query, never assumed):
  *
  *  1. exact grouping match (query keys == view keys): the Aggregate
  *     collapses to a PROJECT over the view — no shuffle at all;
  *  2. roll-up (query keys ⊂ view keys): re-aggregate the view —
  *     `count(*) → sum(n)`, `sum(v') → sum(sum_value)`,
  *     `min/max(v') → min/max(min/max_value)` — a shuffle of O(groups)
  *     rows instead of O(base);
  *  3. global roll-up (no grouping): same, with `count(*)` mapped to
  *     `coalesce(sum(n), 0)` so an empty base still yields the
  *     SQL-correct single zero row.
  *
  * The same three forms also apply to AGGREGATE-OVER-JOIN queries served
  * by a maintained JOIN view ([[graft.table.IncrementalView.joinSumView]] /
  * `joinMinMaxView`): `fact.join(dim, keys).groupBy(g).agg(…)` rewrites
  * to the view when the plan is an inner equi-join of the two registered
  * scans on exactly the registered join keys and the view is synced to
  * BOTH scanned versions (`mv.fact_version` / `mv.dim_version`). At
  * scale this removes the join AND the aggregation — the two most
  * expensive operators in the plan.
  *
  * Filters between the Aggregate and the scan (or above the join) are
  * rewritten when they reference only grouping keys (group-predicate
  * commutation: `Agg(g, F(p(g), base)) = F(p(g), Agg(g, base))`); any
  * other filter, a distinct/filtered aggregate, or an unsupported
  * aggregate shape leaves the plan untouched — the rule only ever
  * substitutes when the result is bit-identical to the base aggregation
  * in the view's exact DECIMAL(20,4) value space (the same discipline
  * the IVM maintainers guarantee).
  *
  * Matching is value-space-strict on purpose: only `count(*)`/`count(1)`
  * and sum/min/max over `cast(valueCol as decimal(20,4))` rewrite —
  * a float `sum(v)` is NOT the same number as the view's decimal sum,
  * so it is left alone rather than approximated.
  *
  * EXCEPTION — `serveDouble` (per registration, default OFF): the most
  * common aggregate a real user writes is `avg(price)` with no cast.
  * Registering with `serveDouble = true` asserts that the value
  * column's doubles are EXACT in the view's decimal value space (e.g.
  * currency with ≤ 4 decimal places — wider values would be rounded by
  * the view's cast, and min/max/sum would serve the rounded numbers).
  * Under that assertion the rule also rewrites uncast `sum/avg/min/max/
  * count(valueCol)` over a DOUBLE column: accumulation is decimal-exact
  * inside the view, with ONE final cast to double at serve time. The
  * determinism contract this buys: the served sum/avg is a pure
  * function of the group's value multiset (exact decimal sum, one
  * rounding), where the un-rewritten plan's float sum depends on
  * partitioning and merge order — the served answer is at most 1 ulp
  * from any particular base execution and bit-reproducible across runs
  * and engines (`q_mv_avg_double`'s DuckDB oracle replays it exactly).
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** View kinds by the aggregate columns they materialize and the exact
    * decimal value space their maintainers aggregate in — matching is
    * strict on the space (a sum over a different cast is a DIFFERENT
    * number and never rewrites). */
  sealed trait Kind {
    def cols: Set[String]
    /** (precision, scale) of the cast the view applies to valueCol. */
    def valueSpace: (Int, Int) = (20, 4)
  }
  case object SumKind extends Kind { val cols = Set("n", "sum_value") }
  case object MinMaxKind extends Kind {
    val cols = Set("n", "sum_value", "min_value", "max_value")
  }

  /** [[graft.table.IncrementalView.fullStatsView]]: adds exact
    * `count(distinct cast(v as decimal(18,4)))` → `n_distinct` — the
    * most expensive aggregate at scale, served from the aux-backed
    * view. Distinct counts cannot be re-aggregated, so this mapping is
    * exact-grouping-match only (a roll-up query containing one leaves
    * the plan untouched). Note the (18,4) value space — fullStatsView
    * squares its values into decimal(38,8), which caps the input
    * precision below the other kinds' (20,4).
    *
    * The `n_nonnull` column (count of NON-NULL cast values) is what
    * lets this kind serve `count(cast(v))` and — the most common
    * aggregate a user writes — `avg(cast(v))`: Average's count buffer
    * counts non-null values, so serving it from `(sum_value, n)` would
    * be silently wrong on null-bearing groups. The avg substitution
    * reuses Average's OWN evaluateExpression with the buffer
    * attributes replaced by view columns, so the division/rounding
    * chain is bit-identical to evaluating the real aggregate. */
  case object FullStatsKind extends Kind {
    val cols = Set("n", "n_nonnull", "sum_value", "min_value", "max_value",
      "n_distinct")
    override def valueSpace: (Int, Int) = (18, 4)
  }

  final case class Entry(base: LakeTable, view: LakeTable,
      keyCols: Seq[String], valueCol: String, kind: Kind,
      serveDouble: Boolean)

  final case class JoinEntry(fact: LakeTable, dim: LakeTable,
      view: LakeTable, joinKeys: Seq[String], groupKeys: Seq[String],
      valueCol: String, kind: Kind, serveDouble: Boolean)

  /** Registries keyed by the base tables' directories (all versions of
    * a base share the entry list; freshness is per scanned version). A
    * base may carry SEVERAL views on different key sets / kinds — the
    * rule picks the best fresh container per query (see [[rewrite]]). */
  private val catalog = new ConcurrentHashMap[String, List[Entry]]()
  private val joinCatalog = new ConcurrentHashMap[String, List[JoinEntry]]()

  /** Register a maintained view for rewrite. The maintainer must record
    * the synced base version in the view's meta under `mv.base_version`
    * (pass `meta = MvRewrite.syncMeta(base.version)` to the maintain
    * call — the marker rides the SAME atomic commit as the merge, so a
    * crash can never leave a fresh-looking stale view). Registering the
    * same view table again replaces its entry; different view tables
    * accumulate as alternative containers for the base.
    *
    * Freshness CONTRACT (path-shape): the rule recognizes a scan of
    * `base` by its [[LakeTable]] layout — a single root path whose leaf
    * is the `v<N>` version directory — and compares that `N` against
    * the view's recorded `mv.base_version`. Scans of anything else (a
    * plain parquet directory, a multi-path read, a different table
    * format) never parse a version and therefore SAFELY never rewrite;
    * registering a non-LakeTable "base" is a silent no-op by design,
    * never a wrong answer (MvRewriteSpec pins the negative). */
  /** `serveDouble` opts this registration into serving UNCAST
    * double-column aggregates — see the class doc's determinism
    * contract; the caller asserts the column's values are exact in the
    * kind's decimal value space. */
  def register(base: LakeTable, view: LakeTable, keyCols: Seq[String],
      valueCol: String, kind: Kind = SumKind,
      serveDouble: Boolean = false): Unit =
    catalog.compute(normalize(base.tablePath), (_, old) =>
      Entry(base, view, keyCols, valueCol, kind, serveDouble) ::
        Option(old).getOrElse(Nil)
          .filterNot(_.view.tablePath == view.tablePath))

  /** Register a maintained JOIN view: serves inner equi-join aggregates
    * of `fact ⋈ dim` on `joinKeys`. The maintainer must record BOTH
    * synced versions (pass `meta = MvRewrite.joinSyncMeta(fv, dv)` to
    * `maintainJoinSumView`/`maintainJoinMinMaxView`). Same list
    * semantics as [[register]]: re-registering the same view table
    * replaces its entry; different view tables accumulate as
    * alternative containers for the (fact, dim) pair, best fresh
    * container selected per query. Same path-shape freshness contract
    * as [[register]]. */
  def registerJoin(fact: LakeTable, dim: LakeTable, view: LakeTable,
      joinKeys: Seq[String], groupKeys: Seq[String], valueCol: String,
      kind: Kind = SumKind, serveDouble: Boolean = false): Unit =
    joinCatalog.compute(joinKey(fact.tablePath, dim.tablePath), (_, old) =>
      JoinEntry(fact, dim, view, joinKeys, groupKeys, valueCol, kind,
        serveDouble) ::
        Option(old).getOrElse(Nil)
          .filterNot(_.view.tablePath == view.tablePath))

  /** Drop ALL view registrations for `base`. */
  def unregister(base: LakeTable): Unit =
    catalog.remove(normalize(base.tablePath))

  /** Drop one view's registration, keeping the base's other containers. */
  def unregisterView(base: LakeTable, view: LakeTable): Unit =
    catalog.computeIfPresent(normalize(base.tablePath), (_, old) =>
      old.filterNot(_.view.tablePath == view.tablePath) match {
        case Nil => null
        case rest => rest
      })
  def unregisterJoin(fact: LakeTable, dim: LakeTable): Unit =
    joinCatalog.remove(joinKey(fact.tablePath, dim.tablePath))
  def clear(): Unit = { catalog.clear(); joinCatalog.clear() }

  val SyncKey = "mv.base_version"
  val FactSyncKey = "mv.fact_version"
  val DimSyncKey = "mv.dim_version"

  /** The meta marker a maintainer commits atomically with its merge. */
  def syncMeta(baseVersion: Int): Map[String, String] =
    Map(SyncKey -> baseVersion.toString)

  def joinSyncMeta(factVersion: Int, dimVersion: Int): Map[String, String] =
    Map(FactSyncKey -> factVersion.toString,
      DimSyncKey -> dimVersion.toString)

  private def joinKey(factPath: String, dimPath: String): String =
    s"${normalize(factPath)}|${normalize(dimPath)}"

  /** Strip the filesystem scheme a qualified Hadoop path carries
    * (`file:/tmp/x` → `/tmp/x`) so scan paths and registration paths
    * compare equal regardless of qualification. */
  private def normalize(path: String): String =
    if (path.startsWith("file:")) path.stripPrefix("file:") else path

  /** (tableDir, version) of a LakeTable version-directory scan path. */
  private def tableVersionOf(path: String): Option[(String, Int)] = {
    val p = normalize(path)
    val i = p.lastIndexOf('/')
    if (i <= 0) None
    else {
      val leaf = p.substring(i + 1)
      if (leaf.length > 1 && leaf.charAt(0) == 'v' &&
          leaf.drop(1).forall(_.isDigit))
        Some((p.substring(0, i), leaf.drop(1).toInt))
      else None
    }
  }

  private def scanOf(lr: LogicalRelation): Option[(String, Int)] =
    lr.relation match {
      case hfs: HadoopFsRelation if hfs.location.rootPaths.length == 1 =>
        tableVersionOf(hfs.location.rootPaths.head.toString)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (catalog.isEmpty && joinCatalog.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(_, _, _, _) =>
        rewrite(agg).orElse(rewriteJoin(agg)).getOrElse(agg)
    }
  }

  /** Unwrap attribute-only Projects and collect Filter conditions down
    * to a single parquet LogicalRelation. */
  private def unwrap(plan: LogicalPlan,
      conds: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, conds)
      case Filter(cond, child) => unwrap(child, conds :+ cond)
      case lr: LogicalRelation => Some((lr, conds))
      case _ => None
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (lr, conds) = unwrap(agg.child, Nil) match {
      case Some(x) => x
      case None => return None
    }
    val (tableDir, scannedVersion) = scanOf(lr) match {
      case Some(x) => x
      case None => return None
    }
    val entries = Option(catalog.get(tableDir)).getOrElse(return None)

    // Freshness: the view must be synced to EXACTLY the snapshot this
    // scan reads (not merely the base's current version — a stale
    // DataFrame over an old retained snapshot must not read a newer
    // view, and vice versa). `meta` is a one-file driver-side read.
    // Any view-side fault (corrupt pointer, missing dir) means "don't
    // rewrite", never "fail an unrelated query inside the optimizer".
    // The view's snapshot is PINNED: the validated meta and the
    // substituted scan come from ONE pointer resolution, so a
    // concurrent view-maintenance commit between check and read can
    // never serve a snapshot newer than the one validated (the
    // check-then-read race `pinnedSnapshot` documents).
    def fresh(e: Entry): Option[LogicalPlan] =
      freshPinned(e.view, _.get(SyncKey).contains(scannedVersion.toString))

    // Container selection: among the fresh views that can answer this
    // query, prefer an exact key match (pure projection, no shuffle)
    // over a roll-up, then the FEWEST key columns (the coarser view is
    // the smaller read). substitute() itself rejects containers whose
    // columns can't express the aggregates, so "try in order" is both
    // the filter and the ranking.
    val lrIds = lr.output.map(_.exprId).toSet
    val groupNames = agg.groupingExpressions.collect {
      case a: AttributeReference => a.name
    }.toSet
    // rank WITHOUT resolving snapshots (the sort key is layout-only),
    // then resolve freshness LAZILY per candidate — the first container
    // that is fresh AND substitutes wins, and the losers' pointer/meta/
    // footer reads never happen (rewriteJoin's form)
    val ordered = entries.sortBy(e =>
      (if (e.keyCols.toSet == groupNames) 0 else 1, e.keyCols.length))
    ordered.view.flatMap { e =>
      fresh(e).flatMap { viewPlan =>
        substitute(agg, conds, viewPlan, e.keyCols, e.kind,
          keyAttrs = lr.output.filter(a => e.keyCols.contains(a.name)),
          isValueAttr = a => a.name == e.valueCol && lrIds(a.exprId),
          allScanIds = lrIds, serveDouble = e.serveDouble)
      }
    }.headOption
  }

  /** Pinned freshness probe: resolve the view's CURRENT snapshot once,
    * validate THAT snapshot's meta with `check`, and return the
    * analyzed scan over the SAME pinned version directory. Any
    * view-side fault yields None ("don't rewrite"), never an optimizer
    * failure. */
  private def freshPinned(view: LakeTable,
      check: Map[String, String] => Boolean): Option[LogicalPlan] =
    scala.util.Try(view.pinnedSnapshot.collect {
      case (df, m) if check(m) => df.queryExecution.analyzed
    }).toOption.flatten

  /** Unwrap attribute-only Projects down to a Join, collecting Filter
    * conditions found above it. */
  private def unwrapToJoin(plan: LogicalPlan,
      conds: Seq[Expression]): Option[(Join, Seq[Expression])] =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrapToJoin(child, conds)
      case Filter(cond, child) => unwrapToJoin(child, conds :+ cond)
      case j: Join => Some((j, conds))
      case _ => None
    }

  /** Unwrap one join input down to its scan, collecting side-local
    * Filter conditions (predicate pushdown moves group-key filters and
    * inferred constraints BELOW the join — for an inner equi-join both
    * commute back out: a key-only predicate on one side removes exactly
    * the groups it removes after the aggregation). */
  private def unwrapSide(
      plan: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrapSide(child)
      case Filter(cond, child) =>
        unwrapSide(child).map { case (lr, cs) =>
          (lr, cs ++ splitConjuncts(cond))
        }
      case lr: LogicalRelation => Some((lr, Nil))
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  private def rewriteJoin(agg: Aggregate): Option[LogicalPlan] = {
    if (joinCatalog.isEmpty) return None
    val (j, conds) = unwrapToJoin(agg.child, Nil) match {
      case Some(x) => x
      case None => return None
    }
    if (j.joinType != Inner || j.condition.isEmpty) return None
    val ((lrA, condsA), (lrB, condsB)) =
      (unwrapSide(j.left), unwrapSide(j.right)) match {
        case (Some(a), Some(b)) => (a, b)
        case _ => return None
      }
    val ((dirA, vA), (dirB, vB)) = (scanOf(lrA), scanOf(lrB)) match {
      case (Some(a), Some(b)) => (a, b)
      case _ => return None
    }
    // registration orientation: fact may be the left OR right input
    val (entries, factV, dimV, lrFact, lrDim) =
      Option(joinCatalog.get(s"$dirA|$dirB"))
        .map(es => (es, vA, vB, lrA, lrB))
        .orElse(Option(joinCatalog.get(s"$dirB|$dirA"))
          .map(es => (es, vB, vA, lrB, lrA)))
        .getOrElse(return None)

    val factIds = lrFact.output.map(_.exprId).toSet
    val dimIds = lrDim.output.map(_.exprId).toSet

    // The join condition as equi-key names: a conjunction of
    // fact.k = dim.k (any other shape never matches any entry).
    val eqKeyNames = splitConjuncts(j.condition.get).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name == b.name &&
            ((factIds(a.exprId) && dimIds(b.exprId)) ||
              (dimIds(a.exprId) && factIds(b.exprId))) => a.name
      case _ => return None
    }

    // Container selection — the base catalog's rule: exact grouping
    // match first (pure projection), then fewest group keys. Each
    // candidate must cover exactly this join's equi-key set, be fresh
    // on BOTH scanned versions (snapshot pinned, as in rewrite()), and
    // survive substitution.
    val groupNames = agg.groupingExpressions.collect {
      case a: AttributeReference => a.name
    }.toSet
    val ordered = entries.sortBy(e =>
      (if (e.groupKeys.toSet == groupNames) 0 else 1, e.groupKeys.length))
    ordered.view.flatMap { entry =>
      val joinKeySet = entry.joinKeys.toSet
      if (eqKeyNames.toSet != joinKeySet) None
      else {
        // Constraint propagation plants inferred `isnotnull(joinKey)`
        // (and the analyzer may plant them for filtered keys) below the
        // join — for the INNER equi-join these are implied by the join
        // itself (a null key never matches), which the view already
        // materializes, so they are dropped from matching. Every
        // surviving side condition must map onto view columns like a
        // top-level filter.
        def implied(e: Expression): Boolean = e match {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(
            a: AttributeReference) => joinKeySet.contains(a.name)
          case _ => false
        }
        val sideConds = (condsA ++ condsB).filterNot(implied)
        freshPinned(entry.view, m =>
          m.get(FactSyncKey).contains(factV.toString) &&
            m.get(DimSyncKey).contains(dimV.toString))
          .flatMap { viewPlan =>
            substitute(agg, conds.filterNot(implied) ++ sideConds, viewPlan,
              entry.groupKeys, entry.kind,
              keyAttrs = (lrFact.output ++ lrDim.output)
                .filter(a => entry.groupKeys.contains(a.name)),
              isValueAttr = a => a.name == entry.valueCol && factIds(a.exprId),
              allScanIds = factIds ++ dimIds,
              serveDouble = entry.serveDouble)
          }
      }
    }.headOption
  }

  /** Shared substitution core: map the Aggregate's grouping, filters,
    * and aggregate calls onto the columns of `viewPlan` (the PINNED
    * analyzed scan of the view snapshot whose freshness was validated);
    * bail out (None — plan untouched) on the first shape that does not
    * map exactly. */
  private def substitute(agg: Aggregate, conds: Seq[Expression],
      viewPlan: LogicalPlan, keyCols: Seq[String], kind: Kind,
      keyAttrs: Seq[Attribute],
      isValueAttr: AttributeReference => Boolean,
      allScanIds: Set[ExprId],
      serveDouble: Boolean): Option[LogicalPlan] = {
    // Grouping must be plain key attributes; filters only over keys.
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val keySet = keyCols.toSet
    if (!groupAttrs.forall(a => keySet.contains(a.name))) return None
    val groupNames = groupAttrs.map(_.name).toSet
    val exact = groupNames == keySet
    if (!conds.forall(_.references.forall(r => keySet.contains(r.name))))
      return None
    // Key-only filter predicates are safe in BOTH forms ONLY when
    // deterministic: group-predicate commutation moves the filter from
    // per-base-row to per-view-group application, which preserves the
    // result for a function of the keys but changes the sampling
    // distribution of a non-deterministic predicate (rand() < 0.5 has
    // an EMPTY reference set and would pass the key check vacuously) —
    // the same non-commutable rule Calcite and Spark's own
    // PushDownPredicate apply.
    if (!conds.forall(_.deterministic)) return None
    val viewAttr: Map[String, Attribute] =
      viewPlan.output.map(a => a.name -> a).toMap
    if (!(kind.cols ++ keyCols).forall(viewAttr.contains)) return None

    val (vp, vs) = kind.valueSpace
    def isValueDec(e: Expression): Boolean = e match {
      case Cast(a: AttributeReference, dt: DecimalType, _, _) =>
        isValueAttr(a) && dt.precision == vp && dt.scale == vs
      case _ => false
    }
    // the serveDouble contract (class doc): an UNCAST double value
    // column — served with decimal-exact accumulation and one final
    // cast, valid under the registration's values-fit-the-space
    // assertion
    def isValueRaw(e: Expression): Boolean = e match {
      case a: AttributeReference =>
        serveDouble && isValueAttr(a) &&
          a.dataType == org.apache.spark.sql.types.DoubleType
      case _ => false
    }
    def hasMinMax = kind.cols.contains("min_value")

    // Map one aggregate call onto the view. Exact form: a view column.
    // Roll-up form: a re-aggregation over the view column.
    def mapAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.isDefined || ae.mode != Complete) return None
      if (ae.isDistinct) {
        // count(distinct cast(v)) → n_distinct, exact-match form only
        // (distinct counts cannot be re-aggregated from group counts)
        return ae.aggregateFunction match {
          case Count(Seq(c)) if isValueDec(c) && exact &&
              kind.cols.contains("n_distinct") &&
              viewAttr("n_distinct").dataType == LongType =>
            Some(viewAttr("n_distinct"))
          case _ => None
        }
      }
      def reAgg(fn: AggregateFunction): Expression = fn.toAggregateExpression()
      // sum_value is stored decimal(30,4) for every kind; a query sum
      // in a narrower value space (e.g. fullStats' (18,4) → sum type
      // (28,4)) takes a cast back — overflow → null either way under
      // the non-ANSI semantics this engine runs with.
      def castTo(e: Expression, dt: org.apache.spark.sql.types.DataType) =
        if (e.dataType == dt) e else Cast(e, dt)
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) if v != null =>
          val n = viewAttr("n")
          if (n.dataType != LongType) None
          else if (exact) Some(n)
          else Some(Coalesce(Seq(reAgg(Sum(n)), Literal(0L))))
        // count(cast(v)) / count(v) — non-null count, served by the
        // n_nonnull column (count(*) would be wrong on null-bearing
        // groups; for the raw form, cast-null ≡ null under the
        // serveDouble values-fit-the-space assertion)
        case Count(Seq(c)) if (isValueDec(c) || isValueRaw(c)) &&
            kind.cols.contains("n_nonnull") &&
            viewAttr("n_nonnull").dataType == LongType =>
          val nn = viewAttr("n_nonnull")
          if (exact) Some(nn)
          else Some(Coalesce(Seq(reAgg(Sum(nn)), Literal(0L))))
        // avg(cast(v)): reuse Average's OWN evaluateExpression — the
        // exact internal cast/divide/rounding chain — with its (sum,
        // count) buffer attributes substituted by the view's stored
        // sum and NON-NULL count (Average counts non-null values;
        // serving count from n would silently shift every null-bearing
        // group's average). The stored decimal(30,4) sum casts into
        // Average's (28,4) sum-buffer space losslessly for any value
        // the real buffer could hold.
        // for the RAW double form, sumBuf.dataType is DoubleType and
        // the castTo below becomes the contract's single decimal →
        // double cast; Average's own evaluateExpression then divides
        // two doubles exactly as any engine replaying the contract does
        case a: Average if (isValueDec(a.child) || isValueRaw(a.child)) &&
            kind.cols.contains("n_nonnull") &&
            viewAttr("n_nonnull").dataType == LongType &&
            a.aggBufferAttributes.length == 2 =>
          val sumBuf = a.aggBufferAttributes.head
          val cntBuf = a.aggBufferAttributes(1)
          val sv = viewAttr("sum_value")
          val nn = viewAttr("n_nonnull")
          val (sumE, cntE) =
            if (exact) (castTo(sv, sumBuf.dataType),
              castTo(nn, cntBuf.dataType))
            else (Cast(reAgg(Sum(sv)), sumBuf.dataType),
              castTo(Coalesce(Seq(reAgg(Sum(nn)), Literal(0L))),
                cntBuf.dataType))
          Some(a.evaluateExpression.transform {
            case r: AttributeReference if r.exprId == sumBuf.exprId => sumE
            case r: AttributeReference if r.exprId == cntBuf.exprId => cntE
          })
        case s: Sum if isValueDec(s.child) &&
            ae.dataType.isInstanceOf[DecimalType] =>
          val sv = viewAttr("sum_value")
          if (exact) Some(castTo(sv, ae.dataType))
          else Some(Cast(reAgg(Sum(sv)), ae.dataType))
        // sum(v: double): decimal-exact accumulation in the view, one
        // final cast to double (the serveDouble contract)
        case s: Sum if isValueRaw(s.child) =>
          val sv = viewAttr("sum_value")
          if (exact) Some(castTo(sv, ae.dataType))
          else Some(Cast(reAgg(Sum(sv)), ae.dataType))
        case m: Min if isValueDec(m.child) && hasMinMax =>
          val mv = viewAttr("min_value")
          if (mv.dataType != ae.dataType) None
          else if (exact) Some(mv) else Some(reAgg(Min(mv)))
        case m: Max if isValueDec(m.child) && hasMinMax =>
          val mv = viewAttr("max_value")
          if (mv.dataType != ae.dataType) None
          else if (exact) Some(mv) else Some(reAgg(Max(mv)))
        // min/max(v: double): the stored decimal extremum IS the raw
        // extremum under the values-fit-the-space assertion (the cast
        // is monotone), cast back to double at serve time
        case m: Min if isValueRaw(m.child) && hasMinMax =>
          val mv = viewAttr("min_value")
          if (exact) Some(castTo(mv, ae.dataType))
          else Some(Cast(reAgg(Min(mv)), ae.dataType))
        case m: Max if isValueRaw(m.child) && hasMinMax =>
          val mv = viewAttr("max_value")
          if (exact) Some(castTo(mv, ae.dataType))
          else Some(Cast(reAgg(Max(mv)), ae.dataType))
        case _ => None
      }
    }

    val baseKeyToView: Map[ExprId, Attribute] =
      keyAttrs.map(a => a.exprId -> viewAttr(a.name)).toMap

    // Rewrite every output expression; bail out (None) if any aggregate
    // or any residual scan-attribute reference fails to map.
    var ok = true
    def rewriteExpr(e: Expression): Expression = e.transformUp {
      case ae: AggregateExpression =>
        mapAgg(ae) match {
          case Some(r) => r
          case None => ok = false; ae
        }
      case a: AttributeReference if baseKeyToView.contains(a.exprId) =>
        baseKeyToView(a.exprId)
    }
    val outExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        val r = rewriteExpr(a)
        Alias(r, a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        Alias(rewriteExpr(child), name)(exprId = al.exprId)
      case _ => ok = false; return None
    }
    if (!ok) return None
    if (outExprs.exists(_.references.exists(r => allScanIds.contains(r.exprId))))
      return None

    val filtered =
      if (conds.isEmpty) viewPlan
      else Filter(conds.map(rewriteExpr).reduce(And), viewPlan)
    if (!ok) return None

    if (exact) Some(Project(outExprs, filtered))
    else Some(Aggregate(groupAttrs.map(a => baseKeyToView(a.exprId)),
      outExprs, filtered))
  }
}
