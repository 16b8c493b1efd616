package graft.pipelines

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{CoreOps, ScaleOps}
import graft.sources.Sources
import graft.table.LakeTable

/** End-to-end job driver — the reference's per-job main composed with its
  * Step-Functions routing (order_glue_job.py:186-212,
  * state_machine.json:25-45): for each entity,
  *
  *   validate → cast → one-pass Observation metrics → valid/reject split
  *   → rejected rows to a side sink (K4 JSON / K5 CSV) → dedup →
  *   RI semi-join with NON-FATAL fallback (J2: a missing dim degrades to
  *   identity, the job still lands) → MERGE into the lake table →
  *   metrics log (K6) written in a `finally`.
  *
  * Metrics cost one pass, not one job per count: the Observation node sits
  * under the split, so the rejected-sink write — the first action — feeds
  * all three counters (reference anti-pattern §4.3-1 fixed).
  *
  * Jobs run in the state machine's order (products → orders → order
  * items). Each is independent; a cluster deployment would run them as
  * separate applications exactly as Step Functions runs separate Glue
  * jobs.
  */
object Orchestrator {

  case class JobReport(entity: String, nInput: Long, nValid: Long,
      nRejected: Long, nMerged: Long, riFallback: Boolean)

  /** All three reference jobs against one lake root. Idempotent: rerunning
    * merges the same rows onto the same keys. */
  def runAll(spark: SparkSession, sfDir: String, root: String): Seq[JobReport] =
    Seq(runProducts(spark, sfDir, root),
      runOrders(spark, sfDir, root),
      runOrderItems(spark, sfDir, root))

  /** Orders job (order_glue_job.py:186-212). `dimSfDir` points at the
    * directory holding the RI dimension (lineitem) — a bad path exercises
    * the reference's try/except fallback. */
  def runOrders(spark: SparkSession, sfDir: String, root: String,
      dimSfDir: Option[String] = None): JobReport = {
    val raw = Tables.load(spark, sfDir, "orders")
    val casted = CoreOps.castColumns(Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType))(
      CoreOps.enforceSchema(Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"))(raw))
    val dim = scala.util.Try(
      Tables.load(spark, dimSfDir.getOrElse(sfDir), "lineitem")
        .selectExpr("l_orderkey as o_orderkey"))
    runJob(spark, root, "orders", casted,
      notNull = Seq("o_orderkey", "o_custkey", "o_orderdate"),
      dedup = CoreOps.latestWins(Seq("o_orderkey"), "o_orderdate"),
      riKeys = Seq("o_orderkey"), dim = dim,
      mergeKeys = Seq("o_orderkey"), rejectedFormat = "json")
  }

  /** Order-items job (order_items_glue_job.py:96-207); rejected rows go to
    * the CSV sink as in the reference. */
  def runOrderItems(spark: SparkSession, sfDir: String, root: String,
      dimSfDir: Option[String] = None): JobReport = {
    val raw = Tables.load(spark, sfDir, "lineitem")
    val projected = CoreOps.enforceSchemaLenient(Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"))(raw)
    val dim = scala.util.Try(
      Tables.load(spark, dimSfDir.getOrElse(sfDir), "orders")
        .selectExpr("o_orderkey as l_orderkey"))
    runJob(spark, root, "order_items", projected,
      notNull = Seq("l_orderkey", "l_partkey", "l_shipdate"),
      dedup = CoreOps.latestWins(Seq("l_orderkey", "l_linenumber"), "l_shipdate",
        tiebreakers = Seq(col("l_partkey"), col("l_suppkey"))),
      riKeys = Seq("l_orderkey"), dim = dim,
      mergeKeys = Seq("l_orderkey", "l_linenumber"), rejectedFormat = "csv")
  }

  /** Products job (products_glue_job.py:135-194). */
  def runProducts(spark: SparkSession, sfDir: String, root: String,
      dimSfDir: Option[String] = None): JobReport = {
    val raw = Sources.requireNonEmpty(Tables.load(spark, sfDir, "part"), "products")
    val validated = CoreOps.enforceSchema(Seq(
      "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))(raw)
    val dim = scala.util.Try(
      Tables.load(spark, dimSfDir.getOrElse(sfDir), "lineitem")
        .selectExpr("l_partkey as p_partkey"))
    runJob(spark, root, "products", validated,
      notNull = Seq("p_partkey", "p_name"),
      dedup = CoreOps.latestWins(Seq("p_partkey"), "p_name"),
      riKeys = Seq("p_partkey"), dim = dim,
      mergeKeys = Seq("p_partkey"), rejectedFormat = "json")
  }

  private def runJob(spark: SparkSession, root: String, entity: String,
      casted: DataFrame, notNull: Seq[String],
      dedup: DataFrame => DataFrame, riKeys: Seq[String],
      dim: scala.util.Try[DataFrame], mergeKeys: Seq[String],
      rejectedFormat: String): JobReport = {
    val (instrumented, obs) = ScaleOps.observedSplitMetrics(casted, notNull)
    val (valid, rejected) = CoreOps.splitValid(notNull)(instrumented)
    var metrics = Map.empty[String, Any]
    try {
      // rejected side sink is the FIRST action: the observe node sits
      // below the split filter, so this single pass also fills the metrics
      rejectedFormat match {
        case "csv" => Sources.writeCsv(rejected, s"$root/rejected/$entity")
        case _ => Sources.writeJson(rejected, s"$root/rejected/$entity")
      }
      metrics = obs.get
      val deduped = dedup(valid)
      val riFallback = dim.isFailure
      val joined = CoreOps.semiJoinIfPresent(riKeys, dim.get)(deduped)
      val table = LakeTable(spark, root, entity, mergeKeys)
      table.upsert(joined)
      JobReport(entity,
        metrics("n_input").asInstanceOf[Long],
        metrics("n_valid").asInstanceOf[Long],
        metrics("n_rejected").asInstanceOf[Long],
        table.read.count(), riFallback)
    } finally {
      // reference writes its run log in a finally — success or not
      Sources.writeTextLog(spark,
        Seq(s"entity=$entity metrics=${metrics.toSeq.sortBy(_._1).mkString(",")}"),
        s"$root/logs/$entity")
    }
  }

  /** Deterministic fresh-root helper for the oracle query. */
  def deleteRecursively(p: String): Unit = {
    val path: Path = Paths.get(p)
    if (Files.exists(path))
      Files.walk(path).sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
  }
}
