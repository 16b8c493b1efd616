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

  /** `nMerged` = rows upserted by THIS run (observed during the merge
    * write itself — no extra action), not the table's post-merge total. */
  case class JobReport(entity: String, nInput: Long, nValid: Long,
      nRejected: Long, nMerged: Long, riFallback: Boolean)

  /** Source table file backing each entity's job (the "files present?"
    * probe target — reference Lambda CountFiles, state_machine.json:4-24). */
  private val inputTable = Map(
    "products" -> "part", "orders" -> "orders", "order_items" -> "lineitem")

  private def inputPath(sfDir: String, entity: String): Path =
    Paths.get(sfDir, s"${inputTable(entity)}.parquet")

  /** All three reference jobs against one lake root, PRESENCE-GATED like
    * the reference's FileCountChoice (state_machine.json:25-45): an entity
    * whose input file is absent is skipped (no report row), the others
    * still run. Idempotent: rerunning merges the same rows onto the same
    * keys.
    *
    * `archiveInputs` replays the reference's post-success archive move
    * (order_glue_job.py:58-82): a job that lands moves its input file to
    * `root/archive/<entity>/<file>.<millis>`. Default OFF — the standard
    * testdata inputs are read-only and shared across queries.
    */
  def runAll(spark: SparkSession, sfDir: String, root: String,
      archiveInputs: Boolean = false): Seq[JobReport] = {
    val jobs = Seq[(String, () => JobReport)](
      "products" -> (() => runProducts(spark, sfDir, root)),
      "orders" -> (() => runOrders(spark, sfDir, root)),
      "order_items" -> (() => runOrderItems(spark, sfDir, root)))
    jobs.flatMap { case (entity, run) =>
      if (!Files.exists(inputPath(sfDir, entity))) {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"orchestrator: no input for $entity (${inputPath(sfDir, entity)}), skipping")
        None
      } else {
        val report = run()
        if (archiveInputs) archiveInput(sfDir, root, entity)
        Some(report)
      }
    }
  }

  /** Post-success archive: move the job's input file into
    * `root/archive/<entity>/` with a timestamp suffix, so a rerun of the
    * orchestrator sees no input and skips (the reference's
    * copy-then-delete raw/→archive/ move, order_glue_job.py:58-82). */
  private def archiveInput(sfDir: String, root: String, entity: String): Unit = {
    val src = inputPath(sfDir, entity)
    val dstDir = Paths.get(root, "archive", entity)
    Files.createDirectories(dstDir)
    val dst = dstDir.resolve(
      s"${src.getFileName}.${System.currentTimeMillis()}")
    Files.move(src, dst)
  }

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
      // nMerged rides the merge write via a second Observation — the
      // merged frame flows through this node during upsert's own action,
      // so the count costs nothing extra (no post-merge table re-scan;
      // one action per stage).
      val mergeObs = org.apache.spark.sql.Observation()
      table.upsert(joined.observe(mergeObs, count(lit(1)).as("n_merged")))
      JobReport(entity,
        metrics("n_input").asInstanceOf[Long],
        metrics("n_valid").asInstanceOf[Long],
        metrics("n_rejected").asInstanceOf[Long],
        mergeObs.get("n_merged").asInstanceOf[Long], riFallback)
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
