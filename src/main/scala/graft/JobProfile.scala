package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run named queries under a scheduler listener and report
  * scheduled-job / stage / task counts plus wall time, one JSON line per
  * query — the measurement side of "is this iterative operator
  * overhead-dominated at lab scale?" (each eager localCheckpoint is its
  * own scheduled job, so job count is the direct probe of per-round
  * scheduling overhead vs real shuffle work).
  *
  * `sbt "runMain graft.JobProfile <sfDir> q_pagerank,q_hits,q_label_prop"`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else Seq("q_pagerank", "q_hits", "q_label_prop", "q_dedup_families")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect() // session warmup

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); () }
    })

    names.foreach { n =>
      // drain BEFORE zeroing so a prior query's stragglers never leak in
      org.apache.spark.GraftListenerBridge.drainListenerBus(
        spark.sparkContext, 30000)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge.drainListenerBus(
        spark.sparkContext, 30000)
      println(f"""{"query":"$n","sec":$sec%.2f,"jobs":${jobs.get},""" +
        s""""stages":${stages.get},"tasks":${tasks.get}}""")
    }
    spark.stop()
  }
}
