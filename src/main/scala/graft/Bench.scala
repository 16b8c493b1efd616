package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM/session warmup outside timings

    // Machine-contention guardrails: a fixed CPU-bound calibration job
    // timed before and after the suite + the OS load average. Query times
    // here are wall-clock on a shared machine — if calibration_sec is far
    // off its idle-machine value (~0.5 s at 32 cpus) or load_avg is well
    // above `cpus`, the run is contention-skewed and its totals should
    // not be compared against BASELINE (see README "Bench variance").
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def loadAvg: Double = osBean.getSystemLoadAverage
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(2000000000L).selectExpr("count(if(id % 7 = 0, 1, null))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val loadStart = loadAvg
    val calStart = calibrate()

    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Full-evaluation action: the noop sink consumes every row and
      // column, so projection-heavy queries are actually executed —
      // a bare .count() lets Catalyst prune the entire projection and
      // under-measures map-heavy work.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        // a failed query must not masquerade as a fast one
        errors += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val calEnd = calibrate()
    val loadEnd = loadAvg
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val cal = s"""{"sec_start":$calStart,"sec_end":$calEnd,""" +
      s""""load_avg_start":$loadStart,"load_avg_end":$loadEnd,"cpus":$cpus}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"calibration":$cal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
