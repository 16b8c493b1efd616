package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named access to the driver-provided testdata tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; this is the
  * single place that maps a logical table name to its parquet path so the
  * scan (and therefore Catalyst's pushdown/pruning) starts from one spot.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as a long of nanos and floor-convert to
      // microseconds with integer `div` (double division would lose
      // precision above 2^53 ns). The nanosAsLong flag must hold for the
      // life of the (lazy) scan, so it belongs in the session builder —
      // graft's entry points (Verify/Bench/tests) all provision it there.
      // Externally-built sessions get a clear failure instead of a silent
      // session-wide reader-behavior change.
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        throw new IllegalStateException(
          "Tables.load(events) needs spark.sql.legacy.parquet.nanosAsLong=true " +
            "(events.ts is parquet TIMESTAMP(NANOS)); set it in your " +
            "SparkSession.builder — it cannot be applied reliably after the " +
            "session exists, and graft will not mutate your session's conf")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so plain `spark.sql` works —
    * the reference's Athena surface (SURVEY.md §2.9): tables queryable
    * under stable names. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
