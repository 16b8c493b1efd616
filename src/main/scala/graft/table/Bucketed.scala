package graft.table

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffled table layout so repeated joins and
  * aggregations on the bucket key run exchange-free.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every join vs once at write time: two tables bucketed into the same
  * number of buckets on the join key sort-merge-join with NO Exchange on
  * either side (verified in BucketedSpec by asserting the physical plan).
  */
object Bucketed {

  /** Write `df` as a bucketed (and in-bucket sorted) managed table.
    * Self-cleaning: a managed-table LOCATION left in the warehouse dir by
    * a previous session is unknown to this session's in-memory catalog,
    * so SaveMode.Overwrite alone fails with LOCATION_ALREADY_EXISTS —
    * drop the catalog entry and remove the stale directory first. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val loc = wh.resolve(table.toLowerCase)
    if (java.nio.file.Files.exists(loc))
      scala.util.Using.resource(java.nio.file.Files.walk(loc))(
        _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(java.nio.file.Files.delete(_)))
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Exchange-free equi-join of two same-bucketed tables. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      on: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), on)
}
