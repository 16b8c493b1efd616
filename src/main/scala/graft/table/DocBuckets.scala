package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Id-hash bucket layout for a document/embedding corpus table — the
  * read-side complement of [[DedupIndex]]'s `idParts` packed-index
  * layout, applied to the CORPUS table itself.
  *
  * Why it exists: the CDC index maintainers ([[DedupIndex.applyChanges]],
  * [[AnnIndex.applyChanges]]) fetch the touched/candidate rows' payloads
  * (texts, vectors) from the current corpus snapshot with a key-pruned
  * semi-join — but the SCAN side of that join reads the whole corpus
  * parquet, the last O(corpus) term in an otherwise O(changes)
  * maintenance path (the measured residual slope of the `dedupidxp`
  * ScaleProbe ladder). Hash-partitioning the corpus table on
  * `__db = pmod(xxhash64(id), parts)` turns that fetch into a
  * partition-PRUNED read: a batch of b ids touches ≤ min(b, parts)
  * partitions, so the fetch opens only the touched ids' files
  * regardless of corpus size. At 100 TB with single-document CDC
  * batches this is the difference between a full-corpus scan per batch
  * and a handful of file opens.
  *
  * The bucket is derived from the MERGE KEY, so a row can never change
  * partition across updates (same invariant as `idParts`/`postingParts`),
  * and [[LakeTable]]'s partition-pruned MERGE makes corpus churn writes
  * O(touched buckets) as a side effect.
  *
  * Layout contract: the writer must stamp `__db` with [[withBucket]]
  * (or [[bucket]]) over the id column AT THE TYPE THE INDEX READS IT —
  * xxhash64 is type-sensitive, so an int-typed id hashed by the writer
  * and long-cast by the reader would bucket differently. A consumer's
  * pruned fetch re-derives the bucket per fetched row and fails LOUDLY
  * (in-plan assert) on any row whose stored `__db` disagrees, so a
  * mixed-modulus or mixed-type layout can never silently lose rows
  * inside the probed partitions. */
object DocBuckets {

  /** The derived partition column's name. */
  val ColName = "__db"

  /** The bucket of an id under a `parts`-way layout. */
  def bucket(id: Column, parts: Int): Column =
    pmod(xxhash64(id), lit(parts.toLong))

  /** Stamp the layout column onto a corpus frame before writing it to a
    * `partitionCols = Seq(DocBuckets.ColName)` LakeTable. */
  def withBucket(df: DataFrame, idCol: String, parts: Int): DataFrame =
    df.withColumn(ColName, bucket(col(idCol), parts))

  /** Prune `snapshot` to the partitions the `ids` frame's id values can
    * live in: collect the ids' distinct bucket set (bounded ≤ min(ids,
    * parts) rows — the layout-sized-collect contract of
    * [[FileSkipping]]), filter on a static IN-list so partition pruning
    * reaches the parquet source, and fold in the loud layout assert
    * (stored `__db` must equal the re-derived bucket for every row
    * actually read). The caller still applies its exact id semi-join —
    * this only bounds the scan. */
  def pruned(snapshot: DataFrame, snapshotId: Column, parts: Int,
      ids: DataFrame, idsCol: String): DataFrame = {
    require(snapshot.columns.contains(ColName),
      s"corpus snapshot has no $ColName layout column — write it with " +
        s"DocBuckets.withBucket (modulus $parts) into a " +
        s"partitionCols = Seq(\"$ColName\") table, or set docParts = 0")
    val dbs = ids.select(bucket(col(idsCol), parts).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    snapshot.filter(col(ColName).isin(dbs: _*))
      .filter(assert_true(col(ColName) === bucket(snapshotId, parts),
        concat(lit(s"corpus layout mismatch: stored $ColName disagrees " +
          s"with pmod(xxhash64(id), $parts) for id "),
          snapshotId.cast("string"),
          lit(" — the table was bucketed with a different modulus or id " +
            "type; a pruned fetch would silently lose rows"))).isNull)
  }
}
