package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.ops.CoreOps

/** Lakehouse table layer over partitioned parquet (SURVEY.md §7.3).
  *
  * The environment has no Delta/Iceberg jar, so the reference's Delta
  * mechanics (jobs/order_glue_job.py:149-158) are provided here:
  *  - K1 partitioned first-load write
  *  - K2 MERGE upsert (WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT
  *    ALL) emulated as anti-join + unionByName, written to a staging dir
  *    and published via an atomic pointer swap — idempotent rerun without
  *    ACID
  *  - K3 table-exists probe choosing create vs merge
  *
  * Publishing is POINTER-based (a one-line `CURRENT` file naming the live
  * version directory, replaced with a single atomic rename) — the Delta/
  * Iceberg manifest-commit pattern in miniature. Readers resolve the
  * pointer first, so they see either the old version or the new one; there
  * is no instant at which the table is unreadable, and a crash at any step
  * of a write leaves the previous pointer and its data fully intact.
  *
  * Scale notes: the anti-join shuffles on the merge key exactly as Delta's
  * own MERGE does; with a `partitionBy` column the rewrite is a full-table
  * rewrite, which is the correct baseline without deletion vectors. At
  * 100 TB you'd bound the rewrite by first computing the touched partition
  * set from the source (partition pruning on the target scan) — provided
  * here via `prunePartitions`. Partition columns should be string/date/
  * integral-valued; null partition values are handled via Hive's
  * `__HIVE_DEFAULT_PARTITION__` convention.
  *
  * `partitionsFromKeys` is a caller ASSERTION that every partition
  * column's value is a pure function of the merge keys (the
  * hash-bucket layouts: DedupIndex's `__ib`, [[DocBuckets]]' `__db`).
  * Under it the pruned MERGE skips its matched-key target scan — the
  * one remaining O(table) term of a small-batch merge (column-pruned
  * to keys + partition columns, but still a full-table read) — because
  * a matched row shares the keys and therefore the derived partition.
  * Asserting it for a layout where a key's partition CAN change (e.g.
  * a date-partitioned table with corrected dates, or AnnIndex's
  * cell-partitioned inverted file) strands the stale row in its old
  * partition and silently breaks merge-key uniqueness — only set it
  * for genuinely key-derived layouts.
  */
final class LakeTable(spark: SparkSession, root: String, name: String,
    mergeKeys: Seq[String], partitionCols: Seq[String] = Nil,
    keepVersions: Int = 2, changeFeed: Boolean = false,
    partitionsFromKeys: Boolean = false) {

  private val HiveNullPart = "__HIVE_DEFAULT_PARTITION__"

  private def tableDir: Path = Paths.get(root, name)

  /** The table's directory (all versions live under it) — the identity
    * key optimizer-side consumers (e.g. the materialized-view rewrite
    * catalog) use to recognize scans of this table. */
  def tablePath: String = tableDir.toString

  private def pointerFile: Path = tableDir.resolve("CURRENT")
  private def stagingDir: Path = Paths.get(root, s".staging_$name")
  private def feedStagingDir: Path = Paths.get(root, s".staging_changes_$name")
  private def versionDir(v: Int): Path = tableDir.resolve(s"v$v")
  private def feedDir(v: Int): Path =
    tableDir.resolve("changes").resolve(s"v$v")

  /** Resolve the CURRENT pointer. "Pointer absent" (None — the table
    * was never published) and "pointer unreadable/unparseable" are
    * deliberately DIFFERENT outcomes: a damaged pointer fails loudly
    * everywhere instead of masquerading as an empty table, because the
    * silent interpretation is catastrophic — publish() would take
    * cur = 0 and reclaim EVERY live version dir as a "beyond-pointer
    * orphan" (and readChangeFeedStream would sweep every recorded
    * feed), turning a recoverable one-line-file corruption into total
    * data loss. Repair is manual by design: point CURRENT at the
    * latest good version dir. */
  private def currentVersion: Option[Int] =
    if (!Files.exists(pointerFile)) None
    else {
      val raw = Files.readString(pointerFile).trim
      Some(scala.util.Try(raw.stripPrefix("v").toInt).getOrElse(
        throw new IllegalStateException(
          s"table $name: CURRENT pointer exists but cannot be parsed " +
            s"('$raw') — refusing to guess; repair it to point at the " +
            "latest good version dir (treating it as absent would " +
            "reclaim every live version as an orphan)")))
    }

  /** K3 — exists probe (filesystem analogue of DeltaTable.isDeltaTable). */
  def exists: Boolean = currentVersion.exists(v => Files.isDirectory(versionDir(v)))

  /** Currently-published version number — the snapshot id a consumer
    * should RECORD when it syncs to this table (and later pass to
    * [[changesSince]]), instead of re-deriving it from
    * [[availableVersions]] after the fact: the oldest RETAINED version
    * shifts forward as writes prune history, so `availableVersions.min`
    * silently stops being "the version I synced at" after enough
    * writes, while the recorded number either still works or fails
    * loudly in [[readVersion]]'s retention check. */
  def version: Int = currentVersion.getOrElse(
    throw new IllegalStateException(s"table $name has no published version"))

  // ---- write-time Change Data Feed (Delta CDF analogue) ----
  //
  // With `changeFeed` on, every row-level DML write stages the rows it
  // changes — typed insert / update_preimage / update_postimage /
  // delete, the SAME types and change-detection hash as the snapshot
  // diff below — and publish() moves them to `changes/v{N}` for the
  // version the write produced. changesSince() then answers from the
  // recorded feeds in O(changes) instead of key-shuffling two full
  // snapshots, and KEEPS answering after retention has pruned the old
  // snapshot — the two properties that make incremental consumers
  // viable on a 100 TB base, where a snapshot diff is a full-table job
  // and retention is aggressive. Layout-only writes (compact, Z-order)
  // record an EMPTY feed so coverage stays contiguous; upsertScd2
  // records none (its bookkeeping rewrites aren't row-level change
  // events), which just falls changesSince back to the snapshot diff
  // across that span. Feed dirs survive version pruning deliberately:
  // they ARE the CDC log.
  //
  // Semantics note (matches Delta CDF): the feed is a PER-VERSION
  // event log, the snapshot diff a NET endpoint comparison. Over a
  // single write they are identical; over multiple writes the feed may
  // contain canceling events (insert then delete of the same key)
  // whose signed composition nets to exactly the snapshot diff — which
  // is what delta-rule consumers (IncrementalView) apply anyway.

  // ---- transactional per-version metadata ----
  //
  // A tiny `_meta.json` (flat string map) lives INSIDE each version
  // dir — invisible to parquet readers (underscore prefix), carried
  // forward by every write, and swapped atomically WITH the data it
  // was committed alongside. This is the hook for Delta's
  // txnAppId/txnVersion pattern: a foreachBatch consumer records its
  // last-applied batch id in the SAME commit as the rows it applied,
  // so a crash between "apply" and "remember" is impossible and
  // at-least-once delivery yields exactly-once table state
  // (Streams.maintainSumViewStream uses it).

  /** The current version's committed metadata (empty before any
    * meta-carrying write). */
  def meta: Map[String, String] =
    if (!exists) Map.empty else readMeta(currentDir)

  private def readMeta(dir: Path): Map[String, String] = {
    val f = dir.resolve("_meta.json")
    if (!Files.exists(f)) Map.empty
    else {
      val txt = Files.readString(f)
      val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      pair.findAllMatchIn(txt)
        .map(m => unescapeJson(m.group(1)) -> unescapeJson(m.group(2)))
        .toMap
    }
  }

  private def writeMeta(dir: Path, m: Map[String, String]): Unit =
    if (m.nonEmpty) {
      val body = m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${escapeJson(k)}":"${escapeJson(v)}"""" }
        .mkString("{", ",", "}")
      Files.writeString(dir.resolve("_meta.json"), body)
    }

  private def escapeJson(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unescapeJson(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  private def stageFeed(feed: DataFrame): Unit = {
    deleteRecursively(feedStagingDir)
    feed.write.mode("overwrite")
      // no _SUCCESS marker: the pointer swap is this table's commit
      // marker (see writeTo)
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(feedStagingDir.toString)
    // schema fingerprint (underscore file, invisible to parquet): lets
    // the epoch-grouping replay reader key each dir with one tiny text
    // read instead of a parquet footer probe — on a 1,000-version
    // catch-up that is the difference between O(versions) footer
    // probes (tens of ms each) and O(versions) microsecond file reads,
    // with footers then touched only once per EPOCH
    Files.writeString(feedStagingDir.resolve("_schema_fp"),
      schemaFingerprint(feed.schema))
  }

  /** Nullability-free schema rendering used both as the fp-file content
    * and as the footer-probe fallback key — the two MUST render
    * identically so a mixed span (old dirs without the file, new dirs
    * with it) still groups into one epoch. */
  private def schemaFingerprint(st: org.apache.spark.sql.types.StructType): String =
    st.map(f => s"${f.name}:${f.dataType.sql}").mkString("|")

  /** Parse a fingerprint back into the (nullable-widened) schema it was
    * rendered from, or None when the roundtrip is not lossless (a
    * column name containing ':' or '|', a pre-fp footer-derived key
    * that fails to re-render) — the caller then falls back to the
    * footer probe. Lossless-roundtrip-checked so the fast path can
    * never serve a schema the footer probe would not have. */
  private def schemaFromFingerprint(fp: String):
      Option[org.apache.spark.sql.types.StructType] =
    try {
      import org.apache.spark.sql.types.{DataType, StructField, StructType}
      val fields = fp.split('|').toIndexedSeq.map { seg =>
        val i = seg.indexOf(':')
        require(i > 0, s"no type in '$seg'")
        StructField(seg.substring(0, i),
          DataType.fromDDL(seg.substring(i + 1)))
      }
      val st = StructType(fields)
      if (schemaFingerprint(st) == fp) Some(st) else None
    } catch { case _: Throwable => None }

  /** Stage the insert/update feed for an upsert of `source` against the
    * CURRENT snapshot (call before publish; reads resolve the old
    * pointer). Schema-evolving sources align both sides with typed
    * nulls, mirroring changesSince's additive-evolution rule.
    *
    * Shape: ONE left join of source against the target's (keys, row
    * struct, non-key hash) — unmatched source rows explode to a typed
    * insert event, matched-with-changed-hash rows to a pre+post pair,
    * unchanged rows to nothing. A single key-shuffle of the target
    * instead of the naive anti-join + change-join + two semi-joins
    * (the CDF write amplification recorded in BASELINE round 9). */
  private def stageUpsertFeed(source: DataFrame): Unit =
    stageFeed(upsertFeedEvents(source))

  /** Stage the merged data AND its change feed in ONE Spark action
    * (unpartitioned tables): both frames ride a single union write,
    * discriminated by a `__dest` partition column, and the staged
    * output is then rearranged with same-filesystem renames into the
    * canonical stagingDir + feedStagingDir layout — publish() and every
    * reader are untouched. Vs. the two sequential writes this removes
    * one full write job (driver latency + commit protocol) per
    * feed-carrying DML — measured ~0.25 s at lab scale, one fewer
    * job/commit round-trip at any scale — and lets the planner share
    * runtime-reused exchanges between the merged rewrite and the feed
    * derivation (both shuffle the target by the merge key).
    *
    * Data files physically carry an all-NULL `_change_type` column (the
    * union's alignment): invisible to every reader, because non-empty
    * version dirs are served from the committed `_schema_ddl` sidecar
    * ([[declaredRead]]), which prunes it, and the sidecar is written
    * from the LOGICAL data schema below. The feed's `_schema_fp` is
    * written from the union's column order — the order the physical
    * feed files actually carry.
    *
    * Partitioned tables keep the two-write path: their staged layout
    * (Hive partition dirs consumed by the hard-link reuse walk) does
    * not compose with the discriminator column. An EMPTY feed gets an
    * explicit empty-frame write (the partitioned writer emits no dir
    * for an empty branch) so feed coverage stays contiguous —
    * changesSince's fast path depends on it. */
  private def stageWithFeed(df: DataFrame, feed: DataFrame): Unit = {
    if (partitionCols.nonEmpty) { writeTo(df, stagingDir); stageFeed(feed); return }
    import org.apache.spark.sql.functions.lit
    deleteRecursively(stagingDir)
    deleteRecursively(feedStagingDir)
    val fused = df
      .withColumn("_change_type", lit(null).cast("string"))
      .withColumn("__dest", lit("data"))
      .unionByName(feed.withColumn("__dest", lit("feed")),
        allowMissingColumns = true)
    fused.write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .partitionBy("__dest").parquet(stagingDir.toString)
    val feedSchema = org.apache.spark.sql.types.StructType(
      fused.schema.fields.filterNot(_.name == "__dest"))
    val dataPart = stagingDir.resolve("__dest=data")
    val feedPart = stagingDir.resolve("__dest=feed")
    if (Files.isDirectory(feedPart))
      Files.move(feedPart, feedStagingDir, StandardCopyOption.ATOMIC_MOVE)
    else
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], feedSchema)
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(feedStagingDir.toString)
    if (Files.isDirectory(dataPart)) {
      scala.util.Using.resource(Files.list(dataPart))(_.forEach(p =>
        Files.move(p, stagingDir.resolve(p.getFileName.toString))))
      Files.delete(dataPart)
    }
    Files.writeString(feedStagingDir.resolve("_schema_fp"),
      schemaFingerprint(feedSchema))
    Files.writeString(stagingDir.resolve("_schema_ddl"), df.schema.toDDL)
    if (exists) writeMeta(stagingDir, readMeta(currentDir))
  }

  private def upsertFeedEvents(source: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{array, explode, lit, struct, when, xxhash64}
    // the feed join only consults target rows MATCHING source keys, so
    // with a key-derived layout the target cut to the source's
    // partitions is lossless — without it every CDF-recording write
    // pays a full-table read just to stage its feed (the one remaining
    // O(table) term of a key-derived small-batch merge; partition-only
    // predicates prune at the source via driver-side evaluation)
    val target = prunedToSourceParts(read, source)
    val allCols = (target.columns ++
      source.columns.filterNot(target.columns.contains)).toIndexedSeq
    val dtypes = (target.schema ++ source.schema)
      .map(f => f.name -> f.dataType).toMap
    def align(df: DataFrame) = df.select(allCols.map { c =>
      if (df.columns.contains(c)) col(c)
      else lit(null).cast(dtypes(c)).as(c)
    }: _*)
    val nonKey = allCols.filterNot(mergeKeys.contains)
    def hashed =
      if (nonKey.isEmpty) lit(0L) else xxhash64(nonKey.map(col): _*)
    def packed(df: DataFrame, row: String, h: String) = align(df).select(
      mergeKeys.map(col) :+ struct(allCols.map(col): _*).as(row) :+
        hashed.as(h): _*)
    val events = packed(source, "__s", "__hs")
      .join(packed(target, "__t", "__ht"), mergeKeys, "left")
      .filter(col("__ht").isNull || col("__hs") =!= col("__ht"))
      .select(explode(
        when(col("__ht").isNull,
          array(struct(col("__s").as("r"), lit("insert").as("ct"))))
        .otherwise(array(
          struct(col("__s").as("r"), lit("update_postimage").as("ct")),
          struct(col("__t").as("r"), lit("update_preimage").as("ct")))))
        .as("__e"))
      .selectExpr("__e.r.*", "__e.ct AS _change_type")
    events
  }

  /** Target cut to the partitions `source` writes into — LOSSLESS for
    * key-lookup purposes when `partitionsFromKeys` holds (a matched
    * target row shares the merge keys, hence the derived partition
    * value); the identity otherwise. The predicate references only
    * partition columns, so it prunes at the source via driver-side
    * partition evaluation. Source partition tuples are a bounded
    * batch-sized collect. Empty-string values fold into the null
    * partition on write (Spark's partition-writer rule), so the
    * read-back side only ever carries null for them. */
  private def prunedToSourceParts(target: DataFrame,
      source: DataFrame): DataFrame =
    if (!partitionsFromKeys || partitionCols.isEmpty) target
    else {
      import org.apache.spark.sql.functions.lit
      val tuples = source
        .select(partitionCols.map(c => col(c).cast("string")): _*)
        .distinct().collect()
        .map(r => partitionCols.indices
          .map(i => Option(r.getString(i)).filter(_.nonEmpty)))
        .toSeq
      val pred = tuples.map { tup =>
        partitionCols.zip(tup).map {
          case (c, Some(v)) => col(c).cast("string") === lit(v)
          case (c, None)    => col(c).isNull
        }.reduce(_ && _)
      }.reduceOption(_ || _).getOrElse(lit(false))
      target.filter(pred)
    }

  /** Directory holding the currently-published version's data files. */
  def currentDir: Path = versionDir(currentVersion.getOrElse(
    throw new IllegalStateException(s"table $name has no published version")))

  def read: DataFrame = readDir(currentDir)

  /** Read a version dir, surviving the EMPTY-PARTITIONED-TABLE case:
    * Spark's partitioned writer emits NO data files for an empty frame
    * (there are no partition values to create directories for), so a
    * later scan has nothing to infer a schema from — unlike an empty
    * UNPARTITIONED write, which emits one schema-bearing file. Every
    * write therefore stages a `_schema_ddl` sidecar (underscore file,
    * invisible to parquet readers) and this fallback serves the empty
    * snapshot with the committed schema. A partitioned table whose
    * first publish is empty is perfectly legal lakehouse state (an
    * index built over a corpus with no matches yet — DedupIndex's
    * pairs under `pairParts`).
    *
    * The empty case is detected UP FRONT (no partition dirs and no
    * data files) rather than by catching the inference failure: the
    * failed read would first surface as an ERROR-level
    * UNABLE_TO_INFER_SCHEMA stack trace through the listener bus —
    * alarming log noise for a designed, legal state.
    *
    * NON-empty dirs are ALSO served from the committed sidecar
    * ([[declaredRead]]): every version dir carries its `_schema_ddl`,
    * so re-inferring the schema from parquet footers on every [[read]]
    * call (~70 ms of driver-side footer I/O per call, measured round
    * 16 — paid 10-40x per lakehouse composite) buys nothing. This is
    * the Delta/Iceberg reader contract — the schema comes from the
    * committed table metadata, never from data-file inference. The
    * frame is constructed to be indistinguishable from the inferred
    * one: inference orders data columns (file order = staged-frame
    * order) before partition columns and reports every field nullable,
    * so the fast path reorders the DDL fields the same way and
    * nullable-widens. */
  private def readDir(dir: Path): DataFrame = {
    val ddl = dir.resolve("_schema_ddl")
    def schemaRead: DataFrame =
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
          Files.readString(ddl)))
        .parquet(dir.toString)
    def hasDataFiles: Boolean = {
      val s = Files.list(dir)
      try s.anyMatch(p => Files.isDirectory(p) ||
        p.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    if (Files.exists(ddl)) {
      if (!hasDataFiles) schemaRead else declaredRead(dir, ddl)
    } else spark.read.parquet(dir.toString) // pre-sidecar dirs: infer
  }

  /** Inference-free read of a non-empty version dir from its committed
    * `_schema_ddl` (see [[readDir]]). Falls back to footer inference
    * only when the sidecar does not cover this handle's partition
    * columns (a foreign/legacy layout this handle cannot reorder). */
  private def declaredRead(dir: Path, ddl: Path): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val full = StructType.fromDDL(Files.readString(ddl))
    if (!partitionCols.forall(full.fieldNames.contains))
      return spark.read.parquet(dir.toString)
    val ordered =
      if (partitionCols.isEmpty) full.fields.toSeq
      else full.fields.toSeq.filterNot(f => partitionCols.contains(f.name)) ++
        partitionCols.map(c => full.fields(full.fieldIndex(c)))
    spark.read.schema(StructType(ordered.map(_.copy(nullable = true))))
      .parquet(dir.toString)
  }

  /** Resolve the CURRENT snapshot ONCE and return (frame over that
    * version dir, THAT dir's committed meta), or None when the table
    * has no published version. [[read]] and [[meta]] each re-resolve
    * the pointer independently, so a consumer that validates metadata
    * and then reads — the MV rewrite's freshness check — has a
    * check-then-read race under a concurrent publish: the meta it
    * validated and the snapshot it scans can come from different
    * versions. This closes it: both come from one pointer resolution,
    * and the version dir itself is immutable once published. */
  def pinnedSnapshot: Option[(DataFrame, Map[String, String])] =
    currentVersion.filter(v => Files.isDirectory(versionDir(v))).map { v =>
      val dir = versionDir(v)
      (readDir(dir), readMeta(dir))
    }

  /** K1 — first-load create: partitioned overwrite. On an existing
    * table this is DDL-replace: data AND committed metadata reset
    * (constraints included, matching the CHECK-constraints doc below)
    * — the one write path that deliberately does NOT carry `_meta.json`
    * forward. `meta` (e.g. a layout-freeze key) commits ATOMICALLY with
    * the first version: create-then-annotate has a crash window that
    * leaves the table WITHOUT its frozen keys, and the layout guards'
    * absent-key tolerance (forall) would then silently accept a
    * mismatched instance. */
  def create(df: DataFrame, meta: Map[String, String] = Map.empty): Unit =
    createWithMeta(df, meta)

  /** The implicit-create path of a meta-carrying merge on a not-yet-
    * existing table: the `meta` map must land WITH the first version,
    * not be silently discarded — a streaming maintainer's exactly-once
    * batch marker dropped here would make the next drain re-apply the
    * whole batch (double-counting the view it just created). */
  private def createWithMeta(df: DataFrame, meta: Map[String, String]): Unit = {
    writeTo(df, stagingDir, carryMeta = false)
    if (meta.nonEmpty) writeMeta(stagingDir, meta)
    publish()
  }

  /** Fail like Delta's multiple-source-rows-matched error when a merge
    * source carries more than one row per merge key. The guard RIDES
    * the merge pass instead of probing: a per-key window count folded
    * into the key column itself, so every consumer of the source (the
    * anti-join's key build, the survivors' write, the staged feed)
    * trips it on the offending rows — one delta-sized shuffle inside
    * jobs that already run, not an extra job re-executing the source
    * lineage (a separate `groupBy.limit(1).collect()` probe measured
    * +0.15-0.7 s per merge on the bench's lakehouse queries). */
  private def guardUniqueSourceKeys(df: DataFrame, op: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{concat_ws, count, lit, raise_error, when}
    val k = mergeKeys.head
    val dup = count(lit(1)).over(Window.partitionBy(mergeKeys.map(col): _*))
    df.withColumn(k,
      when(dup > 1L, raise_error(concat_ws("",
        lit(s"$op into table $name: source has multiple rows for merge " +
          s"key (${mergeKeys.mkString(", ")}) = ("),
        concat_ws(", ", mergeKeys.map(c => col(c).cast("string")): _*),
        lit(") — a merge source must be unique on the merge keys " +
          "(Delta's multiple-source-rows-matched error)")))
        .cast(df.schema(k).dataType))
      .otherwise(col(k)))
  }

  /** K2 — MERGE upsert. `source` must already be deduplicated on
    * `mergeKeys` (every reference job guarantees this before merging).
    *
    * merged = (target ⟕̸ source on keys)  ∪  source
    * i.e. unmatched target rows survive, matched ones are replaced by the
    * source row (UPDATE ALL), unmatched source rows are inserted.
    *
    * `prunePartitions` (default ON for partitioned tables, matching Delta
    * MERGE's partition pruning): only the partitions the source touches
    * are rewritten; untouched partition files are HARD-LINKED from the
    * previous version into the new one (metadata-only, no data copied —
    * the POSIX analogue of manifest-level file reuse), so MERGE cost is
    * sub-linear in table size and every prior version stays a complete,
    * readable snapshot.
    */
  /** `meta` entries are merged into the table's committed metadata in
    * the SAME atomic publish as the merged rows (see the metadata
    * section above) — the transactional hook for exactly-once
    * incremental consumers. */
  def upsert(df: DataFrame, prunePartitions: Boolean = true,
      meta: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.functions.lit
    if (!exists) { createWithMeta(df, meta); return }
    enforceConstraints(df, "upsert")
    if (prunePartitions && partitionCols.nonEmpty)
      upsertPruned(df, lit(false), meta)
    else {
      val merged = CoreOps.antiJoin(mergeKeys, df)(read)
        .unionByName(df, allowMissingColumns = true)
      // feed reads still resolve the old pointer (publish comes after)
      if (changeFeed) stageWithFeed(merged, upsertFeedEvents(df))
      else writeTo(merged, stagingDir)
      if (meta.nonEmpty) writeMeta(stagingDir, readMeta(currentDir) ++ meta)
      publish()
    }
  }

  /** MERGE with `WHEN MATCHED AND <deleteWhen> THEN DELETE` semantics
    * in ONE atomic publish: rows of `df` satisfying `deleteWhen`
    * REMOVE their matching target rows; all other rows UPDATE/INSERT
    * exactly like [[upsert]]. A NULL `deleteWhen` row upserts (SQL
    * condition semantics).
    *
    * Divergence from a literal Delta three-clause MERGE: a delete-
    * marked row NEVER inserts — an UNMATCHED `df` row satisfying
    * `deleteWhen` is dropped, where Delta's unconditioned
    * `WHEN NOT MATCHED THEN INSERT ALL` would insert it (the matched-
    * only delete condition does not shield not-matched rows there).
    * This API is therefore `WHEN MATCHED AND deleteWhen THEN DELETE /
    * WHEN MATCHED THEN UPDATE ALL / WHEN NOT MATCHED AND NOT
    * deleteWhen THEN INSERT ALL` — the shape every incremental-view
    * extinction path wants (an n<=0 group must vanish whether or not
    * the view currently stores it, never be inserted as a zombie).
    *
    * This is the commit shape an exactly-once incremental consumer
    * needs when one batch both changes groups and extinguishes them:
    * the surviving rows, the removals, and the `meta` marker land in
    * the SAME pointer swap. The upsert-then-delete alternative has a
    * crash window — the marker commits with the upsert, the delete is
    * a second commit, and a crash between them strands the zero-count
    * rows forever because the replayed batch is skipped by its marker
    * (found by the round-9 audit of the streaming IVM maintainers).
    *
    * Cost: identical to [[upsert]] — one anti-join of the target
    * against `df`'s keys plus the survivors' union; deletions ride the
    * SAME anti-join (a deleted key is simply not re-inserted), so
    * extinction adds no extra pass. Partitioned tables prune exactly
    * like [[upsert]] (only partitions holding `df` keys — deletions
    * included — are rewritten; the rest hard-link), which is what lets
    * a bucket-partitioned IVM auxiliary table absorb per-batch merges
    * at O(touched buckets) instead of a full rewrite. */
  /** `matchedPartsHint`: a caller-supplied frame of partition-column
    * tuples ASSERTED to cover every target partition holding a row
    * whose merge key appears in `df` — it replaces clause (b)'s
    * column-pruned-but-O(table) matched-key scan in the pruned merge.
    * Use when a cheaper authority for the matched rows' partitions
    * exists (DedupIndex derives the postings sidecar's old-bucket
    * partitions from the id-pruned packed index — an O(batch) read).
    * An INCOMPLETE hint strands stale matched rows in unrewritten
    * partitions and silently breaks merge-key uniqueness — same
    * caller-assertion severity as `partitionsFromKeys`. Ignored for
    * unpartitioned tables and unpruned merges. */
  def upsertWithDelete(df: DataFrame,
      deleteWhen: org.apache.spark.sql.Column,
      meta: Map[String, String] = Map.empty,
      prunePartitions: Boolean = true,
      matchedPartsHint: Option[DataFrame] = None): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    val del = coalesce(deleteWhen, lit(false))
    // Delta parity (multiple-source-rows-matched error): a source
    // carrying more than one row per merge key — in particular a
    // SURVIVOR and a DELETE-marked row for the same key — would both
    // break key uniqueness in the target and stage a self-
    // contradictory change feed (a delete pre-image AND update
    // pre/post events for the same target row, double-subtracting in
    // any IVM consumer). Internal callers feed one row per key by
    // construction (groupBy output); the public path must fail
    // loudly, not corrupt silently.
    val src = guardUniqueSourceKeys(df, "upsertWithDelete")
    if (!exists) { createWithMeta(src.filter(!del), meta); return }
    val survivors = src.filter(!del)
    enforceConstraints(survivors, "upsertWithDelete")
    if (prunePartitions && partitionCols.nonEmpty) {
      upsertPruned(src, del, meta, matchedPartsHint); return
    }
    val merged = CoreOps.antiJoin(mergeKeys, src)(read)
      .unionByName(survivors, allowMissingColumns = true)
    if (changeFeed) stageWithFeed(merged, feedEventsWithDeletes(src, del))
    else writeTo(merged, stagingDir)
    if (meta.nonEmpty) writeMeta(stagingDir, readMeta(currentDir) ++ meta)
    publish()
  }

  /** Feed for a merge-with-delete batch: survivors produce the usual
    * typed upsert events; deletions emit the matched TARGET rows
    * (pre-delete images) as delete events — keys in `df` with no
    * target match are no-ops, like SQL DELETE. */
  private def stageFeedWithDeletes(df: DataFrame,
      del: org.apache.spark.sql.Column): Unit =
    stageFeed(feedEventsWithDeletes(df, del))

  private def feedEventsWithDeletes(df: DataFrame,
      del: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val deletedKeys = df.filter(del).select(mergeKeys.map(col): _*).distinct()
    // same key-derived cut as upsertFeedEvents: deleted keys' target
    // rows live in the batch's partitions
    val delEvents = prunedToSourceParts(read, df)
      .join(deletedKeys, mergeKeys, "left_semi")
      .withColumn("_change_type", lit("delete"))
    upsertFeedEvents(df.filter(!del))
      .unionByName(delEvents, allowMissingColumns = true)
  }

  /** Safe partition-pruned MERGE over the full partition tuple.
    *
    * The touched set is (a) every partition the source writes into, UNION
    * (b) every partition holding a target row whose merge key appears in
    * the source. (b) is what makes pruning SAFE: a key whose partition
    * value changed between target and source (e.g. an order's date
    * corrected) must have its OLD partition rewritten too, or the stale
    * row survives and MERGE key uniqueness breaks. Delta's MERGE matches
    * keys across all partitions for the same reason. (b) costs one
    * column-pruned scan of the target's key+partition columns per merge —
    * sub-linear in table bytes, the analogue of Delta's touched-file
    * discovery join.
    */
  /** `deleteWhen` extends this to the three-clause MERGE: `source` rows
    * satisfying it remove their target matches instead of upserting.
    * The touched-set rule is unchanged and remains safe — a deleted
    * key's target partitions are exactly clause (b)'s matched-key
    * partitions, so they rewrite (without the deleted row) while
    * untouched partitions hard-link. */
  /** Injective partition-tuple → string encoding used ONLY for set
    * membership (both sides use URLEncoder conventions, so it need not
    * match the Hive directory escaping): each value url-encoded, null
    * AND empty string → __HIVE_DEFAULT_PARTITION__ (Spark's partition
    * writer folds "" into the null partition), components joined with
    * '/'. `encTuple` is the frame-side expression (references only
    * partition columns — prunes at the source), `encDriver` the
    * driver-side twin over decoded directory values. */
  private def encTuple(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, concat_ws, length, lit, url_encode, when}
    concat_ws("/", partitionCols.map { c =>
      val sc = col(c).cast("string")
      coalesce(when(length(sc) === 0, lit(HiveNullPart))
        .otherwise(url_encode(sc)), lit(HiveNullPart))
    }: _*)
  }

  private def encDriver(tup: Seq[Option[String]]): String = tup.map {
    case Some(v) if v.nonEmpty => java.net.URLEncoder.encode(v, "UTF-8")
    case _                     => HiveNullPart
  }.mkString("/")

  private def upsertPruned(source: DataFrame,
      deleteWhen: org.apache.spark.sql.Column,
      meta: Map[String, String] = Map.empty,
      matchedPartsHint: Option[DataFrame] = None): Unit = {
    val donor = currentDir
    val target = read

    // Bounded driver-side collect: partition-VALUE tuples, not rows —
    // source partitions ∪ matched-key target partitions in ONE action.
    // With `partitionsFromKeys` the second term is skipped: the
    // partition value being a pure function of the merge keys makes
    // matched-key target partitions ⊆ source partitions a theorem (a
    // matched row shares the keys, hence the derived partition), so
    // clause (b)'s column-pruned-but-O(table) key scan — the slim
    // residual the dedupidxp ladder measured growing with the corpus —
    // adds nothing and is provably safe to drop.
    val sourceParts = source.select(encTuple(source).as("__p"))
    val touched =
      if (partitionsFromKeys)
        sourceParts.distinct().collect().map(_.getString(0)).toSet
      else {
        // clause (b): matched-key target partitions — from the hint
        // when the caller supplied a cheaper authority (see the
        // upsertWithDelete doc), else the column-pruned target key scan
        val matchedParts = matchedPartsHint match {
          case Some(h) => h.select(encTuple(h).as("__p"))
          case None => target
            .join(source.select(mergeKeys.map(col): _*).distinct(),
              mergeKeys, "left_semi")
            .select(encTuple(target).as("__p"))
        }
        sourceParts.unionByName(matchedParts).distinct()
          .collect().map(_.getString(0)).toSet
      }

    val touchedTarget = target.filter(encTuple(target).isin(touched.toSeq: _*))
    val merged = CoreOps.antiJoin(mergeKeys, source)(touchedTarget)
      .unionByName(source.filter(!deleteWhen), allowMissingColumns = true)
    writeTo(merged, stagingDir)
    if (meta.nonEmpty) writeMeta(stagingDir, readMeta(currentDir) ++ meta)
    if (changeFeed) stageFeedWithDeletes(source, deleteWhen)
    // Hard-link untouched leaf partition dirs from the donor version into
    // staging: metadata-only (no bytes copied), and because hard links
    // survive unlinking of the original path, the donor stays a complete
    // snapshot and version pruning can delete old dirs safely. Dir names
    // follow Hive encoding: `<pcol>=<escaped value>` nested per partition
    // column, null written as __HIVE_DEFAULT_PARTITION__.
    linkUntouched(donor, donor, 0, Nil, touched, encDriver)
    publish()
  }

  /** Recursively walk the donor's Hive-style partition directory tree and
    * hard-link every LEAF partition dir (depth == partitionCols.size)
    * whose decoded tuple is not in the touched set. */
  private def linkUntouched(donorRoot: Path, dir: Path, depth: Int,
      prefix: Seq[Option[String]], touched: Set[String],
      enc: Seq[Option[String]] => String): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    scala.util.Using.resource(Files.list(dir))(_.forEach { p =>
      val n = p.getFileName.toString
      if (Files.isDirectory(p) && n.startsWith(s"${partitionCols(depth)}=")) {
        val raw = n.stripPrefix(s"${partitionCols(depth)}=")
        val value: Option[String] =
          if (raw == HiveNullPart) None
          else Some(ExternalCatalogUtils.unescapePathName(raw))
        val tup = prefix :+ value
        if (depth == partitionCols.size - 1) {
          val dst = stagingDir.resolve(donorRoot.relativize(p).toString)
          if (!touched.contains(enc(tup)) && !Files.exists(dst))
            linkTree(p, dst)
        } else linkUntouched(donorRoot, p, depth + 1, tup, touched, enc)
      }
    })
  }

  /** Recursively hard-link a directory tree (same filesystem). The object-
    * store equivalent is manifest-level file reuse: a new table version
    * referencing unchanged data files instead of rewriting them. */
  private def linkTree(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val target = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.createLink(target, p)
    }
  }

  /** `optimizeLayout` (default on): partitioned writes first hash-
    * repartition on the partition columns — Delta's "optimized writes".
    * Without it, every task writes a file into every partition dir it
    * sees a row for (tasks × partitions small files: a 2,048-partition
    * table written by 32 tasks measured 65k files and an 18-minute
    * write in the round-13 dedupidxp probe); with it, each partition's
    * rows land in one task → ~one file per partition, and the
    * per-publish hard-link walk stays O(partitions). Layout-authored
    * writes (compact's file-count contract, Z-order's range clustering)
    * pass false — re-shuffling would destroy the layout they exist to
    * produce. */
  private def writeTo(df: DataFrame, dir: Path,
      carryMeta: Boolean = true, optimizeLayout: Boolean = true): Unit = {
    deleteRecursively(dir)
    // a write path that doesn't stage its own feed (create, scd2) must
    // not publish a STALE one from an aborted earlier operation
    deleteRecursively(feedStagingDir)
    val out =
      if (optimizeLayout && partitionCols.nonEmpty)
        df.repartition(partitionCols.map(col): _*)
      else df
    // No _SUCCESS marker: LakeTable's commit marker is the atomic
    // CURRENT pointer swap, not the Hadoop job-level _SUCCESS file — a
    // staged dir is invisible until publish() regardless, so the marker
    // is pure overhead (~100 ms/write measured round 16; at object-store
    // scale, one fewer PUT per commit).
    val w = out.write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir.toString)
    // schema sidecar: what lets readDir serve an EMPTY partitioned
    // snapshot (the partitioned writer emits no files for one)
    Files.writeString(dir.resolve("_schema_ddl"), df.schema.toDDL)
    // committed metadata survives every write EXCEPT create (DDL-replace
    // resets it); a meta-carrying upsert overwrites this file with the
    // merged map before publish
    if (carryMeta && exists) writeMeta(dir, readMeta(currentDir))
  }

  /** Pointer-publish: move the staged write to the next version directory,
    * then swap the one-line CURRENT pointer with a single atomic rename.
    * Crash-safe at every step: before the pointer rename lands, readers
    * resolve the old version; after, the new one. */
  private def publish(): Unit = {
    Files.createDirectories(tableDir)
    // a crash AFTER the staging→version move but BEFORE the pointer
    // swap leaves an orphan version dir that was never published.
    // Version dirs beyond the current pointer are provably exactly
    // those orphans (the pointer only ever advances to a fully-landed
    // dir) — reclaim them FIRST, or they surface in availableVersions
    // as time travel to a never-committed state AND shift the next
    // version number past a gap. Single-writer discipline is assumed
    // throughout this class (as in the reference's one-job-per-table
    // orchestration); a concurrent writer would race the pointer swap
    // itself, not just this cleanup.
    val cur = currentVersion.getOrElse(0)
    allVersions.filter(_ > cur).foreach(o => deleteRecursively(versionDir(o)))
    // Feed orphans obey the same beyond-pointer rule — and MUST be
    // swept unconditionally, not only when this write stages a feed of
    // its own: a crash between the feed move and the pointer swap
    // leaves changes/v{N} for a never-committed N, and the next
    // FEED-LESS write (create, upsertScd2) lands its data at that same
    // N — changesSince would then answer from the stale feed, silently
    // attributing the crashed operation's events to the new write,
    // instead of falling back to the snapshot diff.
    allFeedVersions.filter(_ > cur).foreach(o => deleteRecursively(feedDir(o)))
    val v = cur + 1
    Files.move(stagingDir, versionDir(v), StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(feedStagingDir)) {
      Files.createDirectories(tableDir.resolve("changes"))
      Files.move(feedStagingDir, feedDir(v), StandardCopyOption.ATOMIC_MOVE)
    }
    val tmp = tableDir.resolve(".CURRENT.tmp")
    Files.writeString(tmp, s"v$v")
    Files.move(tmp, pointerFile, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    pruneVersions(v)
  }

  private def allVersions: Seq[Int] =
    if (!Files.isDirectory(tableDir)) Nil
    else Files.list(tableDir).toArray.toSeq.map(_.asInstanceOf[Path])
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d+"))
      .map(_.stripPrefix("v").toInt)
      .sorted

  /** Versions with a recorded change feed (committed or orphaned). */
  private def allFeedVersions: Seq[Int] = {
    val changes = tableDir.resolve("changes")
    if (!Files.isDirectory(changes)) Nil
    else Files.list(changes).toArray.toSeq.map(_.asInstanceOf[Path])
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d+"))
      .map(_.stripPrefix("v").toInt)
      .sorted
  }

  /** Retained PRIOR snapshots — strictly BELOW the current version.
    * A dir beyond the pointer can only be the residue of a crashed
    * publish (landed but never committed); it is not a snapshot any
    * reader ever saw and must not become a time-travel target. */
  def availableVersions: Seq[Int] = {
    val cur = currentVersion
    allVersions.filter(v => cur.exists(v < _))
  }

  private def pruneVersions(current: Int): Unit =
    allVersions.filterNot(_ == current).dropRight(keepVersions)
      .foreach(v => deleteRecursively(versionDir(v)))

  /** Time travel: read a retained prior snapshot (as listed by
    * [[availableVersions]]). */
  def readVersion(v: Int): DataFrame = {
    require(availableVersions.contains(v),
      s"version $v not retained (have: $availableVersions)")
    readDir(versionDir(v))
  }

  /** Row-level DELETE (Delta DML parity): remove rows matching the
    * condition, keep everything else — including rows where the condition
    * is NULL, matching SQL DELETE semantics. Published as a new version;
    * the old snapshot stays readable.
    *
    * On a partitioned table the rewrite is PRUNED (Delta's file-pruned
    * DELETE): one column-pruned scan finds the partitions holding
    * matching rows, only those rewrite (minus the matches), untouched
    * partitions hard-link. Always safe — a DELETE can only remove rows,
    * never move one across partitions — so unlike the merge's clause
    * (b) this needs no key-derivation assumption. The feed scan prunes
    * to the same touched set. */
  def delete(condition: org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    val cond = coalesce(condition, lit(false))
    val cur = read
    if (partitionCols.isEmpty) {
      if (changeFeed)
        stageWithFeed(cur.filter(!cond),
          cur.filter(cond).withColumn("_change_type", lit("delete")))
      else writeTo(cur.filter(!cond), stagingDir)
      publish()
      return
    }
    val donor = currentDir
    // bounded collect: partition tuples holding >= 1 matching row
    val touched = cur.filter(cond).select(encTuple(cur).as("__p"))
      .distinct().collect().map(_.getString(0)).toSet
    val touchedCur = cur.filter(encTuple(cur).isin(touched.toSeq: _*))
    writeTo(touchedCur.filter(!cond), stagingDir)
    if (changeFeed)
      stageFeed(touchedCur.filter(cond)
        .withColumn("_change_type", lit("delete")))
    linkUntouched(donor, donor, 0, Nil, touched, encDriver)
    publish()
  }

  /** Row-level UPDATE: apply the assignments to rows matching the
    * condition, leave others untouched.
    *
    * Pruned like [[delete]] when no ASSIGNED column is a partition
    * column (an update then can't move a row across partitions): only
    * partitions holding matching rows rewrite, the rest hard-link. An
    * update that assigns a partition column falls back to the full
    * rewrite — the moved rows must land in their new partitions. */
  def update(condition: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, when, xxhash64}
    val whole = read
    val cond = coalesce(condition, lit(false))
    val pruned = partitionCols.nonEmpty &&
      partitionCols.forall(c => !assignments.contains(c))
    val donor = if (pruned) currentDir else null
    val touched: Set[String] =
      if (!pruned) Set.empty
      else whole.filter(cond).select(encTuple(whole).as("__p"))
        .distinct().collect().map(_.getString(0)).toSet
    val cur =
      if (pruned) whole.filter(encTuple(whole).isin(touched.toSeq: _*))
      else whole
    val updated = cur.select(cur.columns.toIndexedSeq.map { c =>
      assignments.get(c)
        .map(expr => when(cond, expr).otherwise(col(c)).as(c))
        .getOrElse(col(c))
    }: _*)
    if (checkConstraints.nonEmpty)
      // only the post-images of MATCHED rows can newly violate
      enforceConstraints(cur.filter(cond).select(
        cur.columns.toIndexedSeq.map { c =>
          assignments.get(c).map(_.as(c)).getOrElse(col(c))
        }: _*), "update")
    if (changeFeed) {
      // pre/post images of MATCHED rows whose non-key values actually
      // changed (no-op assignments produce no events, matching the
      // snapshot diff)
      val before = cur.filter(cond)
      val after = before.select(cur.columns.toIndexedSeq.map { c =>
        assignments.get(c).map(_.as(c)).getOrElse(col(c))
      }: _*)
      val nonKey = cur.columns.filterNot(mergeKeys.contains).toSeq
      def hashed = xxhash64(nonKey.map(col): _*)
      val changedKeys = after.withColumn("__h", hashed)
        .join(before.select(mergeKeys.map(col) :+ hashed.as("__h_old"): _*),
          mergeKeys)
        .filter(col("__h") =!= col("__h_old"))
        .select(mergeKeys.map(col): _*)
      val pre = before.join(changedKeys, mergeKeys, "left_semi")
        .withColumn("_change_type", lit("update_preimage"))
      val post = after.join(changedKeys, mergeKeys, "left_semi")
        .withColumn("_change_type", lit("update_postimage"))
      // partitioned tables fall back to the two-write path inside
      stageWithFeed(updated, post.unionByName(pre))
    } else writeTo(updated, stagingDir)
    if (pruned) linkUntouched(donor, donor, 0, Nil, touched, encDriver)
    publish()
  }

  /** Small-file compaction (OPTIMIZE without reordering): rewrite the
    * current version into `numFiles` files. Content unchanged. */
  def compact(numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.lit
    writeTo(read.repartition(numFiles), stagingDir, optimizeLayout = false)
    // layout-only: empty feed keeps changesSince's feed coverage contiguous
    if (changeFeed)
      stageFeed(read.limit(0).withColumn("_change_type", lit("insert")))
    publish()
  }

  /** OPTIMIZE ZORDER analogue: rewrite the current version clustered on
    * the Z-order (Morton) curve of N columns, published as a new
    * version via the same pointer swap. `repartitionByRange` on the
    * z-value gives each output file a contiguous curve segment, so
    * parquet min/max stats prune scans filtered on ANY of the clustered
    * columns. Content is byte-for-byte the same rows — only layout
    * changes (checked by LakeTableSpec). Per-dimension bit budget is
    * min(16, 63/N). */
  def optimizeZorder(cols: Seq[String], numFiles: Int): Unit = {
    import graft.functions.ZOrder
    import org.apache.spark.sql.functions.{max => fmax, min => fmin, broadcast}
    require(cols.nonEmpty)
    val cur = read
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(fmin(col(c)).as(s"__min$i"), fmax(col(c)).as(s"__max$i")) }
    val stats = cur.agg(aggs.head, aggs.tail: _*)
    val bits = math.min(16, 63 / cols.size)
    val z = ZOrder.interleaveN(cols.zipWithIndex.map { case (c, i) =>
      ZOrder.bin(col(c), col(s"__min$i"), col(s"__max$i"), bits) }, bits)
    val statCols = cols.indices.flatMap(i => Seq(s"__min$i", s"__max$i"))
    val clustered = cur.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z" +: statCols: _*)
    writeTo(clustered, stagingDir, optimizeLayout = false)
    if (changeFeed)
      stageFeed(read.limit(0).withColumn("_change_type",
        org.apache.spark.sql.functions.lit("insert")))
    publish()
  }

  def optimizeZorder(c1: String, c2: String, numFiles: Int): Unit =
    optimizeZorder(Seq(c1, c2), numFiles)

  def optimizeZorder(c1: String, c2: String): Unit =
    optimizeZorder(Seq(c1, c2), 8)

  /** CDC between a retained snapshot and the current version — the Delta
    * Change Data Feed analogue, derivable here because versions are full
    * snapshots: `insert` (key absent in the snapshot),
    * `update_preimage` + `update_postimage` (key present, any non-key
    * column changed — compared via one xxhash64 over the non-key
    * columns, no row-by-row driver work; the PREIMAGE row carries the
    * old values, which is what lets a downstream consumer incrementally
    * maintain aggregates: new_agg = agg − preimage + postimage + inserts
    * − deletes), `delete` (key gone from current). Key-shuffles over the
    * two snapshots only; at scale this is how consumers sync without
    * re-reading the full table.
    *
    * With `changeFeed` on (and feeds recorded for every version in the
    * span) this never touches the snapshots at all: it unions the
    * recorded per-version feeds — O(changes) — and works even after
    * retention pruned snapshot `v`. The feed is an event log rather
    * than a net diff: over multi-write spans it may contain canceling
    * events whose signed composition equals the snapshot diff (see the
    * CDF section above). */
  def changesSince(v: Int): DataFrame = {
    import org.apache.spark.sql.functions.{lit, xxhash64}
    val cur = read
    // Feed fast path: when the recorded write-time feeds (plain
    // per-version dirs and/or compacted net dirs, see
    // [[compactChangeFeed]]) fully cover (v, current], answer from the
    // log — O(changes), no snapshot reads, and independent of whether
    // snapshot v is still retained. Old feeds align to the CURRENT
    // schema with typed nulls (additive evolution, same rule as the
    // snapshot path below).
    if (v < version) resolveFeedReads(v, version) match {
      case Some(reads) => return readFeedVersions(reads, cur)
      case None        => // fall through to the snapshot diff
    }
    // Align the old snapshot to the CURRENT schema: columns added since
    // `v` (schema-evolving upsert) project as typed nulls on the old
    // side, so an update whose ONLY change is setting a new column
    // (null → value) is detected like any other; columns dropped since
    // `v` are not reported (evolution here is additive, matching the
    // merge's allowMissingColumns semantics).
    val old = {
      val o = readVersion(v)
      o.select(cur.columns.toIndexedSeq.map { c =>
        if (o.columns.contains(c)) col(c)
        else lit(null).cast(cur.schema(c).dataType).as(c)
      }: _*)
    }
    val nonKey = cur.columns.filterNot(mergeKeys.contains).toSeq
    def hashed = xxhash64(nonKey.map(col): _*)
    val inserts = CoreOps.antiJoin(mergeKeys, old)(cur)
      .withColumn("_change_type", lit("insert"))
    val deletes = CoreOps.antiJoin(mergeKeys, cur)(old)
      .withColumn("_change_type", lit("delete"))
    val changedKeys = cur.withColumn("__h", hashed)
      .join(old.select(mergeKeys.map(col) :+ hashed.as("__h_old"): _*),
        mergeKeys)
      .filter(col("__h") =!= col("__h_old"))
      .select(mergeKeys.map(col): _*)
    val post = cur.join(changedKeys, mergeKeys, "left_semi")
      .withColumn("_change_type", lit("update_postimage"))
    val pre = old.join(changedKeys, mergeKeys, "left_semi")
      .withColumn("_change_type", lit("update_preimage"))
    inserts.unionByName(post).unionByName(pre).unionByName(deletes)
  }

  // ---- feed resolution, epoch-grouped replay, and compaction ----

  /** Marker inside a compacted feed dir: the version its net events
    * start AFTER (exclusive) — dir `w` with `_compacted_from = f`
    * holds the NET composition of the original feeds (f, w]. */
  private def compactedFrom(w: Int): Option[Int] = {
    val f = feedDir(w).resolve("_compacted_from")
    if (!Files.exists(f)) None
    else {
      val raw = Files.readString(f).trim
      Some(scala.util.Try(raw.toInt).getOrElse(throw new IllegalStateException(
        s"table $name: feed v$w has an unparseable _compacted_from " +
          s"('$raw') — refusing to replay a feed whose span is unknown")))
    }
  }

  /** The feed dirs to READ to cover exactly (sinceV, upTo], or None
    * when the recorded feeds cannot serve this consumer (a gap, or a
    * compacted dir whose net starts BEFORE the sync point — replaying
    * it would attribute pre-sync events to the consumer's span).
    * A plain dir covers itself; a compacted dir covers its whole span,
    * and any dir lying STRICTLY INSIDE another dir's span is
    * superseded residue (the crash window between landing the net and
    * sweeping the originals) — excluded from reading so its events are
    * never double-counted. */
  private def resolveFeedReads(sinceV: Int, upTo: Int): Option[Seq[Int]] = {
    val wanted = (sinceV + 1) to upTo
    if (wanted.isEmpty) return Some(Nil)
    val info = wanted.filter(i => Files.isDirectory(feedDir(i)))
      .map(i => i -> compactedFrom(i))
    val spans = info.collect { case (w, Some(cf)) => (cf, w) }
    if (spans.exists(_._1 < sinceV)) return None
    def superseded(i: Int) = spans.exists { case (cf, w) => i > cf && i < w }
    val reads = info.filterNot { case (i, _) => superseded(i) }
    val covered = reads.iterator.flatMap { case (w, cfOpt) =>
      ((cfOpt.getOrElse(w - 1) + 1) to w).iterator }.toSet
    if (wanted.forall(covered)) Some(reads.map(_._1)) else None
  }

  /** Replay the given feed dirs as one frame aligned to the CURRENT
    * schema. Consecutive dirs sharing a schema (by field name + type;
    * nullability widened) group into ONE multi-path scan, so the
    * replay plan is O(schema epochs) wide, not O(versions): a consumer
    * syncing across a 1,000-version span gets a handful of scan leaves
    * instead of a 1,000-leaf union (driver plan size, optimizer time,
    * and task-launch overhead all scale with leaves). The per-dir
    * schema probe is a driver-side footer read — cheap and bounded. */
  private def readFeedVersions(reads: Seq[Int], cur: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.{StructField, StructType}
    // epoch key: the write-time `_schema_fp` file when present (a
    // microsecond text read), footer probe with the IDENTICAL
    // rendering otherwise (pre-fp dirs) — so grouping costs O(epochs)
    // footer reads plus O(versions) tiny file reads, never O(versions)
    // footer probes
    def key(i: Int): String = {
      val fp = feedDir(i).resolve("_schema_fp")
      if (Files.exists(fp)) Files.readString(fp).trim
      else schemaFingerprint(spark.read.parquet(feedDir(i).toString).schema)
    }
    val groups = reads.foldLeft(Vector.empty[(String, Vector[Int])]) {
      (acc, i) =>
        val k = key(i)
        acc.lastOption match {
          case Some((lk, vs)) if lk == k => acc.init :+ ((lk, vs :+ i))
          case _                         => acc :+ ((k, Vector(i)))
        }
    }
    // the epoch's authoritative types come from its fingerprint STRING
    // when it parses back losslessly (the rendering is `name:type.sql`,
    // DDL-parseable; the roundtrip check rejects any name a ':' or '|'
    // would make ambiguous) — zero footer I/O on the common path. The
    // footer probe stays as the fallback for pre-fp dirs and
    // unparseable names; nullability widened either way (dirs in a
    // group agree by fingerprint).
    groups.map { case (k, vs) =>
      val schema = schemaFromFingerprint(k).getOrElse(StructType(
        spark.read.parquet(feedDir(vs.head).toString).schema
          .map(f => StructField(f.name, f.dataType))))
      val df = spark.read.schema(schema)
        .parquet(vs.map(i => feedDir(i).toString): _*)
      df.select(cur.columns.toIndexedSeq.map { c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast(cur.schema(c).dataType).as(c)
      } :+ col("_change_type"): _*)
    }.reduce(_ unionByName _)
  }

  /** Compact the recorded change feeds over (from, to]: replace the
    * per-version event logs with ONE synthetic feed dir at v`to`
    * holding the NET per-key composition of the span — a slow consumer
    * syncing across it then replays O(net changes) instead of O(raw
    * events), and the span's interior dirs are reclaimed. Canceling
    * event chains vanish entirely (insert→delete, update→revert); a
    * key changed several times nets to ONE pre/post pair (first
    * pre-image, last post-image — exactly the snapshot diff over the
    * span). Already-compacted dirs inside the span compose transitively.
    *
    * Consumer contract (same discipline as [[pruneChangeFeed]]): pick
    * `from` ≤ the oldest version any consumer is still synced at. A
    * consumer synced INSIDE the span afterwards falls back to the
    * snapshot diff — correct if its snapshot is retained, loud
    * (readVersion's retention check) if not; never silently wrong.
    * Do NOT compact while a STREAMING subscriber
    * ([[readChangeFeedStream]]) holds a live checkpoint over this
    * table's feed: the net dir's files are new paths, so a checkpointed
    * file source would re-deliver the span's events.
    *
    * Crash-safe ordering: the net dir (with its `_compacted_from`
    * marker) lands at feedDir(`to`) via an atomic move FIRST; readers
    * seeing the marker skip every dir inside the span, so the
    * interior sweep afterwards is pure space reclamation — a crash
    * between the two steps double-counts nothing. */
  def compactChangeFeed(from: Int, to: Int): Unit = {
    import org.apache.spark.sql.functions.{array, explode, lit, max_by, min_by, struct, when, xxhash64}
    require(from < to, s"empty compaction span ($from, $to]")
    require(to <= version, s"span end $to beyond current version $version")
    val reads = resolveFeedReads(from, to).getOrElse(
      throw new IllegalStateException(
        s"table $name: feed coverage of ($from, $to] is incomplete — " +
          "compaction would record a net that silently misses events"))
    val cur = read
    val allCols = cur.columns.toIndexedSeq
    // events aligned to the CURRENT schema, tagged with their version
    // for ordering (a compacted dir's events carry ITS span-end)
    val events = reads.map { i =>
      val df = spark.read.parquet(feedDir(i).toString)
      df.select(allCols.map { c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast(cur.schema(c).dataType).as(c)
      } ++ Seq(col("_change_type"), lit(i).as("__fv")): _*)
    }.reduce(_ unionByName _)
    // per key: earliest event (pre-types first within a version) gives
    // the span's pre-image if the key existed before it; latest event
    // (post-types last) gives the post-image if the key exists after.
    // One write per version → at most one pre/post pair per (key,
    // version), so (version, typeRank) orders totally per key.
    val isPre = col("_change_type").isin("delete", "update_preimage")
    val ord = col("__fv") * 2 + when(isPre, lit(0)).otherwise(lit(1))
    val agg = events
      .select(mergeKeys.map(col) :+
        struct(struct(allCols.map(col): _*).as("r"),
          col("_change_type").as("ct")).as("__e") :+ ord.as("__o"): _*)
      .groupBy(mergeKeys.map(col): _*)
      .agg(min_by(col("__e"), col("__o")).as("__f"),
        max_by(col("__e"), col("__o")).as("__l"))
      .withColumn("__pre",
        when(col("__f.ct").isin("delete", "update_preimage"), col("__f.r")))
      .withColumn("__post",
        when(col("__l.ct").isin("insert", "update_postimage"), col("__l.r")))
    // same change-detection hash as the feed writer: only genuinely
    // changed pre/post pairs survive (a value updated then reverted
    // nets to nothing)
    val nonKey = allCols.filterNot(mergeKeys.contains)
    def h(s: org.apache.spark.sql.Column) =
      if (nonKey.isEmpty) lit(0L)
      else xxhash64(nonKey.map(c => s.getField(c)): _*)
    val net = agg.select(explode(
        when(col("__pre").isNull && col("__post").isNotNull,
          array(struct(col("__post").as("r"), lit("insert").as("ct"))))
        .when(col("__pre").isNotNull && col("__post").isNull,
          array(struct(col("__pre").as("r"), lit("delete").as("ct"))))
        .when(col("__pre").isNotNull && col("__post").isNotNull &&
            h(col("__pre")) =!= h(col("__post")),
          array(
            struct(col("__post").as("r"), lit("update_postimage").as("ct")),
            struct(col("__pre").as("r"), lit("update_preimage").as("ct")))))
        .as("__ev")) // no otherwise: a netted-away key yields NULL → no rows
      .selectExpr("__ev.r.*", "__ev.ct AS _change_type")
    val tmp = Paths.get(root, s".staging_feedcompact_$name")
    deleteRecursively(tmp)
    net.write.mode("overwrite").parquet(tmp.toString)
    Files.writeString(tmp.resolve("_schema_fp"), schemaFingerprint(net.schema))
    Files.writeString(tmp.resolve("_compacted_from"), from.toString)
    deleteRecursively(feedDir(to))
    Files.move(tmp, feedDir(to), StandardCopyOption.ATOMIC_MOVE)
    reads.filter(_ < to).foreach(i => deleteRecursively(feedDir(i)))
  }

  /** SCD Type 2 MERGE: history-preserving dimension upsert. Rows carry
    * `__valid_from` / `__valid_to` / `__is_current`; for each incoming
    * key whose TRACKED attributes changed (or that is new), the current
    * row (if any) is closed out (`__valid_to` = asOf, `__is_current` =
    * false) and a new current row inserted. Unchanged keys and already-
    * historical rows pass through untouched — the standard warehouse
    * pattern for slowly-changing dimensions, expressed as one anti-join +
    * one change-detection join + a union (same single-shuffle budget as
    * the plain MERGE; change detection compares only the tracked columns,
    * null-safely — Spark's hash functions SKIP null inputs, so a hash
    * comparison would miss a null↔value swap between two tracked columns).
    *
    * `source` must be deduplicated on `mergeKeys` and NOT contain the
    * bookkeeping columns; `asOf` is caller-supplied so reruns are
    * idempotent and the oracle can replay it (no current_timestamp).
    */
  def upsertScd2(source: DataFrame, trackCols: Seq[String],
      asOf: java.sql.Timestamp): Unit = {
    import org.apache.spark.sql.functions.{lit, struct}
    val meta = Seq("__valid_from", "__valid_to", "__is_current")
    require(meta.forall(c => !source.columns.contains(c)),
      "source must not carry SCD bookkeeping columns")
    def tracked = struct(trackCols.map(col): _*)
    if (!exists) {
      create(source
        .withColumn("__valid_from", lit(asOf))
        .withColumn("__valid_to", lit(null).cast("timestamp"))
        .withColumn("__is_current", lit(true)))
      return
    }
    val cur = read
    // keys whose tracked attributes changed, plus brand-new keys;
    // struct <=> struct is null-safe field-wise equality
    val changedKeys = source.withColumn("__t_new", tracked)
      .join(cur.filter(col("__is_current"))
        .select(mergeKeys.map(col) :+ tracked.as("__t_old"): _*),
        mergeKeys, "left_outer")
      .filter(!(col("__t_new") <=> col("__t_old")))
      .select(mergeKeys.map(col): _*)
    val closing = cur.join(changedKeys, mergeKeys, "left_semi")
      .filter(col("__is_current"))
      .withColumn("__valid_to", lit(asOf))
      .withColumn("__is_current", lit(false))
    val untouched = cur
      .join(changedKeys.withColumn("__chg", lit(true)), mergeKeys, "left_outer")
      .filter(col("__chg").isNull || !col("__is_current"))
      .drop("__chg")
    val inserts = source.join(changedKeys, mergeKeys, "left_semi")
      .withColumn("__valid_from", lit(asOf))
      .withColumn("__valid_to", lit(null).cast("timestamp"))
      .withColumn("__is_current", lit(true))
    writeTo(untouched.unionByName(closing).unionByName(inserts), stagingDir)
    publish()
  }

  // ---- CHECK constraints (ALTER TABLE ADD CONSTRAINT analogue) ----
  //
  // Delta's CHECK-constraint semantics: named SQL predicates live in
  // the committed table metadata; the add validates EXISTING rows, and
  // every subsequent DML write (upsert, update) validates the INCOMING
  // rows and fails LOUDLY before anything stages — bad data never
  // reaches the table, and the violation names the constraint instead
  // of surfacing as silent drift downstream. NULL predicates pass
  // (SQL CHECK semantics). `create` is DDL-replace here (first-load
  // semantics throughout this class) and resets metadata, constraints
  // included. Probe cost: one filter+limit(1) job per constraint per
  // write over the incoming frame only — never the table — and zero
  // when the table has no constraints.

  /** The stored CHECK constraints, by name. */
  def checkConstraints: Map[String, String] =
    meta.collect { case (k, v) if k.startsWith("check_") =>
      k.stripPrefix("check_") -> v }

  /** ALTER TABLE ADD CONSTRAINT … CHECK: validates existing rows, then
    * publishes a metadata-only new version (hard links, no data). */
  def addCheckConstraint(cname: String, predicate: String): Unit = {
    require(exists, s"table $name must exist before adding a constraint")
    if (read.filter(!passes(predicate)).limit(1).count() > 0)
      throw new IllegalStateException(
        s"existing rows of $name violate CHECK $cname: $predicate")
    publishMetaOnly(readMeta(currentDir) + (s"check_$cname" -> predicate))
  }

  /** ALTER TABLE DROP CONSTRAINT (metadata-only publish). */
  def dropCheckConstraint(cname: String): Unit = {
    require(exists, s"table $name has no published version")
    publishMetaOnly(readMeta(currentDir) - s"check_$cname")
  }

  // SQL CHECK semantics: only a FALSE predicate violates; NULL passes
  private def passes(predicate: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    coalesce(expr(predicate).cast("boolean"), lit(true))
  }

  /** Metadata-only commit (Delta's commitInfo-style annotation): a new
    * version whose data files hard-link the current snapshot and whose
    * meta is the current meta merged with `m`. The use case that
    * motivated it: a streaming IVM drain records per-batch markers but
    * cannot know mid-drain which batch is last, so it cannot stamp the
    * `mv.base_version` freshness marker inside a batch commit — the
    * caller snapshots the base version BEFORE starting the drain and
    * annotates the view AFTER it completes. Crash between drain and
    * annotate leaves the marker absent → the MV rewrite conservatively
    * skips the view (never serves stale data); the next drain+annotate
    * repairs it. */
  def annotate(m: Map[String, String]): Unit = {
    require(exists, s"table $name has no published version to annotate")
    publishMetaOnly(readMeta(currentDir) ++ m)
  }

  /** Metadata-only new version: hard-link the current snapshot and swap
    * the meta file. The staged `_meta.json` LINK must be unlinked before
    * the rewrite — writing through it would corrupt the published prior
    * version's metadata via the shared inode. */
  private def publishMetaOnly(m: Map[String, String]): Unit = {
    deleteRecursively(stagingDir)
    linkTree(currentDir, stagingDir)
    Files.deleteIfExists(stagingDir.resolve("_meta.json"))
    writeMeta(stagingDir, m)
    publish()
  }

  private def enforceConstraints(source: DataFrame, op: String): Unit =
    checkConstraints.foreach { case (n, p) =>
      if (source.filter(!passes(p)).limit(1).count() > 0)
        throw new IllegalStateException(
          s"CHECK constraint $n ($p) violated by $op into table $name")
    }

  /** DESCRIBE DETAIL analogue: one row per retained snapshot (current
    * included) with data-file count and total bytes — pure filesystem
    * metadata, no data files read. The table-ops surface Delta exposes
    * for compaction/retention decisions. */
  def describeDetail: DataFrame = {
    import scala.jdk.CollectionConverters._
    val cur = currentVersion.getOrElse(
      throw new IllegalStateException(s"table $name has no published version"))
    val versions = (availableVersions :+ cur).distinct.sorted
    val rows = versions.map { v =>
      val files = scala.util.Using.resource(Files.walk(versionDir(v)))(
        _.iterator.asScala.filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet")).toVector)
      (v, files.size.toLong, files.map(Files.size).sum, v == cur)
    }
    import spark.implicits._
    rows.toDF("version", "n_files", "bytes", "is_current")
  }

  /** DESCRIBE CHANGE FEED analogue: one row per recorded feed dir —
    * the version it belongs to, the exclusive span start it covers
    * (`covers_from` = version − 1 for a plain per-version dir; the
    * recorded `_compacted_from` for a compacted net dir), file count
    * and bytes. Pure filesystem metadata, no data files read — the
    * surface retention/compaction decisions are made from: pick
    * `compactChangeFeed` spans where many small per-version dirs
    * cover a range every consumer has passed, and `pruneChangeFeed`
    * cutoffs from the oldest `covers_from` still needed. */
  def describeChangeFeed: DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = allFeedVersions.map { v =>
      val files = scala.util.Using.resource(Files.walk(feedDir(v)))(
        _.iterator.asScala.filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet")).toVector)
      (v, compactedFrom(v).getOrElse(v - 1), files.size.toLong,
        files.map(Files.size).sum, compactedFrom(v).isDefined)
    }
    import spark.implicits._
    rows.toDF("version", "covers_from", "n_files", "bytes", "is_compacted")
  }

  /** DROP TABLE analogue: remove the table (all versions + pointer +
    * change feed). */
  def drop(): Unit = {
    deleteRecursively(tableDir)
    deleteRecursively(stagingDir)
    deleteRecursively(feedStagingDir)
  }

  /** VACUUM analogue: drop every retained PRIOR snapshot now (time travel
    * to them is gone, space is reclaimed); the current version is never
    * touched. Hard-linked files shared with the current version survive
    * via their remaining link, so this is always safe. */
  def vacuum(): Unit =
    availableVersions.foreach(v => deleteRecursively(versionDir(v)))

  /** Streaming CDC source (Delta's `readChangeFeed` in streaming mode):
    * the `changes/` directory is an APPEND-ONLY log of parquet files —
    * each publish lands a whole version dir atomically before the
    * pointer swap — so a file stream over it is a continuous change
    * stream a downstream consumer can subscribe to (enrich, route,
    * maintain views) without ever polling snapshots. Schema = the
    * CURRENT table schema + `_change_type`; feeds recorded before an
    * additive schema evolution surface the new columns as nulls (the
    * same alignment rule as batch [[changesSince]]).
    *
    * Subscription first reclaims BEYOND-POINTER feed orphans (residue
    * of a publish that crashed between the feed move and the pointer
    * swap): the `changes/v*` glob cannot be pointer-bounded, so without
    * the sweep a drain would deliver a never-committed write's events.
    * Safe under the class's single-writer discipline (batch
    * [[changesSince]] needs no sweep — it is pointer-bounded). */
  def readChangeFeedStream: DataFrame = {
    val changes = tableDir.resolve("changes")
    require(Files.isDirectory(changes),
      s"table $name has no recorded change feed (changeFeed off, or no " +
        "row-level writes yet)")
    val cur = currentVersion.getOrElse(0)
    allFeedVersions.filter(_ > cur).foreach(o => deleteRecursively(feedDir(o)))
    val schema = org.apache.spark.sql.types.StructType(
      read.schema.fields :+ org.apache.spark.sql.types.StructField(
        "_change_type", org.apache.spark.sql.types.StringType))
    spark.readStream.schema(schema).parquet(s"$changes/v*")
  }

  /** Bound the CDC log: drop recorded change feeds for versions
    * STRICTLY BEFORE `keepSince` (feeds are otherwise kept forever —
    * they are what lets consumers sync past snapshot retention). Pick
    * `keepSince` = the oldest version any consumer is still synced at
    * (the value the maintainers return); a consumer further behind
    * then gets the correct LOUD failure from the snapshot-diff
    * fallback's retention check instead of a silently incomplete
    * delta. The Delta analogue is CDF files aging out with VACUUM. */
  def pruneChangeFeed(keepSince: Int): Unit = {
    val changes = tableDir.resolve("changes")
    if (Files.isDirectory(changes))
      scala.util.Using.resource(Files.list(changes))(_.forEach { p =>
        val n = p.getFileName.toString
        if (n.matches("v\\d+") && n.stripPrefix("v").toInt < keepSince)
          deleteRecursively(p)
      })
  }

  /** SHALLOW CLONE analogue: a new independent table whose v1 hard-links
    * the current snapshot's files — metadata-only (no data copied), the
    * object-store manifest-copy pattern on POSIX. Divergence is free in
    * both directions: writes to either table publish new version dirs and
    * never mutate shared files (every write path here stages then swaps),
    * and vacuum/retention on one side only unlinks its own paths. */
  def cloneTo(newName: String): LakeTable = {
    val src = currentDir
    val t = new LakeTable(spark, root, newName, mergeKeys, partitionCols,
      keepVersions)
    require(!t.exists, s"clone target $newName already exists")
    val staging = Paths.get(root, s".staging_$newName")
    deleteRecursively(staging)
    linkTree(src, staging)
    t.publish() // private, but same-class access is fine in Scala
    t
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
}

object LakeTable {
  def apply(spark: SparkSession, root: String, name: String, mergeKeys: Seq[String],
      partitionCols: Seq[String] = Nil, changeFeed: Boolean = false,
      partitionsFromKeys: Boolean = false): LakeTable =
    new LakeTable(spark, root, name, mergeKeys, partitionCols,
      changeFeed = changeFeed, partitionsFromKeys = partitionsFromKeys)

  /** Effective-dated lookup against an SCD2 snapshot (as written by
    * `upsertScd2`): each fact row joins the ONE dimension version whose
    * validity interval contains the fact's timestamp —
    * `__valid_from <= ts < coalesce(__valid_to, +inf)`. Facts earlier
    * than the key's first version (or with no key match) drop out, like
    * any inner dimension lookup.
    *
    * Scale shape: an equi-join on the dimension keys with the interval
    * predicate as a residual filter — versions-per-key is small by
    * construction (one per change), so this is NOT a range join and
    * needs no binning; the join broadcasts or shuffles like any
    * fact-dim join. */
  def scd2Lookup(facts: DataFrame, dimSnapshot: DataFrame,
      keys: Seq[String], factTs: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val clash = facts.columns.toSet
      .intersect(dimSnapshot.columns.toSet) -- keys
    require(clash.isEmpty,
      s"fact and dimension share non-key columns $clash — rename or drop " +
        "them on one side, or the join output is ambiguous")
    val dim = dimSnapshot.withColumnRenamed("__valid_from", "__vf")
      .withColumnRenamed("__valid_to", "__vt")
      .drop("__is_current")
    facts.join(dim, keys)
      .filter(col("__vf") <= col(factTs) &&
        (col("__vt").isNull || col(factTs) < col("__vt")))
      .drop("__vf", "__vt")
  }
}
