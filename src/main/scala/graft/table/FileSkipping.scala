package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping: per-file min/max statistics and a scan that
  * reads only the files whose [min, max] range can contain a value
  * predicate — the core pruning mechanism behind Delta/Iceberg data
  * skipping, Parquet row-group filtering, and every "zone map" design
  * (Moerkotte, Small Materialized Aggregates, VLDB'98), re-expressed on
  * plain parquet directories via Spark's `_metadata.file_path` column.
  *
  * Pairs with [[LakeTable.optimizeZorder]]/`repartitionByRange` layouts:
  * clustering tightens per-file ranges, which is precisely what makes
  * these stats selective. At 100 TB the stats table is |files| rows —
  * thousands, not billions — so collecting the surviving file list to
  * drive the scan is a BOUNDED, layout-sized collect (same contract as
  * LakeTable's partition-value collect), while the data itself is only
  * ever touched for the files that survive.
  */
object FileSkipping {

  /** Per-file (min, max, rows) stats for `valueCol` — one scan of the
    * single column (parquet column pruning applies), one |files|-row
    * aggregate. Persist alongside the table and maintain incrementally
    * on append in a real deployment; recomputed here because the lab
    * tables are small. */
  def fileStats(spark: SparkSession, path: String, valueCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"), col(valueCol))
      .groupBy("file")
      .agg(min(valueCol).as("min_v"), max(valueCol).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Files whose stats range intersects [lo, hi] — the candidate set a
    * `valueCol BETWEEN lo AND hi` scan must read. */
  def candidateFiles(spark: SparkSession, path: String, valueCol: String,
      lo: Any, hi: Any): Array[String] =
    fileStats(spark, path, valueCol)
      .filter(col("min_v") <= lit(hi) && col("max_v") >= lit(lo))
      .select("file").collect().map(_.getString(0)).sorted

  /** Range scan that opens ONLY the candidate files, then applies the
    * exact predicate (stats prune files; the residual filter is still
    * pushed into the surviving parquet scans). Returns an empty frame
    * with the table's schema when no file qualifies. */
  def skippingScan(spark: SparkSession, path: String, valueCol: String,
      lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(spark, path, valueCol, lo, hi)
    val base =
      if (files.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col(valueCol) >= lit(lo) && col(valueCol) <= lit(hi))
  }

  /** Conjunctive multi-column range scan: each column's zone map prunes
    * independently and the candidate sets INTERSECT — the access
    * pattern Z-order layouts exist for (interleaved clustering keeps
    * per-file ranges tight on EVERY clustered column, so a conjunction
    * prunes multiplicatively where a single-column sort layout prunes
    * on one column only; measured in FileSkippingSpec). */
  def skippingScanConj(spark: SparkSession, path: String,
      preds: Seq[(String, Any, Any)]): DataFrame = {
    require(preds.nonEmpty, "need at least one (col, lo, hi) predicate")
    val files = preds.map { case (c, lo, hi) =>
      candidateFiles(spark, path, c, lo, hi).toSet
    }.reduce(_ intersect _)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files.toSeq.sorted: _*)
    preds.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
  }

  /** The k (word, bit) Bloom positions of a value: hash j =
    * xxhash64(j, v), word = ⌊|h| mod (words·64) / 64⌋, bit = mod 64.
    * One definition shared by the build and the probe so they can never
    * disagree. */
  private def bloomPositions(v: org.apache.spark.sql.Column, words: Int,
      k: Int): Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)] =
    (0 until k).map { j =>
      val h = pmod(xxhash64(lit(j), v), lit(words.toLong * 64))
      ((h / 64).cast("int"), h % 64)
    }

  /** `1L << bit` for a COLUMN shift amount (the Scala functions API only
    * takes literal shifts). */
  private def bitMask(bit: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        GraftColumnBridge.expression(lit(1L)),
        GraftColumnBridge.expression(bit.cast("int"))))
  }

  /** Per-file Bloom filter index over `valueCol` — the point-lookup
    * complement of [[fileStats]]: min/max zone maps prune RANGE
    * predicates on the clustering column, but an equality probe on any
    * OTHER column sees the full min/max span of every file and prunes
    * nothing. A small per-file Bloom bitmap (`words`×64 bits, `k`
    * hashes — Delta's bloom filter index / Parquet bloom pages, rebuilt
    * as an explicit operator) answers "can this file contain v" with no
    * false negatives.
    *
    * Build shape: one pass over (file, value) exploding each row to its
    * k set-bit positions, then `bit_or` per (file, word) — a bounded
    * |files|·words-row aggregate with map-side partials; no per-file
    * state beyond the bitmap. Output: (file, word, bits). */
  def fileBloom(spark: SparkSession, path: String, valueCol: String,
      words: Int = 512, k: Int = 4): DataFrame = {
    val positions = bloomPositions(col(valueCol), words, k)
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .select(col("file"), explode(array(positions.map { case (w, b) =>
        struct(w.as("word"), b.as("bit"))
      }: _*)).as("p"))
      .groupBy(col("file"), col("p.word").as("word"))
      .agg(bit_or(bitMask(col("p.bit"))).as("bits"))
  }

  /** Files whose Bloom bitmap admits `value` (all k probe bits set).
    * False positives possible (they only cost a scanned file); false
    * negatives impossible. */
  def bloomCandidateFiles(spark: SparkSession, path: String, valueCol: String,
      value: Any, words: Int = 512, k: Int = 4): Array[String] = {
    val bloom = fileBloom(spark, path, valueCol, words, k)
    val probes = bloomPositions(lit(value), words, k)
    val pass = probes.map { case (w, b) =>
      max(when(col("word") === w,
        col("bits").bitwiseAND(bitMask(b)))) =!= 0
    }
    bloom.groupBy("file").agg(pass.head.as("p0"),
        pass.tail.zipWithIndex.map { case (p, i) => p.as(s"p${i + 1}") }: _*)
      .filter((0 until k).map(i => col(s"p$i")).reduce(_ && _))
      .select("file").collect().map(_.getString(0)).sorted
  }

  /** Point lookup through the Bloom index: open only admitting files,
    * keep the exact predicate. */
  def bloomSkippingScan(spark: SparkSession, path: String, valueCol: String,
      value: Any, words: Int = 512, k: Int = 4): DataFrame = {
    val files = bloomCandidateFiles(spark, path, valueCol, value, words, k)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col(valueCol) === lit(value))
  }

  /** Metadata-only COUNT(*): sum the row counts recorded in each parquet
    * FOOTER — ~8 KB read per file, zero data pages — the lakehouse fast
    * path (Delta answers unfiltered counts from its log; DuckDB/
    * DataFusion from footers; Spark's own scan would read and count
    * rows). Same |files|-bounded contract as the rest of this module:
    * at 100 TB the loop is thousands of footer reads over the layout
    * listing, not a data scan (and a real deployment caches the counts
    * in the table log, as [[LakeTable.describeDetail]] does for sizes). */
  def fastCount(spark: SparkSession, path: String): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        scala.util.Using.resource(
          ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))) {
          r => total += r.getRecordCount
        }
    }
    total
  }
}
