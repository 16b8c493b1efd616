package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Zero-extra-dependency Avro container-file source: the Avro core jars
  * ship with the Spark distribution (avro-1.x on the classpath for
  * Spark's own shuffle/serializer use), so object-container files can be
  * read without the separately-published spark-avro module — the same
  * self-reliance pattern as [[Xlsx]] (SURVEY §2.1's "read the formats
  * users actually drop in the landing zone" requirement).
  *
  * Read path is distributed: the `binaryFile` source splits FILES across
  * executors and each partition decodes its files with Avro's streaming
  * `DataFileStream` — no whole-dataset driver materialization. (Avro
  * container blocks are not sub-file-splittable here; at 100 TB you size
  * files to ~128 MB exactly as every Avro ingest pipeline does, and file
  * parallelism saturates the cluster.) Only the SCHEMA is peeked on the
  * driver from one file header, the same bounded metadata read every
  * schema-on-read source performs.
  *
  * Supported Avro types: null, boolean, int, long, float, double,
  * string, bytes, and nullable unions of those — the flat-record subset
  * the reference's tabular pipelines use. Nested records/arrays/maps are
  * rejected loudly rather than half-read.
  */
object Avro {

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.NULL    => (NullType, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toList
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size <= 2,
        s"unsupported Avro union: $s (only [null, T] unions)")
      (toSparkType(nonNull.head)._1, true)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported Avro type $other (flat records only)")
  }

  private def sparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"not a record schema: $avro")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = toSparkType(f.schema())
      StructField(f.name(), t, nullable)
    })
  }

  private def convert(v: AnyRef, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (x, _) => x // boolean/int/long/float/double box directly
  }

  private def decodeFile(content: Array[Byte], schema: StructType): Iterator[Row] = {
    val reader = new DataFileStream[GenericRecord](
      new java.io.ByteArrayInputStream(content), new GenericDatumReader[GenericRecord]())
    val rows = reader.iterator().asScala.map { rec =>
      Row.fromSeq(schema.fields.toSeq.map(f => convert(rec.get(f.name), f.dataType)))
    }.toVector // drain before close: DataFileStream reads lazily
    reader.close()
    rows.iterator
  }

  /** Schema peek from the first file's header (bounded driver read). */
  def readSchema(path: String): StructType = {
    val first = listAvroFiles(path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $path"))
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(first))
    try {
      val s = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      val result = sparkSchema(s.getSchema)
      s.close()
      result
    } finally in.close()
  }

  private def listAvroFiles(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isRegularFile(p)) Seq(path)
    else java.nio.file.Files.list(p).iterator().asScala
      .map(_.toString).filter(_.endsWith(".avro")).toSeq.sorted
  }

  /** Distributed Avro read: binaryFile scan (files spread across tasks)
    * + per-partition streaming decode. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = readSchema(path)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select("content")
    bin.mapPartitions(_.flatMap(r =>
      decodeFile(r.getAs[Array[Byte]]("content"), schema)))(Encoders.row(schema))
  }

  /** Fixture/export writer (driver-side, for bounded row sets — tests
    * and dimension snapshots; big-data Avro EXPORT would be a
    * foreachPartition variant of the same writer). Fields map Scala
    * Long/Double/String/Boolean/Int to the matching Avro type. */
  def write(path: String, recordName: String,
      fields: Seq[(String, Schema.Type)], rows: Seq[Seq[Any]]): Unit = {
    val fieldDefs = fields.map { case (n, t) =>
      new Schema.Field(n, Schema.create(t), null, null.asInstanceOf[AnyRef])
    }
    val schema = Schema.createRecord(recordName, null, "graft", false, fieldDefs.asJava)
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, p.toFile)
    rows.foreach { r =>
      val rec = new GenericData.Record(schema)
      fields.map(_._1).zip(r).foreach { case (n, v) => rec.put(n, v) }
      w.append(rec)
    }
    w.close()
  }
}
