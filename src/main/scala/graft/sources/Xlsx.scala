package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable
import scala.xml.XML

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX scan — SURVEY.md §2 S4, the reference's multi-sheet Excel
  * ingestion (`common/utils.py:21-38`, openpyxl via a Glue pythonshell).
  *
  * No spark-excel jar exists offline, but none is needed: XLSX is a ZIP
  * of XML parts, and `java.util.zip` + `scala-xml` are both on the
  * provided classpath. This reads the workbook's sheet list, the shared-
  * strings table, and each worksheet's cell grid, and returns the
  * reference's "dynamic mode": every column as string, first row as
  * header — exactly what its openpyxl→csv preprocessing produced, ready
  * for the same `CoreOps.castColumns` promotion the CSV path uses.
  *
  * Scale note, mirroring the reference: XLSX is an inherently
  * single-machine format (one central directory, DEFLATE streams, no
  * record splits), which is why the reference parses it in a pythonshell
  * job rather than Spark. Parsing happens driver-side here for the same
  * reason; the parsed rows are then distributed via createDataFrame. At
  * scale the pattern is: land XLSX → convert once at the edge → columnar
  * from then on. The 100 TB path never re-reads XLSX.
  *
  * Supported cell types: shared strings (`t="s"`, including rich-text
  * runs), inline strings (`t="inlineStr"`), formula-cached strings
  * (`t="str"`), booleans (`t="b"` → "true"/"false"), and numbers (raw
  * `<v>` text, no float reformatting). Sparse rows honor the `r="A1"`
  * cell references, so gaps land as nulls in the right columns.
  */
object Xlsx {

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = withZip(path) { zip =>
    val wb = XML.load(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
    (wb \\ "sheet").map(s => (s \@ "name"))
  }

  /** One sheet as an all-string DataFrame (dynamic mode): header from the
    * first row, every value a string, missing cells null. */
  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val grid = readGrid(path, sheet)
    require(grid.nonEmpty, s"sheet '$sheet' in $path is empty")
    // width = widest row, not just the header: data rows wider than the
    // header (trailing computed column, sparse header) must not silently
    // truncate; extra columns get CSV-style synthetic names
    val width = grid.map(_.length).max
    val header = grid.head.map(_.getOrElse(""))
      .padTo(width, "").zipWithIndex
      .map { case (h, i) => if (h.nonEmpty) h else s"_c$i" }
    val rows = grid.tail.map { r =>
      Row.fromSeq(r.padTo(width, None).map(_.orNull))
    }
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  /** All sheets unioned (the reference iterates sheets of one workbook),
    * with a `sheet_name` lineage column — its per-sheet provenance. */
  def readAllSheets(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    sheetNames(path).map { s =>
      readSheet(spark, path, s).withColumn("sheet_name", lit(s))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Worksheet part name for a sheet: resolved through the workbook rels
    * (r:id → Target) when present — foreign writers don't always number
    * sheet parts in workbook order — falling back to positional
    * sheet1..N for rels-less minimal files. */
  private def sheetPart(zip: ZipFile, sheet: String): String = {
    val wb = XML.load(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
    val sheets = (wb \\ "sheet")
    val idx = sheets.indexWhere(s => (s \@ "name") == sheet)
    require(idx >= 0,
      s"sheet '$sheet' not found (have: ${sheets.map(_ \@ "name")})")
    val rid = sheets(idx).attributes.asAttrMap.getOrElse("r:id", "")
    val viaRels = for {
      relsEntry <- Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
      if rid.nonEmpty
      rels = XML.load(zip.getInputStream(relsEntry))
      rel <- (rels \\ "Relationship").find(r => (r \@ "Id") == rid)
    } yield "xl/" + (rel \@ "Target").stripPrefix("/xl/").stripPrefix("./")
    viaRels.getOrElse(s"xl/worksheets/sheet${idx + 1}.xml")
  }

  /** Raw cell grid of a sheet: rows of Option[String], positions from the
    * cell references. Driver-side by design (see scale note above). */
  private def readGrid(path: String, sheet: String): Vector[Vector[Option[String]]] =
    withZip(path) { zip =>
      val part = sheetPart(zip, sheet)
      val shared: Vector[String] = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map { e =>
          val sst = XML.load(zip.getInputStream(e))
          // concatenate text runs: plain <si><t>x</t></si> and rich
          // <si><r><t>x</t></r><r><t>y</t></r></si> both flatten
          (sst \ "si").map(si => (si \\ "t").map(_.text).mkString).toVector
        }.getOrElse(Vector.empty)
      val ws = XML.load(zip.getInputStream(zip.getEntry(part)))
      (ws \\ "row").toVector.map { row =>
        val cells = mutable.ArrayBuffer.empty[Option[String]]
        (row \ "c").foreach { c =>
          val col = colIndex((c \@ "r").takeWhile(_.isLetter))
          while (cells.size < col) cells += None
          val v = (c \@ "t") match {
            case "s" => (c \ "v").headOption.map(v => shared(v.text.trim.toInt))
            case "inlineStr" => Some((c \ "is" \\ "t").map(_.text).mkString)
            case "b" => (c \ "v").headOption.map(v =>
              if (v.text.trim == "1") "true" else "false")
            case _ => (c \ "v").headOption.map(_.text) // "str" and numbers
          }
          cells += v
        }
        cells.toVector
      }
    }

  /** "A"→0, "B"→1, … "AA"→26 (base-26, 1-indexed letters). */
  private def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  private def withZip[A](path: String)(f: ZipFile => A): A = {
    val zip = new ZipFile(path)
    try f(zip) finally zip.close()
  }

  /** Minimal XLSX writer (shared-strings based) — used to stage fixtures
    * and by tests; the reference's ecosystem writes XLSX upstream of the
    * pipeline, so the engine only needs enough of a writer to feed its
    * own reader deterministically. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    val strings = mutable.LinkedHashMap.empty[String, Int]
    def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    val sheetXml = sheets.map { case (_, rows) =>
      val body = rows.zipWithIndex.map { case (r, ri) =>
        val cells = r.zipWithIndex.map { case (v, ci) =>
          s"""<c r="${colRef(ci)}${ri + 1}" t="s"><v>${sid(v)}</v></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cells</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    }
    val sst = {
      val items = strings.keys.map(s => s"<si><t>${escape(s)}</t></si>").mkString
      s"""<?xml version="1.0" encoding="UTF-8"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">$items</sst>"""
    }
    val wb = {
      val items = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${escape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$items</sheets></workbook>"""
    }
    val rels = {
      val items = sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString
      val sstRel = s"""<Relationship Id="rId${sheets.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>"""
      s"""<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$items$sstRel</Relationships>"""
    }
    val types = {
      val overrides = sheets.indices.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
      s"""<?xml version="1.0" encoding="UTF-8"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>$overrides</Types>"""
    }
    val rootRels = """<?xml version="1.0" encoding="UTF-8"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def entry(name: String, content: String): Unit = {
        val e = new ZipEntry(name)
        e.setTime(0L) // deterministic bytes across runs
        out.putNextEntry(e)
        out.write(content.getBytes("UTF-8"))
        out.closeEntry()
      }
      entry("[Content_Types].xml", types)
      entry("_rels/.rels", rootRels)
      entry("xl/workbook.xml", wb)
      entry("xl/_rels/workbook.xml.rels", rels)
      sheets.indices.foreach(i => entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(i)))
      entry("xl/sharedStrings.xml", sst)
    } finally out.close()
  }

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  // used in both text and ATTRIBUTE context (sheet names) — quotes too
  private def escape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;").replace("'", "&apos;")
}
