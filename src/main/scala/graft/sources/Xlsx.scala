package graft.sources

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import javax.xml.parsers.SAXParserFactory
import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Pure-JDK xlsx codec (reference duckdb_connection.py:96-117 loads .xlsx
  * through pandas.read_excel: first sheet by default, row 1 = header,
  * numeric type inference). An xlsx file is a ZIP of XML parts — both
  * already in the JDK (`java.util.zip`, SAX) — so no spreadsheet
  * dependency is needed.
  *
  * Scale note: a workbook is a single non-splittable ZIP whose XML grammar
  * needs sequential decode — structurally a small-dimension/lookup input,
  * never a fact table (Excel itself caps at ~1M rows). The reader parses
  * on the driver and hands Spark a LocalRelation, which downstream joins
  * then broadcast; pointing a 100 TB pipeline's big side at a spreadsheet
  * is a user error this design makes impossible rather than slow.
  *
  * Fidelity simplifications vs pandas (documented, not silent): date-styled
  * numerics come back as their raw Excel serial numbers (style tables are
  * not consulted), and formula cells yield their cached `<v>` value.
  */
object Xlsx {

  // ---------------- read ----------------

  /** Read a worksheet into a DataFrame: first row = header, per-column
    * type inference over the data rows (all-integral → LONG, numeric →
    * DOUBLE, uniform booleans → BOOLEAN, else STRING — the pandas
    * read_excel contract). `sheet` None → the workbook's first sheet. */
  def read(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    val grid = readGrid(path, sheet)
    require(grid.nonEmpty, s"xlsx '$path': selected sheet has no rows")
    val header = grid.head
    val data = grid.tail
    val width = (grid.map(_.length) :+ header.length).max
    val names = (0 until width).map { i =>
      header.lift(i).flatten match {
        case Some(Cell.Str(s)) => s
        case Some(Cell.Num(n)) => fmtNum(n)
        case Some(Cell.Bool(b)) => b.toString
        case None => s"_c$i"
      }
    }

    def colCells(i: Int): Seq[Option[Cell]] = data.map(_.lift(i).flatten)
    val types: Seq[DataType] = (0 until width).map { i =>
      val present = colCells(i).flatten
      if (present.isEmpty) StringType
      else if (present.forall { case Cell.Num(n) => n.isWhole && math.abs(n) < 9.2e18; case _ => false })
        LongType
      else if (present.forall(_.isInstanceOf[Cell.Num])) DoubleType
      else if (present.forall(_.isInstanceOf[Cell.Bool])) BooleanType
      else StringType
    }

    val schema = StructType(names.zip(types).map { case (n, t) => StructField(n, t, nullable = true) })
    val rows = data.map { r =>
      Row.fromSeq((0 until width).map { i =>
        (r.lift(i).flatten, types(i)) match {
          case (None, _) => null
          case (Some(Cell.Num(n)), LongType) => n.toLong
          case (Some(Cell.Num(n)), DoubleType) => n
          case (Some(Cell.Num(n)), _) => fmtNum(n)
          case (Some(Cell.Bool(b)), BooleanType) => b
          case (Some(Cell.Bool(b)), _) => b.toString
          case (Some(Cell.Str(s)), _) => s
        }
      })
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  /** A cell value as stored (pre-inference). */
  private sealed trait Cell
  private object Cell {
    final case class Num(v: Double) extends Cell
    final case class Str(v: String) extends Cell
    final case class Bool(v: Boolean) extends Cell
  }

  /** Integral-looking numbers print without the trailing ".0" when coerced
    * to strings (header names, mixed columns). */
  private def fmtNum(n: Double): String =
    if (n.isWhole && math.abs(n) < 9.2e18) n.toLong.toString else n.toString

  /** Parse the workbook ZIP into a row grid of optional cells. */
  private def readGrid(path: String, sheet: Option[String]): Vector[Vector[Option[Cell]]] = {
    val zip = new ZipFile(path)
    try {
      def bytes(name: String): Option[Array[Byte]] =
        Option(zip.getEntry(name)).map { e =>
          val in = zip.getInputStream(e)
          try in.readAllBytes() finally in.close()
        }

      // sheet name -> relationship id, in workbook order
      val wb = bytes("xl/workbook.xml").getOrElse(
        throw new IllegalArgumentException(s"xlsx '$path': missing xl/workbook.xml"))
      val sheetsInOrder = mutable.ArrayBuffer.empty[(String, String)] // (name, rId)
      sax(wb, new DefaultHandler {
        override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
          if (local(q, l) == "sheet") {
            val rid = Option(a.getValue("r:id")).getOrElse(a.getValue("id"))
            sheetsInOrder += ((a.getValue("name"), rid))
          }
      })
      require(sheetsInOrder.nonEmpty, s"xlsx '$path': workbook declares no sheets")
      val (sheetName, rId) = sheet match {
        case None => sheetsInOrder.head
        case Some(want) => sheetsInOrder.find(_._1 == want).getOrElse(
          throw new IllegalArgumentException(
            s"xlsx '$path': no sheet named '$want' (has ${sheetsInOrder.map(_._1).mkString(", ")})"))
      }

      // relationship id -> part path
      val rels = mutable.Map.empty[String, String]
      bytes("xl/_rels/workbook.xml.rels").foreach(b => sax(b, new DefaultHandler {
        override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
          if (local(q, l) == "Relationship")
            rels(a.getValue("Id")) = a.getValue("Target")
      }))
      val target = rels.getOrElse(rId,
        throw new IllegalArgumentException(s"xlsx '$path': sheet '$sheetName' has no part"))
      val partPath = if (target.startsWith("/")) target.drop(1) else s"xl/$target"

      // shared strings, each <si> = concatenated <t> runs (rich text splits)
      val shared = mutable.ArrayBuffer.empty[String]
      bytes("xl/sharedStrings.xml").foreach(b => sax(b, new DefaultHandler {
        private var inT = false
        private val cur = new StringBuilder
        override def startElement(u: String, l: String, q: String, a: Attributes): Unit = {
          val n = local(q, l)
          if (n == "si") cur.clear()
          if (n == "t") inT = true
        }
        override def characters(ch: Array[Char], s: Int, len: Int): Unit =
          if (inT) cur.appendAll(ch, s, len)
        override def endElement(u: String, l: String, q: String): Unit = {
          val n = local(q, l)
          if (n == "t") inT = false
          if (n == "si") shared += cur.toString
        }
      }))

      // the worksheet grid
      val sheetBytes = bytes(partPath).getOrElse(
        throw new IllegalArgumentException(s"xlsx '$path': missing part $partPath"))
      val grid = mutable.ArrayBuffer.empty[Vector[Option[Cell]]]
      sax(sheetBytes, new DefaultHandler {
        private var row = mutable.ArrayBuffer.empty[Option[Cell]]
        private var cellType = ""
        private var cellCol = -1
        private var inV = false
        private var inIs = false
        private val v = new StringBuilder
        override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
          local(q, l) match {
            case "row" => row = mutable.ArrayBuffer.empty[Option[Cell]]
            case "c" =>
              cellType = Option(a.getValue("t")).getOrElse("")
              cellCol = Option(a.getValue("r")).map(colIndex).getOrElse(row.length)
              v.clear()
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inV = true
            case _ =>
          }
        override def characters(ch: Array[Char], s: Int, len: Int): Unit =
          if (inV) v.appendAll(ch, s, len)
        override def endElement(u: String, l: String, q: String): Unit =
          local(q, l) match {
            case "v" => inV = false
            case "t" if inIs => inV = false
            case "is" => inIs = false
            case "c" =>
              while (row.length < cellCol) row += None
              val text = v.toString
              val cell: Option[Cell] = cellType match {
                case _ if text.isEmpty => None
                case "s" => Some(Cell.Str(shared(text.trim.toInt)))
                case "b" => Some(Cell.Bool(text.trim == "1" || text.trim == "true"))
                case "str" | "inlineStr" => Some(Cell.Str(text))
                // error cells (#DIV/0!, #N/A, …) surface as their text —
                // never a numeric-parse crash (pandas maps them to NaN;
                // string keeps the diagnostic visible)
                case "e" => Some(Cell.Str(text))
                case t =>
                  try Some(Cell.Num(text.trim.toDouble))
                  catch {
                    case _: NumberFormatException =>
                      throw new IllegalArgumentException(
                        s"xlsx cell ${if (cellCol >= 0) colName(cellCol) else "?"}: " +
                          s"unparseable numeric '$text' (cell type '$t')")
                  }
              }
              row += cell
            case "row" => grid += row.toVector
            case _ =>
          }
      })
      grid.toVector
    } finally zip.close()
  }

  /** "BC12" → 0-based column index (A=0 … Z=25, AA=26 …). */
  private def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Namespace-tolerant local name (workbooks may prefix, e.g. `x:row`). */
  private def local(qName: String, localName: String): String =
    if (localName != null && localName.nonEmpty) localName
    else { val i = qName.indexOf(':'); if (i >= 0) qName.substring(i + 1) else qName }

  /** Hardened non-validating SAX parse (no DTDs / external entities). */
  private def sax(bytes: Array[Byte], handler: DefaultHandler): Unit = {
    val f = SAXParserFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.newSAXParser().parse(new ByteArrayInputStream(bytes), handler)
  }

  // ---------------- write (fixture encoder) ----------------

  /** Minimal xlsx encoder for fixtures and round-trip specs (the
    * PNG/GIF-encoder pattern: the writer exists to prove the reader).
    * Strings go through a real sharedStrings table so the reader's
    * shared-string path is exercised; null cells are omitted (sparse). */
  def write(path: String, header: Seq[String], rows: Seq[Seq[Any]],
      sheetName: String = "Sheet1"): Unit = {
    val sharedIdx = mutable.LinkedHashMap.empty[String, Int]
    def sidx(s: String): Int = sharedIdx.getOrElseUpdate(s, sharedIdx.size)

    def cellXml(rowNum: Int, c: Int, v: Any): String = {
      val ref = colName(c) + rowNum
      v match {
        case null => ""
        case None => ""
        case Some(x) => cellXml(rowNum, c, x)
        case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
        case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
        case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
        case s => s"""<c r="$ref" t="s"><v>${sidx(s.toString)}</v></c>"""
      }
    }

    val body = new StringBuilder
    (header.map(h => h: Any) +: rows.map(_.toSeq)).zipWithIndex.foreach { case (r, i) =>
      val rowNum = i + 1
      body.append(s"""<row r="$rowNum">""")
      r.zipWithIndex.foreach { case (v, c) => body.append(cellXml(rowNum, c, v)) }
      body.append("</row>")
    }

    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>${body.toString}</sheetData></worksheet>"""
    val sstXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedIdx.size}" uniqueCount="${sharedIdx.size}">${
        sharedIdx.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString}</sst>"""
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>"""

    val out = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        out.putNextEntry(new ZipEntry(name))
        out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbookXml)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/sharedStrings.xml", sstXml)
      put("xl/worksheets/sheet1.xml", sheetXml)
    } finally out.close()
  }

  /** 0-based column index → "A"/"Z"/"AA" name. */
  private def colName(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")
}
