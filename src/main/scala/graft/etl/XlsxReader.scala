package graft.etl

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Minimal .xlsx (SpreadsheetML) reader on the JDK only (no POI in
  * this environment): ZipFile + StAX over sharedStrings.xml /
  * workbook.xml / worksheets/sheetN.xml. Driver-side by design — ASPEP
  * workbooks are <=450 KB (SURVEY.md §2.1 S3); the DataFrame is created
  * from the parsed rows, and Spark takes over from the first projection.
  *
  * Returns a dense row-major matrix of cell strings (null = blank).
  * Numeric cells are rendered without a trailing ".0" when integral so
  * downstream try_cast produces the same doubles pandas' reader does.
  */
object XlsxReader {

  def read(path: String, sheetName: Option[String] = None): Vector[Vector[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      val sheetPath = resolveSheet(zip, sheetName)
      val entry = zip.getEntry(sheetPath)
      require(entry != null, s"missing $sheetPath in $path")
      readSheet(zip.getInputStream(entry), shared)
    } finally zip.close()
  }

  private def newReader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  private def readSharedStrings(zip: ZipFile): Vector[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return Vector.empty
    val r = newReader(zip.getInputStream(entry))
    val out = ArrayBuffer.empty[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t"  => inT = true
            case _    =>
          }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t"  => inT = false
            case "si" => out += cur.toString; cur = null
            case _    =>
          }
        case _ =>
      }
    }
    r.close()
    out.toVector
  }

  /** Map an optional sheet name to its part path via workbook.xml +
    * workbook.xml.rels; default = first sheet in workbook order.
    */
  private def resolveSheet(zip: ZipFile, sheetName: Option[String]): String = {
    val wb = zip.getEntry("xl/workbook.xml")
    require(wb != null, "missing xl/workbook.xml")
    val r = newReader(zip.getInputStream(wb))
    val sheets = ArrayBuffer.empty[(String, String)] // (name, rId)
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        var nm: String = null; var rid: String = null
        (0 until r.getAttributeCount).foreach { i =>
          r.getAttributeLocalName(i) match {
            case "name" => nm = r.getAttributeValue(i)
            case "id"   => rid = r.getAttributeValue(i)
            case _      =>
          }
        }
        sheets += ((nm, rid))
      }
    }
    r.close()
    val rid = sheetName match {
      case Some(n) =>
        sheets.find(_._1 == n)
          .getOrElse(throw new IllegalArgumentException(s"no sheet named $n"))._2
      case None => sheets.head._2
    }
    val rels = zip.getEntry("xl/_rels/workbook.xml.rels")
    require(rels != null, "missing workbook rels")
    val rr = newReader(zip.getInputStream(rels))
    var target: String = null
    while (rr.hasNext && target == null) {
      if (rr.next() == XMLStreamConstants.START_ELEMENT && rr.getLocalName == "Relationship") {
        var id: String = null; var tgt: String = null
        (0 until rr.getAttributeCount).foreach { i =>
          rr.getAttributeLocalName(i) match {
            case "Id"     => id = rr.getAttributeValue(i)
            case "Target" => tgt = rr.getAttributeValue(i)
            case _        =>
          }
        }
        if (id == rid) target = tgt
      }
    }
    rr.close()
    require(target != null, s"relationship $rid not found")
    if (target.startsWith("/")) target.drop(1)
    else s"xl/$target"
  }

  /** Column index from an A1-style cell ref ("BC12" -> 54). */
  private[etl] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** Render a numeric cell the way a float-reading parser would show an
    * integral value: no exponent, no trailing .0.
    */
  private[etl] def renderNumber(raw: String): String = {
    val d = try raw.toDouble catch { case _: NumberFormatException => return raw }
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else raw
  }

  private def readSheet(in: InputStream, shared: Vector[String]): Vector[Vector[String]] = {
    val r = newReader(in)
    val rows = ArrayBuffer.empty[(Int, ArrayBuffer[(Int, String)])]
    var curRow: ArrayBuffer[(Int, String)] = null
    var curRowIdx = -1
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIs = false
    var buf = new StringBuilder
    var maxCol = -1
    var rowCounter = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              curRow = ArrayBuffer.empty
              val ra = (0 until r.getAttributeCount)
                .find(i => r.getAttributeLocalName(i) == "r")
                .map(i => r.getAttributeValue(i).toInt - 1)
              curRowIdx = ra.getOrElse(rowCounter)
              rowCounter = curRowIdx + 1
            case "c" =>
              cellType = "n"; cellCol = -1
              (0 until r.getAttributeCount).foreach { i =>
                r.getAttributeLocalName(i) match {
                  case "r" => cellCol = colIndex(r.getAttributeValue(i))
                  case "t" => cellType = r.getAttributeValue(i)
                  case _   =>
                }
              }
              if (cellCol < 0) cellCol = if (curRow.isEmpty) 0 else curRow.last._1 + 1
            case "v" => inV = true; buf = new StringBuilder
            case "is" => inIs = true
            case "t" if inIs => inV = true; buf = new StringBuilder
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV =>
          buf.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" =>
              inV = false
              val value = cellType match {
                case "s" => shared(buf.toString.trim.toInt)
                case "n" => renderNumber(buf.toString)
                case "b" => if (buf.toString.trim == "1") "True" else "False"
                case _   => buf.toString
              }
              if (curRow != null) { curRow += ((cellCol, value)); maxCol = math.max(maxCol, cellCol) }
            case "t" if inIs && inV =>
              inV = false
              if (curRow != null) { curRow += ((cellCol, buf.toString)); maxCol = math.max(maxCol, cellCol) }
            case "is" => inIs = false
            case "row" =>
              if (curRow != null) rows += ((curRowIdx, curRow))
              curRow = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    if (rows.isEmpty) return Vector.empty
    val height = rows.map(_._1).max + 1
    val grid = Array.fill[Array[String]](height)(Array.fill[String](maxCol + 1)(null))
    rows.foreach { case (ri, cells) =>
      cells.foreach { case (ci, v) => if (v.nonEmpty) grid(ri)(ci) = v }
    }
    grid.map(_.toVector).toVector
  }
}
