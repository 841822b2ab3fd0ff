package graft.etl

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal OOXML workbook writer for test fixtures (no external
  * spreadsheet library in this environment): one sheet named "Data",
  * inline strings only — exactly the subset the 2024 tidy path reads.
  * Shared by TidyPathSpec (messy-numerics parse) and
  * Aspep2024FixtureSpec (the gated golden tuples).
  */
object XlsxFixture {

  private def cell(v: String): String =
    s"""<c t="inlineStr"><is><t>${v
      .replace("&", "&amp;").replace("<", "&lt;")}</t></is></c>"""

  def writeXlsx(path: String, rows: Seq[Seq[String]]): Unit = {
    val sheetRows = rows.map(r => s"<row>${r.map(cell).mkString}</row>").mkString
    val entries = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>"""
    )
    val zos = new ZipOutputStream(new FileOutputStream(path))
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
  }
}
