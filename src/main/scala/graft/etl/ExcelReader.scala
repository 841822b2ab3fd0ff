package graft.etl

/** Facade over the two hand-rolled Excel readers (no POI in this
  * environment): .xlsx -> XlsxReader (zip + StAX), .xls -> XlsReader
  * (OLE2 compound file + BIFF8 records).
  */
object ExcelReader {
  def read(path: String, sheetName: Option[String]): Vector[Vector[String]] =
    if (path.toLowerCase.endsWith(".xlsx")) XlsxReader.read(path, sheetName)
    else XlsReader.read(path, sheetName)
}
