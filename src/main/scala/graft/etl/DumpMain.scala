package graft.etl

/** Debug utility: dump parsed rows of a workbook.
  * usage: runMain graft.etl.DumpMain <path> [sheetName] [fromRow] [nRows]
  */
object DumpMain {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val sheet = if (args.length > 1 && args(1) != "-" && args(1).nonEmpty) Some(args(1)) else None
    val from = if (args.length > 2) args(2).toInt else 0
    val n = if (args.length > 3) args(3).toInt else 8
    val rows = ExcelReader.read(path, sheet)
    println(s"rows=${rows.length} width=${rows.map(_.length).maxOption.getOrElse(0)}")
    rows.slice(from, from + n).zipWithIndex.foreach { case (r, i) =>
      println(s"[${from + i}] " + r.map(c => if (c == null) "·" else c).mkString(" | "))
    }
  }
}
