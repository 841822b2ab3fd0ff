package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Sinks (SURVEY.md §2.9). The reference publishes single-file pretty
  * JSON arrays (pandas to_json(orient="records", indent=4) — NOT
  * NDJSON, assets.py:325); Spark's JSON sink is NDJSON-only, so K1 is a
  * thin driver-side renderer (bounded: <=45k rows). K3 (parquet,
  * year-partitioned) is the rebuild-native sink for anything large.
  */
object Writers {

  /** K1: single pretty JSON array file, null fields included, NaN/inf
    * -> null (pandas to_json behavior), stable column order.
    */
  def prettyJsonArray(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    // stream row-by-row: the extended artifact is ~256 MB of pretty
    // JSON — building it in one StringBuilder doubles peak driver heap
    val w = Files.newBufferedWriter(Paths.get(path), StandardCharsets.UTF_8)
    try {
      w.write("[")
      var first = true
      df.toLocalIterator().forEachRemaining { row =>
        if (!first) w.write(",")
        first = false
        w.write("\n    {")
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (i > 0) w.write(",")
          w.write("\n        "); w.write(jsonStr(f.name)); w.write(":")
          w.write(renderValue(row, i, f.dataType))
        }
        w.write("\n    }")
      }
      w.write("\n]")
    } finally w.close()
  }

  /** K3: partitioned parquet, the scale-native sink. */
  def parquetByYear(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("year").parquet(path)

  private def renderValue(row: org.apache.spark.sql.Row, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) "null"
    else dt match {
      case DoubleType =>
        val d = row.getDouble(i)
        if (d.isNaN || d.isInfinite) "null"
        else if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString + ".0"
        else d.toString
      case FloatType => row.getFloat(i).toString
      case IntegerType => row.getInt(i).toString
      case LongType => row.getLong(i).toString
      case StringType => jsonStr(row.getString(i))
      case BooleanType => row.getBoolean(i).toString
      case _ => jsonStr(String.valueOf(row.get(i)))
    }

  private def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
}
