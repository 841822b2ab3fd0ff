package graft.etl

import java.text.Normalizer

/** Header slugification matching the reference's normalization order
  * (reference process_aspep/assets.py:42-48, applied at :57 after
  * parenthetical removal):
  * strip -> whitespace->underscore -> drop non-[a-zA-Z0-9_] ->
  * NFKD fold to ASCII -> lowercase.
  */
object Slug {

  def slugify(text: String): String = {
    val underscored = text.trim.replaceAll("\\s+", "_")
    val alnum = underscored.replaceAll("[^a-zA-Z0-9_]", "")
    val folded = Normalizer.normalize(alnum, Normalizer.Form.NFKD)
      .replaceAll("[^\\p{ASCII}]", "")
    folded.toLowerCase
  }

  /** Parenthetical-stripped slug, e.g.
    * "Full-Time Payroll (whole dollars)" -> "fulltime_payroll".
    */
  def headerSlug(text: String): String =
    slugify(text.replaceAll("\\(.*?\\)", "").trim)

  /** Collapse multi-row headers: per column, vertically join the
    * header-range cell strings with spaces (null -> ""), then slug.
    * First two columns are forced to state/gov_function
    * (reference assets.py:51-64).
    */
  def collapseHeaders(rows: Seq[Seq[String]], start: Int, end: Int): Seq[String] = {
    val width = rows.map(_.length).max
    val headerRows = rows.slice(start, end + 1)
    val joined = (0 until width).map { c =>
      headerRows.map(r => if (c < r.length && r(c) != null) r(c) else "")
        .mkString(" ")
    }
    val slugged = joined.map(headerSlug).toArray
    if (slugged.length > 0) slugged(0) = "state"
    if (slugged.length > 1) slugged(1) = "gov_function"
    slugged.toSeq
  }
}
