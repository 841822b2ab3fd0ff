package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the native PII scan kernels value-identical to the regex forms
  * they replace — on the real corpus (with the deterministic PII
  * injection the operators use), on adversarial boundary strings, and
  * on randomized dense strings over the pattern alphabet.
  */
class PiiScanSpec extends SparkTestBase {

  private val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private val IpRe = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"

  private def pinEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.select(
      PiiScan.countEmails(col("s")).as("ce"),
      size(regexp_extract_all(col("s"), lit(EmailRe), lit(0))).cast("long").as("cer"),
      PiiScan.countIps(col("s")).as("ci"),
      size(regexp_extract_all(col("s"), lit(IpRe), lit(0))).cast("long").as("cir"),
      PiiScan.redact(col("s")).as("r"),
      regexp_replace(regexp_replace(col("s"), EmailRe, "<EMAIL>"),
        IpRe, "<IP>").as("rr"))
      .filter(col("ce") =!= col("cer") || col("ci") =!= col("cir") ||
        col("r") =!= col("rr"))
    val rows = bad.take(3)
    assert(rows.isEmpty, rows.mkString("\n"))
  }

  test("kernels == regex forms over the injected corpus") {
    val aug = when(pmod(col("doc_id"), lit(7)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now")))
      .when(pmod(col("doc_id"), lit(11)) === 0,
        concat(col("text"), lit(" from 10.0."),
          pmod(col("doc_id"), lit(256)).cast("string"), lit(".1 port")))
      .otherwise(col("text"))
    pinEqual(spark.read.parquet(s"$sf/documents.parquet").select(aug.as("s")))
  }

  test("kernels == regex forms on adversarial boundary strings") {
    import spark.implicits._
    pinEqual(Seq(
      "", "@", "a@b.c", "a@b.c3", "A@b.c", "aA@b.c", "ab@cd", "a@b@c.d",
      "x@ab@c.d", "ab@@c.d", "a@b..c", "a@b.c.d", "1@2.x", "a@b.", ".@.",
      "1.2.3.4", "1.2.3.4.5", "1.2.3.4.5.6.7.8", "12a3.4.5.6", "1..2.3.4",
      "1.2.3.4567", "999.999.999.999", ".1.2.3.4", "1.2.3.", "a1.2.3.4",
      "1.2.3.4b", "user@host.co 10.0.0.1", "a@1.b", "0@0.z",
      "nested a@b.c inside 1.2.3.4 twice d@e.fg 5.6.7.8 end").toDF("s"))
  }

  test("kernels == regex forms on randomized dense strings") {
    import spark.implicits._
    // fixed-seed random strings over the alphabet that exercises the
    // patterns hard: digits, lowercase, '@', '.', spaces
    val rnd = new scala.util.Random(42)
    val alpha = "ab01@. "
    val rows = (1 to 2000).map(_ =>
      (1 to (3 + rnd.nextInt(30))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    pinEqual(rows.toDF("s"))
  }

  test("piiRedact operator output is fully scrubbed and counts are found") {
    val r = graft.operators.QualityFilters.piiRedact(spark, sf).cache()
    assert(r.filter(col("doc_id") % 7 === 0 && col("n_emails") === 0).count() === 0)
    assert(r.filter(col("redacted").rlike(EmailRe) ||
      col("redacted").rlike(IpRe)).count() === 0)
    r.unpersist()
  }
}
