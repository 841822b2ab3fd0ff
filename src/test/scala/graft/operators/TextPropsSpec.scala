package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Properties + fixtures for the text/dedup primitives. */
class TextPropsSpec extends SparkTestBase {
  import spark.implicits._

  test("normText: punctuation to space, collapse, trim, lower") {
    val got = Seq("  Hello,   WORLD!! 42 ").toDF("text")
      .select(normText($"text")).as[String].head()
    assert(got == "hello world 42")
  }

  test("hash60 is non-negative and stable") {
    val got = Seq("a", "b", "a").toDF("s").select(hash60($"s")).as[Long].collect()
    assert(got.forall(_ >= 0))
    assert(got(0) == got(2) && got(0) != got(1))
  }

  test("wordShingles: k=3 over 5 tokens gives 3 shingles; short docs give none") {
    val df = Seq("a b c d e", "a b").toDF("text")
    val got = df.select(wordShingles(tokens($"text"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1).isEmpty)
  }

  test("charShingles: 8-grams of a 10-char string") {
    val got = Seq("abcdefghij").toDF("t")
      .select(charShingles($"t", 8)).as[Seq[String]].head()
    assert(got == Seq("abcdefgh", "bcdefghi", "cdefghij"))
  }

  test("minhash signatures are within [0, P) and identical docs collide") {
    val sigs = Dedup.minhashSignature(spark, sf)
    val cols = (0 until 8).map(j => col(s"sig$j"))
    val bad = sigs.filter(cols.map(c => c < 0 || c >= 2147483647L).reduce(_ || _)).count()
    assert(bad == 0)
  }

  test("jaccard pairs are symmetric-bounded: 0 <= jac <= 1") {
    val pairs = Dedup.dedupNgramJaccard(spark, sf)
    val bad = pairs.filter(col("jac1") < 0 || col("jac1") > 1 ||
      col("jac3") < 0 || col("jac3") > 1).count()
    assert(bad == 0)
  }

  test("containment pairs equal a string-set driver replay; containment >= 0.8 >= jaccard bound") {
    val got = Dedup.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6), r.getDouble(7))).toSet
    // replay on raw token STRINGS (the oracle's form; hash counts are
    // identical because md5 is injective on the distinct token sets)
    def toks(t: String): Set[String] =
      t.replaceAll("[^a-zA-Z0-9\\s]", " ").replaceAll("\\s+", " ")
        .trim.toLowerCase.split(" ").toSet
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), toks(r.getString(2))))
    val expected = (for {
      a <- docs; b <- docs
      if a._2 == b._2 && a._1 < b._1
      na = a._3.size.toLong; nb = b._3.size.toLong
      i = (a._3 & b._3).size.toLong
      if na > 0 && nb > 0 && i * 5 >= math.min(na, nb) * 4
    } yield {
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a._1, b._1, na, nb, i,
        r6(i.toDouble / math.min(na, nb)),
        r6(i.toDouble / (na + nb - i)))
    }).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, _, _, cont, jac) =>
      assert(cont >= 0.8 - 1e-9 && cont <= 1.0 + 1e-9)
      assert(jac <= cont + 1e-9)
    }
  }

  test("simhash of identical texts is identical") {
    import graft.Tables
    val fp = Dedup.dedupSimhash(spark, sf)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), md5(col("text")).as("h"))
    val joined = fp.join(docs, "doc_id")
      .groupBy("h").agg(countDistinct(col("simhash")).as("n"))
    assert(joined.filter(col("n") > 1).count() == 0)
  }

  test("ann brute-force: self excluded, exactly <=5 per query, rank ordered") {
    val got = Ann.annBruteforceTopk(spark, sf)
    assert(got.filter(col("qid") === col("nid")).count() == 0)
    val perQ = got.groupBy("qid").agg(count(lit(1)).as("n"), max("rn").as("mx"))
    assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5).count() == 0)
  }
}
