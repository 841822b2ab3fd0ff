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
