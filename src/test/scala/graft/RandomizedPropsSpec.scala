package graft

import org.apache.spark.sql.functions._
import graft.functions.Cleaning
import scala.util.Random

/** Seeded randomized properties: engine expressions checked against
  * independent Scala reference implementations on generated inputs
  * (fixed seeds — deterministic across runs).
  */
class RandomizedPropsSpec extends SparkTestBase {
  import spark.implicits._

  test("cleanNumeric inverts messy formatting for 500 random values") {
    val rnd = new Random(42)
    val cases = (1 to 500).map { _ =>
      val v = rnd.between(-99999999L, 99999999L)
      val abs = math.abs(v)
      val grouped = f"$abs%,d"
      val messy = rnd.nextInt(4) match {
        case 0 => if (v < 0) s"-$grouped" else grouped
        case 1 => if (v < 0) s"($grouped)" else grouped   // accounting
        case 2 => if (v < 0) s"−$grouped" else grouped // unicode minus
        case 3 => if (v < 0) s"–$grouped" else grouped // en-dash
      }
      (messy, v.toDouble)
    }
    val got = cases.map(_._1).toDF("s")
      .select(Cleaning.cleanNumeric($"s")).as[Option[Double]].collect()
    cases.zip(got).foreach { case ((messy, expected), actual) =>
      assert(actual.contains(expected), s"'$messy' -> $actual, want $expected")
    }
  }

  test("slugify is idempotent on 300 random strings") {
    val rnd = new Random(7)
    val chars = "abZ019 _-()ü\t."
    val inputs = (1 to 300).map { _ =>
      (1 to rnd.nextInt(30)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    inputs.foreach { x =>
      val once = etl.Slug.slugify(x)
      assert(etl.Slug.slugify(once) == once, s"not idempotent on '$x'")
    }
  }

  test("window rank matches a reference pandas-style rank on random groups") {
    // reference: rank(method="min", ascending=False), NaN -> None
    def refRank(xs: Seq[Option[Double]]): Seq[Option[Int]] =
      xs.map {
        case None => None
        case Some(x) => Some(1 + xs.count(_.exists(_ > x)))
      }
    val rnd = new Random(99)
    val rows = (1 to 400).map { i =>
      val g = rnd.nextInt(8)
      val v = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(12).toDouble) // many ties + nulls
      (i, g, v)
    }
    val df = rows.toDF("id", "g", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy($"v".desc_nulls_last)
    val got = df.select($"id", $"g", $"v",
        when($"v".isNotNull, rank().over(w)).as("r"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    rows.groupBy(_._2).foreach { case (_, grp) =>
      val expected = refRank(grp.map(_._3))
      grp.map(_._1).zip(expected).foreach { case (id, exp) =>
        assert(got(id) == exp, s"id $id: got ${got(id)}, want $exp")
      }
    }
  }

  test("safe division over random inputs never yields infinity") {
    val rnd = new Random(3)
    val pairs = (1 to 300).map { _ =>
      (rnd.nextDouble() * 1e6 - 5e5,
        if (rnd.nextInt(4) == 0) 0.0 else rnd.nextDouble() * 10 - 5)
    }
    val got = pairs.toDF("a", "b")
      .select(Cleaning.safeDiv($"a", $"b")).as[Option[Double]].collect()
    assert(got.forall(o => o.forall(v => !v.isInfinite)))
    pairs.zip(got).foreach { case ((_, b), o) =>
      if (b == 0.0) assert(o.isEmpty, "x/0 must be null")
    }
  }
}
