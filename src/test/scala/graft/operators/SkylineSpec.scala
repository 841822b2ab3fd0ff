package graft.operators

import graft.SparkTestBase

/** Skyline frontier: hand-traced dominance on a 7-part catalog
  * (dominated rows, frontier ties that must BOTH survive, a
  * no-larger-size anchor), plus full-corpus dominance re-check — every
  * returned part verified non-dominated against the whole catalog, and
  * every excluded part verified dominated. The DuckDB oracle re-checks
  * the composition with an independent NOT-EXISTS formulation.
  */
class SkylineSpec extends SparkTestBase {

  test("skyline: hand catalog — dominated rows drop, (size,price) ties both survive") {
    import spark.implicits._
    // best per size: s5->3.00, s10->4.00, s20->4.00, s30->6.00.
    // s30 anchors (nothing larger); s20 best 4.00 < 6.00 survives;
    // s10 best 4.00 is NOT < 4.00 (part 4 dominates part 2: equal
    // price, strictly larger) -> drops; s5 3.00 < 4.00 survives.
    // Parts 5 and 7 tie exactly on (30, 6.00): neither dominates the
    // other, both stay.
    val parts = Seq(
      (1L, "a", 10, 5.00), (2L, "b", 10, 4.00), (3L, "c", 20, 4.50),
      (4L, "d", 20, 4.00), (5L, "e", 30, 6.00), (6L, "f", 5, 3.00),
      (7L, "g", 30, 6.00)
    ).toDF("p_partkey", "p_name", "p_size", "p_retailprice")
    val got = MultiDim.skyline(parts).collect().map(_.getLong(0)).toSet
    assert(got == Set(4L, 5L, 6L, 7L))
  }

  test("skyline: single-size catalog degenerates to the min-price parts") {
    import spark.implicits._
    val parts = Seq(
      (1L, "a", 10, 5.00), (2L, "b", 10, 4.00), (3L, "c", 10, 4.00)
    ).toDF("p_partkey", "p_name", "p_size", "p_retailprice")
    val got = MultiDim.skyline(parts).collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("skyline_frontier: result == brute-force dominance over the full corpus") {
    val all = graft.Tables.part(spark, sf)
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        math.round(r.getDouble(2) * 100)))
    def dominated(x: (Long, Int, Long)) = all.exists { y =>
      y._3 <= x._3 && y._2 >= x._2 && (y._3 < x._3 || y._2 > x._2)
    }
    val expect = all.filterNot(dominated).map(_._1).toSet
    val got = MultiDim.skylineFrontier(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
