package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the long-micros exact-sum path byte-equal to the
  * decimal(18,6)-sum path it replaces — on the real lineitem corpus
  * (including the revenue product) and on adversarial random lattice
  * values (2 dp x 2 dp products, the exact shape of money * rate).
  */
class ExactSumSpec extends SparkTestBase {

  private def decimalSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  test("micros path == decimal path on lineitem sums and revenue product") {
    val li = graft.Tables.lineitem(spark, sf)
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val rows = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        ExactSum.sumExact(col("l_quantity")).as("q_new"),
        decimalSum(col("l_quantity")).as("q_old"),
        ExactSum.sumExact(col("l_extendedprice")).as("p_new"),
        decimalSum(col("l_extendedprice")).as("p_old"),
        ExactSum.sumExact(rev).as("r_new"),
        decimalSum(rev).as("r_old"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3), s"qty: $r")
      assert(r.getDouble(4) == r.getDouble(5), s"price: $r")
      assert(r.getDouble(6) == r.getDouble(7), s"revenue: $r")
    }
  }

  test("micros path == decimal path on adversarial random lattice values") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // price on the 0.01 lattice up to ~1e5; rate on the 0.01 lattice in
    // [0, 1) — products carry 4 dp, the worst case micros must recover
    val data = Seq.fill(20000) {
      val price = rnd.nextInt(10500000) / 100.0
      val rate = rnd.nextInt(100) / 100.0
      (rnd.nextInt(8), price, rate)
    }.toDF("g", "price", "rate")
    val rows = data.groupBy(col("g"))
      .agg(
        ExactSum.sumExact(col("price") * (lit(1) - col("rate"))).as("v_new"),
        decimalSum(col("price") * (lit(1) - col("rate"))).as("v_old"))
      .collect()
    assert(rows.length == 8)
    rows.foreach(r => assert(r.getDouble(1) == r.getDouble(2), r.toString))
  }
}
