package graft

import graft.functions.ExactMath
import org.apache.spark.sql.functions._

/** Pins the cross-engine exact-ln kernel: the three synchronized
  * forms (driver Scala, Spark Column, DuckDB snippet) must produce
  * bit-identical doubles. The DuckDB side is pinned here against
  * literals captured from a real DuckDB run of
  * `ExactMath.sqlLnCols` (see the values' provenance note) so a
  * drift in any form fails this spec before it fails the gate.
  */
class ExactMathSpec extends SparkTestBase {

  // Captured from DuckDB 1.x executing the sqlLnCols snippet over
  // these n. Bit-exact doubles — compare with ==, not tolerance.
  private val duckdbPins: Seq[(Long, Double)] = Seq(
    1L -> 0.0,
    2L -> 0.6931471805599453,
    3L -> 1.0986122886681096,
    7L -> 1.9459101490553132,
    100L -> 4.605170185988091,
    12345L -> 9.421006401779279,
    9999999937L -> 23.025850923640455)

  test("lnInt matches the DuckDB replay bit-for-bit") {
    duckdbPins.foreach { case (n, want) =>
      val got = ExactMath.lnInt(n)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want), s"n=$n got=$got want=$want")
    }
  }

  test("lnIntCol matches lnInt bit-for-bit across a wide range") {
    import spark.implicits._
    val ns = (1L to 2000L) ++ Seq(12345L, 1L << 40, 9999999937L, Long.MaxValue / 2)
    val got = ns.toDF("n").select(col("n"), ExactMath.lnIntCol(col("n")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ns.foreach { n =>
      assert(java.lang.Double.doubleToLongBits(got(n)) ==
        java.lang.Double.doubleToLongBits(ExactMath.lnInt(n)), s"n=$n")
    }
  }

  test("lnInt is a faithful ln (sub-ulp of libm) and lnRatio signs") {
    (1L to 5000L).foreach { n =>
      val err = math.abs(ExactMath.lnInt(n) - math.log(n.toDouble))
      assert(err <= 4e-15, s"n=$n err=$err")
    }
    assert(ExactMath.lnRatio(1, 4) < 0 && ExactMath.lnRatio(4, 1) > 0)
    assert(ExactMath.lnRatio(7, 7) == 0.0)
  }

  test("sqlLnCols emits the synchronized snippet") {
    val sql = ExactMath.sqlLnCols("c", "lc", "lnc")
    assert(sql.contains("length(bin(CAST(c AS BIGINT))) - 1 AS lck"))
    assert(sql.contains(s"* ${ExactMath.LN2} + 2.0 * lcz"))
    assert(sql.contains("1.0/29.0") && sql.contains("1.0/3.0 + lcq"))
  }
}
