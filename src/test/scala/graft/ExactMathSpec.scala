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

  // Captured from DuckDB 1.x executing sqlLnGe1Cols / sqlExpCols over
  // these arguments (tools provenance: the r7 kernel-validation run).
  // Bit-exact — compare with ==.
  private val lnGe1Pins: Seq[(Double, Double)] = Seq(
    1.0 -> 0.0,
    1.5 -> 0.4054651081081644,
    2.0 -> 0.6931471805599453,
    3.75 -> 1.3217558399823195,
    10.0 -> 2.3025850929940455,
    123.456 -> 4.815884817283264,
    1000000.5 -> 13.815511057964148,
    4.7e9 -> 22.270828345662423,
    1e12 -> 27.631021115928547,
    2.5e15 -> 35.45506712678483)

  private val expPins: Seq[(Double, Double)] = Seq(
    0.0 -> 1.0,
    0.5 -> 1.6487212707001282,
    -0.5 -> 0.6065306597126334,
    1.0 -> 2.7182818284590455,
    -1.0 -> 0.3678794411714423,
    5.4321 -> 228.62886226081397,
    -12.345 -> 4.351456244655325e-06,
    42.9 -> 4.27792605732114e18,
    -42.9 -> 2.3375813106648393e-19,
    -43.1 -> 0.0, // the documented k < −62 underflow clamp
    3.2 -> 24.532530197109356,
    -7.77 -> 0.00042221326680907,
    11.0903 -> 65532.40289589632,
    -0.0001 -> 0.9999000049998333)

  test("lnGe1 matches the DuckDB replay bit-for-bit and extends lnInt") {
    lnGe1Pins.foreach { case (x, want) =>
      val got = ExactMath.lnGe1(x)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want), s"x=$x got=$got want=$want")
    }
    // lnGe1 on integer-valued doubles IS lnInt
    (1L to 3000L).foreach { n =>
      assert(java.lang.Double.doubleToLongBits(ExactMath.lnGe1(n.toDouble)) ==
        java.lang.Double.doubleToLongBits(ExactMath.lnInt(n)), s"n=$n")
    }
  }

  test("expFixed matches the DuckDB replay bit-for-bit and is faithful") {
    expPins.foreach { case (y, want) =>
      val got = ExactMath.expFixed(y)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want), s"y=$y got=$got want=$want")
    }
    // faithful to libm within a few ulp over the working range
    (-420 to 420).foreach { i =>
      val y = i / 10.0
      val rel = math.abs(ExactMath.expFixed(y) - math.exp(y)) / math.exp(y)
      assert(rel <= 5e-15, s"y=$y rel=$rel")
    }
    // round-trip with lnGe1: exp(ln x) ~ x
    lnGe1Pins.map(_._1).foreach { x =>
      val rt = ExactMath.expFixed(ExactMath.lnGe1(x))
      assert(math.abs(rt - x) / x <= 5e-15, s"x=$x rt=$rt")
    }
  }

  test("log2Fix/qlnFix are faithful on the integer-only kernel") {
    // value check: log2Fix/2^QF tracks log2, qlnFix/1e6 tracks ln(c/r)
    val ns = (1L to 4000L) ++ Seq(12345L, 999999937L, 1L << 40, Long.MaxValue / 3)
    ns.foreach { n =>
      val got = ExactMath.log2Fix(n).toDouble / (1L << ExactMath.QF).toDouble
      val want = math.log(n.toDouble) / math.log(2.0)
      assert(math.abs(got - want) <= 4e-7, s"n=$n got=$got want=$want")
    }
    val pairs = for (c <- Seq(1L, 2L, 3L, 17L, 999L, 65536L, 12345678L);
                     r <- Seq(1L, 7L, 1000L, 999999937L) if true) yield (c, r)
    pairs.foreach { case (c, r) =>
      val got = ExactMath.qlnFix(c, r) / 1e6
      val want = math.log(c.toDouble) - math.log(r.toDouble)
      assert(math.abs(got - want) <= 1e-5, s"c=$c r=$r got=$got want=$want")
    }
    assert(ExactMath.qlnFix(7, 7) == 0L)
    assert(ExactMath.qlnFix(1, 2) == -ExactMath.qlnFix(2, 1))
  }

  test("sqlQlnFromCounts replays qlnFix under engine integer semantics") {
    // the generated SQL is DuckDB-targeted but uses only bin()/shifts/
    // CASE/integer ops whose semantics Spark SQL shares on these
    // non-negative operands — running the VERY SQL the oracle gets
    // through Spark pins it against the Scala kernel (`//` → `div` is
    // the one dialect rename; both floor-divide non-negative args)
    import spark.implicits._
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 7L), (17L, 1000L),
      (999L, 999999937L), (65536L, 65536L), (12345678L, 99L),
      (1L, Long.MaxValue / 3), (Long.MaxValue / 3, 1L))
    rows.zipWithIndex
      .map { case ((c, r), i) => (s"a$i", s"n$i", c, r) }
      .toDF("a", "nx", "c", "r").createOrReplaceTempView("t_qln")
    val sql = ExactMath.sqlQlnFromCounts("t_qln").replace("//", " div ")
    val got = spark.sql(sql).collect()
      .map(x => (x.getString(0), x.getLong(2))).toMap
    rows.zipWithIndex.foreach { case ((c, r), i) =>
      assert(got(s"a$i") == ExactMath.qlnFix(c, r),
        s"qln c=$c r=$r sql=${got(s"a$i")} scala=${ExactMath.qlnFix(c, r)}")
    }
  }

  test("sqlLnCols emits the synchronized snippet") {
    val sql = ExactMath.sqlLnCols("c", "lc", "lnc")
    assert(sql.contains("length(bin(CAST(c AS BIGINT))) - 1 AS lck"))
    assert(sql.contains(s"* ${ExactMath.LN2} + 2.0 * lcz"))
    assert(sql.contains("1.0/29.0") && sql.contains("1.0/3.0 + lcq"))
  }
}
