package graft

import graft.operators.{Correlate, TimeSeries}

/** Property pins for the round-5 robust-association additions:
  * Kendall tau-b against a naive all-pairs reference, tail dependence
  * on constructed co-spiking signals, and the Hurst estimator's
  * textbook ordering (persistent ramp ≫ 0.5 ≫ anti-persistent
  * alternation). The DuckDB oracles prove engine-equivalence; these
  * pin the SEMANTICS against independent formulations.
  */
class RobustAssocSpec extends SparkTestBase {
  import spark.implicits._

  private def naiveTauB(xs: Seq[Double], ys: Seq[Double]): Double = {
    def quant(vs: Seq[Double]): Seq[Long] = {
      val m = vs.map(math.abs).max match { case 0.0 => 1.0; case v => v }
      vs.map(v => math.floor((v / m) * 1e9 + 0.5).toLong)
    }
    val (qx, qy) = (quant(xs), quant(ys))
    var c, d, tx, ty, n0 = 0L
    for (i <- qx.indices; j <- (i + 1) until qx.length) {
      val dx = qx(i) - qx(j); val dy = qy(i) - qy(j)
      n0 += 1
      if (dx == 0) tx += 1
      if (dy == 0) ty += 1
      if ((dx > 0 && dy > 0) || (dx < 0 && dy < 0)) c += 1
      else if ((dx > 0 && dy < 0) || (dx < 0 && dy > 0)) d += 1
    }
    (c - d).toDouble / math.sqrt(((n0 - tx) * (n0 - ty)).toDouble)
  }

  private def r4(x: Double): Double = math.floor((x + 1e-9) * 1e4 + 0.5) / 1e4

  test("kendall tau-b matches the naive all-pairs reference, ties included") {
    // two signals, one bucket, 12 aligned samples with deliberate ties
    val xs = Seq(1.0, 2.0, 2.0, 3.0, 5.0, 4.0, 4.0, 6.0, 7.0, 8.0, 8.0, 9.0)
    val ys = Seq(2.0, 1.0, 3.0, 3.0, 4.0, 6.0, 5.0, 5.0, 8.0, 7.0, 9.0, 9.0)
    val rows =
      xs.zipWithIndex.map { case (v, i) => ("alpha", "n0", 0L, i.toLong, v) } ++
        ys.zipWithIndex.map { case (v, i) => ("beta", "n0", 0L, i.toLong, v) }
    val grid = rows.toDF("name", "node", "b", "i", "gval")
    val out = Correlate.kendallMatrix(grid, minOverlap = 8).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[String]("a_name") == "alpha")
    assert(row.getAs[Long]("n") == 12L)
    assert(row.getAs[Double]("tau") == r4(naiveTauB(xs, ys)))
    // perfect concordance and perfect reversal hit the exact endpoints
    val up = (0 until 10).map(i => ("a", "n", 0L, i.toLong, i.toDouble))
    val dn = (0 until 10).map(i => ("b", "n", 0L, i.toLong, (9 - i).toDouble))
    val g2 = (up ++ dn).toDF("name", "node", "b", "i", "gval")
    assert(Correlate.kendallMatrix(g2).collect().head.getAs[Double]("tau") == -1.0)
  }

  test("tail dependence: co-spiking pair maxes out, anti-aligned pair zeroes") {
    // 40 samples; both signals spike (value 100) on the same 4 indices →
    // each signal's own p90 threshold sits below the spikes, all 4
    // exceedances joint: cond_ba = 1, lift = n/na = 10
    val spikes = Set(7L, 15L, 23L, 31L)
    def sig(nm: String, at: Set[Long]) = (0L until 40L).map { i =>
      (nm, "n0", i, if (at(i)) 100.0 else 1.0 + (i % 3))
    }
    val g = (sig("a1", spikes) ++ sig("b1", spikes) ++
      sig("c1", Set(2L, 11L, 20L, 29L))).toDF("name", "node", "i", "gval")
    val out = Correlate.tailDependence(g, minOverlap = 24)
      .collect().map(r => (r.getAs[String]("a_name"), r.getAs[String]("b_name")) -> r).toMap
    val ab = out(("a1", "b1"))
    assert(ab.getAs[Long]("nboth") == 4L && ab.getAs[Double]("cond_ba") == 1.0)
    assert(ab.getAs[Double]("lift") == 10.0)
    val ac = out(("a1", "c1"))
    assert(ac.getAs[Long]("nboth") == 0L && ac.getAs[Double]("lift") == 0.0)
  }

  test("hurst: persistent ramp near 1, anti-persistent alternation near 0") {
    // 128 points each: a pure ramp (every window's cumdev range is
    // maximal for its variance → H ≈ 1) vs a strict alternation
    // (cumdev never accumulates → H ≈ 0); both well clear of 0.5
    val ramp = (0 until 128).map(i => ("ramp", "n0", i * 900L, i.toDouble))
    val alt = (0 until 128).map(i =>
      ("alt", "n0", i * 900L, if (i % 2 == 0) 1.0 else -1.0))
    val g = (ramp ++ alt).toDF("name", "node", "tsb", "gval")
    val out = TimeSeries.hurstRS(g).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Double]("hurst")).toMap
    assert(out("ramp") > 0.9, s"ramp hurst = ${out("ramp")}")
    assert(out("alt") < 0.1, s"alternation hurst = ${out("alt")}")
  }
}
