package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** The r6 signal diagnostics: Bollinger breach summary, prominence
  * peaks, Ljung–Box whiteness, MACD. Each test pins the operator
  * against a hand-computable construction (the naive-replay
  * convention), so the DuckDB oracle and these specs agree on the
  * same closed forms.
  */
class SignalDiagnosticsSpec extends SparkTestBase {
  import spark.implicits._

  private def grid(rows: (String, String, Long, Double)*) =
    rows.toDF("name", "node", "tsb", "gval")

  test("bollinger: a spike after a flat window breaches high; flat series never breach") {
    val flat = (0 until 30).map(i => ("m", "flat", i * 900L, 10.0))
    val spike = (0 until 30).map(i =>
      ("m", "sp", i * 900L, if (i == 20) 20.0 else 10.0))
    val out = TimeSeries.bollinger(grid(flat ++ spike: _*)).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // 30 points, w=12 → 18 evaluated per signal
    assert(out("flat") == ((18L, 0L, 0L)))
    // the spike's prior window is flat (variance 0) → hi breach; the
    // points AFTER the spike see a window containing it — 10 vs mean
    // ~10.8, std ~2.9 → inside the band, so exactly one breach total
    assert(out("sp")._1 == 18L && out("sp")._2 == 1L && out("sp")._3 == 0L)
  }

  test("peaks: strict local max found with window prominence; plateaus yield none") {
    val shape = Seq(0.0, 1.0, 2.0, 3.0, 10.0, 3.0, 2.0, 1.0, 0.0, 1.0, 1.0, 1.0)
    val peak = shape.zipWithIndex.map { case (v, i) => ("m", "pk", i * 900L, v) }
    val plateau = (0 until 12).map(i =>
      ("m", "pl", i * 900L, if (i == 5 || i == 6) 5.0 else 1.0))
    val out = TimeSeries.peaks(grid(peak ++ plateau: _*)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(1) == "pk" && r.getLong(2) == 4 * 900L)
    assert(r.getDouble(3) == 10.0)
    // surrounding minima are 0 on both sides → prominence = 10
    assert(r.getDouble(4) == 10.0)
  }

  test("ljungbox replays n(n+2)·Σ rk²/(n−k) over the exact ACF") {
    val rows = (0 until 24).map(i => ("m", "a", i * 900L, i.toDouble)) ++
      (0 until 24).map(i => ("m", "b", i * 900L, math.pow(-1.0, i) * (1 + i % 3)))
    val g = grid(rows: _*)
    val acf = TimeSeries.autocorr(g, maxLag = 3, minOverlap = 8)
      .select("name", "node", "lag", "r", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> (r.getDouble(3), r.getLong(4)))
      .toMap
    val got = TimeSeries.ljungBox(g).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3), r.getInt(4)))
      .toMap
    for (node <- Seq("a", "b")) {
      val (r1, n1) = acf(("m", node, 1L))
      val r2 = acf(("m", node, 2L))._1
      val r3 = acf(("m", node, 3L))._1
      val nd = (n1 + 1).toDouble
      val q = (nd * (nd + 2.0)) * (((r1 * r1) / (nd - 1.0)) +
        ((r2 * r2) / (nd - 2.0)) + ((r3 * r3) / (nd - 3.0)))
      val q4 = math.floor((q + 1e-9) * 1e4 + 0.5) / 1e4
      assert(got(("m", node)) == ((n1 + 1, q4, if (q4 > 7.8147) 1 else 0)))
    }
    // the linear ramp is maximally autocorrelated → flagged non-white
    assert(got(("m", "a"))._3 == 1)
  }

  test("hampel flags the spike, not the flat neighborhood; zero-MAD flags any deviation") {
    val spike = (0 until 15).map(i =>
      ("m", "sp", i * 900L, if (i == 7) 50.0 else 10.0 + (i % 3)))
    val flat = (0 until 15).map(i => ("m", "fl", i * 900L, 4.0))
    // flat window with ONE off value → window MAD = 0 → any deviation
    // must flag (the standard Hampel convention)
    val zmad = (0 until 15).map(i =>
      ("m", "zm", i * 900L, if (i == 7) 4.0001 else 4.0))
    val out = graft.operators.Anomaly.hampel(
      grid(spike ++ flat ++ zmad: _*)).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.count(_._1 == "sp") == 1)
    assert(out.filter(_._1 == "sp").head == (("sp", 7 * 900L, 50.0)))
    assert(!out.exists(_._1 == "fl"))
    assert(out.count(_._1 == "zm") == 1)
    assert(out.filter(_._1 == "zm").head._3 == 4.0001)
  }

  test("macd matches a naive fold replay, crossings count nonzero sign flips") {
    val vals = Seq(1.0, 1.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 6.0, 6.0, 2.0, 2.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "x", i * 900L, v) }
    val got = TimeSeries.macd(grid(rows: _*)).collect().head
    var fast = vals.head; var slow = vals.head; var sig = 0.0
    var lastSgn = 0L; var xc = 0L; var qh = 0L
    vals.tail.foreach { v =>
      fast = 0.25 * v + 0.75 * fast
      slow = 0.0625 * v + 0.9375 * slow
      val m = fast - slow
      sig = 0.5 * m + 0.5 * sig
      qh = math.floor(((m - sig) + 1e-9) * 1e4 + 0.5).toLong
      val sgn = if (qh > 0) 1L else if (qh < 0) -1L else 0L
      if (sgn != 0 && lastSgn != 0 && sgn != lastSgn) xc += 1
      if (sgn != 0) lastSgn = sgn
    }
    val m = fast - slow
    assert(got.getLong(2) == vals.length)
    assert(got.getDouble(3) == math.floor((m + 1e-9) * 1e4 + 0.5) / 1e4)
    assert(got.getDouble(4) == math.floor((sig + 1e-9) * 1e4 + 0.5) / 1e4)
    assert(got.getDouble(5) == qh.toDouble / 1e4)
    assert(got.getLong(6) == xc)
    assert(xc >= 1, "the up-down-up shape must cross at least once")
    // a constant series never crosses and ends at zero everywhere
    val const = TimeSeries.macd(grid((0 until 8).map(i =>
      ("m", "c", i * 900L, 3.0)): _*)).collect().head
    assert(const.getDouble(3) == 0.0 && const.getDouble(4) == 0.0 &&
      const.getDouble(5) == 0.0 && const.getLong(6) == 0L)
  }
}
