package graft

import graft.operators._
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("lttb keeps endpoints, the spike, and exactly nOut points") {
    import graft.functions.Lttb
    val n = 100
    val vs = Array.tabulate(n)(i => if (i == 37) 500L * 10000 else (10L + (i % 3)) * 10000)
    val ts = Array.tabulate(n)(_.toLong)
    val kept = Lttb.indices(ts, vs, 12)
    assert(kept.size == 12)
    assert(kept.head == 0 && kept.last == n - 1)
    assert(kept.contains(37), "the spike must survive downsampling")
    // short series pass through untouched
    assert(Lttb.indices(ts.take(5), vs.take(5), 12) == (0 until 5))
  }

  test("downsampleLttb bounds per-signal output and keeps grid columns") {
    val rows = (0 until 80).map(i => ("m", "a", i * 900L, if (i == 40) 99.0 else 1.0)) ++
      (0 until 10).map(i => ("m", "b", i * 900L, i.toDouble))
    val out = operators.TimeSeries.downsampleLttb(
      rows.toDF("name", "node", "tsb", "gval"), 20)
    val counts = out.groupBy("name", "node").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts(("m", "a")) == 20)
    assert(counts(("m", "b")) == 10) // already below the budget
    assert(out.filter(col("gval") === 99.0).count() == 1)
  }
  import spark.implicits._

  private def sig(rows: (String, String, Long, Double)*) =
    rows.toDF("name", "node", "tsec", "value")

  test("gridOnePass is bit-identical to resample→fillForward→indexed") {
    // irregular arrivals, multi-sample cells, interior gaps, values
    // that exercise the 2-dp decimal rounding (x.xx5 ties) and uneven
    // spans per signal
    val rng = new scala.util.Random(7)
    val rows = (for {
      (name, node) <- Seq(("m1", "a"), ("m1", "b"), ("m2", "a"))
      i <- 0 until 200 if rng.nextDouble() > 0.3
    } yield (name, node, 1640000000L + i * 37L + rng.nextInt(20),
        rng.nextDouble() * 10.0 - 3.0 + (if (i % 7 == 0) 0.005 else 0.0)))
    val s = rows.toDF("name", "node", "tsec", "value")
    val step = 900L
    val composed = TimeSeries.indexed(
      TimeSeries.fillForward(TimeSeries.resample(s, step), step)
        .select(col("name"), col("node"), col("tsb"), col("filled").as("gval")),
      step)
      .select("name", "node", "tsb", "gval", "i", "b")
      .as[(String, String, Long, Double, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3))
    val fused = TimeSeries.gridOnePass(s, step)
      .as[(String, String, Long, Double, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3))
    assert(fused.length == composed.length)
    fused.zip(composed).foreach { case (f, c) =>
      assert(f == c, s"fused $f != composed $c") // exact, doubles included
    }
  }

  private def grid(rows: (String, String, Long, Double)*) =
    rows.toDF("name", "node", "tsb", "gval")

  test("resample floors to grid and takes exact mean") {
    val g = TimeSeries.resample(sig(
      ("m", "a", 100L, 1.0), ("m", "a", 800L, 3.0), ("m", "a", 950L, 10.0)), 900L)
      .orderBy("tsb").collect()
    assert(g.map(r => (r.getLong(2), r.getDouble(3))).toSeq == Seq((0L, 2.0), (900L, 10.0)))
  }

  test("movingMedian matches interpolated median on even windows") {
    val out = TimeSeries.movingMedian(grid(
      ("m", "a", 0L, 1.0), ("m", "a", 900L, 9.0), ("m", "a", 1800L, 2.0),
      ("m", "a", 2700L, 8.0), ("m", "a", 3600L, 3.0)), 5)
      .orderBy("tsb").select("med").as[Double].collect().toSeq
    // edges shrink: [1,9,2]→2; [1,9,2,8]→(2+8)/2=5; [1,9,2,8,3]→3; [9,2,8,3]→5.5; [2,8,3]→3
    assert(out == Seq(2.0, 5.0, 3.0, 5.5, 3.0))
  }

  test("movingQuantile takes the ceil(q*n)-th smallest of the trailing frame") {
    val out = TimeSeries.movingQuantile(grid(
      ("m", "a", 0L, 5.0), ("m", "a", 900L, 1.0), ("m", "a", 1800L, 9.0),
      ("m", "a", 2700L, 3.0)), w = 3, q = 0.5)
      .orderBy("tsb").select("pq").as[Double].collect().toSeq
    // trailing frames: [5]→5; [1,5] idx ceil(1)=1→1; [1,5,9] idx 2→5; [1,3,9] idx 2→3
    assert(out == Seq(5.0, 1.0, 5.0, 3.0))
    val p95 = TimeSeries.movingQuantile(grid(
      (1 to 20).map(i => ("m", "a", i * 900L, i.toDouble)): _*), w = 12, q = 0.95)
      .orderBy("tsb").select("pq").as[Double].collect().toSeq
    // full 12-frames: ceil(0.95*12)=12 -> the frame max
    assert(p95.drop(11) == (12 to 20).map(_.toDouble), p95.toString)
  }

  test("fillForward densifies and carries last value") {
    val out = TimeSeries.fillForward(grid(("m", "a", 0L, 1.0), ("m", "a", 2700L, 4.0)), 900L)
      .orderBy("tsb").select("tsb", "filled").as[(Long, Double)].collect().toSeq
    assert(out == Seq((0L, 1.0), (900L, 1.0), (1800L, 1.0), (2700L, 4.0)))
  }

  test("deltaRate computes per-second rate") {
    val out = TimeSeries.deltaRate(grid(("m", "a", 0L, 10.0), ("m", "a", 900L, 19.0)))
      .orderBy("tsb").select("rate").as[Option[Double]].collect().toSeq
    assert(out == Seq(None, Some(0.01)))
  }

  test("rangeGate drops flat signals") {
    val out = TimeSeries.rangeGate(grid(
      ("flat", "a", 0L, 1.0), ("flat", "a", 900L, 1.0),
      ("live", "a", 0L, 1.0), ("live", "a", 900L, 2.0)))
      .select("name").as[String].collect().toSeq
    assert(out == Seq("live"))
  }

  test("interpLinear fills interior gaps proportionally, edges with nearest") {
    // observed at 0 (v=10) and 300 (v=40); grid step 100 → two interior
    // gaps; plus a leading-edge case on a second signal
    val out = TimeSeries.interpLinear(grid(
      ("m", "a", 0L, 10.0), ("m", "a", 300L, 40.0),
      ("m", "b", 100L, 5.0), ("m", "b", 300L, 7.0)), 100L)
      .orderBy("name", "node", "tsb")
      .select("node", "tsb", "interp", "was_missing")
      .as[(String, Long, Double, Int)].collect().toSeq
    assert(out == Seq(
      ("a", 0L, 10.0, 0), ("a", 100L, 20.0, 1), ("a", 200L, 30.0, 1), ("a", 300L, 40.0, 0),
      ("b", 100L, 5.0, 0), ("b", 200L, 6.0, 1), ("b", 300L, 7.0, 0)))
  }

  test("asOf join attaches the latest right row at or before each left row") {
    val clicks = Seq((1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0), (2L, 50L, 12L, 3.0))
      .toDF("key", "tsec", "id", "value")
    val purchases = Seq((1L, 90L, 20L, 9.0), (1L, 150L, 21L, 8.0), (3L, 10L, 22L, 7.0))
      .toDF("key", "tsec", "id", "value")
    val out = operators.AsOfJoin.asOf(clicks, purchases)
      .orderBy("id").select("id", "asof_ts", "asof_value")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(out == Seq(
      (10L, Some(90L), Some(9.0)),   // click@100 ← purchase@90
      (11L, Some(150L), Some(8.0)),  // click@200 ← purchase@150
      (12L, None, None)))            // no purchase for user 2
  }

  test("ewma smooths recursively") {
    val out = TimeSeries.ewma(grid(
      ("m", "a", 0L, 10.0), ("m", "a", 900L, 20.0), ("m", "a", 1800L, 20.0)), 0.5)
      .orderBy("tsb").select("ewma").as[Double].collect().toSeq
    assert(out == Seq(10.0, 15.0, 17.5))
  }

  test("melt goes wide to long") {
    val wide = Seq((1L, 2.0, 3.0)).toDF("id", "x", "y")
    val out = TimeSeries.melt(wide, Seq("id"), Seq("x", "y"))
      .orderBy("measure").collect()
    assert(out.map(r => (r.getString(1), r.getDouble(2))).toSeq == Seq(("x", 2.0), ("y", 3.0)))
  }

  test("autocorr matches a brute-force Pearson over lagged samples") {
    // a short deterministic series with real autocorrelation structure
    val vals = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0, 9.0, 8.0, 11.0, 10.0, 13.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) }
    val out = TimeSeries.autocorr(grid(rows: _*), maxLag = 2, minOverlap = 4)
      .orderBy("lag").select("lag", "r").as[(Long, Double)].collect().toMap
    def brute(l: Int): Double = {
      val xs = vals.dropRight(l); val ys = vals.drop(l)
      val n = xs.size.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(b => b * b).sum
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    for (l <- 1 to 2)
      assert(math.abs(out(l.toLong) - brute(l)) < 1e-3, s"lag $l: ${out(l.toLong)} vs ${brute(l)}")
  }

  test("cusum is an exact running deviation sum and flags a mean shift") {
    // flat first half, shifted second half: cusum dips then recovers
    val vals = (0 until 20).map(i => if (i < 10) 10.0 else 30.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) }
    val out = TimeSeries.cusum(grid(rows: _*), h = 2.0)
      .orderBy("tsb").select("cusum", "drift").as[(Double, Int)].collect()
    val mu = 20.0 // mean of the series
    val expect = vals.scanLeft(0.0)((acc, v) => acc + (v - mu)).drop(1)
    // cusum runs on 1e-9-relative-quantized values — exact integer
    // arithmetic internally, but the descaled output is approximate
    out.map(_._1).zip(expect).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-5, s"$a vs $e")
    }
    assert(out.exists(_._2 == 1), "mean shift must trip the drift flag")
    assert(math.abs(out.last._1) < 1e-5) // deviations cancel by construction
  }

  test("seasonalNaiveError scores MAE/RMSE against the lag-period baseline") {
    // period 4; second cycle = first cycle + 2 -> every error is 2
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 4.0, 5.0, 6.0, 5.0, 6.0, 7.0, 8.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) }
    val out = TimeSeries.seasonalNaiveError(grid(rows: _*), period = 4, minScored = 4)
      .select("n", "mae", "rmse").as[(Long, Double, Double)].head()
    assert(out == ((8L, 2.0, 2.0)))
  }

  test("kalman tracks a constant exactly and converges its gain") {
    val const = (0 until 50).map(i => ("m", "a", i * 900L, 7.5))
    val out = TimeSeries.kalman(grid(const: _*))
      .select("n", "level", "gain", "p_var")
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 == 50L && out._2 == 7.5, s"level must stay put: $out")
    // steady state of P = (1-K)(P+Q) with Q=0.05, R=1: P* ≈ 0.2 → K* ≈ 0.2
    assert(math.abs(out._3 - 0.2016) < 0.01, s"gain not converged: $out")
    // level shift: the filter ends near the new level, lagging slightly
    val step = (0 until 60).map(i =>
      ("m2", "b", i * 900L, if (i < 30) 0.0 else 10.0))
    val s = TimeSeries.kalman(grid(step: _*))
      .filter($"name" === "m2").select("level").as[Double].head()
    assert(s > 9.5 && s <= 10.0, s"level after step: $s")
  }

  test("crossover flags the mean-crossing edges, not the plateau") {
    // ramp up past the trailing mean, plateau, then drop below it:
    // exactly one 'up' edge on the rise and one 'down' edge on the fall
    val vals = Seq(10.0, 10.0, 10.0, 10.0, 10.0, 30.0, 30.0, 30.0, 30.0, 30.0,
      5.0, 5.0, 5.0, 5.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) }
    val out = TimeSeries.crossover(grid(rows: _*), 5)
      .select("tsb", "direction").as[(Long, String)].collect().toSeq
    assert(out == Seq((5 * 900L, "up"), (10 * 900L, "down")), s"got $out")
    // a constant signal never crosses anything
    val flat = (0 until 12).map(i => ("f", "a", i * 900L, 7.0))
    assert(TimeSeries.crossover(grid(flat: _*), 5).count() == 0)
  }

  test("gap stats report span capacity, missing cells, and the worst outage") {
    // observations at steps 0,1,2, 6,7, 10 of a 900s grid:
    // capacity 11, missing 5, worst run = steps 3-5 (3 cells)
    val obs = Seq(0, 1, 2, 6, 7, 10).map(i => ("m", "a", i * 900L, 1.0 * i))
    val full = (0 until 8).map(i => ("f", "a", i * 900L, 2.0))
    val out = TimeSeries.gapStats(grid((obs ++ full): _*))
      .orderBy("name")
      .select("name", "n_obs", "n_cells", "max_gap", "n_missing", "missing_frac")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("f", 8L, 8L, 0L, 0L, 0.0),
      ("m", 6L, 11L, 3L, 5L, 0.4545)), s"got $out")
  }

  test("holt matches a hand-rolled level/trend recursion") {
    val vals = Seq(10.0, 12.0, 13.0, 15.0, 16.0, 18.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) }
    val out = TimeSeries.holt(grid(rows: _*), alpha = 0.3, beta = 0.2)
      .select("n", "level", "trend", "fc1").as[(Long, Double, Double, Double)].head()
    var l = vals(0); var b = vals(1) - vals(0)
    vals.drop(2).foreach { x =>
      val lNew = 0.3 * x + (1 - 0.3) * (l + b)
      b = 0.2 * (lNew - l) + (1 - 0.2) * b
      l = lNew
    }
    def r4d(v: Double) = math.floor((v + 1e-9) * 1e4 + 0.5) / 1e4
    assert(out == ((6L, r4d(l), r4d(b), r4d(l + b))))
  }

  test("holtWinters absorbs a pure cycle into the season, not the trend") {
    // 5 full periods of a clean m=4 cycle around level 10: the
    // seasonal state should capture the cycle (fc1 ≈ next true value)
    // and the trend should stay ~0 — the failure mode plain Holt has
    val season = Seq(2.0, -1.0, -3.0, 2.0)
    val vals = (0 until 20).map(i => 10.0 + season(i % 4))
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) }
    val out = TimeSeries.holtWinters(grid(rows: _*), m = 4)
      .select("n", "level", "trend", "s_next", "fc1")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(out._1 == 20L)
    assert(math.abs(out._3) < 0.05, s"trend leaked the cycle: ${out._3}")
    // next point (i=20, slot 0) is 12.0
    assert(math.abs(out._5 - 12.0) < 0.2, s"fc1 missed the cycle: ${out._5}")
    // short series (< 2m+1) drop
    assert(TimeSeries.holtWinters(grid(rows.take(8): _*), m = 4).count() == 0)
  }

  test("stabilityLumpiness is the variance of tile means resp. variances") {
    // 3 tiles of 5 samples (tileSec=4500, step 900):
    //   tile 0: 0..4   -> mean 2, var 2.5
    //   tile 1: 0,2..8 -> mean 4, var 10
    //   tile 2: 7 x5   -> mean 7, var 0
    // stability = var(2,4,7) = 6.3333; lumpiness = var(2.5,10,0) = 27.0833
    val vals = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 0.0, 2.0, 4.0, 6.0, 8.0,
      7.0, 7.0, 7.0, 7.0, 7.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) } ++
      // second signal: only one qualifying tile -> dropped (t < 2)
      (0 until 5).map(i => ("one", "b", i * 900L, 1.0))
    val out = TimeSeries.stabilityLumpiness(grid(rows: _*), tileSec = 4500L, minTile = 5)
      .select("name", "n_tiles", "stability", "lumpiness")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("m", 3L, 6.3333, 27.0833)), s"got $out")
    // a short tail tile below minTile is excluded from the rollup
    val ragged = rows.take(15) ++ Seq(("m", "a", 15 * 900L, 99.0))
    val r = TimeSeries.stabilityLumpiness(grid(ragged: _*), tileSec = 4500L, minTile = 5)
      .select("n_tiles").as[Long].head()
    assert(r == 3L, "the 1-sample tail tile must not count")
  }

  test("flatSpots finds the longest run of identical quantized values") {
    val vals = Seq(1.0, 1.0, 2.0, 2.0, 2.0, 1.0, 3.0, 3.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) }
    val out = TimeSeries.flatSpots(grid(rows: _*))
      .select("n_runs", "flat_len").as[(Long, Long)].head()
    assert(out == ((4L, 3L)), s"got $out")
    // all-distinct series: n runs of length 1
    val distinct = (0 until 6).map(i => ("d", "a", i * 900L, i.toDouble))
    val d = TimeSeries.flatSpots(grid(distinct: _*))
      .select("n_runs", "flat_len").as[(Long, Long)].head()
    assert(d == ((6L, 1L)))
  }

  test("burstiness is -1 for periodic arrivals and matches exact gap moments") {
    // periodic: every gap 10 s -> sigma 0, cv 0, B = -1
    val periodic = (0 until 6).map(i => ("p", "a", i * 10L, 1.0))
    // bursty: arrivals 0,1,2,100 -> gaps 1,1,98
    val bursty = Seq(0L, 1L, 2L, 100L).map(t => ("b", "a", t, 1.0))
    // short: 2 arrivals = 1 gap < minGaps -> dropped
    val short = Seq(0L, 50L).map(t => ("s", "a", t, 1.0))
    val out = TimeSeries.burstiness(
      (periodic ++ bursty ++ short).toDF("name", "node", "tsec", "value"))
      .orderBy("name")
      .select("name", "n_gaps", "mean_gap", "cv", "burstiness")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    def r4d(v: Double) = math.floor((v + 1e-9) * 1e4 + 0.5) / 1e4
    val mu = 100.0 / 3.0
    val sigma = math.sqrt((3.0 * (1 + 1 + 98.0 * 98.0) - 100.0 * 100.0) / (3.0 * 2.0))
    assert(out == Seq(
      ("b", 3L, r4d(mu), r4d(sigma / mu), r4d((sigma - mu) / (sigma + mu))),
      ("p", 5L, 10.0, 0.0, -1.0)), s"got $out")
  }

  test("topMovers ranks day-over-day deltas and skips non-consecutive days") {
    val day = 86400L
    // sig A: 10 -> 30 (delta +20); sig B: 50 -> 45 (delta -5);
    // sig C: day 0 then day 2 -> gap, never a mover
    val rows = Seq(
      ("A", "a", 0L, 10.0), ("A", "a", day, 30.0),
      ("B", "a", 100L, 50.0), ("B", "a", day + 100L, 45.0),
      ("C", "a", 0L, 1.0), ("C", "a", 2 * day, 99.0))
    val out = TimeSeries.topMovers(rows.toDF("name", "node", "tsec", "value"))
      .select("day", "rk", "name", "prev_mean", "cur_mean", "delta")
      .as[(Long, Int, String, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      (day, 1, "A", 10.0, 30.0, 20.0),
      (day, 2, "B", 50.0, 45.0, -5.0)), s"got $out")
  }

  test("medianCrossings counts sign changes around the lower median") {
    // sorted [1,1,1,5,5] -> lower median 1; above = 0,1,0,1,0 -> 4 crossings
    val vals = Seq(1.0, 5.0, 1.0, 5.0, 1.0)
    val rows = vals.zipWithIndex.map { case (v, i) => ("m", "a", i * 900L, v) }
    val out = TimeSeries.medianCrossings(grid(rows: _*))
      .select("n", "crossings").as[(Long, Long)].head()
    assert(out == ((5L, 4L)), s"got $out")
    // even n: rank (n+1) div 2 = 2 of [1,2,3,4] -> med 2; above 0,0,1,1 -> 1
    val even = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex
      .map { case (v, i) => ("e", "a", i * 900L, v) }
    val e = TimeSeries.medianCrossings(grid(even: _*))
      .select("crossings").as[Long].head()
    assert(e == 1L)
    // constant series never crosses
    val flat = (0 until 7).map(i => ("f", "a", i * 900L, 7.0))
    val f = TimeSeries.medianCrossings(grid(flat: _*))
      .select("crossings").as[Long].head()
    assert(f == 0L)
  }

  test("matrixProfile finds the exact repeat at distance 0 and the " +
    "discord at the max; constant windows drop") {
    // period-8 sawtooth, one corrupted cycle in the middle, repeated
    // clean cycles everywhere else
    val base = Array.tabulate(48)(i => (i % 8).toDouble)
    base(20) = 40.0 // corrupt one point → windows 13..20 see an outlier
    val rows = base.zipWithIndex.map { case (v, i) =>
      ("s", "a", i * 3600L, v)
    }.toSeq
    val out = TimeSeries.matrixProfile(grid(rows: _*), m = 8, excl = 4,
        block = 16)
      .select("idx", "nn_idx", "dist")
      .as[(Int, Int, Double)].collect().sortBy(_._1)
    // a clean window far from the corruption has an exact period-8
    // repeat → z-normalized distance 0 to idx ± 8
    val byIdx = out.map(r => r._1 -> r).toMap
    assert(byIdx(1)._3 == 0.0 && byIdx(1)._2 == 9)
    // the discord: every window touching the corrupted point is far
    // from everything; the corruption sits at 1-based idx 21, so the
    // global max dist lands on a window start in 14..21
    val discord = out.maxBy(r => (r._3, r._1))
    assert(discord._1 >= 14 && discord._1 <= 21, s"$discord")
    assert(discord._3 > 1.0)
    // windows fully inside a clean stretch all profile at 0
    assert(out.filter(r => r._1 <= 5).forall(_._3 == 0.0))
    // a constant signal has zero-variance windows → no profile rows
    val const = (0 until 20).map(i => ("c", "a", i * 3600L, 5.0))
    assert(TimeSeries.matrixProfile(grid(const: _*), m = 8).count() == 0)
  }
}
