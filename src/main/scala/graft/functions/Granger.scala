package graft.functions

/** Granger-causality F-test (Granger 1969): does adding the candidate's
  * lags to an autoregression of the objective reduce the residual sum
  * of squares more than chance? The advisor's correlation ranking
  * answers "moves together"; this answers "its past predicts the
  * objective's future" — the sharper root-cause question, and the
  * classical nested-model F-test makes it cheap:
  *
  *   restricted:   y_t ~ 1 + y_{t-1..t-p}
  *   unrestricted: y_t ~ 1 + y_{t-1..t-p} + x_{t-1..t-p}
  *   F = ((RSS_r − RSS_u)/p) / (RSS_u/(n_eff − 2p − 1))
  *
  * Runs per (objective, candidate) pair inside one task on aligned
  * retention-bounded series. Everything is deterministic: fixed
  * Gaussian-elimination pivot order, fixed summation order, the
  * p-value from [[Stats.fSf]]'s continued fraction.
  */
object Granger {

  final case class Result(fStat: Double, pValue: Double, nEff: Int)

  /** Solve the symmetric normal-equation system A·b = c in place by
    * Gaussian elimination with partial pivoting; None when singular
    * (collinear or constant regressors).
    */
  private def solve(a: Array[Array[Double]], c: Array[Double]): Option[Array[Double]] = {
    val k = c.length
    var col = 0
    while (col < k) {
      var piv = col
      var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < k) {
        val v = math.abs(a(r)(col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      if (best < 1e-10) return None
      if (piv != col) {
        val tmp = a(piv); a(piv) = a(col); a(col) = tmp
        val t2 = c(piv); c(piv) = c(col); c(col) = t2
      }
      r = col + 1
      while (r < k) {
        val factor = a(r)(col) / a(col)(col)
        var j = col
        while (j < k) { a(r)(j) -= factor * a(col)(j); j += 1 }
        c(r) -= factor * c(col)
        r += 1
      }
      col += 1
    }
    val b = new Array[Double](k)
    var i = k - 1
    while (i >= 0) {
      var s = c(i)
      var j = i + 1
      while (j < k) { s -= a(i)(j) * b(j); j += 1 }
      b(i) = s / a(i)(i)
      i -= 1
    }
    Some(b)
  }

  /** OLS residual sum of squares of y ~ rows (each row one observation's
    * QUANTIZED regressor vector), via the normal equations — the design
    * is tiny (k ≤ 2p+1), so XᵀX is k×k regardless of series length.
    *
    * The moments accumulate as exact Longs (order-independent — at
    * |q| ≤ 3e6 and n ≤ 1e5 the products stay far inside 2⁶³), so the
    * only IEEE arithmetic is the correctly-rounded Long→Double casts,
    * the fixed-pivot elimination, and the t-ordered residual fold — a
    * sequence the DuckDB oracle replays op for op.
    */
  private def rssQ(rows: Array[Array[Long]], y: Array[Long]): Option[Double] = {
    val n = rows.length
    val k = rows(0).length
    val xtx = Array.fill(k)(new Array[Long](k))
    val xty = new Array[Long](k)
    var t = 0
    while (t < n) {
      val row = rows(t)
      var i = 0
      while (i < k) {
        xty(i) += row(i) * y(t)
        var j = 0
        while (j < k) { xtx(i)(j) += row(i) * row(j); j += 1 }
        i += 1
      }
      t += 1
    }
    val a = Array.tabulate(k, k)((i, j) => xtx(i)(j).toDouble)
    val c = Array.tabulate(k)(i => xty(i).toDouble)
    solve(a, c).map { b =>
      var acc = 0.0
      t = 0
      while (t < n) {
        val row = rows(t)
        var pred = 0.0
        var i = 0
        while (i < k) { pred += b(i) * row(i).toDouble; i += 1 }
        val e = y(t).toDouble - pred
        acc += e * e
        t += 1
      }
      acc
    }
  }

  /** Test whether x Granger-causes y at lag order p. None when the
    * series is too short for the unrestricted model's degrees of
    * freedom or either regression is singular (constant/collinear).
    */
  def test(y: Array[Double], x: Array[Double], p: Int): Option[Result] = {
    val n = y.length
    if (x.length != n) return None
    val nEff = n - p
    val df2 = nEff - (2 * p + 1)
    if (df2 < 1) return None
    // the regression runs on the ×1e4-quantized series (Num.qint
    // semantics): F is scale-invariant and the ±5e-5 quantization is
    // noise against any real signal, but the integer moments make the
    // whole statistic engine-exact and oracle-replayable
    val q4 = (v: Double) => math.floor((v + 1e-9) * 1e4 + 0.5).toLong
    val yq = y.map(q4)
    val xq = x.map(q4)
    val target = new Array[Long](nEff)
    val restr = new Array[Array[Long]](nEff)
    val unrestr = new Array[Array[Long]](nEff)
    var t = 0
    while (t < nEff) {
      val at = t + p
      target(t) = yq(at)
      val r = new Array[Long](p + 1)
      val u = new Array[Long](2 * p + 1)
      r(0) = 1L; u(0) = 1L
      var l = 1
      while (l <= p) {
        r(l) = yq(at - l)
        u(l) = yq(at - l)
        u(p + l) = xq(at - l)
        l += 1
      }
      restr(t) = r
      unrestr(t) = u
      t += 1
    }
    for {
      rssR <- rssQ(restr, target)
      rssU <- rssQ(unrestr, target)
    } yield {
      // a perfect unrestricted fit (rssU ~ 0) means maximal evidence
      val f =
        if (rssU <= 1e-12 * math.max(rssR, 1.0)) Double.MaxValue
        else math.max(0.0, ((rssR - rssU) / p) / (rssU / df2))
      // p-value: for df1 = 2 the F survival has the closed form
      // (1 + 2F/d)^(−d/2), computed in the cross-engine exact kernels
      // (ExactMath.lnGe1/expFixed — fixed-order IEEE ops the oracle
      // replays verbatim; f is capped at 1e12 inside the formula on
      // both sides, where p has long since floored to 0 at 4 dp).
      // Other lag orders keep the Lentz continued-fraction route.
      val pv =
        if (java.lang.Double.isNaN(f)) Double.NaN // NaN input propagates, never throws
        else if (f >= 1e300) 0.0
        else if (p == 2) graft.functions.ExactMath.expFixed(
          (-df2.toDouble / 2.0) * graft.functions.ExactMath.lnGe1(
            1.0 + 2.0 * math.min(f, 1e12) / df2.toDouble))
        else Stats.fSf(f, p.toDouble, df2.toDouble)
      Result(f, pv, nEff)
    }
  }
}
