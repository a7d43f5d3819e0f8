package graft.functions

/** PELT changepoint detection (Killick, Fearnhead & Eckley 2012) with
  * the L2 (mean-shift) segment cost — the exact-optimal-partition
  * complement to [[EDivisive]]: e-divisive tests distributional change
  * by permutation; PELT minimizes a penalized SSE and is fully
  * deterministic (no permutations, no seed), with expected O(n) time
  * from the inadmissible-candidate pruning.
  *
  * ENGINE-EXACT (r4): the series enters as 1e4-QUANTIZED integers, so
  * prefix sums are exact longs and every cost is the fixed IEEE
  * sequence `s2d − s1d·s1d/n` on doubles cast from exact integers —
  * identical on any engine. The DuckDB oracle replays the UNPRUNED
  * O(n²) DP (pruning provably never changes the optimum — the same
  * fact the property spec pins) in a recursive CTE and reaches
  * bit-identical F values and picks. The penalty is likewise derived
  * from exact difference moments and then floored onto a 1e-6 grid so
  * the one transcendental (ln n) can never flip a comparison across
  * engines.
  *
  * Runs per signal inside one task on a retention-bounded series
  * (see ChangePoints.pelt for the distributed shape).
  */
object Pelt {

  /** SSE of q[s, e) from exact prefix sums: Σq² − (Σq)²/n — the L2
    * segment cost whose minimizer is the segment mean, in grid units².
    */
  private def cost(ps: Array[Long], ps2: Array[Long], s: Int, e: Int): Double = {
    val n = (e - s).toDouble
    val s1 = (ps(e) - ps(s)).toDouble
    val s2 = (ps2(e) - ps2(s)).toDouble
    s2 - s1 * s1 / n
  }

  /** Optimal changepoint indices (each the start of a new segment,
    * sorted, exclusive of 0 and n) minimizing
    * Σ_segments SSE + β·(#changepoints), over the QUANTIZED series.
    *
    * Pruning is the PELT inequality: a candidate split s is dropped for
    * all future t once F(s) + C(s, t) > F(t) — valid for L2 because the
    * cost is subadditive under splitting (K = 0).
    */
  def changePoints(q: Array[Long], penalty: Double, minSize: Int = 2): Array[Int] = {
    val n = q.length
    if (n < 2 * minSize) return Array.empty
    val ps = new Array[Long](n + 1)
    val ps2 = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      ps(i + 1) = ps(i) + q(i)
      ps2(i + 1) = ps2(i) + q(i) * q(i)
      i += 1
    }
    val f = new Array[Double](n + 1)
    val prev = new Array[Int](n + 1)
    f(0) = -penalty
    var cands = List(0)
    var t = minSize
    while (t <= n) {
      var best = Double.MaxValue
      var bestS = 0
      for (s <- cands if t - s >= minSize) {
        val v = f(s) + cost(ps, ps2, s, t) + penalty
        // strict < with in-order candidates → earliest argmin, deterministic
        if (v < best) { best = v; bestS = s }
      }
      f(t) = best
      prev(t) = bestS
      // prune: s stays only while it could still start the final segment
      cands = cands.filter(s => t - s < minSize ||
        f(s) + cost(ps, ps2, s, t) <= f(t)) :+ t
      t += 1
    }
    var cps = List.empty[Int]
    var at = n
    while (prev(at) > 0) { cps = prev(at) :: cps; at = prev(at) }
    cps.toArray
  }

  /** Data-driven penalty in grid units²: 2·σ̂²·ln n (the BIC-style
    * default), σ̂² estimated from first differences
    * (Var(q_{i+1} − q_i) = 2σ² for i.i.d. noise) so level shifts
    * themselves barely inflate it — each shift contributes one
    * difference term, not a whole segment. Variance comes from exact
    * integer moments (no double accumulation); the one transcendental,
    * ln n, is floored onto a 1e-9 grid (ln n ≲ 10, so the grid is far
    * above double ulp and the scaled value stays inside 2⁵³) so a
    * 1-ulp ln divergence between engines can never change the penalty.
    */
  def autoPenalty(q: Array[Long]): Double = {
    val n = q.length
    if (n < 3) return 1.0
    val m = (n - 1).toLong
    var s1 = 0L
    var s2 = 0L
    var i = 0
    while (i < n - 1) {
      val d = q(i + 1) - q(i)
      s1 += d
      s2 += d * d
      i += 1
    }
    val md = m.toDouble
    val v = (md * s2.toDouble - s1.toDouble * s1.toDouble) / (md * (md - 1.0))
    val sigma2 = v / 2.0
    // ExactMath.lnInt: the ×1e9 grid made a libm ulp flip plausible;
    // the exact kernel is replayed op-for-op by the oracle
    val lnq = math.floor(ExactMath.lnInt(n.toLong) * 1e9 + 0.5) / 1e9
    math.max(2.0 * sigma2 * lnq, 1e-12)
  }

  /** The r4-grid quantizer the distributed wrapper and specs share. */
  def quantize(x: Array[Double]): Array[Long] =
    x.map(v => math.floor((v + 1e-9) * 1e4 + 0.5).toLong)
}
