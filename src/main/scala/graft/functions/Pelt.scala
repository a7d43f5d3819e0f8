package graft.functions

/** PELT changepoint detection (Killick, Fearnhead & Eckley 2012) with
  * the L2 (mean-shift) segment cost — the exact-optimal-partition
  * complement to [[EDivisive]]: e-divisive tests distributional change
  * by permutation; PELT minimizes a penalized SSE and is fully
  * deterministic (no permutations, no seed), with expected O(n) time
  * from the inadmissible-candidate pruning.
  *
  * Runs per signal inside one task on a retention-bounded series
  * (see ChangePoints.pelt for the distributed shape).
  */
object Pelt {

  /** SSE of x[s, e) from prefix sums: Σx² − (Σx)²/n — the L2 segment
    * cost whose minimizer is the segment mean.
    */
  private def cost(ps: Array[Double], ps2: Array[Double], s: Int, e: Int): Double = {
    val n = e - s
    val sum = ps(e) - ps(s)
    val sum2 = ps2(e) - ps2(s)
    sum2 - sum * sum / n
  }

  /** Optimal changepoint indices (each the start of a new segment,
    * sorted, exclusive of 0 and n) minimizing
    * Σ_segments SSE + β·(#changepoints).
    *
    * Pruning is the PELT inequality: a candidate split s is dropped for
    * all future t once F(s) + C(s, t) > F(t) — valid for L2 because the
    * cost is subadditive under splitting (K = 0).
    */
  def changePoints(x: Array[Double], penalty: Double, minSize: Int = 2): Array[Int] = {
    val n = x.length
    if (n < 2 * minSize) return Array.empty
    val ps = new Array[Double](n + 1)
    val ps2 = new Array[Double](n + 1)
    var i = 0
    while (i < n) {
      ps(i + 1) = ps(i) + x(i)
      ps2(i + 1) = ps2(i) + x(i) * x(i)
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

  /** Data-driven penalty: 2·σ̂²·ln n (the BIC-style default), with σ̂²
    * estimated from first differences (Var(x_{i+1} − x_i) = 2σ² for
    * i.i.d. noise) so level shifts themselves barely inflate it —
    * each shift contributes one difference term, not a whole segment.
    */
  def autoPenalty(x: Array[Double]): Double = {
    val n = x.length
    if (n < 3) return 1.0
    val d = Array.tabulate(n - 1)(i => x(i + 1) - x(i))
    val mu = d.sum / d.length
    val v = d.map(t => (t - mu) * (t - mu)).sum / (d.length - 1)
    val sigma2 = v / 2.0
    math.max(2.0 * sigma2 * math.log(n.toDouble), 1e-12)
  }
}
