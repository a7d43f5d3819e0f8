package graft.functions

/** E-divisive change-point detection (Matteson & James 2014, "A
  * Nonparametric Approach for Multiple Change Point Analysis of
  * Multivariate Data") — the algorithm behind the reference's
  * `e_divisive(med_filtered, pvalue=0.05, permutations=100)` call
  * (metrics_advisor.py:148, via the public signal-processing-algorithms
  * package).
  *
  * Hierarchical binary segmentation: find the split that maximizes the
  * scaled energy statistic Q(τ); accept it if a seeded permutation test
  * deems it significant; recurse into both halves.
  *
  * O(n²) time per segment with O(1) extra memory (incremental cross /
  * within-sums as τ advances) — no n×n distance matrix, so a 10k-point
  * series costs ~100M float ops and a few KB, fine for one executor task.
  * Scale-out happens across signals (one series per task), not within.
  */
object EDivisive {

  final case class ChangePoint(index: Int, qhat: Double)

  private def splitmix64(seed0: Long): Long = {
    var z = seed0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic Fisher-Yates shuffle (engine-independent, no RNG
    * state shared across tasks).
    */
  private def shuffled(xs: Array[Double], seed: Long): Array[Double] = {
    val a = xs.clone()
    var s = seed
    var i = a.length - 1
    while (i > 0) {
      s = splitmix64(s)
      val j = (Math.floorMod(s, i + 1L)).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a
  }

  /** Max Q over all splits of x[lo, hi) with min segment size; returns
    * (argmax τ as absolute index, maxQ). Incremental O(n²)/O(1).
    */
  private def bestSplit(x: Array[Double], lo: Int, hi: Int, minSize: Int): (Int, Double) = {
    val n = hi - lo
    if (n < 2 * minSize) return (-1, 0.0)
    // start with τ = lo + minSize: compute the three sums directly
    var cross = 0.0; var left = 0.0; var right = 0.0
    var tau = lo + minSize
    var i = lo
    while (i < hi) {
      var j = i + 1
      while (j < hi) {
        val d = math.abs(x(i) - x(j))
        if (j < tau) left += d
        else if (i >= tau) right += d
        else cross += d
        j += 1
      }
      i += 1
    }
    var bestTau = -1; var bestQ = Double.NegativeInfinity
    while (tau <= hi - minSize) {
      val m = (tau - lo).toDouble; val k = (hi - tau).toDouble
      val t1 = cross * (2.0 / (m * k))
      val t2 = if (m > 1) left * (2.0 / (m * (m - 1))) else 0.0
      val t3 = if (k > 1) right * (2.0 / (k * (k - 1))) else 0.0
      val q = (m * k / (m + k)) * (t1 - t2 - t3)
      if (q > bestQ) { bestQ = q; bestTau = tau }
      if (tau < hi - minSize) {
        // advance τ: point p = x(tau) moves from right side to left side
        val p = x(tau)
        var sLeft = 0.0
        var a = lo
        while (a < tau) { sLeft += math.abs(x(a) - p); a += 1 }
        var sRight = 0.0
        var b = tau + 1
        while (b < hi) { sRight += math.abs(x(b) - p); b += 1 }
        cross += sRight - sLeft
        left += sLeft
        right -= sRight
      }
      tau += 1
    }
    (bestTau, bestQ)
  }

  /** Permutation test: is q0 significant at `pvalue` on x[lo, hi)? */
  private def significant(x: Array[Double], lo: Int, hi: Int, q0: Double,
                          pvalue: Double, permutations: Int, minSize: Int,
                          seed: Long): Boolean = {
    if (permutations <= 0) return true
    val seg = java.util.Arrays.copyOfRange(x, lo, hi)
    var exceed = 0
    var p = 0
    while (p < permutations) {
      val perm = shuffled(seg, seed + p)
      val (_, q) = bestSplit(perm, 0, perm.length, minSize)
      if (q >= q0) exceed += 1
      p += 1
    }
    (exceed + 1).toDouble / (permutations + 1) <= pvalue
  }

  /** All change points of `series`, sorted ascending. */
  def changePoints(series: Array[Double], pvalue: Double = 0.05,
                   permutations: Int = 50, minSize: Int = 5,
                   maxPoints: Int = 16, seed: Long = 42L): Seq[ChangePoint] = {
    val found = scala.collection.mutable.ArrayBuffer.empty[ChangePoint]
    def recurse(lo: Int, hi: Int): Unit = {
      if (found.size >= maxPoints) return
      val (tau, q) = bestSplit(series, lo, hi, minSize)
      if (tau < 0) return
      if (!significant(series, lo, hi, q, pvalue, permutations, minSize,
        seed ^ (lo.toLong << 32) ^ hi.toLong)) return
      found += ChangePoint(tau, q)
      recurse(lo, tau)
      recurse(tau, hi)
    }
    recurse(0, series.length)
    found.sortBy(_.index).toSeq
  }
}
