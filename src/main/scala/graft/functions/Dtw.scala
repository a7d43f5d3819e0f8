package graft.functions

/** Dynamic time warping with a Sakoe-Chiba band — series similarity
  * that tolerates local time distortion (a cache-warm ramp that takes
  * 3 samples on one node and 5 on another still matches), which the
  * fixed-lag NCC family structurally cannot express.
  *
  * Rolling two-row DP over the band: O(n·w) time, O(n) memory — at
  * band w ≪ n this is the standard large-scale formulation (full DTW
  * is O(n²) and rarely wanted). Deterministic: fixed iteration order,
  * pure double arithmetic, no ties to break (min over 3 doubles).
  */
object Dtw {

  /** DTW distance between a and b under |i−j| ≤ band, with squared
    * point cost and a final sqrt — the common "DTW-L2" convention.
    * Returns +∞ if either series is empty or the band cannot connect
    * the endpoints (|n−m| > band).
    */
  def distance(a: Array[Double], b: Array[Double], band: Int): Double = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0 || math.abs(n - m) > band) return Double.PositiveInfinity
    val inf = Double.PositiveInfinity
    var prev = Array.fill(m + 1)(inf)
    var cur = Array.fill(m + 1)(inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - band)
      val hi = math.min(m, i + band)
      var j = lo
      while (j <= hi) {
        val d = a(i - 1) - b(j - 1)
        val best = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
        cur(j) = d * d + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    math.sqrt(prev(m))
  }

  /** Per-signal z-normalization (the standard DTW preprocessing:
    * without it, scale dominates shape). Constant series normalize
    * to all-zeros.
    *
    * ENGINE-EXACT (r4): input is the 1e4-quantized series, so the
    * mean/variance come from exact integer moments via one fixed IEEE
    * sequence (no accumulation-order noise), sqrt is correctly rounded
    * on any IEEE engine, and each z value is the same double
    * everywhere — which makes the downstream DP (a fixed op tree:
    * d·d + min of three) bit-identical across engines too.
    */
  def znorm(q: Array[Long]): Array[Double] = {
    val n = q.length
    if (n == 0) return Array.empty
    var s1 = 0L
    var s2 = 0L
    var i = 0
    while (i < n) { s1 += q(i); s2 += q(i) * q(i); i += 1 }
    val nd = n.toDouble
    val mean = s1.toDouble / nd
    val varr = (nd * s2.toDouble - s1.toDouble * s1.toDouble) / (nd * nd)
    val sd = math.sqrt(varr)
    if (sd == 0.0) Array.fill(n)(0.0)
    else Array.tabulate(n)(k => (q(k).toDouble - mean) / sd)
  }

  /** The r4-grid quantizer shared with the distributed wrapper. */
  def quantize(x: Array[Double]): Array[Long] =
    x.map(v => math.floor((v + 1e-9) * 1e4 + 0.5).toLong)
}
