package graft.functions

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
  * the standard algorithm for decimating a series to `nOut` points
  * for plotting while keeping its visual shape: peaks, troughs, and
  * spikes survive because each bucket keeps the point forming the
  * largest triangle with the previously kept point and the next
  * bucket's centroid.
  *
  * Deterministic: fixed bucket boundaries, strict `>` on the area
  * comparison keeps the FIRST maximal point on ties.
  */
object Lttb {

  /** Indices of the kept points (always includes first and last).
    * Returns all indices when the series is already ≤ nOut.
    */
  def indices(ts: Array[Double], vs: Array[Double], nOut: Int): Seq[Int] = {
    val n = vs.length
    require(ts.length == n, "ts/vs length mismatch")
    if (nOut >= n || n <= 2) return (0 until n).toSeq
    if (nOut < 3) return Seq(0, n - 1)
    val kept = new Array[Int](nOut)
    kept(0) = 0
    val every = (n - 2).toDouble / (nOut - 2)
    var a = 0 // previously kept index
    var i = 0
    while (i < nOut - 2) {
      // current bucket [lo, hi); next bucket centroid as the third vertex
      val lo = math.floor(i * every).toInt + 1
      val hi = math.min(math.floor((i + 1) * every).toInt + 1, n - 1)
      val nlo = hi
      val nhi = math.min(math.floor((i + 2) * every).toInt + 1, n)
      var cx = 0.0
      var cy = 0.0
      var j = nlo
      while (j < nhi) { cx += ts(j); cy += vs(j); j += 1 }
      val cn = (nhi - nlo).toDouble
      cx /= cn
      cy /= cn
      var best = lo
      var bestArea = -1.0
      j = lo
      while (j < hi) {
        val area = math.abs(
          (ts(a) - cx) * (vs(j) - vs(a)) - (ts(a) - ts(j)) * (cy - vs(a))) * 0.5
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      kept(i + 1) = best
      a = best
      i += 1
    }
    kept(nOut - 1) = n - 1
    kept.toSeq
  }
}
