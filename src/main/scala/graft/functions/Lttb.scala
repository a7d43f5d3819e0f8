package graft.functions

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
  * the standard algorithm for decimating a series to `nOut` points
  * for plotting while keeping its visual shape: peaks, troughs, and
  * spikes survive because each bucket keeps the point forming the
  * largest triangle with the previously kept point and the next
  * bucket's centroid.
  *
  * Deterministic and ENGINE-EXACT: inputs are integers (grid
  * timestamps + 1e4-quantized values), and the triangle comparison is
  * done on 2·cn·area — an INTEGER: with centroid (Σt/cn, Σq/cn),
  *   2·cn·area = |(t_a·cn − Σt)(q_j − q_a) − (t_a − t_j)(Σq − q_a·cn)|
  * so the argmax never touches floating point and any engine (the
  * DuckDB oracle replays it in HUGEINT) reaches the identical pick.
  * Ties keep the FIRST maximal point. Products run in BigInt — the
  * epoch-second × count × quantized-value magnitudes stay far below
  * 2¹²⁷ but can exceed a long.
  */
object Lttb {

  /** Indices of the kept points (always includes first and last).
    * Returns all indices when the series is already ≤ nOut.
    * `ts` = grid timestamps; `qvs` = values quantized to exact ints.
    */
  def indices(ts: Array[Long], qvs: Array[Long], nOut: Int): Seq[Int] = {
    val n = qvs.length
    require(ts.length == n, "ts/vs length mismatch")
    if (nOut >= n || n <= 2) return (0 until n).toSeq
    if (nOut < 3) return Seq(0, n - 1)
    val kept = new Array[Int](nOut)
    kept(0) = 0
    val every = (n - 2).toDouble / (nOut - 2)
    var a = 0 // previously kept index
    var i = 0
    while (i < nOut - 2) {
      // current bucket [lo, hi); next bucket's exact centroid sums
      val lo = math.floor(i * every).toInt + 1
      val hi = math.min(math.floor((i + 1) * every).toInt + 1, n - 1)
      val nlo = hi
      val nhi = math.min(math.floor((i + 2) * every).toInt + 1, n)
      var st = 0L
      var sq = 0L
      var j = nlo
      while (j < nhi) { st += ts(j); sq += qvs(j); j += 1 }
      val cn = (nhi - nlo).toLong
      var best = lo
      var bestArea = BigInt(-1)
      j = lo
      while (j < hi) {
        val area = ((BigInt(ts(a)) * cn - st) * (BigInt(qvs(j)) - qvs(a)) -
          (BigInt(ts(a)) - ts(j)) * (BigInt(sq) - BigInt(qvs(a)) * cn)).abs
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
