package graft.functions

/** Frequency-domain signal processing for seasonality extraction —
  * mathbox `f_lowpass_filter(moved_trend, T, n, f_min)` as used in the
  * reference's get_noise (metrics_advisor.py:51-62): the de-trended
  * series is lowpass-filtered to isolate seasonality; the remainder is
  * noise.
  *
  * Pinned semantics (SURVEY §4): ideal lowpass — real FFT, zero every
  * bin with |f| > fMin, inverse FFT. Runs per signal on one task; the
  * engine parallelizes across signals.
  */
object Dsp {

  /** In-place iterative radix-2 Cooley-Tukey FFT (re, im arrays). */
  private def fft(re: Array[Double], im: Array[Double], invert: Boolean): Unit = {
    val n = re.length
    if (n <= 1) return
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = 2 * math.Pi / len * (if (invert) 1 else -1)
      val wr = math.cos(ang); val wi = math.sin(ang)
      var s = 0
      while (s < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(s + k); val ui = im(s + k)
          val vr = re(s + k + len / 2) * cwr - im(s + k + len / 2) * cwi
          val vi = re(s + k + len / 2) * cwi + im(s + k + len / 2) * cwr
          re(s + k) = ur + vr; im(s + k) = ui + vi
          re(s + k + len / 2) = ur - vr; im(s + k + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
    if (invert) {
      var t = 0
      while (t < n) { re(t) /= n; im(t) /= n; t += 1 }
    }
  }

  private def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }

  /** Dominant seasonality period of a series, in samples: remove the
    * mean (DC), FFT over the mean-padded power-of-two window, take the
    * positive-frequency bin with maximal power among periods that fit
    * at least `minCycles` times into the observed window. Returns
    * (periodSamples, strength) where strength = peak power / total
    * positive-frequency power — near 1 for a clean sinusoid, near 0
    * for white noise. None when the series is too short or carries no
    * variance. The reference hardcodes its seasonal cutoff
    * (f_min, metrics_advisor.py:57); this measures it instead.
    */
  def dominantPeriod(x: Array[Double], minCycles: Int = 3): Option[(Double, Double)] = {
    val n = x.length
    if (n < 8) return None
    val mean = x.sum / n
    val m = nextPow2(n)
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    var i = 0
    while (i < n) { re(i) = x(i) - mean; i += 1 }
    fft(re, im, invert = false)
    // period = m/k samples; require k ≥ minCycles·m/n so the window saw
    // the cycle at least minCycles times (longer "periods" are trend)
    val kMin = math.max(1, math.ceil(minCycles.toDouble * m / n).toInt)
    var total = 0.0
    var best = -1
    var bestP = 0.0
    var k = 1
    while (k <= m / 2) {
      val p = re(k) * re(k) + im(k) * im(k)
      total += p
      if (k >= kMin && p > bestP) { bestP = p; best = k } // first argmax
      k += 1
    }
    if (best < 0 || total <= 0) None
    else Some((m.toDouble / best, bestP / total))
  }

  /** Normalized spectral entropy of a series: Shannon entropy of the
    * positive-frequency power distribution, divided by ln(m/2) so 0 =
    * one pure tone (perfectly forecastable) and 1 = white noise — the
    * forecastability score completing the Hyndman feature triple next
    * to trend and seasonal strength. Same FFT pipeline as
    * [[dominantPeriod]]; the entropy fold runs k-ascending so the
    * oracle's k-ordered list_sum replays the same sequence (direct-DFT
    * float noise absorbed by the 4-dp guard, the period_detect
    * precedent). None for short or variance-free series.
    */
  def spectralEntropy(x: Array[Double]): Option[(Double, Long)] = {
    val n = x.length
    if (n < 8) return None
    val mean = x.sum / n
    val m = nextPow2(n)
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    var i = 0
    while (i < n) { re(i) = x(i) - mean; i += 1 }
    fft(re, im, invert = false)
    var total = 0.0
    var k = 1
    while (k <= m / 2) { total += re(k) * re(k) + im(k) * im(k); k += 1 }
    if (total <= 0) return None
    var h = 0.0
    k = 1
    while (k <= m / 2) {
      val p = (re(k) * re(k) + im(k) * im(k)) / total
      if (p > 0) h -= p * math.log(p)
      k += 1
    }
    Some((h / math.log((m / 2).toDouble), n.toLong))
  }

  /** Ideal lowpass: keep frequency bins with |f| <= fMin (f in Hz given
    * sample interval `stepSec`), zero the rest. Returns the filtered
    * series (the "seasonality"); `x - lowpass(x)` is the noise.
    */
  def lowpass(x: Array[Double], stepSec: Double, fMin: Double): Array[Double] = {
    val n = x.length
    if (n == 0) return x
    val m = nextPow2(n)
    val re = new Array[Double](m)
    val im = new Array[Double](m)
    System.arraycopy(x, 0, re, 0, n)
    // pad with the last value to limit edge ringing
    var p = n
    while (p < m) { re(p) = x(n - 1); p += 1 }
    fft(re, im, invert = false)
    val cutoffBin = math.max(0, (fMin * stepSec * m).toInt)  // f_k = k / (m * step)
    var k = cutoffBin + 1
    while (k <= m - 1 - cutoffBin) { re(k) = 0.0; im(k) = 0.0; k += 1 }
    fft(re, im, invert = true)
    java.util.Arrays.copyOfRange(re, 0, n)
  }
}
