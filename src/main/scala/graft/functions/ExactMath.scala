package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine BIT-EXACT natural log of positive integers.
  *
  * Why this exists: several operators quantize a log-probability
  * (`floor((ln(c/r) + eps) * 1e6 + 0.5)`) and the driver's oracle
  * replays the same formula in DuckDB. `ln` is a libm call on both
  * engines and the two libms disagree at the last ulp; when the
  * scaled value lands within that ulp of a floor boundary the two
  * engines quantize to DIFFERENT integers and the hash gate fails —
  * exactly the r5 `q34_session_surprise` defect (VERDICT r5, What's
  * wrong #1). Re-quantizing more coarsely only shrinks the window;
  * this kernel removes it.
  *
  * Mechanism: compute ln(n) for integer n ≥ 1 using ONLY IEEE-754
  * `+ - * /` in a FIXED operation order. IEEE requires those four
  * ops to be exactly rounded, so any engine that executes the same
  * sequence on the same inputs produces the same 64-bit double —
  * JVM (strict FP since Java 17), DuckDB's vectorized C++, and
  * Spark codegen all qualify. No libm, no engine freedom.
  *
  *   k  = bitLength(n) - 1          (integer; `bin()` both engines)
  *   m  = n / 2^k ∈ [1, 2)          (2^k exact; division exact-rounded)
  *   z  = (m - 1) / (m + 1) ∈ [0, 1/3)
  *   ln m = 2z · (1 + z²(1/3 + z²(1/5 + … + z²(1/29))))   [atanh series]
  *   ln n = k · LN2 + ln m
  *
  * The truncation error is ≤ z³¹/31 < 3e-17 (z < 1/3), i.e. below
  * one ulp of any ln value ≥ ln 2 — the result is a faithful ln —
  * but the point is NOT accuracy: both engines get the IDENTICAL
  * double because every step is an exactly-rounded op on identical
  * inputs. LN2 is a shared decimal literal (decimal→double parsing
  * is correctly rounded on both engines), and the 1/(2j+1)
  * coefficients are written as divisions of small exact doubles so
  * neither side depends on literal-printing precision.
  *
  * Three synchronized forms — keep them in lockstep when editing:
  *  - [[lnInt]]      driver-side Scala (tiny collected models)
  *  - [[lnIntCol]]   Spark Column (distributed, codegen-friendly)
  *  - [[sqlLnCols]]  DuckDB SELECT snippet (oracle replay; uses
  *                   lateral column aliases, so the emitted aliases
  *                   `<pfx>_k/_m/_z/_q` must not collide)
  */
object ExactMath {

  /** Shared ln(2) literal — parse-identical on JVM and DuckDB. */
  final val LN2 = 0.6931471805599453

  /** atanh-series Horner spine: 1 + z²(1/3 + z²(1/5 + … + z²(1/29))).
    * Written once; the three forms below replay the same nesting.
    */
  private final val OddCoefs: Seq[Int] = Seq(29, 27, 25, 23, 21, 19, 17, 15, 13, 11, 9, 7, 5, 3)

  /** ln(n) for a positive integer, bit-identical to [[lnIntCol]] /
    * [[sqlLnCols]]. n = 1 → exactly 0.0.
    */
  def lnInt(n: Long): Double = {
    require(n >= 1, s"lnInt needs a positive integer, got $n")
    val k = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = n.toDouble / (1L << k).toDouble
    val z = (m - 1.0) / (m + 1.0)
    val q = z * z
    var acc = 1.0 / OddCoefs.head
    OddCoefs.tail.foreach { c => acc = 1.0 / c + q * acc }
    val lnm = 2.0 * z * (1.0 + q * acc)
    k.toDouble * LN2 + lnm
  }

  /** ln(c/r) for positive integers — the log-probability form. */
  def lnRatio(c: Long, r: Long): Double = lnInt(c) - lnInt(r)

  /** ln(x) for ANY double x ≥ 1, same mechanism as [[lnInt]]: the
    * exponent k comes from the bit length of floor(x) (floor(x) and x
    * share a binade for x ≥ 1 because 2^k is an integer), m = x/2^k is
    * an exact power-of-two division, and the atanh series replays in
    * fixed order. Synchronized with [[sqlLnGe1Cols]]. Domain guard:
    * x < 2^63 (far beyond any statistic this feeds).
    */
  def lnGe1(x: Double): Double = {
    require(x >= 1.0 && x < 9.223372036854776e18, s"lnGe1 domain: $x")
    val fl = math.max(1L, math.floor(x).toLong)
    val k = 63 - java.lang.Long.numberOfLeadingZeros(fl)
    val m = x / (1L << k).toDouble
    val z = (m - 1.0) / (m + 1.0)
    val q = z * z
    var acc = 1.0 / OddCoefs.head
    OddCoefs.tail.foreach { c => acc = 1.0 / c + q * acc }
    val lnm = 2.0 * z * (1.0 + q * acc)
    k.toDouble * LN2 + lnm
  }

  /** e^y in pure exactly-rounded IEEE ops, fixed order — synchronized
    * with [[sqlExpCols]]. Mechanism: k = floor(y/LN2), r = y − k·LN2
    * ∈ [0, ~0.694], Taylor e^r = Σ r^j/j! to j = 17 in the nested form
    * acc_j = 1 + (r·acc_{j+1})/j (truncation < 3e-19, below one ulp),
    * then scale by the exact power 2^k. k < −62 → 0.0 (the 4-dp
    * quantization every caller applies floors such values to 0 anyway);
    * domain guard k ≤ 62 (e^y < 6.4e18 — any p-value/perplexity fits).
    */
  final val ExpCoefs: Seq[Int] = (1 to 17).reverse

  def expFixed(y: Double): Double = {
    val kd = math.floor(y / LN2)
    if (kd < -62.0) return 0.0
    require(kd <= 62.0, s"expFixed domain: $y")
    val r = y - kd * LN2
    var acc = 1.0
    ExpCoefs.foreach { j => acc = 1.0 + (r * acc) / j }
    val k = kd.toInt
    if (k >= 0) acc * (1L << k).toDouble else acc / (1L << -k).toDouble
  }

  /** [[lnGe1]] as a DuckDB SELECT snippet (lateral column aliases
    * `<pfx>k/_m/_z/_q`, result alias `<out>`). `xExpr` must be ≥ 1.
    */
  def sqlLnGe1Cols(xExpr: String, pfx: String, out: String): String = {
    val horner = OddCoefs.tail.foldLeft(s"1.0/${OddCoefs.head}.0") {
      (acc, c) => s"1.0/$c.0 + ${pfx}q * ($acc)"
    }
    s"""length(bin(greatest(CAST(floor($xExpr) AS BIGINT), 1))) - 1 AS ${pfx}k,
       |  ($xExpr) / CAST((CAST(1 AS BIGINT) << ${pfx}k) AS DOUBLE) AS ${pfx}m,
       |  (${pfx}m - 1.0) / (${pfx}m + 1.0) AS ${pfx}z,
       |  ${pfx}z * ${pfx}z AS ${pfx}q,
       |  CAST(${pfx}k AS DOUBLE) * $LN2 + 2.0 * ${pfx}z * (1.0 + ${pfx}q * ($horner)) AS $out""".stripMargin
  }

  /** [[expFixed]] as a DuckDB SELECT snippet (lateral column aliases
    * `<pfx>kd/_r`, result alias `<out>`).
    */
  def sqlExpCols(yExpr: String, pfx: String, out: String): String = {
    val horner = ExpCoefs.foldLeft("1.0") {
      (acc, j) => s"1.0 + ((${pfx}r * ($acc)) / $j.0)"
    }
    s"""floor(($yExpr) / $LN2) AS ${pfx}kd,
       |  ($yExpr) - ${pfx}kd * $LN2 AS ${pfx}r,
       |  CASE WHEN ${pfx}kd < -62.0 THEN 0.0
       |    WHEN ${pfx}kd >= 0.0 THEN ($horner) * CAST((CAST(1 AS BIGINT) << CAST(${pfx}kd AS INT)) AS DOUBLE)
       |    ELSE ($horner) / CAST((CAST(1 AS BIGINT) << CAST(-${pfx}kd AS INT)) AS DOUBLE) END AS $out""".stripMargin
  }

  /** Column form of [[lnInt]]; `n` must be a positive integral
    * column (cast to long internally). Pure arithmetic + `bin` +
    * `shiftleft` — stays inside whole-stage codegen.
    */
  def lnIntCol(n: Column): Column = {
    val nl = n.cast("long")
    val k = (length(bin(nl)) - lit(1)).cast("int")
    val pow2k = call_function("shiftleft", lit(1L), k)
    val m = nl.cast("double") / pow2k.cast("double")
    lnWithKM(k, m)
  }

  private def lnWithKM(k: Column, m: Column): Column = {
    val z = (m - lit(1.0)) / (m + lit(1.0))
    val q = z * z
    var acc: Column = lit(1.0) / lit(OddCoefs.head.toDouble)
    OddCoefs.tail.foreach { c => acc = lit(1.0) / lit(c.toDouble) + q * acc }
    val lnm = lit(2.0) * z * (lit(1.0) + q * acc)
    k.cast("double") * lit(LN2) + lnm
  }

  /** DuckDB SELECT-list snippet computing `<out>` = ln(`<nExpr>`)
    * via lateral column aliases. Emits four helper aliases prefixed
    * `<pfx>` — give each call in a SELECT a distinct prefix.
    */
  def sqlLnCols(nExpr: String, pfx: String, out: String): String = {
    val horner = OddCoefs.tail.foldLeft(s"1.0/${OddCoefs.head}.0") {
      (acc, c) => s"1.0/$c.0 + ${pfx}q * ($acc)"
    }
    s"""length(bin(CAST($nExpr AS BIGINT))) - 1 AS ${pfx}k,
       |  CAST($nExpr AS DOUBLE) / CAST((CAST(1 AS BIGINT) << ${pfx}k) AS DOUBLE) AS ${pfx}m,
       |  (${pfx}m - 1.0) / (${pfx}m + 1.0) AS ${pfx}z,
       |  ${pfx}z * ${pfx}z AS ${pfx}q,
       |  CAST(${pfx}k AS DOUBLE) * $LN2 + 2.0 * ${pfx}z * (1.0 + ${pfx}q * ($horner)) AS $out""".stripMargin
  }

  // ------------------------------------------------------------------
  // INTEGER-ONLY log kernel: no IEEE op anywhere in the chain.
  //
  // The exactly-rounded-IEEE kernels above remove LIBM freedom, but
  // they still assume both engines execute the emitted FP expression
  // verbatim — an engine that constant-folds, reassociates, or renders
  // a different branch of a stash-dependent oracle can diverge (the
  // r5-r7 q34_session_surprise driver-gate history). The kernel below
  // removes the assumption: every operation is 64-bit integer
  // arithmetic (shift / multiply / add / integer divide), which is
  // exact on any engine, in any evaluation order the optimizer picks.
  // ------------------------------------------------------------------

  /** Fractional bits of the fixed-point binary log. F = 24 keeps every
    * intermediate inside a signed 64-bit integer for ANY positive n
    * (x < 2^26 ⇒ x² < 2^52; the result < 64·2^24 < 2^30).
    */
  final val QF = 24

  /** round(ln2 · 1e9) — the rational ln2 used to convert the base-2
    * fixed-point log to the ×1e6 natural-log grid. |D|·LN2NUM < 2^60
    * for any 64-bit input, so the conversion never overflows.
    */
  final val LN2NUM = 693147181L

  private final val QDEN = (1L << QF) * 1000L // ÷ LN2NUM denominator → ×1e6 grid

  /** Fixed-point floor-ish log2: returns ≈ log2(n)·2^QF for n ≥ 1 by
    * the classic shift-and-square recurrence — normalize n to
    * x ∈ [2^QF, 2^(QF+1)), then QF rounds of x ← x²>>QF with a result
    * bit per round. Pure integer ops; truncation ≤ ~2 ulp (2^-23 in
    * log2). Synchronized with [[sqlLog2FixCols]] — keep in lockstep.
    */
  def log2Fix(n: Long): Long = {
    require(n >= 1, s"log2Fix needs a positive integer, got $n")
    val k = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = if (k >= QF) n >> (k - QF) else n << (QF - k)
    var r = k.toLong
    val two = 1L << (QF + 1)
    var i = 0
    while (i < QF) {
      val s = (x * x) >> QF
      if (s >= two) { x = s >> 1; r = 2 * r + 1 } else { x = s; r = 2 * r }
      i += 1
    }
    r
  }

  /** Quantized log-probability qln = round(ln(c/r)·1e6) on the
    * integer-only kernel: D = log2Fix(c) − log2Fix(r), then one
    * rounded integer division through the rational ln2. Faithful to
    * ln(c/r)·1e6 within ~0.1 units; the DEFINITION is the spec — both
    * engines replay the identical integers because no FP op exists.
    * Synchronized with [[sqlQlnExpr]].
    */
  def qlnFix(c: Long, r: Long): Long = {
    val d = log2Fix(c) - log2Fix(r)
    val n = d * LN2NUM
    if (n >= 0) (2 * n + QDEN) / (2 * QDEN)
    else -((2 * (-n) + QDEN) / (2 * QDEN))
  }

  /** [[qlnFix]] as a SQL scalar over two [[log2Fix]] result columns
    * (`lcExpr` = log2Fix(c), `lrExpr` = log2Fix(r)). All operands of
    * the `//` are non-negative on their branch, so DuckDB's floor
    * division and Spark's truncating `div` agree.
    */
  def sqlQlnExpr(lcExpr: String, lrExpr: String): String = {
    val d = s"(($lcExpr) - ($lrExpr)) * $LN2NUM"
    s"CASE WHEN $d >= 0 THEN (2 * ($d) + $QDEN) // ${2 * QDEN} " +
      s"ELSE -((2 * (-($d)) + $QDEN) // ${2 * QDEN}) END"
  }

  /** [[qlnFix]] over a whole relation: given `src` with columns
    * `(a, nx, c, r)` (positive integers), emits a SELECT producing
    * `(a, nx, qln)` with qln = qlnFix(c, r) — QF recurrence steps for
    * BOTH logs as NESTED SUBQUERIES, one level per step, columns
    * materialized at every level.
    *
    * Why nesting and not lateral column aliases: each step references
    * its predecessor several times, and an engine that desugars
    * lateral aliases by textual substitution (DuckDB's binder) would
    * inflate a 24-deep alias chain into an exponentially-sized
    * expression tree — the r8 first attempt hung the oracle. A
    * subquery boundary pins each step's columns, so the tree stays
    * linear in QF on any engine. Only BIGINT shifts / multiplies /
    * compares — Spark SQL shares the semantics, which the
    * synchronization spec exploits by running this very SQL through
    * Spark against the Scala kernel.
    */
  def sqlQlnFromCounts(src: String): String = {
    val two = 1L << (QF + 1)
    var rel = "(SELECT a, nx, " +
      s"CASE WHEN kc >= $QF THEN c >> (kc - $QF) ELSE c << ($QF - kc) END AS x0c, " +
      "CAST(kc AS BIGINT) AS r0c, " +
      s"CASE WHEN kr >= $QF THEN r >> (kr - $QF) ELSE r << ($QF - kr) END AS x0r, " +
      "CAST(kr AS BIGINT) AS r0r " +
      "FROM (SELECT a, nx, CAST(c AS BIGINT) AS c, CAST(r AS BIGINT) AS r, " +
      "length(bin(CAST(c AS BIGINT))) - 1 AS kc, " +
      s"length(bin(CAST(r AS BIGINT))) - 1 AS kr FROM $src))"
    for (i <- 1 to QF) {
      val p = i - 1
      def step(sfx: String) = {
        val s = s"((x$p$sfx * x$p$sfx) >> $QF)"
        s"CASE WHEN $s >= $two THEN $s >> 1 ELSE $s END AS x$i$sfx, " +
          s"2 * r$p$sfx + CASE WHEN $s >= $two THEN 1 ELSE 0 END AS r$i$sfx"
      }
      rel = s"(SELECT a, nx, ${step("c")}, ${step("r")} FROM $rel)"
    }
    s"SELECT a, nx, ${sqlQlnExpr(s"r${QF}c", s"r${QF}r")} AS qln FROM $rel"
  }
}
