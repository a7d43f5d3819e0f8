package graft.operators

import graft.Caches._
import graft.Num._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic (hash-based) sampling and dataset mixing — the
  * reproducibility layer of a training-data pipeline. A corpus sample
  * must be a pure function of the data, not of `rand()` seeds or
  * partition layout: re-running the pipeline, re-partitioning the
  * input, or re-sharding the cluster must select the *same rows*.
  *
  * Mechanism: the first 8 hex chars of `md5(key)` form a uniform
  * 32-bit integer; a row is kept iff that integer < rate × 2³².
  * Properties that matter at corpus scale:
  *   - deterministic: same key → same verdict on any engine, any
  *     partitioning, any day (md5 is endianness- and engine-stable);
  *   - nested: the rate-0.25 sample is a strict subset of the
  *     rate-0.5 sample (same hash, lower threshold), so growing a
  *     data mix never churns previously-selected documents;
  *   - a narrow codegen'd filter over the scan — no shuffle, no
  *     state, trivially parallel at 100 TB.
  *
  * The same idea at (name, node) granularity is what the reference's
  * ecosystem calls "signal sharding"; here it is applied to document
  * curation (stratified keep-rates, weighted mixes).
  */
object Sampling {

  /** Uniform 32-bit hash of a key column: first 8 md5 hex digits as a
    * bigint in [0, 2³²). Cross-engine contract: Spark
    * `conv(substring(md5(x), 1, 8), 16, 10)` ≡ DuckDB
    * `CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)` on identical
    * UTF-8 bytes.
    */
  def hash32(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 8), 16, 10).cast("bigint")

  private val Two32 = 4294967296.0

  /** Threshold literal for a keep-rate: floor(rate × 2³²). */
  def threshold(rate: Double): Long = math.floor(rate * Two32).toLong

  /** Stratified deterministic Bernoulli sample: per-stratum keep-rates
    * (e.g. keep all wiki, a quarter of common-crawl). Unlisted strata
    * fall to `defaultRate`. One filter over the scan; the stratum
    * column must be present (no join).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: Column,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val thr = rates.foldLeft(lit(threshold(defaultRate))) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(threshold(r))).otherwise(acc)
    }
    df.filter(hash32(keyCol) < thr)
  }

  /** Deterministic train/validation/test assignment: the key's hash
    * falls into one of the cumulative fraction ranges, the last split
    * absorbing the rounding remainder so every row gets exactly one
    * label. Re-running, re-partitioning, or appending new data never
    * reassigns an existing row (its hash doesn't move) — the property
    * that keeps eval sets honest as a corpus grows. Same narrow
    * codegen'd projection over the scan as [[stratifiedSample]].
    */
  def splitAssign(df: DataFrame, keyCol: Column,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val h = hash32(keyCol)
    val label = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), c)) =>
        when(h < lit(threshold(c)), lit(name)).otherwise(acc)
      }
    // the fold nests WHENs so ranges stay cumulative: h < t1 → s1,
    // else h < t2 → s2, …, else last
    df.withColumn("split", label)
  }

  /** Mix a corpus to target stratum proportions `weights` without
    * upsampling: the achievable scale is set by the scarcest stratum
    * (k = min over strata of countₛ / wₛ); stratum s keeps
    * k·wₛ / countₛ of its rows. Strata with no listed weight drop.
    *
    * Plan shape: one count aggregate over the stratum column (tiny),
    * broadcast back as the per-stratum threshold, then the same
    * narrow hash filter — at 100 TB the only shuffle is the
    * stratum-count aggregate, whose output is |strata| rows.
    *
    * Determinism: countₛ are exact integers; k and the per-stratum
    * rates are fixed IEEE double sequences over those integers —
    * bit-identical on any engine, mirrored verbatim in the oracle.
    */
  def mixToTarget(df: DataFrame, strataCol: String, keyCol: Column,
                  weights: Column): DataFrame = {
    // k = min over strata is an unpartitioned window over the ONE
    // counts aggregate, not a separate agg + crossJoin — the latter
    // embeds a second copy of the corpus scan in the plan (projections
    // differ between the copies, so ReuseExchange never fires). The
    // single-task window is over |strata| rows, bounded by definition;
    // min is an exact order-independent selection.
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("w", weights)
      .filter(col("w") > 0)
      .withColumn("k", min(col("cnt") / col("w")).over(all))
      .select(col(strataCol),
        floor(col("k") * col("w") / col("cnt") * lit(Two32)).cast("bigint")
          .as("thr"))
    df.join(broadcast(rates), strataCol)
      .filter(hash32(keyCol) < col("thr"))
      .drop("thr")
  }

  /** Importance (probability-proportional) sampling: each row carries
    * its own acceptance probability — e.g. a quality-classifier score —
    * and is kept iff its hash falls under that per-row threshold. The
    * standard "sample proportional to quality" curation move, with the
    * same determinism contract as [[stratifiedSample]]: same row → same
    * verdict on any engine or partitioning, and a row kept at
    * probability p stays kept at any p′ > p (nested). `probCol` must be
    * in [0, 1]; the filter is a narrow codegen'd predicate on the scan.
    */
  def importanceSample(df: DataFrame, keyCol: Column,
                       probCol: Column): DataFrame =
    df.filter(hash32(keyCol) <
      floor(probCol * lit(Two32)).cast("bigint"))

  /** Deterministic per-stratum cap: keep the `n` smallest-hash keys of
    * each stratum — the "at most N documents per domain/source" rule a
    * web-corpus pipeline applies before mixing. Hash-ranking makes the
    * kept set uniform w.r.t. any content or arrival order and
    * reproducible across runs and partitionings; under append it is as
    * stable as a cap can be (a new doc evicts at most the largest-hash
    * survivor of its stratum). One stratum-keyed window, ties broken
    * on the key itself → total-order deterministic. At 100 TB this is
    * one shuffle of (stratum, hash, key)-width rows; a top-n window is
    * partially aggregated map-side by the rank-limit pushdown.
    */
  def cappedPerStratum(df: DataFrame, strataCol: String, keyCol: Column,
                       n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hash32(keyCol), keyCol)
    df.withColumn("_hrk", row_number().over(w))
      .filter(col("_hrk") <= n)
      .drop("_hrk")
  }

  /** Class-balanced deterministic downsample: every stratum is cut to
    * the SIZE OF THE SMALLEST stratum by md5-hash rank — the
    * classifier-training prep next to [[cappedPerStratum]] (whose cap
    * is a fixed N; here the cap is data-derived, so the output is
    * exactly balanced without the caller pre-counting). Same
    * determinism contract: hash-ranked keep set is append-biased-free,
    * partition-invariant, and engine-replayable. The min count is ONE
    * broadcast scalar; the rank window is per-stratum.
    */
  def balancedPerStratum(df: DataFrame, strataCol: String,
                         keyCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_c"))
      .agg(min("_c").as("_m"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hash32(keyCol), keyCol)
    df.withColumn("_hrk", row_number().over(w))
      .crossJoin(broadcast(m))
      .filter(col("_hrk") <= col("_m"))
      .drop("_hrk", "_m")
  }

  /** Quality-budgeted corpus fill — "what does a token budget buy, per
    * stratum?": rank each stratum's documents best-quality-first
    * (4-dp-rounded quality DESC, doc_id ASC — the rounded score makes
    * the order engine-stable) and keep documents while the cumulative
    * token count BEFORE each one is under the budget, so the budget
    * straddler is kept (the [[pack_sequences]]-family convention).
    * Output is the per-stratum scorecard: documents/tokens the budget
    * bought, the effective quality cut it induced, and utilization.
    *
    * `scored` carries (strataCol, doc_id, n_tokens, quality) — one
    * `TextAnalysis.qualityGate` scan produces it.
    *
    * Scale shape — NO document-level sort: the doc-level cumsum window
    * would serialize a mega-stratum onto one task. Instead (the
    * sample_curriculum move) aggregate to the per-(stratum, quality
    * VALUE) histogram first — a parallel hash aggregate; ≤ 10⁴ 4-dp
    * values per stratum — walk the value-level cumulative token sums
    * to find each stratum's BOUNDARY value (budget crossed inside it),
    * and rank row-by-row ONLY the boundary value's documents. Values
    * above the boundary are kept wholesale from the histogram; values
    * below never leave the aggregate.
    */
  def budgetFill(scored: DataFrame, strataCol: String,
                 budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = col(strataCol)
    // three consumers (histogram, boundary ranking, stratum totals) —
    // materialize the slim projection once instead of re-scanning the
    // raw corpus (and re-computing the quality expression) per branch
    val sc = scored.persist().tracked
    val vals = sc.groupBy(st, col("quality"))
      .agg(count(lit(1)).as("c"), sum("n_tokens").as("toks"))
    val wv = Window.partitionBy(st).orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = vals
      .withColumn("cum_before", coalesce(sum("toks").over(wv), lit(0L)))
      .persist().tracked
    // values wholly inside the budget: every document kept (the last
    // one's per-doc cum_before is cum_before + toks − its own ≥ 1
    // tokens < budget)
    val full = cum.filter(col("cum_before") + col("toks") <= budget)
      .groupBy(st).agg(sum("c").as("n_full"), sum("toks").as("toks_full"),
        min("quality").as("q_full"))
    // the boundary value (≤ 1 per stratum): budget crossed inside it —
    // only ITS documents get row-level ranking
    val bnd = cum.filter(col("cum_before") < budget &&
      col("cum_before") + col("toks") > budget)
    val wb = Window.partitionBy(st).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bkept = sc
      .join(broadcast(bnd.select(st, col("quality"), col("cum_before"))),
        Seq(strataCol, "quality"))
      .withColumn("cb_doc",
        col("cum_before") + coalesce(sum("n_tokens").over(wb), lit(0L)))
      .filter(col("cb_doc") < budget)
      .groupBy(st).agg(count(lit(1)).as("n_bnd"),
        sum("n_tokens").as("toks_bnd"), min("quality").as("q_bnd"))
    sc.groupBy(st)
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("corpus_tokens"))
      .join(full, Seq(strataCol), "left")
      .join(bkept, Seq(strataCol), "left")
      .select(st, col("n_docs"), col("corpus_tokens"),
        (coalesce(col("n_full"), lit(0L)) +
          coalesce(col("n_bnd"), lit(0L))).as("n_kept"),
        (coalesce(col("toks_full"), lit(0L)) +
          coalesce(col("toks_bnd"), lit(0L))).as("tokens_kept"),
        coalesce(col("q_bnd"), col("q_full")).as("cut_quality"),
        r4((coalesce(col("toks_full"), lit(0L)) +
          coalesce(col("toks_bnd"), lit(0L))).cast("double") / budget)
          .as("util"))
  }

  /** Deterministic k-fold assignment: fold = md5-hash(key) mod k — the
    * cross-validation companion of [[splitAssign]]. Same contract:
    * append-stable (a document's fold never changes as the corpus
    * grows), partition-invariant, and leakage-safe when `keyCol` is a
    * GROUP key (pass the exact-dup canonical id to keep duplicate
    * groups inside one fold, the sample_split_grouped move).
    */
  def kfoldAssign(df: DataFrame, keyCol: Column, k: Int = 5): DataFrame =
    df.withColumn("fold", (hash32(keyCol) % k).cast("int"))

  /** Deterministic curriculum assignment: phase 1 = the top score
    * decile, phase `nPhases` = the bottom — the easy-to-hard (or
    * clean-to-noisy) ordering curriculum-training schedules consume —
    * plus an md5 shuffle key for within-phase order (sequential reads
    * of a phase stay internally shuffled without a global sort).
    *
    * Exact global ranks WITHOUT a global sort: scores are 4-dp
    * rounded, so the distinct-value frame is tiny (≤ ~10⁴ rows);
    * cumulative counts over it give each value's rank offset, and a
    * per-value row_number (id tiebreak) completes an exact dense
    * global rank — two windows, one over the tiny frame, one
    * partitioned by score value. phase = ⌊(rank−1)·nPhases/n⌋ + 1 in
    * pure integer arithmetic, so boundaries replay on any engine.
    */
  def curriculum(scored: DataFrame, keyCol: Column, scoreCol: Column,
                 nPhases: Int = 10): DataFrame = {
    val base = scored.withColumn("s4", scoreCol).withColumn("ck", keyCol)
      .persist().tracked // feeds the distinct-value aggregate AND the rank join
    val vc = base.groupBy("s4").agg(count(lit(1)).as("c"))
    val cum = vc
      .withColumn("cum_before",
        sum(col("c")).over(Window.orderBy(col("s4").desc)) - col("c"))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy()))
      .select(col("s4"), col("cum_before"), col("n"))
    val perVal = Window.partitionBy("s4").orderBy("ck")
    base.join(cum, "s4")
      .withColumn("grank", col("cum_before") + row_number().over(perVal))
      .withColumn("phase",
        expr(s"(grank - 1) * $nPhases div n + 1").cast("int"))
      .withColumn("shuffle_key",
        substring(md5(concat(col("phase").cast("string"), lit(":"),
          col("ck").cast("string")).cast("binary")), 1, 8))
      .drop("s4", "ck", "cum_before", "n", "grank")
  }
}
