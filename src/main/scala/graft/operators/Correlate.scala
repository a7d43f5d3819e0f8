package graft.operators

import graft.Num._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lagged cross-correlation between "objective" and "candidate" signals,
  * per time bucket — the reference's core question ("which metrics move
  * with the anomalous one?", metrics_advisor.py:183-196: mathbox
  * `ncc(a, b, lag_max=3)` then rank by |corr|).
  *
  * The reference loops obj×candidate×lag in Python on one core (~320 s).
  * Here it is one equi-join: explode the small lag set, join the grids on
  * (bucket, index+lag), and let a single hash-aggregate compute every
  * (obj, cand, bucket, lag) Pearson cell. The obj side is a handful of
  * metric names → broadcast; the cand side streams, so at 100 TB the
  * cost is one shuffle of the candidate grid.
  */
object Correlate {

  /** NCC cells: one row per (obj signal, cand signal, bucket, lag) with
    * Pearson r over aligned grid samples. `minOverlap` drops cells whose
    * aligned sample count is too small to be meaningful.
    */
  def nccLag(indexedGrid: DataFrame, objNames: Seq[String], lagMax: Int = 3,
             minOverlap: Int = 8): DataFrame = {
    val obj = indexedGrid.filter(col("name").isin(objNames: _*))
      .select(col("name").as("obj_name"), col("node").as("obj_node"),
        col("b"), col("i"), col("gval").as("ov"))
    val cand = indexedGrid.filter(!col("name").isin(objNames: _*))
      .select(col("name").as("cand_name"), col("node").as("cand_node"),
        col("b").as("cb"), col("i").as("ci"), col("gval").as("cv"))
    val lags = indexedGrid.sparkSession.range(-lagMax, lagMax + 1)
      .select(col("id").cast("long").as("lag"))
    val cells = obj.crossJoin(broadcast(lags))
      .join(cand, col("ci") === col("i") + col("lag") && col("cb") === col("b"))
      .groupBy("obj_name", "obj_node", "cand_name", "cand_node", "b", "lag")
      .agg(corr(col("ov"), col("cv")).as("r_raw"), count(lit(1)).as("n"))
      .filter(col("n") >= minOverlap && col("r_raw").isNotNull && !isnan(col("r_raw")))
    cells.withColumn("r", r4(col("r_raw"))).drop("r_raw")
  }

  /** For each (obj, cand, bucket): the lag with max |r| (mathbox max_corr,
    * metrics_advisor.py:193); then the top-k candidates per obj signal and
    * bucket by |r| (:196, :209 keeps top 5). Ranking uses rounded r with
    * name/node/lag tiebreaks → engine-deterministic.
    */
  def topCorr(cells: DataFrame, k: Int = 5): DataFrame = {
    val bestLag = Window
      .partitionBy("obj_name", "obj_node", "cand_name", "cand_node", "b")
      .orderBy(abs(col("r")).desc, col("lag").asc)
    val perPair = cells
      .withColumn("rn", row_number().over(bestLag))
      .filter(col("rn") === 1).drop("rn")
    val rankW = Window.partitionBy("obj_name", "obj_node", "b")
      .orderBy(abs(col("r")).desc, col("cand_name").asc, col("cand_node").asc)
    perPair.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
  }

  /** Full pairwise correlation matrix per bucket (zero lag), upper
    * triangle only. Self-join on (bucket, index) → one shuffle.
    */
  /** Spearman rank-correlation matrix: Pearson over average ranks
    * within each (signal, bucket) — the robust companion to
    * [[corrMatrix]] (monotone association, insensitive to outliers the
    * advisor itself flags). Average ranks for ties keep the statistic
    * well-defined on plateaued metrics. Same join shape and shuffle
    * profile as corrMatrix; ranking adds one window over the grid.
    */
  def spearmanMatrix(indexedGrid: DataFrame, minOverlap: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy("name", "node", "b").orderBy("gval")
    val ties = Window.partitionBy("name", "node", "b", "gval")
    val ranked = indexedGrid.withColumn("ar",
      rank().over(byVal) + (count(lit(1)).over(ties) - 1) / 2.0)
    corrMatrix(ranked.drop("gval").withColumnRenamed("ar", "gval"), minOverlap)
  }

  def corrMatrix(indexedGrid: DataFrame, minOverlap: Int = 8): DataFrame = {
    val a = indexedGrid.select(col("name").as("a_name"), col("node").as("a_node"),
      col("b"), col("i"), col("gval").as("av"))
    val bdf = indexedGrid.select(col("name").as("b_name"), col("node").as("b_node"),
      col("b").as("bb"), col("i").as("bi"), col("gval").as("bv"))
    a.join(bdf, col("bi") === col("i") && col("bb") === col("b") &&
        (col("a_name") < col("b_name") ||
         (col("a_name") === col("b_name") && col("a_node") < col("b_node"))))
      .groupBy("a_name", "a_node", "b_name", "b_node", "b")
      .agg(corr(col("av"), col("bv")).as("r_raw"), count(lit(1)).as("n"))
      .filter(col("n") >= minOverlap && col("r_raw").isNotNull && !isnan(col("r_raw")))
      .withColumn("r", r4(col("r_raw"))).drop("r_raw")
  }
}
