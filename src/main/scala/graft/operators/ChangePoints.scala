package graft.operators

import graft.functions.{Dsp, EDivisive}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-series analytics that genuinely need the full per-signal series
  * in one place (e-divisive change points, FFT seasonality). These use
  * `groupByKey(signal).flatMapGroups`: one shuffle keyed by signal, each
  * task materializes just its signal's series (bounded by retention —
  * thousands of points), the algorithm runs in tight JVM loops, and
  * output returns to DataFrame land. At 100 TB the parallelism is the
  * number of signals, which is what grows — per-series cost is constant.
  */
object ChangePoints {

  private def r4d(x: Double): Double = math.floor((x + 1e-9) * 1e4 + 0.5) / 1e4

  /** E-divisive change points per signal (metrics_advisor.py:148).
    * Output: name, node, cp_tsb (grid time of the change), qhat.
    */
  def eDivisive(grid: DataFrame, pvalue: Double = 0.05, permutations: Int = 50,
                minSize: Int = 5): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    grid.select(col("name"), col("node"), col("tsb"), col("gval"))
      .as[(String, String, Long, Double)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (String, String), it: Iterator[(String, String, Long, Double)]) =>
        val (name, node) = key
        val pts = it.toArray.sortBy(_._3)
        val series = pts.map(_._4)
        EDivisive.changePoints(series, pvalue, permutations, minSize,
            seed = name.hashCode.toLong * 1000003L + node.hashCode)
          .map(cp => (name, node, pts(cp.index)._3, r4d(cp.qhat)))
      }
      .toDF("name", "node", "cp_tsb", "qhat")
  }

  /** Full reference decomposition (get_noise, metrics_advisor.py:51-62):
    * trend = centered rolling median (w=5); detrended = x − trend;
    * seasonal = ideal lowpass of detrended; noise = detrended − seasonal.
    * Output one row per grid cell with all four components.
    */
  def seasonalNoise(grid: DataFrame, stepSec: Double = 3600.0,
                    fMin: Double = 1.0 / 86400.0, w: Int = 5): DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    grid.select(col("name"), col("node"), col("tsb"), col("gval"))
      .as[(String, String, Long, Double)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (String, String), it: Iterator[(String, String, Long, Double)]) =>
        val (name, node) = key
        val pts = it.toArray.sortBy(_._3)
        val x = pts.map(_._4)
        val n = x.length
        val h = w / 2
        val trend = Array.tabulate(n) { i =>
          val lo = math.max(0, i - h); val hi = math.min(n - 1, i + h)
          val win = java.util.Arrays.copyOfRange(x, lo, hi + 1).sorted
          val m = win.length
          if (m % 2 == 1) win(m / 2) else (win(m / 2 - 1) + win(m / 2)) / 2.0
        }
        val detr = Array.tabulate(n)(i => x(i) - trend(i))
        val seas = Dsp.lowpass(detr, stepSec, fMin)
        pts.indices.map { i =>
          (name, node, pts(i)._3, x(i), r4d(trend(i)), r4d(seas(i)),
            r4d(detr(i) - seas(i)))
        }
      }
      .toDF("name", "node", "tsb", "gval", "trend", "seasonal", "noise")
  }

  /** Reference anomaly set (metrics_advisor.py:152): change points ∪
    * k-sigma outliers on the residual noise, tagged and bucketed.
    */
  def anomalyUnion(grid: DataFrame, level: Double = 2.5,
                   bucket: Long = 86400L): DataFrame = {
    // the grid feeds both the decomposition and the change-point scan —
    // persist so the resample/ffill pipeline runs once
    val g = grid.persist()
    val sn = seasonalNoise(g)
    val stats = sn.groupBy("name", "node")
      .agg(avg("noise").as("mu"), stddev_samp(col("noise")).as("sigma"))
      .filter(col("sigma") > 0)
    val outliers = sn.join(stats, Seq("name", "node"))
      .filter(graft.Num.r4(abs((col("noise") - col("mu")) / col("sigma"))) >= level)
      .select(col("name"), col("node"), col("tsb"), lit("outlier").as("kind"))
    val cps = eDivisive(g)
      .select(col("name"), col("node"), col("cp_tsb").as("tsb"),
        lit("changepoint").as("kind"))
    outliers.unionByName(cps)
      .withColumn("b", expr(s"tsb div $bucket") * bucket)
  }
}
