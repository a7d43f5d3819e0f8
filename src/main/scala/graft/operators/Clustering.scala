package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.vecDot

/** Clustering over the embedding column — k-means as corpus structure
  * discovery and cluster-distance as an anomaly score (the "Spark SQL
  * aggregations + ML anomaly detection" leg of BASELINE.json's
  * north_star). K-means is an engine-exact quantized Lloyd's
  * ([[lloydExact]]) so the correctness gate replays it; PCA stays on
  * MLlib (one distributed Gramian pass + driver-side d×d SVD).
  */
object Clustering {

  private def withFeatures(embs: DataFrame): DataFrame =
    embs.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col("embedding")))

  /** Engine-exact Lloyd's k-means over the embedding column.
    *
    * MLlib's KMeans (kmeans|| init, double centroids) is seeded but not
    * oracle-replayable: init depends on RDD sampling and the centroid
    * means on float summation order. This formulation makes every step
    * an exact integer computation, so an independent engine (the DuckDB
    * correctness gate) replays the whole clustering bit-for-bit:
    *
    *  - coordinates quantized once to ×1e6 integers (`floor((x+1e-9)
    *    *1e6+0.5)` — the repo-wide IEEE sequence);
    *  - init = the embeddings of the `k` lowest vec_ids (the declared
    *    first-k convention the IVF/PQ codebooks already use);
    *  - assignment = argmin of the exact integer squared distance,
    *    ties to the lowest cluster id (|q|≤2e6, d=64 → dist² ≤ 2.6e14,
    *    exact in double);
    *  - update = per-dimension floor-div of exact integer sums (the
    *    nonneg-mod subtraction makes the quotient an exact division on
    *    any engine); an emptied cluster keeps its previous centroid.
    *
    * Spark execution shape: centroids live in the plan as literals
    * (broadcast by construction), each round is ONE scan of the
    * persisted quantized corpus into a k×(d+1)-cell hash aggregate
    * (map-side combined), and only that k×(d+1) frame reaches the
    * driver — Lloyd's at 100 TB is `iters` scans with O(k·d) driver
    * state, nothing else.
    *
    * Returns (assignment frame with `cluster` + exact `dist2q`, final
    * quantized centroids). The quantized input is persisted for the
    * duration of the iteration loop and released to the ContextCleaner
    * (prefixJaccard convention).
    */
  def lloydExact(embs: DataFrame, k: Int = 8,
                 iters: Int = 5): (DataFrame, Array[Array[Long]]) = {
    // the quantized coords, their double view, and the per-row self
    // dot are iteration-invariant — persisted once, reused 6×
    val q = embs.select(col("vec_id"), col("label"),
        transform(col("embedding"), x =>
          floor((x.cast("double") + lit(1e-9)) * lit(1e6) + lit(0.5))
            .cast("long")).as("q"))
      .withColumn("qd", transform(col("q"), _.cast("double")))
      .withColumn("selfq", vecDot(col("qd"), col("qd")))
      .persist()
    def assignTo(cents: Array[Array[Long]]): DataFrame = {
      // one distance expression per centroid, gathered into an ARRAY:
      // array_min + first-position argmin keeps the plan LINEAR in k
      // (a when-chain fold duplicates the running best twice per step
      // — 3^k expression growth, measured as a 13 s codegen stall at
      // k = 8) and array_position's first-match IS the lowest-cluster
      // tiebreak
      val dcols = cents.map { cv =>
        val c = array(cv.map(v => lit(v.toDouble)).toSeq: _*)
        col("selfq") - lit(2.0) * vecDot(col("qd"), c) +
          lit(cv.map(v => v.toDouble * v.toDouble).sum)
      }
      q.withColumn("darr", array(dcols.toSeq: _*))
        .withColumn("dist2q", array_min(col("darr")))
        .withColumn("cluster",
          (array_position(col("darr"), col("dist2q")) - 1).cast("int"))
        .drop("darr")
    }
    var cents: Array[Array[Long]] = q.orderBy("vec_id").limit(k)
      .select("q").collect().map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"need at least $k vectors")
    val dim = cents(0).length
    for (_ <- 1 to iters) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col("q"), i + 1)).as(s"s$i")) :+ count(lit(1)).as("n")
      val rows = assignTo(cents).groupBy("cluster")
        .agg(sums.head, sums.tail: _*).collect()
      val byC = rows.map(r => r.getInt(0) -> r).toMap
      cents = (0 until k).map { ci =>
        byC.get(ci) match {
          case Some(r) =>
            val n = r.getLong(dim + 1)
            (0 until dim).map(i => Math.floorDiv(r.getLong(i + 1), n)).toArray
          case None => cents(ci)
        }
      }.toArray
    }
    (assignTo(cents), cents)
  }

  /** Per-cluster stats: size and label purity (majority label share). */
  def clusterStats(embs: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val assigned = lloydExact(embs, k, iters)._1
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
    val majority = assigned.groupBy("cluster", "label")
      .agg(count(lit(1)).as("nl"))
      .groupBy("cluster").agg(max("nl").as("max_label_n"))
    sizes.join(majority, "cluster")
      .select(col("cluster"), col("n"),
        graft.Num.r4(col("max_label_n") / col("n")).as("purity"))
      .orderBy("cluster")
  }

  /** PCA diagnostics over the embedding column: per-component explained
    * variance ratio plus the projection's actual variance — the
    * dimensionality audit run before quantizing or truncating vectors.
    * MLlib PCA is one distributed Gramian pass + a driver-side SVD of
    * the d×d matrix (d = embedding width, tiny); the projection is a
    * broadcast matrix multiply on the scan. The projection variance is
    * computed from exact quantized-integer moment sums (the repo-wide
    * order-independent pattern), never the parallel `variance`
    * aggregate.
    */
  def pcaStats(embs: DataFrame, k: Int = 4): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.linalg.Vector
    val spark = embs.sparkSession
    import spark.implicits._
    val feat = withFeatures(embs)
    val model = new PCA().setK(k)
      .setInputCol("features").setOutputCol("proj").fit(feat)
    val ev = model.explainedVariance.toArray
    val projected = model.transform(feat)
      .select(col("vec_id"), col("proj"))
      .as[(Long, Vector)]
      .flatMap { case (_, v) => v.toArray.zipWithIndex.map {
        case (x, c) => (c, x) } }
      .toDF("component", "x")
    val stats = projected
      .select(col("component"), graft.Num.qint(col("x"), 1e6).as("qx"))
      .groupBy("component")
      .agg(count(lit(1)).as("n"),
        sum(col("qx")).cast("double").as("s1"),
        sum(col("qx") * col("qx")).cast("double").as("s2"))
      .select(col("component"), col("n"),
        graft.Num.r4((col("n") * col("s2") - col("s1") * col("s1")) /
          (col("n").cast("double") * (col("n") - 1)) / lit(1e12)).as("proj_var"))
    stats.join(
        ev.toSeq.zipWithIndex.map { case (r, c) =>
            (c, math.floor((r + 1e-9) * 1e4 + 0.5) / 1e4) }
          .toDF("component", "explained_var_ratio"),
        "component")
      .orderBy("component")
  }

  /** Distance-to-nearest-centroid anomaly score (the clustering
    * analogue of k-sigma): the topN vectors farthest from their own
    * (= nearest) centroid. Ranking is on the EXACT integer distance
    * with a vec_id tiebreak, so the top-N set is engine-deterministic;
    * the reported score is the distance de-quantized back to input
    * units (÷1e12, the square of the ×1e6 coordinate scale).
    */
  def distanceOutliers(embs: DataFrame, k: Int = 8, topN: Int = 20,
                       iters: Int = 5): DataFrame = {
    val (assigned, _) = lloydExact(embs, k, iters)
    assigned
      .orderBy(col("dist2q").desc, col("vec_id").asc)
      .limit(topN)
      .select(col("vec_id"), col("cluster"),
        graft.Num.r4(col("dist2q") / lit(1e12)).as("min_dist2"))
  }
}
