package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.vecDot

/** MLlib clustering over the embedding column — the "Spark SQL
  * aggregations + MLlib anomaly detection" leg of the approach
  * (BASELINE.json north_star): k-means as corpus structure discovery,
  * cluster-distance as an anomaly score, and trained centroids as the
  * IVF coarse quantizer.
  */
object Clustering {

  private def withFeatures(embs: DataFrame): DataFrame =
    embs.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col("embedding")))

  private def train(embs: DataFrame, k: Int, seed: Long): (DataFrame, KMeansModel) = {
    val feat = withFeatures(embs)
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(feat)
    (model.transform(feat).drop("features"), model)
  }

  /** Seeded k-means assignment: input + `cluster` column. */
  def assign(embs: DataFrame, k: Int = 8, seed: Long = 42L): DataFrame =
    train(embs, k, seed)._1

  /** Per-cluster stats: size and label purity (majority label share). */
  def clusterStats(embs: DataFrame, k: Int = 8): DataFrame = {
    val assigned = assign(embs, k)
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

  /** Distance-to-nearest-centroid anomaly score (the MLlib analogue of
    * k-sigma): the topN vectors farthest from every centroid. Centroids
    * are broadcast as literals; the distance is `vec_dot` codegen, so
    * the scan is one tight pass over the corpus.
    */
  def distanceOutliers(embs: DataFrame, k: Int = 8, topN: Int = 20): DataFrame = {
    val (assigned, model) = train(embs, k, 42L)
    val centers = model.clusterCenters.map(_.toArray)
    val vArr = transform(col("embedding"), x => x.cast("double"))
    val dist2 = (cIdx: Int) => {
      val c = array(centers(cIdx).map(lit).toSeq: _*)
      vecDot(vArr, vArr) - lit(2.0) * vecDot(vArr, c) + vecDot(c, c)
    }
    val minDist = (0 until k).map(dist2).reduce((a, b) => least(a, b))
    assigned
      .withColumn("min_dist2", graft.Num.r4(minDist))
      .orderBy(col("min_dist2").desc, col("vec_id").asc)
      .limit(topN)
      .select("vec_id", "cluster", "min_dist2")
  }
}
