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
