package graft

import graft.sources.BucketedCorpus
import org.apache.spark.sql.functions._

class BucketedCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (1 to 200).map(i =>
    (i.toLong, s"doc body $i", s"src${i % 4}")).toDF("doc_id", "text", "source")

  private def scores = (1 to 200).map(i =>
    (i.toLong, i * 0.01)).toDF("doc_id", "quality")

  test("co-bucketed tables join and aggregate with zero shuffle exchanges") {
    // force the sort-merge path so exchange elimination (not broadcast)
    // is what the assertion witnesses
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedCorpus.write(corpus, "corpus_b", "doc_id", buckets = 4)
      BucketedCorpus.write(scores, "scores_b", "doc_id", buckets = 4)

      assert(BucketedCorpus.joinIsExchangeFree(spark, "corpus_b", "scores_b",
        "doc_id"), "co-bucketed equi-join must plan without a shuffle")

      // control: the same join against an UNBUCKETED side must shuffle,
      // so the detector is demonstrably not vacuous
      scores.write.mode("overwrite").saveAsTable("scores_flat")
      assert(!BucketedCorpus.joinIsExchangeFree(spark, "corpus_b",
        "scores_flat", "doc_id"), "unbucketed side must require a shuffle")

      // aggregation on the bucket key also rides the layout
      val aggPlan = BucketedCorpus.read(spark, "corpus_b")
        .groupBy("doc_id").agg(count(lit(1)))
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        "bucket-key aggregation must not shuffle")

      // and the layout changes plans, not answers
      val bucketed = BucketedCorpus.read(spark, "corpus_b")
        .join(BucketedCorpus.read(spark, "scores_b"), "doc_id")
        .agg(sum("quality")).as[Double].head()
      val flat = corpus.join(scores, "doc_id")
        .agg(sum("quality")).as[Double].head()
      assert(math.abs(bucketed - flat) < 1e-9)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      Seq("corpus_b", "scores_b", "scores_flat").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
