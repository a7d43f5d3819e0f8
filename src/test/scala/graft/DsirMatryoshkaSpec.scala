package graft

import graft.operators.{Curation, Similarity}

/** DSIR importance weights and Matryoshka-truncation recall. */
class DsirMatryoshkaSpec extends SparkTestBase {
  import spark.implicits._

  test("dsir scores target-like sources positive and disjoint sources negative") {
    val en = (0 until 3).map(i =>
      (i.toLong, "alpha beta alpha beta alpha beta", "en", "srcEn", 30L))
    val de = (3 until 6).map(i =>
      (i.toLong, "gamma delta gamma delta gamma delta", "de", "srcDe", 30L))
    val tiny = Seq((6L, "solo", "en", "srcTiny", 4L)) // < 2 words → weight 0
    val docs = (en ++ de ++ tiny)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.dsirWeights(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // target = en: en bigrams are likelier under target than raw → > 0;
    // de bigrams never appear in the target → < 0
    assert(out("srcEn")._2 > 0.0 && out("srcEn")._3 == 1.0)
    assert(out("srcDe")._2 < 0.0 && out("srcDe")._3 == 0.0)
    assert(out("srcTiny") == ((1L, 0.0, 0.0)))
    // determinism: identical rerun
    val again = Curation.dsirWeights(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(again == out)
  }

  test("matryoshka recall is 1.0 when all information lives in the prefix") {
    // dims 9..64 are zero, so every prefix ranking equals the full
    // ranking exactly
    val rnd = new scala.util.Random(7)
    val embs = (0 until 40).map { i =>
      val v = Array.tabulate(64)(d =>
        if (d < 8) (rnd.nextFloat() - 0.5f) * 4f else 0.0f)
      (i.toLong, v, i % 3)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.matryoshkaRecall(embs, nQ = 10, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(8, 16, 32))
    out.foreach { case (_, nq, rec) =>
      assert(nq == 10 && rec == 1.0)
    }
  }

  test("matryoshka recall degrades monotonically-ish when the tail carries signal") {
    val rnd = new scala.util.Random(9)
    val embs = (0 until 60).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val rec = Similarity.matryoshkaRecall(embs, nQ = 10, k = 5).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // random full-dim vectors: an 8-dim prefix cannot reproduce the
    // full ranking, and wider prefixes can only know more
    assert(rec(8) < 1.0)
    assert(rec(32) >= rec(8))
  }
}
