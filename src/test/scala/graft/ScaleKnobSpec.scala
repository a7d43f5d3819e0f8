package graft

import graft.operators.{Clustering, Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The self-scaling IVF cell knob (Similarity.autoCells) and its
  * wiring into the three Σ|cell|² consumers. The r5 decade audit
  * measured 2.7–7.1× growth at 10× data with cells pinned to 8 —
  * these tests pin the fix: cells ∝ corpus size holds the candidate
  * volume linear, and `knob <= 0` routes every consumer through it
  * without changing the explicit-knob results the oracles replay.
  */
class ScaleKnobSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic pseudo-random embeddings: dim 6, values in [-1, 1)
    * from an integer mix — same corpus every run, no RNG.
    */
  private def synthEmbs(n: Int): DataFrame =
    (0 until n).map { i =>
      val v = Array.tabulate(6) { d =>
        (((i.toLong * 2654435761L + d * 40503L + 12289L) % 1000 + 1000) % 1000 / 500.0f) - 1.0f
      }
      (i.toLong, v, i % 3)
    }.toDF("vec_id", "embedding", "label")

  test("autoCells arithmetic: ceil(n/target) floored at minCells") {
    assert(Similarity.autoCells(synthEmbs(1024), targetCell = 64) == 16)
    assert(Similarity.autoCells(synthEmbs(100), targetCell = 64) == 8)
    assert(Similarity.autoCells(synthEmbs(130), targetCell = 64, minCells = 1) == 3)
    intercept[IllegalArgumentException] {
      Similarity.autoCells(synthEmbs(10), targetCell = 0)
    }
  }

  test("knob <= 0 derives cells without changing the explicit-knob result") {
    val e = synthEmbs(96)
    // 96 vectors, targetCell 64 → ceil = 2 → minCells 8 wins: auto == 8,
    // the same constant the gate queries pin, so results must be identical
    val auto = Dedup.embedCosinePairsIvf(e, nCells = 0, threshold = 0.5)
      .orderBy("id1", "id2").collect().toSeq
    val fixed = Dedup.embedCosinePairsIvf(e, nCells = 8, threshold = 0.5)
      .orderBy("id1", "id2").collect().toSeq
    assert(auto == fixed)
    val autoOod = Similarity.oodKnnDist(e, nCells = 0, k = 3, topN = 10)
      .collect().toSeq
    val fixedOod = Similarity.oodKnnDist(e, nCells = 8, k = 3, topN = 10)
      .collect().toSeq
    assert(autoOod == fixedOod)
    val autoSem = Clustering.semDedup(e, k = 0, threshold = 0.3)
      .orderBy("vec_id").collect().toSeq
    val fixedSem = Clustering.semDedup(e, k = 8, threshold = 0.3)
      .orderBy("vec_id").collect().toSeq
    assert(autoSem == fixedSem)
  }

  test("auto knob holds the candidate volume linear where fixed k is quadratic") {
    // in-cell pair count (threshold -1 keeps every candidate) across a
    // corpus doubling: fixed k=8 multiplies pairs ~4× (n²/k); the auto
    // knob (target 32: 16 → 32 cells) must stay ~2× (n · target)
    def pairs(n: Int, cells: Int): Long =
      Dedup.embedCosinePairsIvf(synthEmbs(n), nCells = cells, threshold = -1.0).count()
    val fixedRatio = pairs(1024, 8).toDouble / pairs(512, 8)
    val autoRatio =
      pairs(1024, Similarity.autoCells(synthEmbs(1024), targetCell = 32)).toDouble /
        pairs(512, Similarity.autoCells(synthEmbs(512), targetCell = 32))
    assert(fixedRatio > 3.0, s"fixed-k doubling ratio was $fixedRatio, expected ~4")
    assert(autoRatio < 3.0, s"auto-k doubling ratio was $autoRatio, expected ~2")
  }
}
