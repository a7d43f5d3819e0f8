package graft

import graft.operators.{Clustering, Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The self-scaling IVF cell knob (Similarity.autoCells) and its
  * wiring into the Σ|cell|² consumers. v1 (k = n/64) held the in-cell
  * pair volume linear but made centroid ASSIGNMENT n²/64 — the r6
  * sfx10 audit measured the derived k = 7 813 putting ~98 % of
  * semdedup's time in the assignment scan. v2 is the balanced
  * k = ceil(√n): assignment n·k and pairs n²/k are BOTH n^1.5, so a
  * 10× corpus costs ~31.6× everywhere, never 100×. These tests pin
  * the formula, the knob routing (`knob <= 0` derives without
  * changing the equivalent explicit-knob result), and the n^1.5 law
  * against the fixed-k n² law.
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

  test("autoCells arithmetic: ceil(sqrt(n)) floored at minCells") {
    assert(Similarity.autoCells(synthEmbs(1024)) == 32)
    assert(Similarity.autoCells(synthEmbs(100)) == 10)
    assert(Similarity.autoCells(synthEmbs(130)) == 12) // sqrt = 11.40 → 12
    assert(Similarity.autoCells(synthEmbs(30)) == 8) // sqrt = 5.48 → minCells 8
    assert(Similarity.autoCells(synthEmbs(30), minCells = 1) == 6)
  }

  test("knob <= 0 derives cells without changing the explicit-knob result") {
    val e = synthEmbs(96)
    // 96 vectors → ceil(sqrt) = 10: auto must equal an explicit 10,
    // proving the derive path changes nothing but where the count
    // comes from
    val auto = Dedup.embedCosinePairsIvf(e, nCells = 0, threshold = 0.5)
      .orderBy("id1", "id2").collect().toSeq
    val fixed = Dedup.embedCosinePairsIvf(e, nCells = 10, threshold = 0.5)
      .orderBy("id1", "id2").collect().toSeq
    assert(auto == fixed)
    val autoOod = Similarity.oodKnnDist(e, nCells = 0, k = 3, topN = 10)
      .collect().toSeq
    val fixedOod = Similarity.oodKnnDist(e, nCells = 10, k = 3, topN = 10)
      .collect().toSeq
    assert(autoOod == fixedOod)
    // the auto path also engages sampled training (cap = 8k = 80 < 96
    // binds here, so the gate corpus genuinely exercises it): it must
    // equal the SAME knobs passed explicitly, and differ from
    // full-corpus training only through the centroids
    val autoSem = Clustering.semDedup(e, k = 0, threshold = 0.3)
      .orderBy("vec_id").collect().toSeq
    val fixedSem = Clustering.semDedup(e, k = 10, threshold = 0.3, trainCap = 80)
      .orderBy("vec_id").collect().toSeq
    assert(autoSem == fixedSem)
  }

  test("auto knob holds candidates on the n^1.5 law where fixed k is n²") {
    // in-cell pair count (threshold -1 keeps every candidate) across a
    // corpus QUADRUPLING 512 → 2048: fixed k=8 multiplies pairs ~16×
    // (n²/k); the balanced auto knob (23 → 46 cells) must stay near
    // the 4^1.5 = 8× law — and the total cost model adds an
    // assignment term n·k that the fixed-cell-SIZE v1 formula grew
    // quadratically, which pairs alone cannot show, so the pair law
    // here plus the autoCells arithmetic above pin both terms
    def pairs(n: Int, cells: Int): Long =
      Dedup.embedCosinePairsIvf(synthEmbs(n), nCells = cells, threshold = -1.0).count()
    val fixedRatio = pairs(2048, 8).toDouble / pairs(512, 8)
    val autoRatio =
      pairs(2048, Similarity.autoCells(synthEmbs(2048))).toDouble /
        pairs(512, Similarity.autoCells(synthEmbs(512)))
    assert(fixedRatio > 12.0, s"fixed-k quadrupling ratio was $fixedRatio, expected ~16")
    assert(autoRatio < 12.0, s"auto-k quadrupling ratio was $autoRatio, expected ~8")
  }
}
