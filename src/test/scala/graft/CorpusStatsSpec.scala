package graft

import graft.operators.{Similarity, TextAnalysis}

/** Semantic pins for the round-5 corpus-statistics additions. The
  * DuckDB oracles prove Spark↔DuckDB equivalence; these pin the
  * formulas themselves on hand-computable corpora.
  */
class CorpusStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def r4(x: Double): Double = math.floor((x + 1e-9) * 1e4 + 0.5) / 1e4

  test("readability reproduces the hand-computed Flesch counts") {
    // "the cat sat. it ran away!" → 6 words, 2 sentences, 8 vowel
    // groups (e, a, a, i, a, a-a-y merges? no: a, a, ay → the=1 cat=1
    // sat=1 it=1 ran=1 away=2) = 7
    val docs = Seq((1L, "the cat sat. it ran away!"))
      .toDF("doc_id", "text")
    val row = TextAnalysis.readability(docs).collect().head
    assert(row.getAs[Long]("n_words") == 6L)
    assert(row.getAs[Long]("n_sent") == 2L)
    assert(row.getAs[Long]("n_syll") == 7L)
    val wps = 6.0 / 2.0; val spw = 7.0 / 6.0
    assert(row.getAs[Double]("flesch") == r4(206.835 - 1.015 * wps - 84.6 * spw))
    assert(row.getAs[Double]("fk_grade") == r4(0.39 * wps + 11.8 * spw - 15.59))
    // unpunctuated text floors sentences at 1 instead of dividing by zero
    val bare = TextAnalysis.readability(
      Seq((2L, "just words no stops")).toDF("doc_id", "text")).collect().head
    assert(bare.getAs[Long]("n_sent") == 1L)
  }

  test("zipf slope is -1 on an exact power-law corpus and hapax counts are exact") {
    // word w_r appears floor(1024/r) times, r = 1..32: counts are NOT
    // exactly 1024/r after floor, so allow the fitted slope a small
    // departure from -1 — but it must be far from 0 and monotone data
    val words = (1 to 32).flatMap { r =>
      Seq.fill(1024 / r)(f"w$r%02d")
    }
    val docs = Seq((1L, "s0", words.mkString(" "))).toDF("doc_id", "source", "text")
    val z = TextAnalysis.zipfSlope(docs, topK = 32).collect().head
    assert(z.getAs[Long]("k") == 32L)
    val slope = z.getAs[Double]("zipf_slope")
    assert(slope < -0.9 && slope > -1.1, s"zipf slope = $slope")
    assert(z.getAs[Double]("top1_share") ==
      r4(1024.0 / words.length))
    val h = TextAnalysis.hapaxProfile(
      Seq((1L, "s0", "a a b c c d e")).toDF("doc_id", "source", "text"))
      .collect().head
    assert(h.getAs[Long]("vocab") == 5L && h.getAs[Long]("hapax") == 3L)
    assert(h.getAs[Double]("hapax_token_share") == r4(3.0 / 7.0))
  }

  test("bitsketch calibration: identical vectors land at hamming 0 with cos 1") {
    // 12 copies of one vector + 12 of its negation: every same-sign
    // pair has hamming 0 / cos 1; every cross pair hamming 32 / cos −1
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 0.5).toFloat)
    val rows = (0L until 12L).map(i => (i, v, 0)) ++
      (12L until 24L).map(i => (i, v.map(-_), 1))
    val out = Similarity.bitSketchCalibration(
        rows.toDF("vec_id", "embedding", "label"), nPlanes = 32, nCells = 1)
      .collect().map(r => r.getAs[Long]("hamming") -> r).toMap
    assert(out(0L).getAs[Double]("mean_cos") == 1.0)
    assert(out(0L).getAs[Double]("est_cos") == 1.0)
    assert(out(0L).getAs[Double]("mean_abs_err") == 0.0)
    assert(out(32L).getAs[Double]("mean_cos") == -1.0)
    assert(out(32L).getAs[Double]("mean_abs_err") == 0.0)
    assert(out(0L).getAs[Long]("n_pairs") == 2 * 66L)
  }

  test("vocabGrowth: hand-built deciles, new/cumulative vocabulary exact") {
    // mx = 10 so bucket = doc_id with nBuckets = 10; vocabulary plan:
    // doc 0: a b — 2 new; doc 3: b c — 1 new (c); doc 9: a d d — 1 new
    // (d); buckets 1,2,4..8 have no docs and must not appear
    val docs = Seq(
      (0L, "A b"),       // lowercased → a b
      (3L, "b C"),
      (9L, "a d  d")     // double space → split artifact filtered
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, nBuckets = 10)
      .orderBy("bucket").collect()
    assert(out.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 3L, 9L))
    val b0 = out(0); val b3 = out(1); val b9 = out(2)
    assert(b0.getAs[Long]("n_docs") == 1L && b0.getAs[Long]("n_tokens") == 2L)
    assert(b0.getAs[Long]("vocab") == 2L && b0.getAs[Long]("new_terms") == 2L)
    assert(b0.getAs[Long]("cum_terms") == 2L)
    assert(b3.getAs[Long]("new_terms") == 1L && b3.getAs[Long]("cum_terms") == 3L)
    assert(b9.getAs[Long]("n_tokens") == 3L && b9.getAs[Long]("vocab") == 2L)
    assert(b9.getAs[Long]("new_terms") == 1L && b9.getAs[Long]("cum_terms") == 4L)
  }

  test("vocabGrowth names the empty input instead of an opaque NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.vocabGrowth(empty)
    }
    assert(e.getMessage.contains("no rows"))
  }

  test("sceneCuts invariants: shot partition sums to frames, sentinel on one-shot") {
    // invariants over arbitrary stub scores (the digest is content-
    // derived, so assert structure, then cross-check one doc by hand
    // against the replayed frameSample scores)
    val docs = Seq(
      (1L, "x" * 450),   // 5 frames, stride 2 → fi 0,2,4 sampled
      (2L, "short"),     // 1 frame → 1 shot, no cuts
      (3L, ("the quick brown fox " * 30))
    ).toDF("doc_id", "text")
    val out = graft.operators.Multimodal.sceneCuts(docs, stride = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_shots") == r.getAs[Long]("n_cuts") + 1L)
      assert(r.getAs[Long]("longest_shot") <= r.getAs[Long]("n_frames"))
      assert((r.getAs[Long]("n_cuts") == 0L) == (r.getAs[Long]("first_cut") == -1L))
    }
    assert(out(2L).getAs[Long]("n_frames") == 1L)
    assert(out(2L).getAs[Long]("n_shots") == 1L)
    assert(out(2L).getAs[Long]("first_cut") == -1L)
    // hand replay for doc 1: scores from the frameSample digest chain
    val m = 1048576L
    val scores = graft.operators.Multimodal.frameSample(
        docs.filter($"doc_id" === 1L), stride = 2)
      .orderBy("frame_idx")
      .collect().map(r => ((r.getAs[Long]("frame_digest") % m) + m) % m)
    val cuts = scores.sliding(2).count(p => math.abs(p(1) - p(0)) > 524288L)
    assert(out(1L).getAs[Long]("n_frames") == scores.length.toLong)
    assert(out(1L).getAs[Long]("n_cuts") == cuts.toLong)
  }
}
