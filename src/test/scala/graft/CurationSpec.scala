package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("passage dup stats count cross-doc duplicated chunks, not within-doc repeats") {
    // docs 1 and 2 share their first 8-word passage; doc 3 repeats its
    // own passage twice (n_chars 16 words) but shares with nobody
    val shared = "a b c d e f g h"
    val d = docs(
      (1L, s"$shared i j k l m n o p"),
      (2L, s"$shared q r s t u v w x"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z1 z2 z3 z4 z5 z6 z7 z8"))
    val out = Curation.passageDupStats(d).orderBy("doc_id")
      .select("doc_id", "n_passages", "n_dup", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out(0) == ((1L, 2L, 1L, 0.5)))
    assert(out(1) == ((2L, 2L, 1L, 0.5)))
    // within-doc repetition: the passage occurs in ONE distinct doc →
    // not duplicated by the cross-corpus definition
    assert(out(2) == ((3L, 2L, 0L, 0.0)))
  }

  test("curationVerdict composes every gate with per-reason flags") {
    val leak = "alpha beta gamma delta"
    val train = docs(
      (1L, "good clean words across enough tokens here"),   // keep
      (2L, "short doc"),                                    // fails length
      (3L, "good clean words across enough tokens here"),   // exact dup of 1 → not canonical
      (4L, s"fine length text but leaks $leak from eval"),  // contaminated
      (5L, "a b c d e f g h i j"))                          // short tokens → low quality
    val eval = docs((97L, s"held out doc with $leak inside it"))
    val out = Curation.curationVerdict(train, eval, minTokens = 5,
        qualityMin = 0.8, w = 4)
      .orderBy("doc_id")
      .select("doc_id", "ok_len", "ok_quality", "is_canonical", "contaminated", "keep")
      .as[(Long, Int, Int, Int, Int, Int)].collect().toSeq
    assert(out(0) == ((1L, 1, 1, 1, 0, 1)), s"doc 1: ${out(0)}")
    assert(out(1)._2 == 0 && out(1)._6 == 0, s"doc 2 must fail length: ${out(1)}")
    assert(out(2)._4 == 0 && out(2)._6 == 0, s"doc 3 must fail canonicality: ${out(2)}")
    assert(out(3)._5 == 1 && out(3)._6 == 0, s"doc 4 must be contaminated: ${out(3)}")
    assert(out(4)._3 == 0 && out(4)._6 == 0, s"doc 5 must fail quality: ${out(4)}")
  }

  test("ngramNovelty credits the first holder of a bigram, not repeaters") {
    val d = docs(
      (1L, "one two three four"),          // all 3 bigrams novel
      (2L, "one two three four"),          // verbatim repeat → 0 novel
      (3L, "one two entirely fresh tail")) // shares only "one two"
    val out = graft.operators.TextAnalysis.ngramNovelty(d).orderBy("doc_id")
      .select("doc_id", "n_bigrams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out(0) == ((1L, 3L, 3L, 1.0)))
    assert(out(1) == ((2L, 3L, 0L, 0.0)))
    assert(out(2) == ((3L, 4L, 3L, 0.75)))
  }

  test("nearestDup picks the most-similar neighbor per doc") {
    val d = docs(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),  // J(1,2) high
      (3L, "a b c d zz yy xx ww"), // J(1,3) lower
      (4L, "totally different content everywhere now"))
    val out = graft.operators.Dedup.nearestDup(d, 0.2).orderBy("doc_id")
      .select("doc_id", "nbr").as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L, s"doc 1 nearest must be 2: $out")
    assert(out(2L) == 1L)
    assert(!out.contains(4L), "doc with no neighbor above threshold must not appear")
  }

  test("packingPlan cuts at exact token budgets and flags straddlers") {
    val d = Seq(
      (1L, "a b c d", "en"),
      (2L, "e f g", "en"),
      (3L, "h i", "en"),
      (4L, "x y z", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Curation.packingPlan(d, 6).orderBy("lang", "doc_id")
      .select("doc_id", "n_tokens", "pack_id", "start_offset", "crosses")
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(out == Seq(
      (4L, 3L, 0L, 0L, 0),  // de stream packs independently
      (1L, 4L, 0L, 0L, 0),
      (2L, 3L, 0L, 4L, 1),  // tokens 4..6 of pack 0 + 1 cut into pack 1
      (3L, 2L, 1L, 1L, 0)), out.toString)
  }

  test("packEfficiency reports packs, straddlers, padding and utilization per stratum") {
    val d = Seq(
      (1L, "a b c d", "en"),
      (2L, "e f g", "en"),
      (3L, "h i", "en"),
      (4L, "x y z", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Curation.packEfficiency(d, 6).orderBy("lang")
      .select("lang", "n_docs", "total_tokens", "n_straddle", "n_packs",
        "pad_tokens", "utilization")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("de", 1L, 3L, 0L, 1L, 3L, 0.5),
      ("en", 3L, 9L, 1L, 2L, 3L, 0.75)), out.toString)
  }

  test("sourceOverlap counts shared passages per source pair, expanding multi-source sets") {
    val d = Seq(
      (1L, "a b c d", "srcA"),
      (2L, "a b x y", "srcB"),
      (3L, "a b q r", "srcC"),
      (4L, "z z z z", "srcD")
    ).toDF("doc_id", "text", "source")
    val out = Curation.sourceOverlap(d, w = 2).orderBy("src_a", "src_b")
      .as[(String, String, Long)].collect().toSeq
    // "a b" lives in A, B and C -> all three pairs; D shares nothing
    assert(out == Seq(
      ("srcA", "srcB", 1L), ("srcA", "srcC", 1L), ("srcB", "srcC", 1L)),
      out.toString)
  }

  test("chunkPlan windows with stride, short tail, and whole-doc chunk for short docs") {
    val twenty = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, twenty), (2L, "a b c")).toDF("doc_id", "text")
    val out = Curation.chunkPlan(d, c = 16, s = 8)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "chunk_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, 16L), (1L, 2L, 9L, 12L),  // tail chunk is short
      (2L, 1L, 1L, 3L)), out.toString)
    val hashes = Curation.chunkPlan(d, 16, 8).select("chunk_hash")
      .distinct().count()
    assert(hashes == 3, "distinct windows must hash distinctly")
  }

  test("waterfillMix caps tiny strata at their size and floor-splits the rest by weight") {
    val mk = (lang: String, n: Int, base: Long) =>
      (1 to 1).map(_ => (base, (1 to n).map(i => s"t$i").mkString(" "), lang))
    val d = (mk("aa", 2, 1L) ++ mk("bb", 100, 2L) ++ mk("cc", 100, 3L))
      .toDF("doc_id", "text", "lang")
    val out = Curation.waterfillMix(d, budgetFrac = 0.5).orderBy("lang")
      .select("lang", "avail_tokens", "weight", "alloc_tokens", "saturated")
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    // T = floor(202 * 0.5) = 101; aa (2 tokens) saturates, bb and cc
    // share floor((101 - 2) * w / 2w) = 49 each
    assert(out == Seq(
      ("aa", 2L, 14142L, 2L, 1),
      ("bb", 100L, 100000L, 49L, 0),
      ("cc", 100L, 100000L, 49L, 0)), out.toString)
  }

  test("decontaminate flags train docs sharing an n-gram run with eval, ignores clean ones") {
    val leak = "alpha beta gamma delta"
    val train = docs(
      (10L, s"start words then $leak and more text here"),
      (11L, "totally clean document with no overlap at all"))
    val eval = docs((97L, s"eval set doc containing $leak inside"))
    val out = Curation.decontaminate(train, eval, w = 4)
      .select("doc_id", "eval_doc_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 97L, 1L)), s"got $out")
  }

  test("fuzzy decontamination gates on overlap fraction, not raw collisions") {
    val evalDoc = "alpha beta gamma delta epsilon"
    val train = docs(
      (1L, evalDoc),                                    // 100% of its bigrams leak
      (2L, "clean words alpha beta other stuff here"))  // one shared bigram
    val eval = docs((97L, evalDoc))
    val out = Curation.decontaminateFuzzy(train, eval, w = 2, minFrac = 0.8)
      .select("doc_id", "eval_doc_id", "n_shared", "n_train", "overlap_frac")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // doc 2 shares 1 of its 6 bigrams (frac 0.1667) → below the gate
    assert(out == Seq((1L, 97L, 4L, 4L, 1.0)))
    // dropping the gate surfaces the partial overlap with its fraction
    val all = Curation.decontaminateFuzzy(train, eval, w = 2, minFrac = 0.0)
      .orderBy("doc_id").select("doc_id", "overlap_frac")
      .as[(Long, Double)].collect().toSeq
    assert(all == Seq((1L, 1.0), (2L, 0.1667)))
  }

  test("boilerplate counts chunks repeated across docs of the SAME source only") {
    val hdr = "site nav footer"
    val d = Seq(
      (1L, s"$hdr unique one content", "s1"),
      (2L, s"$hdr unique two content", "s1"),
      (3L, s"$hdr unique three words", "s2"))  // alone in s2 → clean
      .toDF("doc_id", "text", "source")
    val out = Curation.boilerplate(d, w = 3, minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "source", "n_passages", "n_boiler", "clean_frac")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    // docs 1 and 2 share their header chunk within s1; doc 3's copy of
    // the SAME chunk does not count (single doc in its source)
    assert(out == Seq((1L, "s1", 2L, 1L, 0.5), (2L, "s1", 2L, 1L, 0.5)))
  }

  test("containment catches a doc embedded in a larger one that Jaccard misses") {
    val inner = "p q r s t u v w"
    val filler = (0 until 60).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, inner),
      (2L, s"$filler $inner"),
      (3L, "unrelated words entirely different from everything else"))
    val out = Curation.containmentPairs(d, 0.8)
      .select("inner_id", "outer_id", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 2L)), s"got $out")
    assert(out.head._3 >= 0.85, s"doc 1's bigrams are nearly all in doc 2: ${out.head}")
    // Jaccard on the same pair is far below any dedup threshold
    val jac = graft.operators.Dedup.jaccardPairs(d, 0.0)
      .filter(col("doc1") === 1 && col("doc2") === 2)
      .select("jac").as[Double].collect()
    assert(jac.isEmpty || jac.head < 0.2)
  }

  test("bloom decontamination is exactly the broadcast decontamination") {
    val leak = "alpha beta gamma delta"
    val train = docs(
      (10L, s"start words then $leak and more text here"),
      (11L, "totally clean document with no overlap at all"),
      (12L, s"another leaky one $leak again $leak repeated"))
    val eval = docs((97L, s"eval set doc containing $leak inside"))
    val exact = Curation.decontaminate(train, eval, w = 4)
      .select("doc_id", "eval_doc_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Curation.decontaminateBloom(train, eval, w = 4)
      .select("doc_id", "eval_doc_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(bloom == exact, s"bloom path must be exact: $bloom vs $exact")
    assert(exact.nonEmpty)
  }

  test("canonical-by-quality keeps the cleanest cluster member, not the lowest id") {
    // docs 1 and 2 near-dup; doc 1 (lower id) is polluted with digits
    // and punctuation, doc 2 is clean — quality must override the id
    val d = docs(
      (1L, "a b c d e f g h 1,2,3!!! 4,5,6??? 99 88 77"),
      (2L, "a b c d e f g h i j k"),
      (9L, "totally separate island document here"))
    val out = Curation.canonicalByQuality(d, 0.3).orderBy("doc_id")
      .select("doc_id", "cluster_id", "keep")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.map(_._2) == Seq(1L, 1L, 9L), s"clustering wrong: $out")
    assert(out.map(_._3) == Seq(0, 1, 1),
      s"clean doc 2 must survive over polluted doc 1: $out")
  }

  test("temperature sampling flattens the head: rare strata keep a larger fraction") {
    val d = (0 until 800).map(i => (i.toLong, if (i < 640) "en" else "xx"))
      .toDF("doc_id", "lang")
    val kept = Curation.temperatureSample(d, "lang", col("doc_id").cast("string"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val keepEn = kept.getOrElse("en", 0L).toDouble / 640
    val keepXx = kept.getOrElse("xx", 0L).toDouble / 160
    assert(keepXx > keepEn, s"rare stratum must keep a larger share: en=$keepEn xx=$keepXx")
    // determinism: partition layout must not change the sample
    val kept2 = Curation.temperatureSample(d.repartition(7), "lang",
        col("doc_id").cast("string"))
      .select("doc_id").as[Long].collect().toSet
    val kept1 = Curation.temperatureSample(d, "lang", col("doc_id").cast("string"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == kept2)
  }

  test("curation report renders every section, deterministically") {
    val d = (1 to 60).map { i =>
      val text =
        if (i % 5 == 0) "short"
        else s"document number $i with enough plain words to pass the " +
          s"quality gate and some variety token$i token${i % 7}"
      (i.toLong, text, "en", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = graft.report.CurationReport.render(d)
    val r2 = graft.report.CurationReport.render(d)
    assert(r1 == r2, "report must be deterministic")
    for (section <- Seq("# Curation report", "## Summary",
        "## Survival funnel by source", "## Language composition",
        "## Quality score percentiles by source", "<svg "))
      assert(r1.contains(section), s"missing: $section")
    // the summary counts survivors of a real funnel: the 'short' docs
    // fail the gate, so clean < raw, and every source appears
    assert(Seq("src0", "src1", "src2").forall(r1.contains))
    val summary = r1.linesIterator.dropWhile(!_.startsWith("## Summary"))
      .drop(2).next()
    assert(summary.matches("""\d+ of \d+ documents .*"""), summary)
  }
}
