package graft

import graft.operators.{Clustering, Curation, TextAnalysis}

/** Specs for the r5 curation additions: the Gopher structural rule
  * battery, corpus-wide duplicated-line boilerplate, and SemDeDup.
  */
class TextRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("gopherRules flags each structural failure independently") {
    val good = "the quick brown fox jumps over the lazy dog and it runs for fun on grass today"
    val symbols = "the word " + Seq.fill(10)("###").mkString(" ") + " and for it is of to in that"
    val bullets = (1 to 5).map(i => s"- bullet item number $i here").mkString("\n") +
      "\nthe and is of to in that it for on word word word"
    val nonAlpha = "the and is of " + Seq.fill(40)("12345").mkString(" ")
    val out = TextAnalysis.gopherRules(docs(
        (1L, good), (2L, symbols), (3L, bullets), (4L, nonAlpha)))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") == 1)
    assert(out(2L).getAs[Int]("ok_symbol") == 0 && out(2L).getAs[Int]("keep") == 0)
    // 5 of 6 non-blank lines are bullets > 0.9? 5/6 = 0.833 ≤ 0.9 keeps;
    // make sure the measured fraction is what arrives
    assert(math.abs(out(3L).getAs[Double]("bullet_frac") - 0.8333) < 1e-9)
    assert(out(4L).getAs[Int]("ok_alpha") == 0, "digit words fail the alpha rule")
    assert(out(4L).getAs[Double]("alpha_frac") < 0.8)
  }

  test("gopherRules survives empty and single-line documents") {
    val out = TextAnalysis.gopherRules(docs((1L, ""), (2L, "word")))
      .collect().map(r => r.getLong(0) -> r).toMap
    // no non-blank lines → line fractions are zero, not null
    assert(out(1L).getAs[Double]("bullet_frac") == 0.0)
    assert(out(1L).getAs[Double]("ellipsis_frac") == 0.0)
    assert(out(2L).getAs[Int]("ok_words") == 0, "one word is under the floor")
  }

  test("dupLines measures corpus-wide line duplication, not per-doc") {
    val footer = "copyright footer line"
    val d = docs(
      (1L, s"unique alpha\n$footer"),
      (2L, s"unique beta\n$footer\nunique gamma"),
      (3L, "all original content"))
    val out = TextAnalysis.dupLines(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 2)
    assert(out(1L).getAs[Long]("n_dup_lines") == 1)
    assert(out(1L).getAs[Double]("dup_line_frac") == 0.5)
    assert(math.abs(out(2L).getAs[Double]("dup_line_frac") - 0.3333) < 1e-9)
    assert(out(3L).getAs[Long]("n_dup_lines") == 0)
    // char fraction weights by line length
    val d1chars = "unique alpha".length + footer.length
    assert(math.abs(out(1L).getAs[Double]("dup_char_frac") -
      math.floor((footer.length.toDouble / d1chars + 1e-9) * 1e4 + 0.5) / 1e4) < 1e-9)
  }

  test("dupLines keeps blank-only documents in the profile with zeros") {
    val out = TextAnalysis.dupLines(docs((1L, "\n \n"), (2L, "a line")))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 0)
    assert(out(1L).getAs[Double]("dup_line_frac") == 0.0)
  }

  test("qualityDupBias measures the dup-vs-quality association per source") {
    // src_a: duplicated docs are the junky ones (negative association);
    // both classes present so the correlation is defined
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "src_a"),
      (2L, "alpha beta gamma delta epsilon zeta eta", "src_a"), // near-dup of 1
      (3L, "111 222 333 111 222 333 111 222", "src_a"),
      (4L, "clean prose sentence with several plain words here", "src_a"),
      (5L, "another clean prose sentence with plain words", "src_a"),
      (6L, "yet another clean sentence entirely its own", "src_a"))
      .toDF("doc_id", "text", "source")
    val out = Curation.qualityDupBias(docs,
      precomputedPairs = Some(Seq((1L, 2L)).toDF("doc1", "doc2"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 6)
    // one non-canonical member (doc 2) of the pair is the removal set
    assert(math.abs(r.getAs[Double]("dup_rate") - 0.1667) < 1e-9)
    assert(r.getAs[Double]("r_pb").abs <= 1.0)
    // mean of the kept docs reflects the junk doc 3 riding with them
    assert(r.getAs[Double]("mean_q_clean") < 1.0)
  }

  test("epochShuffle yields stable per-(epoch,doc) keys and in-range shards") {
    val docs = (1L to 20L).map(i => (i, s"text $i", "s")).toDF("doc_id", "text", "source")
    val out = graft.operators.Curation.epochShuffle(docs, epochs = 2, shards = 8)
      .collect()
    assert(out.length == 40)
    assert(out.forall(r => { val s = r.getAs[Int]("shard"); s >= 0 && s < 8 }))
    // the same (epoch, doc) key is a pure function — append-stable by
    // construction: recompute on a grown corpus and compare
    val grown = (1L to 25L).map(i => (i, s"text $i", "s")).toDF("doc_id", "text", "source")
    val again = graft.operators.Curation.epochShuffle(grown, epochs = 2, shards = 8)
      .collect().map(r => (r.getLong(0), r.getAs[Int]("epoch")) -> r.getAs[Long]("skey")).toMap
    assert(out.forall(r =>
      again((r.getLong(0), r.getAs[Int]("epoch"))) == r.getAs[Long]("skey")))
    // epochs genuinely reshuffle: the two epochs' key ORDERS differ
    val e0 = out.filter(_.getAs[Int]("epoch") == 0).sortBy(_.getAs[Long]("skey")).map(_.getLong(0)).toSeq
    val e1 = out.filter(_.getAs[Int]("epoch") == 1).sortBy(_.getAs[Long]("skey")).map(_.getLong(0)).toSeq
    assert(e0 != e1)
  }

  test("packBfd places each doc in the fullest fitting bin, worked example") {
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    // sizes 7,6,4,3,3,2 at budget 10 → bins {7,3} {6,4} {3,2}
    val docs = Seq(
      (1L, txt(7), "en"), (2L, txt(6), "en"), (3L, txt(4), "en"),
      (4L, txt(3), "en"), (5L, txt(3), "en"), (6L, txt(2), "en"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.packBfd(docs, budget = 10).collect()
      .map(r => r.getLong(1) -> r.getAs[Long]("pack_id")).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 3L, 6L -> 3L))
  }

  test("packBfd matches a reference best-fit-decreasing on random corpora") {
    val rnd = new scala.util.Random(17)
    def ref(sizes: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
      val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
      sizes.sortBy { case (id, n) => (-n, id) }.map { case (id, n) =>
        val fits = bins.zipWithIndex.filter { case (l, _) => l + n <= budget }
        if (fits.isEmpty) { bins += n; id -> bins.length.toLong }
        else {
          val (_, bi) = fits.maxBy { case (l, i) => (l, -i) }
          bins(bi) += n
          id -> (bi + 1).toLong
        }
      }.toMap
    }
    val sizes = (1L to 60L).map(i => i -> (1L + rnd.nextInt(12)))
    val docs = sizes.map { case (id, n) =>
      (id, Seq.fill(n.toInt)("w").mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
    val got = Curation.packBfd(docs, budget = 16).collect()
      .map(r => r.getLong(1) -> r.getAs[Long]("pack_id")).toMap
    assert(got == ref(sizes, 16))
  }

  test("mixKlReport: shares normalize, flattening direction, nonnegative total KL") {
    val docs = ((1 to 80).map(i => (i.toLong, s"t$i", "en")) ++
      (81 to 95).map(i => (i.toLong, s"t$i", "de")) ++
      (96 to 100).map(i => (i.toLong, s"t$i", "fr")))
      .toDF("doc_id", "text", "lang")
    val out = Curation.mixKlReport(docs, "lang",
      org.apache.spark.sql.functions.col("doc_id").cast("string")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 3)
    def s(c: String) = out.values.map(_.getAs[Double](c)).sum
    assert(math.abs(s("natural_share") - 1.0) < 0.001)
    assert(math.abs(s("achieved_share") - 1.0) < 0.001)
    // √p flattening: the head's target share sits below its natural share
    assert(out("en").getAs[Double]("target_share") <
      out("en").getAs[Double]("natural_share"))
    assert(out("fr").getAs[Double]("target_share") >
      out("fr").getAs[Double]("natural_share"))
    // total KL of two normalized distributions is nonnegative (Gibbs)
    assert(s("kl_term") >= -1e-9)
  }

  test("semDedup keeps exactly one survivor per duplicate group — the farthest from centroid") {
    // first-k init seeds the three axes; the duplicates then fall into
    // the seed cells. Group {0,3,4} pins the farthest-keep policy
    // (vec 3 is farthest from the converged centroid); group {1,5} is
    // centroid-symmetric, pinning the lowest-id tiebreak.
    val rows = Seq(
      (0L, Array(10.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 10.0f, 0.0f), 1),
      (2L, Array(0.0f, 0.0f, 10.0f), 2),
      (3L, Array(10.5f, 0.0f, 0.0f), 0),  // near-dup of 0, farthest in group
      (4L, Array(10.2f, 0.0f, 0.0f), 0),  // near-dup of 0
      (5L, Array(0.0f, 10.4f, 0.0f), 1))  // near-dup of 1
    val embs = rows.toDF("vec_id", "embedding", "label")
    val out = Clustering.semDedup(embs, k = 3, iters = 3, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 6)
    assert(Seq(0L, 3L, 4L).forall(out(_).getAs[Long]("group_id") == 0L))
    assert(Seq(1L, 5L).forall(out(_).getAs[Long]("group_id") == 1L))
    // the survivor is the member farthest from the converged centroid
    assert(out(3L).getAs[Int]("keep") == 1)
    assert(out(0L).getAs[Int]("keep") == 0 && out(4L).getAs[Int]("keep") == 0)
    // centroid-equidistant pair → deterministic lowest-id survivor
    assert(out(1L).getAs[Int]("keep") == 1 && out(5L).getAs[Int]("keep") == 0)
    // singletons keep themselves; group sizes ride along
    assert(out(2L).getAs[Int]("keep") == 1)
    assert(out(0L).getAs[Long]("n_group") == 3)
    assert(out(2L).getAs[Long]("n_group") == 1)
  }
  test("scriptMix: integer class shares, dominant argmax with fixed-order ties, mix score") {
    val out = TextAnalysis.scriptMix(docs(
      (1L, "abcdefgh"),            // all letters
      (2L, "1234567890"),          // all digits
      (3L, "ab12"),                // letter/digit tie -> letter wins (fixed order)
      (4L, "a b"),                 // 2 letters, 1 space
      (5L, ""),                    // empty: dropped (no classes on zero chars)
      (6L, "!!??..,,;;")           // punct + other ('!'/'?' are punct, none other)
    )).collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(5L), "empty doc must be dropped")
    val d1 = out(1L)
    assert(d1.getAs[Long]("letter_x1e4") == 10000L &&
      d1.getAs[String]("dominant") == "letter" &&
      d1.getAs[Long]("mix_x1e4") == 0L)
    val d2 = out(2L)
    assert(d2.getAs[Long]("digit_x1e4") == 10000L &&
      d2.getAs[String]("dominant") == "digit")
    val d3 = out(3L)
    assert(d3.getAs[Long]("letter_x1e4") == 5000L &&
      d3.getAs[Long]("digit_x1e4") == 5000L)
    assert(d3.getAs[String]("dominant") == "letter", "tie must break by class order")
    assert(d3.getAs[Long]("mix_x1e4") == 5000L)
    val d4 = out(4L)
    // 2/3 letters -> round((2*2*1e4+3)/(2*3)) = 6667
    assert(d4.getAs[Long]("letter_x1e4") == 6667L, d4.toString)
    assert(d4.getAs[Long]("space_x1e4") == 3333L)
    val d6 = out(6L)
    assert(d6.getAs[Long]("punct_x1e4") == 10000L && d6.getAs[Long]("other_x1e4") == 0L)
    // shares are each independently rounded; mix uses the max share only
    assert(out.values.forall(r => r.getAs[Long]("mix_x1e4") >= 0 &&
      r.getAs[Long]("mix_x1e4") <= 8000L))
  }
}
