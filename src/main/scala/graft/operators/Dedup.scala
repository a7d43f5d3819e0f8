package graft.operators

import graft.Num._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.{vecDot, vecNorm}

/** Document deduplication for large-scale training-data pipelines.
  *
  * Scale design: exact dedup is one hash-aggregate on a 128-bit digest
  * (never shuffles raw text). Near-dup methods are bucket-then-verify:
  * MinHash/LSH and SimHash shrink the candidate space with a groupBy on
  * small keys, and only candidate pairs are verified — the all-pairs
  * quadratic never materializes at scale.
  */
object Dedup {

  private def words(text: Column): Column = split(lower(text), "\\s+")

  /** Word k-shingles (k=2) — with a tiny vocabulary single words are
    * shared by every document; bigrams discriminate.
    *
    * Two-step projection on purpose: materialize the split once, THEN
    * index it. Inlining `split` into the transform lambda makes every
    * `element_at` re-run the regex split (no CSE across lambda
    * boundaries) — measured ~10× slower on the shingle stage.
    */
  private def withShingles(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(1), size(col("w")) - 1),
          i => concat(element_at(col("w"), i), lit(" "),
            element_at(col("w"), i + 1)))).as("sh"))

  /** A text corpus often arrives as few large files; per-doc expression
    * work (shingling, hashing) is CPU-bound, so spread it across all
    * cores first. Keyed repartition keeps results deterministic (every
    * downstream op aggregates by doc_id).
    */
  private def spread(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

  /** Exact dedup: group by md5(text), canonical = min doc_id per group. */
  def exact(docs: DataFrame): DataFrame = {
    val canon = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("group_size"))
    docs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(canon, "h")
      .select(col("doc_id"), col("canonical_id"), col("group_size"),
        (col("doc_id") =!= col("canonical_id")).cast("int").as("is_dup"))
  }

  /** Near-dup pairs by exact Jaccard over word-bigram shingles.
    * Inverted-index join: explode shingles, pair docs sharing one, count
    * the intersection, derive the union from per-doc set sizes. All
    * integer arithmetic → bit-identical across engines.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    val toks = withShingles(docs).select(col("doc_id"), explode(col("sh")).as("s"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = toks.as("a")
      .join(toks.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n", "n1"), "doc1")
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n", "n2"), "doc2")
      .withColumn("jac",
        r4(col("inter").cast("double") / (col("n1") + col("n2") - col("inter"))))
      .filter(col("jac") >= threshold)
      .select("doc1", "doc2", "inter", "n1", "n2", "jac")
  }

  /** MinHash signatures + LSH banding → candidate pairs, verified with
    * exact shingle Jaccard. numHashes=64, bands=16 (r=4) targets
    * J ≈ 0.5+ candidates.
    *
    * Each shingle is hashed ONCE (variable-length string → long); the
    * permutation family re-hashes that fixed-width long, so the per-row
    * cost is 1 string hash + numHashes integer hashes instead of
    * numHashes string hashes (~10× cheaper at corpus scale).
    */
  def minhashLsh(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                 threshold: Double = 0.6): DataFrame = {
    val rows = numHashes / bands
    // the shingle table feeds three branches (signatures + both sides of
    // the verify join) — persist it instead of recomputing the regex
    // split + shingle build per branch
    val sets = withShingles(docs).persist()
    val toks = sets
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h0"))
    // Signature: min over shingles of h_p(shingle) for each permutation.
    // A 64-column min-aggregate makes Catalyst generate (and Janino
    // compile) a multi-second giant class; a mapGroups loop is 16M
    // integer mixes — milliseconds — with the same one-shuffle shape.
    val spark2 = docs.sparkSession
    import spark2.implicits._
    val nh = numHashes
    val sig = toks.as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (docId: Long, it: Iterator[(Long, Long)]) =>
        val mins = Array.fill(nh)(Long.MaxValue)
        it.foreach { case (_, h0) =>
          var p = 0
          while (p < nh) {
            var z = h0 ^ (p * 0x9E3779B97F4A7C15L)
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            z ^= z >>> 31
            if (z < mins(p)) mins(p) = z
            p += 1
          }
        }
        (docId, mins.toSeq)
      }
      .toDF("doc_id", "sig")
    // band key: hash of the band's slice of the signature
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map(bd =>
        hash(slice(col("sig"), bd * rows + 1, rows))): _*)).as(Seq("band", "bh")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    // verify candidates with exact Jaccard
    candidates
      .join(sets.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
      .join(sets.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jac", r4(col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter"))))
      .filter(col("jac") >= threshold)
      .select("doc1", "doc2", "jac")
  }

  /** Char-trigram Jaccard near-dup pairs with prefix filtering
    * (AllPairs/PPJoin family). A naive inverted-index self-join on char
    * trigrams is near-quadratic: frequent trigrams occur in every
    * document, so one hot token alone yields |corpus|² candidate rows.
    *
    * Prefix filter: order every doc's trigram set by ascending global
    * document frequency (ties by value — one canonical total order).
    * Jaccard(A,B) ≥ t implies |A∩B| ≥ ⌈t·|A|⌉, so the rarest
    * |A| − ⌈t·|A|⌉ + 1 tokens of each side must share an element —
    * only that prefix is indexed. Hot trigrams sit at the end of the
    * order and never enter the join; candidates are verified with the
    * exact set intersection. Same exact result, candidate space shrunk
    * from Σ df² over all tokens to Σ df² over rare-prefix tokens.
    */
  def ngramCharPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same gram construction as the oracle: distinct char trigrams
    val d = spread(docs).select(col("doc_id"),
      array_distinct(expr(
        "transform(sequence(1, char_length(text) - 2), i -> substring(text, i, 3))")).as("g"))
      .persist() // feeds the prefix index and both sides of the verify join
    val toks = d.select(col("doc_id"), explode(col("g")).as("s"))
    val dfreq = toks.groupBy("s").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("s"))
    val ranked = toks.join(dfreq, "s")
      .withColumn("rk", row_number().over(byRarity))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val prefix = ranked
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("doc_id", "s", "n")
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: t·|A| ≤ |B| and t·|B| ≤ |A| is necessary for J ≥ t
          col("b.n") >= ceil(lit(threshold) * col("a.n")) &&
          col("a.n") >= ceil(lit(threshold) * col("b.n")))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    cands
      .join(d.select(col("doc_id").as("doc1"), col("g").as("g1")), "doc1")
      .join(d.select(col("doc_id").as("doc2"), col("g").as("g2")), "doc2")
      .withColumn("inter", size(array_intersect(col("g1"), col("g2"))))
      .withColumn("jac", r4(col("inter").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("inter"))))
      .filter(col("jac") >= threshold)
      .select("doc1", "doc2", "jac")
  }

  /** 64-bit SimHash over word hashes; near-dup = hamming distance ≤ k.
    * Pairs are found by exact match on 4 16-bit blocks (pigeonhole: any
    * pair within hamming ≤ 3 of 64 bits shares at least one of 4 blocks)
    * — a groupBy join, not an all-pairs scan.
    */
  def simhash(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val w = explode(words(col("text")))
    val tok = spread(docs).select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    // 64 bit-count sum-aggregates blow up codegen (see minhashLsh); the
    // per-doc bit tally is a tiny mapGroups loop instead.
    val spark2 = docs.sparkSession
    import spark2.implicits._
    val sim = tok.as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (docId: Long, it: Iterator[(Long, Long)]) =>
        val counts = new Array[Int](64)
        it.foreach { case (_, h) =>
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
            bit += 1
          }
        }
        var sh = 0L
        var bit = 0
        while (bit < 64) {
          if (counts(bit) > 0) sh |= (1L << bit)
          bit += 1
        }
        (docId, sh)
      }
      .toDF("doc_id", "simhash")
    val blocks = sim.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(blk =>
        shiftright(col("simhash"), blk * 16).bitwiseAND(0xFFFFL)): _*)).as(Seq("blk", "bv")))
    val popcnt = (x: Column) => bit_count(x)
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        popcnt(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-dup pairs by embedding cosine similarity above a threshold.
    * Brute pairwise on a keyed subset; the scale path is Similarity.lshAnn
    * (bucketed). Cosine folds the vector in array order on both engines →
    * identical doubles before rounding.
    */
  def embedCosinePairs(embs: DataFrame, mod: Int = 5, threshold: Double = 0.5): DataFrame = {
    val e = embs.filter(col("vec_id") % mod === 0)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val withNorm = e.withColumn("nrm", vecNorm(col("v")))
    withNorm.as("a").join(withNorm.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        r4(vecDot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
