package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, MediaDecoder}

/** Pins the generic tiled co-bucket kernel (Dedup.bucketPairs) and its
  * three production consumers (minhashLsh bands, simhash/phash
  * pigeonhole blocks, passage windows): tiling a MEGA-BUCKET's pair
  * triangle across salts changes the task decomposition only — the
  * pair set, payload pairing and every downstream verified row are
  * identical to the self-equijoin it replaced (the r10 verdict-#1
  * port of the inCellPairs contract to arbitrary bucket keys).
  */
class BucketPairsSpec extends SparkTestBase {
  import spark.implicits._

  test("kernel pair set equals the self-equijoin on a mega-bucket, salted and not") {
    // one hot bucket (60 rows) + two small ones; payload = 100·id so
    // payload pairing is checkable
    val rows = ((0 until 60).map(i => ("hot", i.toLong, i * 100L)) ++
      Seq(("a", 900L, 1L), ("a", 901L, 2L), ("b", 950L, 3L)))
      .toDF("bkey", "id", "pay")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "pay1", "id2", "pay2")
        .as[(Long, Long, Long, Long)].collect().toSet
    val joined = rows.as("x").join(rows.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("x.pay").as("pay1"),
        col("y.id").as("id2"), col("y.pay").as("pay2"))
    val expect = asSet(joined)
    assert(expect.size == 60 * 59 / 2 + 1)
    for (cap <- Seq(1 << 30, 7)) { // unsalted AND 9-salt tiled paths
      val got = asSet(Dedup.bucketPairs(rows, saltCap = cap))
      assert(got == expect, s"saltCap=$cap")
      // exactly once: list length == set size
      val n = Dedup.bucketPairs(rows, saltCap = cap).count()
      assert(n == expect.size.toLong, s"saltCap=$cap pair multiplicity")
    }
  }

  test("duplicate ids in one bucket never self-pair (join semantics)") {
    val rows = Seq(("k", 1L, 10L), ("k", 1L, 20L), ("k", 2L, 30L))
      .toDF("bkey", "id", "pay")
    for (cap <- Seq(1 << 30, 1)) {
      val got = Dedup.bucketPairs(rows, saltCap = cap)
        .select("id1", "id2").as[(Long, Long)].collect()
      assert(got.forall { case (a, b) => a < b }, s"saltCap=$cap: $got")
      assert(got.count(_ == (1L, 2L)) == 2, s"saltCap=$cap: $got")
    }
  }

  test("minhashLsh pairs are unchanged by band-bucket tiling") {
    // a near-verbatim family: one template + per-doc timestamp line —
    // survives exact dedup, collides on most band slices (the
    // 30%-mirrored-crawl shape); plus genuinely distinct docs
    val tpl = "the quick brown fox jumps over the lazy dog again and " +
      "again while the subscribe banner asks you to follow for updates "
    val docs = ((0 until 40).map(i => (i.toLong, tpl + s"retrieved at 2026 08 $i")) ++
      Seq((100L, "completely different content about spark catalyst plans"),
        (101L, "another unrelated document mentioning parquet footers")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSet
    // the family is all-pairs near-dup at jac >= 0.6
    assert(pairs.size >= 40 * 39 / 2, s"got ${pairs.size}")
    assert(pairs.forall { case (d1, d2, j) => d1 < 40 && d2 < 40 && j >= 0.6 })
  }

  test("phashPairs via a hot-block decoder matches the exact hamming truth") {
    // custom decoder: phash = block0 constant (the hot pigeonhole
    // bucket — every doc collides there), upper blocks spread by id
    val hotDecoder: MediaDecoder = new MediaDecoder {
      override def decode(payload: Array[Byte]): MediaDecoder.Meta =
        MediaDecoder.Stub.decode(payload)
      override def phash(payload: Array[Byte]): Long = {
        val id = new String(payload, "UTF-8").toLong
        (id << 16) | 0x00AAL // block0 identical for ALL docs
      }
    }
    val n = 50
    val docs = (0 until n).map(i => (i.toLong, i.toString))
      .toDF("doc_id", "text")
    val got = Multimodal.phashPairs(docs, maxDist = 3, decoder = hotDecoder)
      .as[(Long, Long, Long)].collect().toSet
    // brute-force truth
    val ph = (0 until n).map(i => (i.toLong << 16) | 0x00AAL)
    val expect = (for {
      i <- 0 until n; j <- i + 1 until n
      d = java.lang.Long.bitCount(ph(i) ^ ph(j)) if d <= 3
    } yield (i.toLong, j.toLong, d.toLong)).toSet
    assert(expect.nonEmpty)
    assert(got == expect)
  }

  test("simhash pairs equal the block self-equijoin they replaced") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    val docs = ((0 until 12).map(i => (i.toLong, base + s"tail $i")) :+
      (99L, "totally different words entirely unrelated to the others"))
      .toDF("doc_id", "text")
    val got = Dedup.simhash(docs, maxHamming = 16)
      .select("doc1", "doc2", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    // truth: brute-force hamming over candidate pairs sharing a block
    val ph = Dedup.simhash(docs, maxHamming = 64) // all block-sharing pairs
      .as[(Long, Long, Long)].collect().toSet
    val expect = ph.filter(_._3 <= 16)
    assert(expect.nonEmpty, s"block-sharing pairs: $ph")
    assert(got == expect, s"got $got expect $expect")
    // the near-identical family must block-collide; the outlier never
    assert(ph.exists { case (a, b, _) => a < 12 && b < 12 }, s"$ph")
  }
}
