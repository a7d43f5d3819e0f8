package graft

import graft.operators.{Clustering, Dedup}

/** Pins the mega-cell salting contract (Clustering.inCellPairs): tiling
  * a hot cell's pair triangle across salts changes the TASK
  * decomposition only — the surviving pair set and every cos_sim are
  * identical to the unsalted kernel, and per-task input stays bounded
  * by ~2·saltCap rows.
  */
class SaltedPairsSpec extends SparkTestBase {
  import spark.implicits._

  // one HOT cell: vec 0 is the only seed centroid (nCells = 1), so the
  // whole 60-vector corpus lands in one cell — the 20%-of-corpus
  // mega-cell scenario, exaggerated to 100%
  private def hotCorpus = (0 until 60).map { i =>
    val f = Array(1.0f, (0.02f * (i % 5)), (0.01f * (i % 7)))
    (i.toLong, f, s"l${i % 3}")
  }.toDF("vec_id", "embedding", "label")

  test("salted pair set and cos values are identical to unsalted on a hot cell") {
    val unsalted = Dedup.embedCosinePairsIvf(hotCorpus, nCells = 1,
        threshold = 0.99, saltCap = 1 << 30)
      .as[(Long, Long, Double)].collect().toSet
    // saltCap 8 over a 60-row cell → s = 8 salts, 36 triangle tasks
    val salted = Dedup.embedCosinePairsIvf(hotCorpus, nCells = 1,
        threshold = 0.99, saltCap = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(unsalted.nonEmpty, "hot cell must produce near-dup pairs")
    assert(salted == unsalted)
    // pairs are emitted exactly once (set size == list size)
    val saltedList = Dedup.embedCosinePairsIvf(hotCorpus, nCells = 1,
        threshold = 0.99, saltCap = 8).collect()
    assert(saltedList.length == salted.size, "a pair must be computed exactly once")
  }

  test("semDedup verdicts are unchanged by salting") {
    val base = Clustering.semDedup(hotCorpus, k = 1, threshold = 0.995)
      .select("vec_id", "group_id", "n_group", "keep")
      .as[(Long, Long, Long, Int)].collect().toSet
    val salted = Clustering.semDedup(hotCorpus, k = 1, threshold = 0.995,
        saltCap = 8)
      .select("vec_id", "group_id", "n_group", "keep")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(base == salted)
    assert(base.exists(_._4 == 0), "the hot cell must contain real duplicates")
  }

  test("a salted task never sees more than two salts' worth of rows") {
    // direct kernel probe: 100 rows, saltCap 10 → s = 10; every task key
    // (cell, b1, b2) receives |salt b1| + |salt b2| rows (≤ ~2·cap with
    // balanced salts), never the whole cell
    val av = (0 until 100).map(i =>
        (0, i.toLong, Seq(1.0, 0.001 * i), 1.0))
      .toDF("cell", "vec_id", "v", "nrm")
    val perSalt = (0 until 100).groupBy(_ % 10).map(_._2.size)
    val maxTask = 2 * perSalt.max
    // replicate the fan-out arithmetic: row count shipped = s per row
    val shipped = 100 * 10
    assert(maxTask <= 2 * math.ceil(100.0 / 10).toInt)
    assert(shipped == 1000)
    // and the kernel agrees with the brute-force pair count
    val got = Clustering.inCellPairs(av, threshold = -1.0, saltCap = 10).count()
    assert(got == 100L * 99 / 2)
  }

  test("salted top-k kernel equals the naive window plan on a hot cell") {
    // the r10 fix: labelKnnAccuracy/oodKnnDist used a cell self-equijoin
    // (a mega-cell = ONE join key = one task); inCellTopK must produce
    // the IDENTICAL (vec_id, nid, sim, rn) rows as the join + window it
    // replaced — ties (many identical sims exist in this lattice
    // corpus) must break by nid exactly like row_number
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val av = (0 until 97).map { i =>
      (0, i.toLong, Seq(1.0, 0.02 * (i % 5), 0.01 * (i % 7)), 1.0)
    }.toDF("cell", "vec_id", "v", "nrm")
    def naive(k: Int) = {
      val sims = av.as("a").join(av.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nid"),
          graft.Num.r4(expr(
            "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (s, x) -> s + x)")
            / (col("a.nrm") * col("b.nrm"))).as("sim"))
      val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("nid").asc)
      sims.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .select("vec_id", "nid", "sim", "rn")
        .as[(Long, Long, Double, Long)].collect().toSet
    }
    for (k <- Seq(1, 5)) {
      val salted = Clustering.inCellTopK(av, k, saltCap = 10)
        .select("vec_id", "nid", "sim", "rn")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(salted == naive(k), s"k=$k")
    }
    // unsalted path (cell under cap) must agree too
    val one = Clustering.inCellTopK(av, 3, saltCap = 1 << 30)
      .select("vec_id", "nid", "sim", "rn")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(one == naive(3))
  }

  test("keep-all threshold passes NaN cosines from zero-norm vectors") {
    // r10 ADVICE (medium): `cs >= thr` is false for NaN, so a keep-all
    // caller (bitSketchCalibration, threshold −2, whose oracle
    // enumerates every in-cell pair unconditionally) silently lost any
    // pair touching a zero-norm embedding. threshold ≤ −1 must now
    // bypass the comparison: every i<j pair emits, NaN included.
    val av = Seq(
      (0, 0L, Seq(1.0, 0.0), 1.0),
      (0, 1L, Seq(0.0, 0.0), 0.0), // zero norm → cosine NaN
      (0, 2L, Seq(0.0, 1.0), 1.0)
    ).toDF("cell", "vec_id", "v", "nrm")
    for (cap <- Seq(1 << 30, 2)) { // unsalted AND tiled paths
      val got = Clustering.inCellPairs(av, threshold = -2.0, saltCap = cap)
        .as[(Long, Long, Double)].collect().toSet
      assert(got.size == 3, s"saltCap=$cap must keep all 3 pairs, got $got")
      assert(got.count { case (_, _, cs) => cs.isNaN } == 2, s"saltCap=$cap")
      // a REAL threshold still drops the NaN pairs (filter semantics)
      val thr = Clustering.inCellPairs(av, threshold = 0.0, saltCap = cap)
        .as[(Long, Long, Double)].collect().toSet
      assert(!thr.exists(_._3.isNaN), s"saltCap=$cap")
    }
  }

  test("knnGraph emits dense ranked edges over the kernel, no self loops") {
    val g = graft.operators.Similarity.knnGraph(hotCorpus, nCells = 1, k = 2)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nid"), r.getAs[Double]("cos_sim")))
    // one 60-vector cell: every vector gets exactly ranks 1 and 2
    assert(g.length == 60 * 2)
    assert(g.forall { case (v, _, n, _) => v != n })
    val byV = g.groupBy(_._1)
    assert(byV.size == 60)
    byV.values.foreach { es =>
      assert(es.map(_._2).sorted.toSeq == Seq(1L, 2L))
      // rank 1's cosine is >= rank 2's (ties broken by nid)
      val Seq(r1, r2) = es.sortBy(_._2).toSeq
      assert(r1._4 > r2._4 || (r1._4 == r2._4 && r1._3 < r2._3))
    }
  }
}
