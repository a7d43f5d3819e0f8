package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Dedup}

/** THE SKEW GATE (r11 verdict #2): runs a manufactured hot-bucket /
  * hot-cell corpus through the three salted tiled kernels
  * (Dedup.bucketPairs, Clustering.inCellPairs, Clustering.inCellTopK)
  * with a task-level listener attached and ASSERTS the kernel stage
  * actually ran wide — task count > 1 and no single task carrying the
  * stage. The r11 AQE finding proved plan-shape regressions arrive
  * WITHOUT code changes (byte-based partition coalescing folded a
  * compute-dense sub-MB exchange into ONE task); until this spec, only
  * PLANS prose would have noticed a re-collapse. Mutation-verified at
  * introduction: with bucketPairs' explicit `repartition(parts, key)`
  * replaced by a bare key repartition, the bucketPairs case fails
  * (AQE coalesces the 16-byte fan-out rows to a single task).
  *
  * The session is the shared test session (AQE on, DEFAULT 1 MB
  * minPartitionSize — the exact configuration that collapses an
  * unpinned exchange), with shuffle.partitions raised to 8 for the
  * duration so "wide" is distinguishable from local[2]'s floor.
  */
class KernelWidthSpec extends SparkTestBase {
  import spark.implicits._

  private val WIDTH = 8
  // a fair hash of tiles over 8 partitions can still double up; 0.6
  // fails only on genuine collapse (a single task ≥ 60% of the stage)
  private val MAX_SHARE = 0.6

  private def withListener(body: TaskSkewListener => Unit): Unit = {
    val listener = new TaskSkewListener
    spark.sparkContext.addSparkListener(listener)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", WIDTH.toString)
    try body(listener)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.sparkContext.removeSparkListener(listener)
      Caches.release()
    }
  }

  private def assertWide(stats: Seq[StageStat], what: String): Unit = {
    println(s"WIDTHDBG $what: " + stats.sortBy(-_.sumMs).take(5).mkString(" | "))
    assert(stats.nonEmpty, s"$what: no stages observed")
    val heavy = stats.maxBy(_.sumMs)
    assert(heavy.nTasks > 1,
      s"$what: kernel stage collapsed to ${heavy.nTasks} task(s) — $heavy")
    assert(heavy.maxShare <= MAX_SHARE,
      s"$what: one task carries ${heavy.maxShare} of the stage — $heavy")
  }

  test("bucketPairs runs a mega-bucket wide under default AQE") {
    withListener { listener =>
      // one bucket holding the whole corpus: the exact shape a band
      // slice shared by a near-verbatim family produces. Sized so the
      // kernel stage (32M pair enumerations) dominates every other
      // stage by sum AND the fan-out stays far under AQE's 64 MB
      // advisory target — an unpinned exchange WOULD coalesce to one
      // task (the mutation this spec was verified against).
      val n = 8000
      val rows = (0 until n).map(i => ("hot", i.toLong, 0L))
        .toDF("bkey", "id", "pay")
      listener.reset()
      val cnt = Dedup.bucketPairs(rows, saltCap = 512).count()
      assert(cnt == n.toLong * (n - 1) / 2)
      assertWide(listener.settled(), "bucketPairs")
    }
  }

  test("inCellPairs runs a mega-cell wide under default AQE") {
    withListener { listener =>
      val n = 1500
      val rng = new scala.util.Random(7L)
      val av = (0 until n).map { i =>
        val v = Seq.fill(16)(rng.nextDouble() - 0.5)
        (0, i.toLong, v, math.sqrt(v.map(x => x * x).sum))
      }.toDF("cell", "vec_id", "v", "nrm")
      listener.reset()
      val cnt = Clustering.inCellPairs(av, threshold = -2.0, saltCap = 128)
        .count()
      assert(cnt == n.toLong * (n - 1) / 2)
      assertWide(listener.settled(), "inCellPairs")
    }
  }

  test("per-signal kernel reuses the pinned grid width under default AQE") {
    withListener { listener =>
      // compute-dense sub-MB per-signal grid — the r12 SignalKernel
      // class: 200 series × 60 samples is ~200 KB on the wire while
      // each group runs the 100-permutation e-divisive test. The old
      // typed groupByKey(tuple) planned its own opaque-keyed exchange
      // here, which default AQE coalesced to ONE task (measured:
      // ad_edivisive 0.80 s single-task kernel, maxShare 1.00); the
      // relational grouping must instead reuse the explicit AQE-exempt
      // (name, node) repartition below and run the kernel wide.
      val n = 200; val len = 60
      val rows = for (s <- 0 until n; i <- 0 until len)
        yield (f"sig$s%03d", "u0", i.toLong * 900L,
          math.sin(i * 0.7) * 10 + (if (i > len / 2) s % 7 else 0))
      val grid = rows.toDF("name", "node", "tsb", "gval")
        .repartition(WIDTH, col("name"), col("node"))
      listener.reset()
      operators.ChangePoints.eDivisive(grid, medianW = 5).count()
      assertWide(listener.settled(), "perSignal")
    }
  }

  test("inCellTopK runs a mega-cell wide under default AQE") {
    withListener { listener =>
      val n = 1500
      val rng = new scala.util.Random(11L)
      val av = (0 until n).map { i =>
        val v = Seq.fill(16)(rng.nextDouble() - 0.5)
        (0, i.toLong, v, math.sqrt(v.map(x => x * x).sum))
      }.toDF("cell", "vec_id", "v", "nrm")
      listener.reset()
      val cnt = Clustering.inCellTopK(av, k = 5, saltCap = 128).count()
      assert(cnt == n.toLong * 5)
      assertWide(listener.settled(), "inCellTopK")
    }
  }
}
