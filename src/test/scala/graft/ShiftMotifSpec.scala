package graft

import graft.operators.{Anomaly, Sampling, TimeSeries}
import org.apache.spark.sql.functions._

/** Semantic pins for the level-shift detector, the SAX motif miner,
  * and curriculum phase assignment (oracle equivalence is proven by
  * the driver gate; these pin behavior on constructed inputs).
  */
class ShiftMotifSpec extends SparkTestBase {
  import spark.implicits._

  test("level shift fires at a clean step and nowhere else") {
    // step at index 15 with ±0.01 jitter so the MAD is nonzero; the
    // shift is ~9 units against a ~0.01-scale MAD → far over threshold
    val pts = (0 until 30).map { i =>
      val base = if (i < 15) 1.0 else 10.0
      ("sig", "n0", i * 900L, base + (i % 3) * 0.01)
    }
    val out = Anomaly.levelShift(pts.toDF("name", "node", "tsb", "gval"))
      .collect()
    assert(out.nonEmpty, "step not detected")
    // every flagged point must sit where the before/after windows
    // straddle the step (tsb in [11·900, 19·900])
    assert(out.forall { r =>
      val t = r.getAs[Long]("tsb") / 900L; t >= 10 && t <= 19
    }, s"flags outside the step region: ${out.map(_.getAs[Long]("tsb") / 900L).mkString(",")}")
    // a flat-jitter signal with no step yields nothing
    val flat = (0 until 30).map(i => ("f", "n0", i * 900L, 1.0 + (i % 3) * 0.01))
    assert(Anomaly.levelShift(flat.toDF("name", "node", "tsb", "gval")).isEmpty)
  }

  test("sax motif finds the repeating block oscillation") {
    // 4-point blocks alternating +1/−1 → symbols alternate d/a →
    // every 4-word is adad or dada
    val pts = (0 until 64).map { i =>
      ("osc", "n0", i * 900L, if ((i / 4) % 2 == 0) 1.0 else -1.0)
    }
    val row = TimeSeries.motifSax(pts.toDF("name", "node", "tsb", "gval"))
      .collect().head
    val motif = row.getAs[String]("motif")
    assert(motif == "adad" || motif == "dada", s"motif = $motif")
    assert(row.getAs[Double]("support") > 0.4)
  }

  test("curriculum phases are balanced and ordered by score") {
    val docs = (1 to 20).map(i => (i.toLong, (21 - i) / 100.0))
      .toDF("doc_id", "sc")
    val out = Sampling.curriculum(docs, col("doc_id"), col("sc"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("phase"), r.getAs[Double]("sc"))).toMap
    // 20 docs / 10 phases → 2 per phase; best scores (doc 1, 2) in
    // phase 1, worst (19, 20) in phase 10
    val sizes = out.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.values.forall(_ == 2), s"unbalanced: $sizes")
    assert(out(1L)._1 == 1 && out(2L)._1 == 1)
    assert(out(19L)._1 == 10 && out(20L)._1 == 10)
    // shuffle keys are 8 hex chars and deterministic across runs
    val again = Sampling.curriculum(docs, col("doc_id"), col("sc"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("shuffle_key")).toMap
    assert(again.values.forall(_.matches("[0-9a-f]{8}")))
  }
}
