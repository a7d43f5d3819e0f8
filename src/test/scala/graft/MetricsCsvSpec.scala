package graft

import graft.sources.MetricsCsv
import java.nio.file.Files

class MetricsCsvSpec extends SparkTestBase {
  import spark.implicits._

  test("reads wide reshape CSVs into long signals with min-sample gate") {
    val dir = Files.createTempDirectory("metrics_csv").toFile
    val f1 = new java.io.File(dir, "node_cpu:by_instance.csv")
    val rows = (0 until 25).map(i => s"${1640588307 + i * 15},${i * 1.5},${i * 2.5}")
    // NaN / empty cells are dropped on ingest (the reference's dropna):
    // one extra row carrying only junk must change nothing downstream
    val junk = s"${1640588307 + 25 * 15},NaN,"
    Files.writeString(f1.toPath,
      ("timestamp,host1:9100,host2:9100" +: rows :+ junk).mkString("\n"))
    // a file below the sample gate
    val f2 = new java.io.File(dir, "tiny.csv")
    Files.writeString(f2.toPath, "timestamp,h\n1,2\n3,4")

    val out = MetricsCsv.read(spark, dir.getAbsolutePath, minSamples = 20)
    val names = out.select("name").distinct().as[String].collect().toSet
    assert(names == Set("node_cpu:by_instance"))
    assert(out.count() == 50)
    val one = out.filter("node = 'host1:9100' AND tsec = 1640588307")
      .select("value").as[Double].head()
    assert(one == 0.0)
  }

  test("Main.run produces a markdown report from a CSV bundle dir") {
    val dir = Files.createTempDirectory("metrics_cli").toFile
    // an objective signal with a step change plus two candidates; hourly
    // points across 4 days so the advisor grid has substance
    val hours = 0 until 96
    def series(f: Int => Double) = hours.map(i => f(i))
    val ts = hours.map(i => 1640563200L + i * 3600L)
    val obj = series(i => if (i < 48) 10.0 + (i % 5) else 80.0 + (i % 7))
    val cand = series(i => if (i < 48) 5.0 + (i % 3) else 40.0 + (i % 4))
    val flat = series(_ => 7.0)
    for ((nm, vals) <- Seq("qps" -> obj, "cpu" -> cand, "disk" -> flat)) {
      val rows = ts.zip(vals).map { case (t, v) => s"$t,$v" }
      Files.writeString(new java.io.File(dir, s"$nm.csv").toPath,
        ("timestamp,n0" +: rows).mkString("\n"))
    }
    val report = Main.run(spark, dir.getAbsolutePath, objNames = Seq("qps"))
    assert(report.startsWith("# Metrics advisor report"))
    assert(report.contains("| bucket |"))
    // the reference's deliverable also carries the normalized series of
    // every plotted signal, and its 0.005 variance gate must keep the
    // flat candidate out of the whole report
    assert(report.contains("## Normalized series per anomalous bucket"))
    assert(!report.contains("disk"), "flat signal leaked into the report")
  }
}
