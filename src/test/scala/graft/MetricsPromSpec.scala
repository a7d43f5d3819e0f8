package graft

import graft.sources.MetricsProm
import java.nio.file.Files

class MetricsPromSpec extends SparkTestBase {
  import spark.implicits._

  test("parses the exposition format: labels, timestamps, specials, comments") {
    val dir = Files.createTempDirectory("prom").toFile
    val f = new java.io.File(dir, "scrape.prom")
    Files.writeString(f.toPath,
      """# HELP http_requests_total The total number of HTTP requests.
        |# TYPE http_requests_total counter
        |http_requests_total{method="post",instance="n0"} 1027 1395066363000
        |http_requests_total{method="get",instance="n1"} 3 1395066363000
        |node_load1 0.5
        |up{instance="n0"} 1
        |bad_value{instance="n0"} notanumber
        |temp_kelvin{instance="n2"} +Inf 1395066364000
        |
        |""".stripMargin)
    val out = MetricsProm.signals(spark, dir.getAbsolutePath, defaultTsec = 42L)
      .orderBy("name", "node").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    assert(out.length == 5, out.mkString("; "))
    // labelled counter rows: node from the instance label, ts = ms div 1000
    assert(out.contains(("http_requests_total", "n0", 1395066363L, 1027.0)))
    assert(out.contains(("http_requests_total", "n1", 1395066363L, 3.0)))
    // no labels → empty node; no timestamp → defaultTsec
    assert(out.contains(("node_load1", "", 42L, 0.5)))
    assert(out.contains(("up", "n0", 42L, 1.0)))
    // +Inf is a valid sample per spec; unparseable values are dropped
    val inf = out.find(_._1 == "temp_kelvin").get
    assert(inf._4.isPosInfinity && inf._3 == 1395066364L)
    assert(!out.exists(_._1 == "bad_value"))
  }

  test("node label key is anchored to a label boundary") {
    val lines = Seq(
      // a label SUFFIXED with the key must not be misread as the node
      """reqs{myinstance="wrong"} 1 1000000""",
      // ...and must not shadow the real key when both are present
      """reqs{myinstance="wrong",instance="right"} 2 1000000""",
      // key first in the label list (start-of-labels anchor)
      """reqs{instance="first",job="j"} 3 1000000""",
      // key mid-list after a comma, with exposition-legal spacing
      """reqs{job="j", instance="mid"} 4 1000000""").toDF("value")
    val out = MetricsProm.parse(lines).orderBy("value")
      .collect().map(r => (r.getDouble(3), r.getString(1)))
    assert(out.toSeq == Seq((1.0, ""), (2.0, "right"), (3.0, "first"), (4.0, "mid")))
  }

  test("parsed signals feed the grid ops directly") {
    val lines = (0 until 8).map(i =>
      s"""cpu_busy{instance="h1"} ${i * 1.5} ${(1000L + i * 900L) * 1000L}""")
      .toDF("value")
    val sig = MetricsProm.parse(lines)
    val grid = graft.operators.TimeSeries.resample(sig)
    assert(grid.count() > 0)
    assert(sig.columns.toSeq == Seq("name", "node", "tsec", "value"))
  }
}
