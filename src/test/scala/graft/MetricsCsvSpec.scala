package graft

import graft.sources.MetricsCsv
import java.nio.file.Files

class MetricsCsvSpec extends SparkTestBase {
  import spark.implicits._

  test("reads wide reshape CSVs into long signals with min-sample gate") {
    val dir = Files.createTempDirectory("metrics_csv").toFile
    val f1 = new java.io.File(dir, "node_cpu:by_instance.csv")
    val rows = (0 until 25).map(i => s"${1640588307 + i * 15},${i * 1.5},${i * 2.5}")
    Files.writeString(f1.toPath,
      ("timestamp,host1:9100,host2:9100" +: rows).mkString("\n"))
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
}
