package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end ingestion of the reference's metrics bundles: a .tar.gz
  * (or .gz.tar) containing wide metric CSVs under `<workload>/reshape/`
  * (metrics_advisor.py:114-120 untars to a temp dir and globs the CSVs).
  *
  * The tar walk is a minimal ustar reader (512-byte headers, octal size
  * field) — only extraction of *.csv entries is needed. Extraction is a
  * driver-side, one-pass streaming step (bundles are small: metadata and
  * metric series); the heavy lifting stays in the Spark melt that
  * follows.
  */
object MetricsTar {

  /** InputStream.skip returns 0 at EOF (never -1), so a bare skip loop
    * spins forever on a truncated archive; a zero-progress skip falls
    * back to a blocking read, which does signal EOF.
    */
  private def skipFully(in: DataInputStream, n: Long): Unit = {
    var toSkip = n
    while (toSkip > 0) {
      val s = in.skip(toSkip)
      if (s > 0) toSkip -= s
      else {
        if (in.read() < 0) throw new EOFException("truncated tar archive")
        toSkip -= 1
      }
    }
  }

  /** Extract `*.csv` members under a `reshape/` directory to a temp dir;
    * returns the directory. AppleDouble `._*` entries are skipped.
    */
  def extractCsvs(tarGzPath: String, subdir: String = "reshape"): Path = {
    val out = Files.createTempDirectory("graft_metrics_tar")
    val in = new DataInputStream(new BufferedInputStream(
      new GZIPInputStream(new FileInputStream(tarGzPath), 1 << 16), 1 << 16))
    val header = new Array[Byte](512)
    try {
      var done = false
      while (!done) {
        // EOF at a HEADER boundary is a normal end-of-archive (some
        // writers omit the two zero blocks); EOF inside an entry's data
        // or padding means the archive is truncated and must propagate
        // — silently returning partial data would feed the advisor an
        // incomplete bundle with no warning
        val gotHeader =
          try { in.readFully(header); true }
          catch { case _: EOFException => false }
        if (!gotHeader || header.forall(_ == 0)) done = true
        else {
          val name = new String(header, 0, 100, "US-ASCII").takeWhile(_ != 0)
          val sizeStr = new String(header, 124, 12, "US-ASCII")
            .takeWhile(c => c != 0 && c != ' ').trim
          val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
          val typeFlag = header(156).toChar
          val base = name.split('/').lastOption.getOrElse("")
          val wanted = (typeFlag == '0' || typeFlag == 0.toChar) &&
            name.contains(s"/$subdir/") && base.endsWith(".csv") &&
            !base.startsWith("._")
          if (wanted) {
            val target = out.resolve(base)
            // entries are flattened by basename: a collision (same CSV
            // name under two workload dirs) would silently drop one
            // workload's data — fail loudly instead
            if (Files.exists(target))
              throw new IllegalStateException(
                s"duplicate CSV basename '$base' in $tarGzPath — entries from " +
                  "different workload dirs would overwrite each other")
            val buf = new Array[Byte](size.toInt)
            in.readFully(buf)
            Files.write(target, buf, StandardOpenOption.CREATE_NEW)
          } else {
            skipFully(in, size)
          }
          skipFully(in, (512 - (size % 512)) % 512)
        }
      }
    } finally in.close()
    out
  }

  /** Bundle → long signals (name, node, tsec, value). */
  def read(spark: SparkSession, tarGzPath: String, minSamples: Int = 20): DataFrame = {
    val dir = extractCsvs(tarGzPath)
    MetricsCsv.read(spark, dir.toString, minSamples)
  }
}
