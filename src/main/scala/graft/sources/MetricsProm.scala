package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prometheus text exposition format → long signals — the third ingest
  * shape next to reshape-CSV (MetricsCsv/MetricsTar) and the events
  * table: fleets that already scrape /metrics can feed their dumps to
  * every operator here without a conversion hop.
  *
  * Format (public: Prometheus exposition format v0.0.4):
  * {{{
  *   # HELP http_requests_total The total number of HTTP requests.
  *   # TYPE http_requests_total counter
  *   http_requests_total{method="post",instance="n0"} 1027 1395066363000
  * }}}
  * `# ...` comment lines and blanks are skipped; the optional trailing
  * timestamp is epoch MILLISECONDS; `+Inf`/`-Inf`/`NaN` are valid
  * sample values per spec.
  *
  * Scale shape: one `spark.read.text` over the scraped dumps and a
  * single regex-projection scan (whole-stage codegen, no UDFs, no
  * shuffle) — line order never matters, so the parse is partition- and
  * ingest-order-invariant.
  */
object MetricsProm {

  def signals(spark: SparkSession, path: String,
              nodeLabel: String = "instance",
              defaultTsec: Long = 0L): DataFrame =
    parse(spark.read.text(path), nodeLabel, defaultTsec)

  /** Parse a DataFrame of raw exposition lines (column `value`).
    * `nodeLabel` names the label that becomes the signal's node
    * (empty node when absent — single-target scrapes have none). The
    * label key is anchored to a label boundary (start-of-labels or a
    * comma), so a label merely SUFFIXED with the key (`myinstance=`)
    * is never misread as the node (r5 ADVICE fix).
    *
    * Known limitation (documented, not handled): the exposition spec
    * allows `\"` and `}` inside quoted label VALUES; this single-pass
    * regex projection reads such values up to the first unescaped-
    * looking quote/brace. Telemetry label values are overwhelmingly
    * plain tokens; a corpus that needs escaped quotes should pre-
    * normalize or extend the parse with a real tokenizer.
    */
  def parse(lines: DataFrame, nodeLabel: String = "instance",
            defaultTsec: Long = 0L): DataFrame = {
    val body = lines.select(trim(col("value")).as("line"))
      .filter(col("line") =!= "" && !col("line").startsWith("#"))
    val vstr = split(col("rest"), "\\s+").getItem(0)
    body
      .withColumn("name", regexp_extract(col("line"), "^([a-zA-Z_:][a-zA-Z0-9_:]*)", 1))
      .withColumn("labels", regexp_extract(col("line"), "^[^{\\s]+\\{([^}]*)\\}", 1))
      .withColumn("rest", trim(regexp_replace(col("line"), "^[^{\\s]+(\\{[^}]*\\})?", "")))
      .withColumn("v",
        when(vstr === "+Inf", lit(Double.PositiveInfinity))
          .when(vstr === "-Inf", lit(Double.NegativeInfinity))
          .otherwise(vstr.cast("double")))
      .withColumn("tsms", split(col("rest"), "\\s+").getItem(1).cast("long"))
      .withColumn("node",
        regexp_extract(col("labels"),
          "(?:^|,)\\s*" + java.util.regex.Pattern.quote(nodeLabel) + "=\"([^\"]*)\"", 1))
      .filter(col("name") =!= "" && col("v").isNotNull)
      .select(col("name"), col("node"),
        coalesce(expr("tsms div 1000"), lit(defaultTsec)).as("tsec"),
        col("v").as("value"))
  }
}
