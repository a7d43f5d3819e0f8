package graft

/** Temporary measurement (guide §1): per-call cost of spark.read.parquet
  * schema inference vs an explicit-schema read — the per-query footer
  * job every Tables.table call pays inside the bench's timed region.
  */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tables = Seq("lineitem", "orders", "events", "documents")
    // JIT warm
    (1 to 5).foreach(_ =>
      tables.foreach(t => spark.read.parquet(s"$dir/$t.parquet").schema))
    val n = 50
    val t0 = System.nanoTime()
    (1 to n).foreach { _ =>
      tables.foreach(t => spark.read.parquet(s"$dir/$t.parquet").schema)
    }
    println(f"inferred  avg ${(System.nanoTime() - t0) / 1e6 / (n * 4)}%.2f ms/call")
    val schemas = tables.map(t => t -> spark.read.parquet(s"$dir/$t.parquet").schema).toMap
    val t1 = System.nanoTime()
    (1 to n).foreach { _ =>
      tables.foreach(t => spark.read.schema(schemas(t)).parquet(s"$dir/$t.parquet").schema)
    }
    println(f"explicit  avg ${(System.nanoTime() - t1) / 1e6 / (n * 4)}%.2f ms/call")
    // and the end-to-end effect on a cheap query: count after resolution
    val t2 = System.nanoTime()
    (1 to 20).foreach(_ => spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("max(o_orderkey)").collect())
    println(f"count inferred  ${(System.nanoTime() - t2) / 1e6 / 20}%.1f ms")
    val t3 = System.nanoTime()
    (1 to 20).foreach(_ => spark.read.schema(schemas("orders")).parquet(s"$dir/orders.parquet")
      .selectExpr("max(o_orderkey)").collect())
    println(f"count explicit  ${(System.nanoTime() - t3) / 1e6 / 20}%.1f ms")
    spark.stop()
  }
}
