package graft

import org.apache.spark.sql.functions._

/** Seeded randomized trials pinning the native codegen kernels to their
  * reference formulations across adversarial inputs — duplicates-free
  * sorted sets of varying sizes, shared prefixes, empty sides, unicode.
  */
class KernelPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("sortedIntersectCount equals array_intersect size over 200 random sorted set pairs") {
    val rng = new scala.util.Random(20260813L)
    // includes a supplementary-plane char (🎉): UTF-8 byte order (what
    // the kernel compares and sort_array produces) differs from Java's
    // UTF-16 order for those vs BMP chars ≥ U+E000 — sorting MUST go
    // through sort_array, exactly as the production operators do
    val alphabet = Vector("a", "b", "c", "aa", "ab", "ba", "zz", "日本", "ß",
      "x1", "x2", "!", " ", "🎉", "�")
    val cases = (0 until 200).map { i =>
      def randSet() = (0 until rng.nextInt(12))
        .map(_ => alphabet(rng.nextInt(alphabet.size))).distinct
      (i.toLong, randSet(), randSet())
    }
    val df = cases.toDF("id", "a0", "b0")
      .withColumn("a", sort_array(col("a0")))
      .withColumn("b", sort_array(col("b0")))
      .withColumn("native",
        org.apache.spark.sql.graft.VectorExpressions.sortedIntersect(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("native") =!= col("builtin")).collect()
    assert(bad.isEmpty, s"kernel disagrees with builtin: ${bad.mkString(";")}")
  }

  test("sortedIntersectCount is symmetric and bounded by min set size") {
    val rng = new scala.util.Random(7L)
    val cases = (0 until 100).map { i =>
      def randSet() = (0 until rng.nextInt(20)).map(_ => rng.nextInt(30).toString).distinct.sorted
      (i.toLong, randSet(), randSet())
    }
    val df = cases.toDF("id", "a", "b")
      .select(col("id"),
        org.apache.spark.sql.graft.VectorExpressions.sortedIntersect(col("a"), col("b")).as("ab"),
        org.apache.spark.sql.graft.VectorExpressions.sortedIntersect(col("b"), col("a")).as("ba"),
        least(size(col("a")), size(col("b"))).cast("long").as("cap"))
    assert(df.filter(col("ab") =!= col("ba")).isEmpty, "must be symmetric")
    assert(df.filter(col("ab") > col("cap")).isEmpty, "must be bounded by min size")
  }

  test("vec_dot equals the HOF formulation over 100 random vectors") {
    val rng = new scala.util.Random(99L)
    val cases = (0 until 100).map { i =>
      val n = 1 + rng.nextInt(16)
      (i.toLong, Array.fill(n)(rng.nextDouble() * 10 - 5), Array.fill(n)(rng.nextDouble() * 10 - 5))
    }
    val df = cases.toDF("id", "a", "b")
      .withColumn("native",
        org.apache.spark.sql.graft.VectorExpressions.vecDot(col("a"), col("b")))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)"))
    // same fold order → bit-identical, not merely close
    assert(df.filter(col("native") =!= col("hof")).isEmpty)
  }
}
