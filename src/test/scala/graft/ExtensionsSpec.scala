package graft

import graft.plans.GraftExtensions

class ExtensionsSpec extends SparkTestBase {

  test("registered vec_dot / vec_norm work from pure SQL") {
    val reg = spark.sessionState.functionRegistry
    Seq(GraftExtensions.vecDotDescriptor, GraftExtensions.vecNormDescriptor)
      .foreach { case (id, inf, builder) => reg.registerFunction(id, inf, builder) }
    val row = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       vec_norm(array(3.0d, 4.0d)) AS n""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 5.0)
    // length mismatch → null, not an error
    assert(spark.sql("SELECT vec_dot(array(1.0d), array(1.0d, 2.0d))").head().isNullAt(0))
  }

  test("registered text_hash matches the HOF fold it replaces") {
    val reg = spark.sessionState.functionRegistry
    val (id, inf, builder) = GraftExtensions.textHashDescriptor
    reg.registerFunction(id, inf, builder)
    val row = spark.sql(
      """SELECT text_hash('hello world!') AS native,
        |  aggregate(split('hello world!', ''), 0L,
        |    (h, c) -> (h * 31 + ascii(c)) % 1000000007) AS hof""".stripMargin).head()
    assert(row.getLong(0) == row.getLong(1))
    assert(spark.sql("SELECT text_hash('')").head().getLong(0) == 0L)
    assert(spark.sql("SELECT text_hash(CAST(NULL AS STRING))").head().isNullAt(0))
  }

  test("registered sorted_intersect_count agrees with array_intersect on sorted input") {
    val reg = spark.sessionState.functionRegistry
    val (id, inf, builder) = GraftExtensions.sortedIntersectDescriptor
    reg.registerFunction(id, inf, builder)
    val row = spark.sql(
      """SELECT sorted_intersect_count(sort_array(array('b', 'a', 'c')),
        |         sort_array(array('c', 'x', 'a'))) AS native,
        |  size(array_intersect(array('b', 'a', 'c'), array('c', 'x', 'a'))) AS builtin""".stripMargin)
      .head()
    assert(row.getLong(0) == 2L && row.getInt(1) == 2)
    assert(spark.sql(
      "SELECT sorted_intersect_count(CAST(array() AS ARRAY<STRING>), array('a'))")
      .head().getLong(0) == 0L)
  }

  test("the extension installer wires all functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders validated above
  }
}
