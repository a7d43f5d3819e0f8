package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.VectorExpressions.{DotProduct, RollingHash, SortedIntersectCount}

/** Session-extension installer for the engine's native expressions —
  * the `SparkSessionExtensions` integration point, so pure-SQL users
  * (spark-sql shell, JDBC, `spark.sql(...)`) get the same codegen
  * kernels as the Column API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or programmatically via `.withExtensions(new GraftExtensions)`.
  *
  * Registered functions:
  *  - `vec_dot(a, b)`  — native whole-stage-codegen dot product over
  *    ARRAY<DOUBLE> (see VectorExpressions.DotProduct); the inner loop
  *    of every ANN / cosine query in this engine.
  *  - `vec_norm(a)`    — L2 norm, rewritten to `sqrt(vec_dot(a, a))`.
  *  - `text_hash(s)`   — rolling code-point hash (fingerprint scan).
  *  - `sorted_intersect_count(a, b)` — merge-count |A ∩ B| of two
  *    ascending-sorted distinct ARRAY<STRING> (the dedup verify
  *    kernel).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.vecNormDescriptor)
    ext.injectFunction(GraftExtensions.textHashDescriptor)
    ext.injectFunction(GraftExtensions.sortedIntersectDescriptor)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("vec_dot"),
    info("vec_dot", "vec_dot(a, b) - dot product of two ARRAY<DOUBLE> vectors."),
    (children: Seq[Expression]) => {
      require(children.size == 2, "vec_dot expects exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  val vecNormDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("vec_norm"),
    info("vec_norm", "vec_norm(a) - L2 norm of an ARRAY<DOUBLE> vector."),
    (children: Seq[Expression]) => {
      require(children.size == 1, "vec_norm expects exactly 1 argument")
      org.apache.spark.sql.catalyst.expressions.Sqrt(
        DotProduct(children.head, children.head))
    })

  val textHashDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("text_hash"),
    info("text_hash", "text_hash(s) - rolling code-point hash (h*31 + cp mod 1e9+7)."),
    (children: Seq[Expression]) => {
      require(children.size == 1, "text_hash expects exactly 1 argument")
      RollingHash(children.head)
    })

  val sortedIntersectDescriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("sorted_intersect_count"),
    info("sorted_intersect_count",
      "sorted_intersect_count(a, b) - |A ∩ B| of two ascending-sorted distinct ARRAY<STRING>."),
    (children: Seq[Expression]) => {
      require(children.size == 2, "sorted_intersect_count expects exactly 2 arguments")
      SortedIntersectCount(children.head, children(1))
    })
}
