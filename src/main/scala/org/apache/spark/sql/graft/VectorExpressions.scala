package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's lambda HOFs (`aggregate`, `zip_with`) are CodegenFallback —
  * every row pays interpreted-lambda dispatch per element. For a
  * 100 TB ANN scan the dot product IS the inner loop, so it gets a real
  * Expression with `doGenCode`: a tight primitive double loop inside
  * whole-stage codegen, no virtual calls, no boxing.
  *
  * Lives under org.apache.spark.sql because the Column/Expression bridge
  * (ExpressionUtils) and AbstractDataType are private[sql] — the same
  * technique public Spark extension libraries use.
  */
object VectorExpressions {

  /** Σ a(i)·b(i) over two ARRAY<DOUBLE> columns (null if lengths differ).
    * Accumulates left-to-right in array order — the same fold order as
    * `aggregate(zip_with(...))`, so results are bit-identical to the HOF
    * formulation (and to the DuckDB oracle).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    // null on length mismatch even when both inputs are non-null — the
    // default child-derived nullability would drop that null
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        val n = x.numElements()
        while (i < n) {
          acc += x.getDouble(i) * y.getDouble(i)
          i += 1
        }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Static kernel for [[RollingHash]] — generated code calls this via
    * the object's static forwarder. Iterates Unicode code points (the
    * definition DuckDB's `string_split('')` + `ascii` folds over);
    * mod-prime at every step keeps the fold in BIGINT range.
    */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** Polynomial rolling hash over a STRING column's code points —
    * h ← (h·31 + cp) mod 1e9+7. The HOF formulation
    * `aggregate(split(text, ''), ...)` is CodegenFallback AND
    * materializes a one-string-per-character array per row; at corpus
    * scale the fingerprint scan IS the job, so it gets a native
    * Expression: one pass over the string bytes inside whole-stage
    * codegen, zero allocation beyond the fold.
    */
  case class RollingHash(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "text_hash"

    override protected def nullSafeEval(input: Any): Any =
      rollingHash(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"org.apache.spark.sql.graft.VectorExpressions.rollingHash($c)")

    override protected def withNewChildInternal(newChild: Expression): RollingHash =
      copy(child = newChild)
  }

  /** Column API: rolling code-point hash of a STRING column. */
  def textHash(c: Column): Column = column(RollingHash(expression(c)))

  /** The repo's epsilon-floor rounding (Num.r4/r6) as a native
    * expression: NaN/±Inf pass through, else
    * floor((x + eps) · scale + 0.5) / scale — the IDENTICAL IEEE op
    * sequence as the Column formulation it replaces, evaluated ONCE.
    * The `when(isnan(c) || ...)` form references its child in all five
    * guard/branch positions, so every r4-wrapped output column
    * replicated its argument tree 5× in generated code — the direct
    * cause of the one 64 KB codegen overflow (mixKlReport) and a
    * code-size tax on every projection in the engine. Values are
    * bit-identical: Math.floor is IEEE-exact, and for every value both
    * engines agreed on before (|scaled| < 2⁵³) the double result
    * equals the old floor-to-long path.
    */
  case class RoundFloor(child: Expression, eps: Double, scale: Double)
      extends UnaryExpression with ImplicitCastInputTypes {

    override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "round_floor"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[Double]
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
      else math.floor((v + eps) * scale + 0.5) / scale
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"((Double.isNaN($c) || Double.isInfinite($c)) ? $c : " +
          s"Math.floor(($c + ${eps}D) * ${scale}D + 0.5D) / ${scale}D)")

    override protected def withNewChildInternal(newChild: Expression): RoundFloor =
      copy(child = newChild)
  }

  /** Column API: epsilon-floor rounding (see [[RoundFloor]]). */
  def roundFloor(c: Column, eps: Double, scale: Double): Column =
    column(RoundFloor(expression(c), eps, scale))

  /** Bloom-filter aggregate over a LONG column — Spark's own mergeable
    * sketch (the one InjectRuntimeFilter builds for runtime row-level
    * pruning; spark.sql.optimizer.runtime.bloomFilter.*), exposed
    * through the Column API since `bloom_filter_agg` is not in the
    * public registry. Map-side state is one fixed-size bit array per
    * task; merge is a bitwise OR — the sketch reaches the driver as a
    * single binary regardless of input size.
    */
  def bloomAgg(c: Column, estimatedNumItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    column(new BloomFilterAggregate(expression(c),
      Literal(estimatedNumItems), Literal(numBits)).toAggregateExpression())
  }

  /** Probe of a serialized bloom filter (constant binary) against a LONG
    * column — the codegen'd `might_contain` the runtime-filter rewrite
    * uses, sharing put/probe hashing with [[bloomAgg]] by construction.
    */
  def bloomMightContain(sketch: Column, value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    column(BloomFilterMightContain(expression(sketch), expression(value)))
  }

  /** Static kernel for [[SortedIntersectCount]]: two-pointer merge count
    * over ascending-sorted (UTF8 binary order) distinct string arrays.
    * Null elements never match and are skipped (the function is in the
    * SQL registry, so arbitrary arrays can reach it — `sort_array`
    * places nulls first, so the skip keeps the merge invariant).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n1 && j < n2) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** |A ∩ B| of two ascending-sorted distinct ARRAY<STRING> columns.
    *
    * The dedup verify stage computes exact Jaccard for every candidate
    * pair; `size(array_intersect(...))` builds and probes a hash set of
    * UTF8Strings per PAIR — measured ~27 µs/pair on trigram sets, and at
    * corpus scale the verify join IS the query. Sorting each document's
    * token set ONCE (amortized over all its candidate pairs) turns the
    * per-pair cost into an allocation-free two-pointer scan of binary
    * string compares. Exact — no hashing, so no collision caveat against
    * the string-Jaccard oracle. Callers must pass `sort_array`-ed
    * distinct arrays; unsorted input silently undercounts.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"org.apache.spark.sql.graft.VectorExpressions.sortedIntersectCount($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: merge-count intersection of two sorted ARRAY<STRING>. */
  def sortedIntersect(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))

  /** Column API: dot product of two ARRAY<DOUBLE> columns. */
  def vecDot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Column API: L2 norm. */
  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vecDot(a, a))
  }
}
