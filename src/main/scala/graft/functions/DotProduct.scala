package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType, NumericType}

/** Native Catalyst dot product over two double arrays — the hot scalar of
  * every similarity/ANN query.
  *
  * Why a custom Expression (SURVEY.md §7.2 tier b): the built-in
  * composition `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) ->
  * acc+x)` materializes an intermediate array and evaluates two
  * higher-order lambdas per row; this expression is one fused loop with
  * full whole-stage-codegen participation (doGenCode below) — no
  * intermediate allocation, no lambda dispatch.
  *
  * Semantics match the built-in composition exactly: strict
  * left-to-right summation (bit-identical to DuckDB's list_dot_product,
  * verified), null iff either array is null, length = min(len(a),
  * len(b)). Array ELEMENTS are assumed non-null (embedding columns).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  /** Implicit input casting, exactly like Spark's numeric builtins: a
    * float embedding column or a decimal-literal array (`array(-0.1,
    * 0.2)` — Spark types bare decimal literals as DECIMAL) coerces to
    * array<double> in the analyzer instead of failing the type check. */
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  /** Only NUMERIC (or empty-literal) element types may coerce: Spark's
    * implicit casts also admit array<string> → array<double>, under which
    * (with ANSI off) a malformed element becomes a null slot that
    * nullSafeEval silently reads as 0.0 — a wrong-ish result where a type
    * error belongs. Analyzer-inserted coercion casts are unwrapped to see
    * the ORIGINAL element type; an explicit user CAST is respected as the
    * user taking responsibility for the conversion. */
  override def checkInputDataTypes(): TypeCheckResult = {
    val default = super.checkInputDataTypes()
    if (default.isFailure) default
    else {
      def preCoercion(e: Expression): Expression = e match {
        case c: Cast if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
          preCoercion(c.child)
        case other => other
      }
      val bad = Seq(left, right).map(preCoercion).map(_.dataType).collect {
        case ArrayType(et, _)
            if !et.isInstanceOf[NumericType] && et != NullType => et
      }
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires numeric array elements, got " +
          bad.map(_.simpleString).mkString(", "))
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Runtime registration so `expr("dot_product(a, b)")` and SQL text
    * resolve without a config change. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}

/** SparkSessionExtensions installer — enable the engine's functions and
  * optimizer rules cluster-wide with
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "md5_60"),
      (exprs: Seq[Expression]) => Md5Hash60(exprs.head)))
    ext.injectOptimizerRule(_ => graft.plans.TopOneToMaxBy)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
