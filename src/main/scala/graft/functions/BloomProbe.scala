package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a serialized `BloomFilter` sketch —
  * the probe side of a bloom-filtered join (SURVEY.md §7.2 tier b).
  *
  * The filter argument must be a FOLDABLE binary column (a
  * `lit(bytes)` of `BloomFilter.writeTo`): it is deserialized ONCE at
  * plan time on the driver and shipped to executors as a codegen
  * reference object, so per-row cost is just the k hash probes —
  * fully inside whole-stage codegen, no UDF dispatch, no per-row
  * deserialization. Why an Expression at all: Spark's own runtime
  * bloom-join filter (`BloomFilterMightContain`) is internal-only and
  * injected solely by the optimizer; this exposes the identical
  * mechanism as a first-class engine function for explicitly planned
  * pre-filters (see `graft.operators.BloomJoin`).
  *
  * Null/absent semantics match an equi-join probe: a null key matches
  * nothing → false (never null), so the expression can sit directly in
  * a WHERE clause without a null guard. False POSITIVES pass (callers
  * must re-check exactly — BloomJoin does); false negatives cannot
  * happen, which is what makes dropping non-matches sound.
  */
case class BloomProbe(filter: Expression, key: Expression)
    extends BinaryExpression {

  override def left: Expression = filter
  override def right: Expression = key

  override def checkInputDataTypes(): TypeCheckResult =
    if (filter.dataType != BinaryType || !filter.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_probe: first argument must be a foldable BINARY bloom filter")
    else key.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_probe: key must be BIGINT/INT/STRING, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_probe"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = filter.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_probe: filter bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val k = key.eval(input)
    if (k == null) false
    else key.dataType match {
      case LongType => bloom.mightContainLong(k.asInstanceOf[Long])
      case IntegerType => bloom.mightContainLong(k.asInstanceOf[Int].toLong)
      case StringType =>
        bloom.mightContainBinary(k.asInstanceOf[UTF8String].getBytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    val keyGen = key.genCode(ctx)
    val probe = key.dataType match {
      case LongType => s"$bloomRef.mightContainLong(${keyGen.value})"
      case IntegerType => s"$bloomRef.mightContainLong((long) ${keyGen.value})"
      case StringType => s"$bloomRef.mightContainBinary(${keyGen.value}.getBytes())"
    }
    ev.copy(
      code = code"""
        ${keyGen.code}
        boolean ${ev.value} = ${keyGen.isNull} ? false : $probe;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(filter = newLeft, key = newRight)
}

object BloomProbe {
  /** Runtime registration so `call_function("bloom_probe", lit(bytes),
    * col(key))` and SQL text resolve. Idempotent. Arity is validated in
    * the builder so `bloom_probe(x)` fails analysis with Spark's own
    * WRONG_NUM_ARGS condition instead of an IndexOutOfBoundsException. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_probe",
      exprs => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map(
              "functionName" -> "`bloom_probe`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        BloomProbe(exprs(0), exprs(1))
      },
      "built-in")
}
