package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — SURVEY.md §7.2 tier (c): a whole-operator
  * extension (LogicalPlan + SparkStrategy + SparkPlan) for a semantics
  * Spark's built-in operators cannot express as ONE operator.
  *
  * `AsOfJoin.backward(l, r, …)` gives every left row the single right
  * row with the greatest `rightTime <= leftTime` for the same key
  * (left outer: no candidate → null payload) — price-at-decision
  * attribution, quote-at-trade enrichment, config-as-of lookup.
  *
  * Why a custom operator when the engine already ships the union-trick
  * rewrite (`AnalyticsQueries.asofJoin`): the union trick forces both
  * sides through ONE union schema — every left column is null-padded
  * onto the right rows and vice versa before the shuffle, so the
  * exchange carries |L|+|R| rows of width(L)+width(R). This exec
  * shuffles each side at its own natural width and merges
  * per-partition in one forward pass. Plan shape at 100 TB: exactly
  * one hash exchange per side on the key (Catalyst's EnsureRequirements
  * satisfies [[AsOfJoinExec.requiredChildDistribution]] /
  * `requiredChildOrdering`, so AQE still coalesces/re-plans the
  * exchanges), an in-partition sort on (key, time), then an O(|L|+|R|)
  * streaming merge holding ONE buffered row — no range self-join blowup,
  * no window carry-forward over a padded union, state independent of
  * per-key fan-in.
  *
  * Null semantics match SQL `ON l.k = r.k AND l.ts >= r.ts`: null keys
  * and null times match nothing (left rows still emitted, null-padded).
  * Ties on equal `rightTime` within a key are broken by whatever total
  * order the caller establishes — pre-aggregate the right side to one
  * row per (key, time) when determinism matters (the shipped query does).
  */
case class AsOfJoinPlan(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    forward: Boolean,
    toleranceUnits: Option[Long],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: 1:1 physical mapping for [[AsOfJoinPlan]].
  * Injected per-session via `spark.experimental.extraStrategies`
  * (AsOfJoin.ensureStrategy) or cluster-wide via GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, payload, fwd, tol, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, payload, fwd, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    forward: Boolean,
    toleranceUnits: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  /** Both sides hash-clustered on the key — Catalyst inserts (and AQE
    * re-plans) one exchange per side, co-partitioned, like any shuffled
    * join. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  /** In-partition sort on (key, time) on both sides — what makes the
    * single-pass merge possible. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** The merge emits left rows in their sorted order — downstream ops
    * can reuse both the partitioning and the (key, time) sort. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadAttrs = payload
    val outAttrs = output
    val isForward = forward
    val tol = toleranceUnits

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkt = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), lOut)
      val rkt = UnsafeProjection.create(Seq(rKeyExpr, rTimeExpr), rOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      // bind against NULLABLE payload attrs: the join pads non-matches with
      // nulls even when the right column itself is non-nullable
      val resultProj = UnsafeProjection.create(
        outAttrs, lOut ++ payloadAttrs.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // single buffered right row (key/time extracted; valid until advance)
        private var rRow: InternalRow = _
        private var rKey: Any = _
        private var rTime: Any = _
        // backward only: latest right row seen with rTime <= some probed
        // lTime, as a COPIED payload projection — the only per-key state
        // the merge holds (forward needs no history: the buffered row IS
        // the candidate)
        private var lastMatchKey: Any = _
        private var lastMatch: UnsafeRow = _
        private var lastMatchTime: Any = _

        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            val kt = rkt(rRow)
            rKey = if (kt.isNullAt(0)) null else kt.get(0, keyDt)
            rTime = if (kt.isNullAt(1)) null else kt.get(1, timeDt)
          } else rRow = null

        override def hasNext: Boolean = lIter.hasNext

        /** Integral view of a time value, for tolerance arithmetic
          * (timestamp = µs, date = days; API guards the types). */
        private def tl(v: Any): Long = v match {
          case l: java.lang.Long => l
          case i: java.lang.Integer => i.toLong
          case other => throw new IllegalStateException(
            s"as-of tolerance on non-integral time value: $other")
        }

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val kt = lkt(lRow)
          val lKey = if (kt.isNullAt(0)) null else kt.get(0, keyDt)
          val lTime = if (kt.isNullAt(1)) null else kt.get(1, timeDt)
          if (lKey != null) {
            var advance = true
            while (advance && rRow != null) {
              if (rKey == null) {
                // null keys sort first and match nothing: consume
              } else {
                val ck = keyOrd.compare(rKey, lKey)
                if (ck > 0) advance = false
                else if (ck == 0) {
                  if (rTime == null) {
                    // null times sort first within the key group: consume
                  } else if (lTime == null) {
                    advance = false
                  } else if (isForward) {
                    // stop at the first right row with rTime >= lTime: it
                    // IS the candidate (earliest at-or-after)
                    if (timeOrd.compare(rTime, lTime) < 0) advance = true
                    else advance = false
                  } else if (timeOrd.compare(rTime, lTime) <= 0) {
                    lastMatchKey = InternalRow.copyValue(rKey)
                    lastMatch = payloadProj(rRow).copy()
                    lastMatchTime = InternalRow.copyValue(rTime)
                  } else advance = false
                }
                // ck < 0: right row's key already passed — consume
              }
              if (advance) advanceRight()
            }
          }
          val payloadRow: InternalRow =
            if (lKey == null || lTime == null) nullPayload
            else if (isForward) {
              val hit = rRow != null && rKey != null &&
                keyOrd.compare(rKey, lKey) == 0 && rTime != null &&
                timeOrd.compare(rTime, lTime) >= 0 &&
                tol.forall(t => tl(rTime) - tl(lTime) <= t)
              if (hit) payloadProj(rRow) else nullPayload
            } else {
              val hit = lastMatch != null &&
                keyOrd.compare(lastMatchKey, lKey) == 0 &&
                tol.forall(t => tl(lTime) - tl(lastMatchTime) <= t)
              if (hit) lastMatch else nullPayload
            }
          if (!(payloadRow eq nullPayload)) numMatched += 1
          numOutputRows += 1
          resultProj(joined(lRow, payloadRow))
        }
      }
    }
  }
}

/** User-facing API. */
object AsOfJoin {

  /** Idempotently install [[AsOfJoinStrategy]] into the session's
    * planner (the runtime analogue of GraftExtensions). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies

  /** Backward as-of join: each left row gains `payload` from the right
    * row with the greatest `rightTime <= leftTime` at the same key
    * (null payload when none — left outer).
    *
    * The two plans must not share attribute ids (re-read the source or
    * `.alias` the right side for self-joins) and payload names must not
    * collide with left columns — both checked eagerly here rather than
    * left to confuse downstream resolution.
    */
  def backward(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      payloadCols: Seq[String],
      toleranceUnits: Option[Long] = None): DataFrame =
    join(left, right, leftKeyCol, rightKeyCol, leftTimeCol, rightTimeCol,
      payloadCols, forward = false, toleranceUnits)

  /** Forward as-of join: each left row gains `payload` from the right
    * row with the SMALLEST `rightTime >= leftTime` at the same key —
    * next-touch attribution, next-quote lookup. Same contract as
    * [[backward]]; `toleranceUnits` bounds `rightTime − leftTime`. */
  def forward(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      payloadCols: Seq[String],
      toleranceUnits: Option[Long] = None): DataFrame =
    join(left, right, leftKeyCol, rightKeyCol, leftTimeCol, rightTimeCol,
      payloadCols, forward = true, toleranceUnits)

  private def join(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      payloadCols: Seq[String], forward: Boolean,
      toleranceUnits: Option[Long]): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    require(rPlan.outputSet.intersect(lPlan.outputSet).isEmpty,
      "asof: left and right share attribute ids (same Dataset " +
        "used on both sides) — re-read the source or rename the right side")
    val leftNames = lPlan.output.map(_.name).toSet
    val clash = payloadCols.filter(leftNames.contains)
    require(clash.isEmpty,
      s"asof: payload columns ${clash.mkString(", ")} collide " +
        "with left columns — rename them on the right side first")
    def attr(out: Seq[Attribute], name: String, side: String): Attribute =
      out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"asof: no column '$name' on the $side side " +
          s"(have ${out.map(_.name).mkString(", ")})"))
    val lTime = attr(lPlan.output, leftTimeCol, "left")
    toleranceUnits.foreach { t =>
      require(t >= 0, s"asof: negative tolerance $t")
      import org.apache.spark.sql.types._
      require(Seq(TimestampType, TimestampNTZType, LongType, IntegerType,
          DateType).contains(lTime.dataType),
        s"asof: tolerance needs an integral-backed time type " +
          s"(timestamp=µs, date=days, int/long), got ${lTime.dataType}")
    }
    val lKey = attr(lPlan.output, leftKeyCol, "left")
    val rKey = attr(rPlan.output, rightKeyCol, "right")
    val rTime = attr(rPlan.output, rightTimeCol, "right")
    // The merge orderings are built from the LEFT types; a mismatched right
    // type would pass analysis and only blow up executor-side mid-compare.
    require(lKey.dataType == rKey.dataType,
      s"asof: key types differ — left '$leftKeyCol' is ${lKey.dataType}, " +
        s"right '$rightKeyCol' is ${rKey.dataType}; cast one side first")
    require(lTime.dataType == rTime.dataType,
      s"asof: time types differ — left '$leftTimeCol' is ${lTime.dataType}, " +
        s"right '$rightTimeCol' is ${rTime.dataType}; cast one side first")
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      lKey,
      rKey,
      lTime,
      rTime,
      payloadCols.map(attr(rPlan.output, _, "right")),
      forward, toleranceUnits,
      lPlan, rPlan))
  }
}
