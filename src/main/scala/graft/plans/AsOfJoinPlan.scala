package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** A whole-operator Catalyst extension — SURVEY.md §2's option (c):
  * custom `LogicalPlan` node + rewrite `Rule`, surfaced through the
  * public DataFrame API.
  *
  * [[AsOfJoinPlan]] declares "each left row picks up the most recent
  * right payload at-or-before its time, per key" as a single logical
  * node; [[RewriteAsOfJoin]] lowers it to the scalable union-tag
  * composition (one shuffle on the key, a running last(ignoreNulls)
  * window over the merged timeline — no per-row subquery, no range
  * explosion). Ties at the same time resolve right-before-left, then by
  * the tie column — the semantics the reference's sorted-merge shape
  * implies (worker/__main__.py:166-167,208: whole-line sort makes equal
  * keys contiguous and deterministic).
  *
  * The node resolves as soon as its children do (its output is the left
  * schema plus one nullable column with a pre-allocated ExprId, which
  * the rewrite re-binds via an Alias), so it passes CheckAnalysis and
  * any rule batch can run before the rewrite fires.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    keyCol: String,
    leftTimeCol: String,
    leftTieCol: String,
    rightKeyCol: String,
    rightTimeCol: String,
    rightTieCol: String,
    payloadCol: String,
    outCol: String,
    outExprId: ExprId = NamedExpression.newExprId)
  extends BinaryNode {

  private def payloadType =
    right.output.find(_.name == payloadCol)
      .map(_.dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)

  override def output: Seq[Attribute] =
    left.output :+
      AttributeReference(outCol, payloadType, nullable = true)(exprId = outExprId)

  /** The operator itself consumes every left column (they all flow to
    * the output) plus the right-side key/time/tie/payload — declared so
    * ColumnPruning keeps them when a parent (e.g. a bare count) needs
    * nothing (without this, children get pruned under the node and the
    * rewrite can no longer resolve its columns).
    */
  override def references: AttributeSet = {
    val rightNeeded =
      Set(rightKeyCol, rightTimeCol, rightTieCol, payloadCol)
    AttributeSet(left.output ++ right.output.filter(a => rightNeeded(a.name)))
  }

  /** The as-of column is produced here, not read from a child. */
  override def producedAttributes: AttributeSet = AttributeSet(output.last)

  override protected def withNewChildrenInternal(
    newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[AsOfJoinPlan]] to union-tag + running-last. Registered via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`) and,
  * imperatively, through `experimentalMethods.extraOptimizations` in
  * [[AsOfJoin.apply]] so it works on any session.
  */
object RewriteAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case aj: AsOfJoinPlan => rewrite(aj)
  }

  private def rewrite(aj: AsOfJoinPlan): LogicalPlan = {
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$n' in ${p.output.map(_.name)}"))
    val (lk, lt, ltie) = (attr(aj.left, aj.keyCol),
      attr(aj.left, aj.leftTimeCol), attr(aj.left, aj.leftTieCol))
    val (rk, rt, rtie, rp) = (attr(aj.right, aj.rightKeyCol),
      attr(aj.right, aj.rightTimeCol), attr(aj.right, aj.rightTieCol),
      attr(aj.right, aj.payloadCol))

    // Align both sides on (left columns…, __k, __t, __tag, __tie, __p):
    // left rows carry their columns and a null payload (tag 1); right
    // rows carry nulls for the left columns and the payload (tag 0, so
    // at equal time the payload sorts first and is visible to the left
    // row via the running window).
    val leftProj = Project(
      aj.left.output.map(a => a: NamedExpression) ++ Seq(
        Alias(lk, "__k")(), Alias(lt, "__t")(),
        Alias(Literal(1), "__tag")(), Alias(ltie, "__tie")(),
        Alias(Literal(null, rp.dataType), "__p")()),
      aj.left)
    val rightProj = Project(
      aj.left.output.map(a =>
        Alias(Literal(null, a.dataType), a.name)(): NamedExpression) ++ Seq(
        Alias(rk, "__k")(), Alias(rt, "__t")(),
        Alias(Literal(0), "__tag")(), Alias(rtie, "__tie")(),
        Alias(rp, "__p")()),
      aj.right)
    val union = Union(Seq(leftProj, rightProj))

    def uattr(n: String): Attribute = union.output.find(_.name == n).get
    val (uk, ut, utag, utie, up) =
      (uattr("__k"), uattr("__t"), uattr("__tag"), uattr("__tie"), uattr("__p"))

    val order = Seq(SortOrder(ut, Ascending), SortOrder(utag, Ascending),
      SortOrder(utie, Ascending))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val spec = WindowSpecDefinition(Seq(uk), order, frame)
    val lastAlias = Alias(
      WindowExpression(
        AggregateExpression(Last(up, ignoreNulls = true), Complete,
          isDistinct = false),
        spec),
      aj.outCol)()
    val win = Window(Seq(lastAlias), Seq(uk), order, union)
    val onlyLeft = Filter(EqualTo(utag, Literal(1)), win)

    // Left attributes flow through Project/Union head unchanged (same
    // ExprIds); the declared output column re-binds via its ExprId.
    val leftAttrs = aj.left.output.map(a =>
      onlyLeft.output.find(_.exprId == a.exprId).getOrElse(a))
    Project(
      leftAttrs.map(a => a: NamedExpression) :+
        Alias(lastAlias.toAttribute, aj.outCol)(exprId = aj.outExprId),
      onlyLeft)
  }
}

/** Public API for the plan-level as-of join. */
object AsOfJoin {
  /** Ensure the rewrite rule is active on this session (idempotent;
    * covers sessions built without GraftExtensions).
    */
  def ensureRule(spark: SparkSession): Unit = {
    val em = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.experimentalMethods
    if (!em.extraOptimizations.contains(RewriteAsOfJoin))
      em.extraOptimizations = em.extraOptimizations :+ RewriteAsOfJoin
  }

  /** left.asofJoin(right): per `key`, each left row gains `outCol` = the
    * `payload` of the latest right row with time at-or-before its own.
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
    leftTime: String, leftTie: String, rightKey: String, rightTime: String,
    rightTie: String, payload: String, outCol: String): DataFrame = {
    val spark = left.sparkSession
    ensureRule(spark)
    org.apache.spark.sql.GraftSqlShims.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoinPlan(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        key, leftTime, leftTie, rightKey, rightTime, rightTie,
        payload, outCol))
  }
}
