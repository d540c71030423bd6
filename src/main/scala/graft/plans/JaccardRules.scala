package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Jaccard similarity as a first-class Catalyst expression, plus an
  * optimizer rule that exploits it.
  *
  * Having `jaccard(a,b)` be ONE node (instead of the composed
  * `size(intersect)/size(union)` tree) buys two things: a
  * single-pass hash-set evaluation, and a pattern the optimizer can
  * recognize — [[JaccardSizePrefilter]] rewrites
  * `filter(jaccard(a,b) >= t)` to prepend the O(1) necessary
  * condition `size(a) >= t·size(b) && size(b) >= t·size(a)`
  * (|A∩B| ≤ min sizes, |A∪B| ≥ max sizes ⇒ J ≤ min/max). Conjuncts
  * evaluate left-to-right, so wildly mismatched pairs never pay for
  * the set intersection — the positional-filter idea from the
  * similarity-join literature (PPJoin) expressed as a Catalyst
  * rewrite.
  */
object JaccardRules {

  /** Sorted-merge jaccard over long arrays — no boxing, no hash
    * set. Shingle-hash arrays (the dedup verify hot path) hit this.
    * Public: also invoked from generated code.
    */
  def jaccardLongs(x: ArrayData, y: ArrayData): Double = {
    val xs = x.toLongArray(); java.util.Arrays.sort(xs)
    val ys = y.toLongArray(); java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var inter = 0; var union = 0
    while (i < xs.length || j < ys.length) {
      // skip duplicates within each side
      if (i > 0 && i < xs.length && xs(i) == xs(i - 1)) i += 1
      else if (j > 0 && j < ys.length && ys(j) == ys(j - 1)) j += 1
      else if (i < xs.length && (j >= ys.length || xs(i) < ys(j))) { union += 1; i += 1 }
      else if (j < ys.length && (i >= xs.length || ys(j) < xs(i))) { union += 1; j += 1 }
      else { inter += 1; union += 1; i += 1; j += 1 }
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Boxed-set jaccard for non-long element types — also invoked
    * from generated code via reference object.
    */
  def jaccardGeneric(x: ArrayData, y: ArrayData, elemType: DataType): Double = {
    val seen = new java.util.HashSet[Any]()
    var i = 0
    while (i < x.numElements()) { seen.add(x.get(i, elemType)); i += 1 }
    val nx = seen.size()
    var inter = 0
    val matched = new java.util.HashSet[Any]()
    i = 0
    while (i < y.numElements()) {
      val v = y.get(i, elemType)
      if (seen.contains(v) && matched.add(v)) inter += 1
      i += 1
    }
    val s2 = new java.util.HashSet[Any]()
    var j = 0
    while (j < y.numElements()) { s2.add(y.get(j, elemType)); j += 1 }
    val union = nx + s2.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard_sim"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
      copy(left = l, right = r)

    private lazy val elemType = left.dataType.asInstanceOf[ArrayType].elementType
    private lazy val isLong = elemType == LongType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      java.lang.Double.valueOf(if (isLong) jaccardLongs(x, y) else jaccardGeneric(x, y, elemType))
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
    ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        if (isLong)
          s"${ev.value} = graft.plans.JaccardRules.jaccardLongs($a, $b);"
        else {
          val dtRef = ctx.addReferenceObj("jaccardElemType", elemType, classOf[DataType].getName)
          s"${ev.value} = graft.plans.JaccardRules.jaccardGeneric($a, $b, $dtRef);"
        })
  }

  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** filter(jaccard(a,b) >= t) ⇒
    * filter(|A| >= t·|B| && |B| >= t·|A| && jaccard(a,b) >= t)
    * where |·| is the DISTINCT cardinality (JaccardSim is a set
    * jaccard — both eval paths dedup elements, so a raw-size guard
    * would be unsound for arrays with duplicates and could filter
    * out true matches).
    *
    * |A∩B| ≤ min(|A|,|B|), |A∪B| ≥ max(|A|,|B|) ⇒ J ≤ min/max.
    * Conjuncts evaluate left-to-right, so wildly mismatched pairs
    * never pay for the set intersection — the length-filter idea
    * from the similarity-join literature (PPJoin) expressed as a
    * Catalyst rewrite.
    *
    * When an input is provably duplicate-free — a [[graft.functions
    * .HashExpressions.ShingleHashes]] (distinct-ified by
    * construction) or an `array_distinct`, traced through Project
    * aliases below the filter — the guard uses the cheap raw
    * `size(x)`; otherwise it pays one `size(array_distinct(x))`
    * per side, still far cheaper than the sorted-merge
    * intersection it guards.
    *
    * Marked by an exists-guard so the rewrite is applied once
    * (idempotent under the fixed-point optimizer).
    */
  object JaccardSizePrefilter extends Rule[LogicalPlan] {

    /** Alias definitions anywhere below the filter (exprIds are
      * unique per plan, so a flat map is safe).
      */
    private def aliasesBelow(plan: LogicalPlan): Map[Long, Expression] =
      plan.collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.collect { case a: Alias => a.exprId.id -> a.child }
      }.flatten.toMap

    private def provablyDistinct(e: Expression, aliases: Map[Long, Expression]): Boolean = e match {
      case _: graft.functions.HashExpressions.ShingleHashes     => true
      case _: graft.functions.HashExpressions.ShingleHashesText => true
      case _: ArrayDistinct                                     => true
      case Alias(c, _)                                      => provablyDistinct(c, aliases)
      case ar: AttributeReference =>
        aliases.get(ar.exprId.id).exists(provablyDistinct(_, aliases))
      case _ => false
    }

    private def sizeGuard(a: Expression, b: Expression, t: Expression, aliases: Map[Long, Expression]): Expression = {
      def card(x: Expression): Expression =
        Cast(Size(if (provablyDistinct(x, aliases)) x else ArrayDistinct(x)), DoubleType)
      val sa = card(a)
      val sb = card(b)
      And(GreaterThanOrEqual(sa, Multiply(t, sb)), GreaterThanOrEqual(sb, Multiply(t, sa)))
    }

    /** Idempotency check that is insensitive to the raw-size vs
      * array_distinct-size choice: a later optimizer iteration can
      * prune the Project alias that made an input provably
      * distinct, which would rebuild a differently-shaped guard and
      * defeat a fastEquals comparison — re-wrapping the condition
      * with a second, redundant guard every iteration.
      */
    private def hasGuardFor(cond: Expression, input: Expression): Boolean =
      cond.exists {
        case GreaterThanOrEqual(Cast(Size(e, _), _, _, _), _) =>
          e.semanticEquals(input) ||
            (e match { case ArrayDistinct(c) => c.semanticEquals(input); case _ => false })
        case _ => false
      }

    private def rewriteCond(cond: Expression, aliasesThunk: => Map[Long, Expression]): Expression = {
      // alias resolution only runs when a jaccard threshold is
      // actually present (most Filters/Joins have none)
      lazy val aliases = aliasesThunk
      cond.transformUp {
        case ge @ GreaterThanOrEqual(j: JaccardSim, t @ Literal(_, DoubleType))
            if !hasGuardFor(cond, j.left) =>
          And(sizeGuard(j.left, j.right, t, aliases), ge)
      }
    }

    // Matches jaccard thresholds both in Filters and in Join
    // conditions — predicate pushdown folds `join.filter(jaccard…)`
    // into the join condition before this rule runs.
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, child) =>
        val rewritten = rewriteCond(cond, aliasesBelow(child))
        if (rewritten fastEquals cond) f else Filter(rewritten, child)
      case j: org.apache.spark.sql.catalyst.plans.logical.Join if j.condition.isDefined =>
        val cond = j.condition.get
        val rewritten = rewriteCond(cond, aliasesBelow(j))
        if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
    }
  }
}
