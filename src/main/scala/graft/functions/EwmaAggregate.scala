package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Cast, Divide, EqualTo, Expression, Floor, If, IsNull, Literal, Multiply, Subtract}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponentially-weighted moving average as a mergeable affine scan.
  *
  * The recurrence `y_i = λ·x_i + (1−λ)·y_{i−1}` looks inherently
  * sequential, but a zero-seeded segment is an affine map of its
  * predecessor: carrying `(b, w)` where `b` is the segment's
  * zero-seeded EWMA and `w = (1−λ)^n` its total decay, two segments
  * compose as `b = b_r + w_r·b_l`, `w = w_l·w_r` — so the aggregate
  * is a genuine DeclarativeAggregate with codegen'd update AND a
  * lawful merge, not an order-fragile imperative fold.
  *
  * The emitted value is the debiased mean `b / (1 − w)` — identical
  * to the adjusted EWMA `Σ(1−λ)^{i−j}x_j / Σ(1−λ)^{i−j}` — null
  * until the first non-null input; null inputs skip (buffer
  * untouched).
  *
  * Determinism: each update lands `b` on the 1e-9 grid, so the
  * sequential fixed point is engine-independent (an oracle replays
  * the same snapped recurrence, e.g. via a recursive CTE), and `w`
  * is a pure multiply chain (no `pow`, whose libm rounding differs
  * across engines).
  *
  * Ordering contract: the running value is order-defined, so use it
  * over a window `partitionBy(key).orderBy(time, tiebreak)` (frame
  * update processes rows in window order). In a plain `groupBy` the
  * merge composes partial segments in shuffle-arrival order, which
  * is only meaningful if the data's order is the partition order —
  * the window form is the supported surface
  * ([[graft.operators.DriftOps.ewmaChart]]).
  */
object EwmaAggregate {

  case class Ewma(child: Expression, lambda: Double)
      extends DeclarativeAggregate with UnaryLike[Expression] {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")

    override def prettyName: String = "ewma"
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes() = {
      if (child.dataType == DoubleType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ewma requires DOUBLE input, got ${child.dataType.catalogString}")
    }

    private lazy val b = AttributeReference("b", DoubleType, nullable = false)()
    private lazy val w = AttributeReference("w", DoubleType, nullable = false)()
    override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(b, w)
    override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(1.0))

    private def snap9(e: Expression): Expression =
      Divide(
        Cast(Floor(Add(Multiply(e, Literal(1e9)), Literal(0.5))), DoubleType),
        Literal(1e9))

    override lazy val updateExpressions: Seq[Expression] = Seq(
      If(IsNull(child), b,
        snap9(Add(Multiply(Literal(lambda), child), Multiply(Literal(1.0 - lambda), b)))),
      If(IsNull(child), w, Multiply(w, Literal(1.0 - lambda)))
    )

    // right segment follows left: left's contribution decays by the
    // right segment's total weight; composition lands on the same
    // 1e-9 grid as updates so the groupBy merge path cannot drift a
    // grid cell from the windowed scan
    override lazy val mergeExpressions: Seq[Expression] = Seq(
      snap9(Add(b.right, Multiply(w.right, b.left))),
      Multiply(w.left, w.right)
    )

    override lazy val evaluateExpression: Expression =
      If(EqualTo(w, Literal(1.0)), Literal(null, DoubleType),
        Divide(b, Subtract(Literal(1.0), w)))

    override protected def withNewChildInternal(newChild: Expression): Ewma =
      copy(child = newChild)
  }

  /** Adjusted (debiased) EWMA of `c` with smoothing `lambda`; nulls
    * skip. Use over an ordered window — see the ordering contract.
    */
  def ewma(c: Column, lambda: Double): Column =
    ColumnBridge.column(
      Ewma(ColumnBridge.expression(c.cast("double")), lambda).toAggregateExpression())
}
