package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence modeling over keyed, time-ordered streams — the
  * behavioral layer next to [[FunnelOps]] (funnels ask "did the
  * prescribed path happen", these ask "what paths DO happen").
  */
object SequenceOps {

  /** First-order Markov transition matrix between event types: for
    * each observed (from, to) adjacent pair within a key's
    * time-ordered stream, the transition count and row-normalized
    * probability `P(to | from)`.
    *
    * ONE keyed-window shuffle builds the adjacency (lag over
    * `partitionBy(key).orderBy(order...)`), then a
    * map-side-combinable groupBy(from, to) count and a tiny
    * per-from normalization join — the matrix frame is
    * |types|² rows regardless of the event log. Probabilities are
    * integer-count ratios on the 1e-9 grid.
    *
    * @param orderCols total order within key (include a unique
    *        tie-break — adjacency is order-defined)
    * @return (from_type, to_type, n, p) — p on the 1e-9 grid
    */
  def transitionMatrix(
      events: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      typeCol: String
  ): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = events
      .filter(col(typeCol).isNotNull)
      .select(col(keyCol), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("__t"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (floor(col("n") / col("__t").cast("double") * lit(1e9) + lit(0.5)) / lit(1e9)).as("p"))
  }
}
