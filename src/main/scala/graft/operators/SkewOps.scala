package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overwhelm single
  * reducers. AQE's skew-join split handles sort-merge skew
  * automatically; explicit salting remains the tool when a
  * broadcast is impossible AND the skew lives in a key that AQE
  * can't split (e.g. aggregation-after-join pipelines, or
  * deterministic layout requirements).
  *
  * Left (large, skewed) rows get a deterministic salt in
  * [0, saltFactor); right rows are replicated saltFactor times —
  * the join key becomes (key, salt), spreading each hot key over
  * saltFactor reducers. Replication cost: |R|·saltFactor, so use
  * for dimension-ish right sides just above the broadcast
  * threshold.
  */
object SkewOps {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // salt derived from the full row hash — deterministic, no RNG
    // state per task, reproducible across retries
    val saltedLeft = left.withColumn(
      "__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int")
    )
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(saltedRight, saltedLeft("__salt") === saltedRight("__salt") &&
        saltedLeft(key) === saltedRight(key), joinType)
      .drop("__salt")
      .drop(saltedRight(key))
  }
}
