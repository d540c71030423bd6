package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string (record-linkage) join: pairs within a bounded
  * edit distance, found without a cartesian product.
  *
  * Blocking (the classic record-linkage technique, e.g. Christen
  * 2012 — public method): candidates must agree on the first
  * `blockPrefix` characters AND have lengths within `maxDist` —
  * both are consequences of a small TRUE edit distance only when
  * the edits don't touch the prefix, which is the standard
  * precision/recall trade blocking makes (documented contract: a
  * pair whose edits hit the first `blockPrefix` chars is not
  * emitted). The prefix match is an EQUI-join key, so the plan is a
  * hash join on `(prefix)` — ONE shuffle each side, linear in the
  * block sizes, never |L|×|R|; the length band and the exact
  * `levenshtein` gate run inside the join as codegen'd filters.
  *
  * Skew note: a hot prefix (e.g. every id sharing a constant stem)
  * concentrates a block; pick `blockPrefix` past the shared stem, or
  * pre-salt with [[SkewOps]] if a block still dominates.
  */
object FuzzyJoinOps {

  /** @return left + right rows paired with `edit_dist` ≤ maxDist,
    *         prefix-blocked. Column names are taken from the input
    *         frames (caller aliases to avoid collisions).
    */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int,
      blockPrefix: Int = 2
  ): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockPrefix > 0, s"blockPrefix must be positive, got $blockPrefix")
    val l = left.withColumn("__blk", substring(col(leftCol), 1, blockPrefix))
    val r = right.withColumn("__blk2", substring(col(rightCol), 1, blockPrefix))
    l.join(r, col("__blk") === col("__blk2") &&
        abs(length(col(leftCol)) - length(col(rightCol))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col(leftCol), col(rightCol)))
      .filter(col("edit_dist") <= maxDist)
      .drop("__blk", "__blk2")
  }
}
