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

  /** [[fuzzyJoin]]'s Jaro-Winkler twin — positional-agreement
    * scoring instead of edit counting, the usual choice for
    * person/company names where truncations and near-transpositions
    * should rank high. Same prefix-blocking plan (hash equi-join on
    * the block key, ONE shuffle each side, never |L|×|R|) with the
    * same documented trade: a pair differing inside the first
    * `blockPrefix` characters is not emitted (Jaro-Winkler's prefix
    * boost makes this a natural blocking axis — high scorers agree
    * on prefixes). The codegen'd
    * [[graft.functions.StringSimilarity.JaroWinklerSim]] kernel runs
    * inside the join; scores snap to the 1e-6 grid BEFORE the
    * threshold so the emitted frame is engine-portable.
    *
    * @return left + right rows paired with `jw_sim` ≥ minSim
    */
  def fuzzyJoinJaro(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      minSim: Double,
      blockPrefix: Int = 2
  ): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim must be in (0, 1], got $minSim")
    require(blockPrefix > 0, s"blockPrefix must be positive, got $blockPrefix")
    val l = left.withColumn("__blk", substring(col(leftCol), 1, blockPrefix))
    val r = right.withColumn("__blk2", substring(col(rightCol), 1, blockPrefix))
    l.join(r, col("__blk") === col("__blk2"))
      .withColumn("jw_sim", floor(
        graft.functions.StringSimilarity.jaroWinkler(col(leftCol), col(rightCol)) *
          lit(1e6) + lit(0.5)) / lit(1e6))
      .filter(col("jw_sim") >= minSim)
      .drop("__blk", "__blk2")
  }

  /** Phonetic-blocked fuzzy join — candidates share a SOUNDEX code
    * (the classic record-linkage blocking key for person/company
    * names: "Smith"/"Smyth"/"Smithe" all block together where
    * [[fuzzyJoinJaro]]'s prefix block separates them at the first
    * spelling divergence), verified by the codegen'd Jaro-Winkler
    * gate. Spark's built-in `soundex` is codegen'd scan-stage
    * work — no UDF.
    *
    * Scale shape: identical to the other blocked joins — a hash
    * EQUI join on the 4-char code (≤ 26·7³ distinct blocks; at
    * corpus scale soundex blocks are the skew axis, AQE splits the
    * hot codes), the K22 kernel running inside the join, scores
    * snapped to 1e-6 BEFORE the threshold. The blocking CONTRACT:
    * pairs whose names differ in their consonant skeleton are not
    * candidates — that is the phonetic trade, documented like the
    * prefix block's.
    */
  def fuzzyJoinPhonetic(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      minSim: Double
  ): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim must be in (0, 1], got $minSim")
    val l = left.withColumn("__snd", soundex(col(leftCol)))
    val r = right.withColumn("__snd2", soundex(col(rightCol)))
    l.join(r, col("__snd") === col("__snd2"))
      .withColumn("jw_sim", floor(
        graft.functions.StringSimilarity.jaroWinkler(col(leftCol), col(rightCol)) *
          lit(1e6) + lit(0.5)) / lit(1e6))
      .filter(col("jw_sim") >= minSim)
      .drop("__snd", "__snd2")
  }
}
