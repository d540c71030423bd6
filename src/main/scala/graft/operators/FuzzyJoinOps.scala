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
  /** @param maxBlockSize structural guard against non-selective
    *   blocking keys: a prefix block with more than this many rows
    *   on EITHER side is dropped WHOLESALE before the join (the
    *   same drop-and-report semantics as the capped dedup buckets
    *   and M25's streaming `maxBlockSize`), so pair generation is
    *   bounded at cap² per block instead of OOMing the downstream
    *   closure — query the dropped blocks with
    *   [[jaroBlockOverflowReport]]. Default = no cap (the r9
    *   contract, oracle-stable).
    */
  def fuzzyJoinJaro(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      minSim: Double,
      blockPrefix: Int = 2,
      maxBlockSize: Int = Int.MaxValue
  ): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim must be in (0, 1], got $minSim")
    require(blockPrefix > 0, s"blockPrefix must be positive, got $blockPrefix")
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val l0 = left.withColumn("__blk", substring(col(leftCol), 1, blockPrefix))
    val r0 = right.withColumn("__blk2", substring(col(rightCol), 1, blockPrefix))
    val (l, r) =
      if (maxBlockSize == Int.MaxValue) (l0, r0)
      else {
        // over-cap block keys are FEW by construction (each holds
        // > cap rows, so ≤ n/cap of them exist), so the exclusion
        // list rides a broadcast anti-join — the count pass is one
        // count-only partial-agg shuffle per side, far lighter than
        // the pairs it prevents. Materialized ONCE (eager local
        // checkpoint): both anti-joins reuse it instead of
        // re-scanning both inputs per consumer.
        val big = l0.groupBy(col("__blk")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBlockSize).select(col("__blk"))
          .union(r0.groupBy(col("__blk2")).agg(count(lit(1)).as("__n"))
            .filter(col("__n") > maxBlockSize).select(col("__blk2").as("__blk")))
          .distinct()
          .localCheckpoint(true)
        (l0.join(broadcast(big), Seq("__blk"), "left_anti"),
          r0.join(broadcast(big.select(col("__blk").as("__blk2"))), Seq("__blk2"), "left_anti"))
      }
    l.join(r, col("__blk") === col("__blk2"))
      .withColumn("jw_sim", floor(
        graft.functions.StringSimilarity.jaroWinkler(col(leftCol), col(rightCol)) *
          lit(1e6) + lit(0.5)) / lit(1e6))
      .filter(col("jw_sim") >= minSim)
      .drop("__blk", "__blk2")
  }

  /** "No silent caps" telemetry for [[fuzzyJoinJaro]]'s
    * `maxBlockSize` — the prefix blocks the capped join drops
    * wholesale, with the candidate pairs they would have generated.
    * Same discipline as the dedup bucket overflow reports: run it
    * when a capped ER pass resolves suspiciously many singletons.
    *
    * @return (block, n_left, n_right, n_lost_pairs)
    */
  def jaroBlockOverflowReport(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      blockPrefix: Int = 2,
      maxBlockSize: Int = 1000
  ): DataFrame = {
    require(blockPrefix > 0, s"blockPrefix must be positive, got $blockPrefix")
    val ln = left.select(substring(col(leftCol), 1, blockPrefix).as("block"))
      .groupBy(col("block")).agg(count(lit(1)).as("n_left"))
    val rn = right.select(substring(col(rightCol), 1, blockPrefix).as("block"))
      .groupBy(col("block")).agg(count(lit(1)).as("n_right"))
    ln.join(rn, Seq("block"), "full_outer")
      .select(col("block"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .filter(col("n_left") > maxBlockSize || col("n_right") > maxBlockSize)
      .withColumn("n_lost_pairs", col("n_left") * col("n_right"))
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
