package graft.operators

import graft.functions.{HashExpressions => HE, PairGenerators => PG}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for large text/embedding corpora.
  *
  * Scale design: every near-dup algorithm here is
  * candidate-generation (cheap, per-row, codegen) → bucket join
  * (shuffle of small key rows, O(n·bands), never O(n²)) →
  * verification inside buckets only. The full-corpus cross join
  * never appears in any plan.
  */
object DedupOps {

  /** Exact dedup on a key expression (e.g. raw text or a
    * fingerprint). Keeps the row with the minimum `idCol` — one
    * hash-aggregate shuffle on the content key.
    */
  def exact(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Keep each distinct `key`'s FIRST occurrence in `orderCols`
    * order — the segment-level exact dedup of MassiveText-style
    * paragraph dedup (chunk the corpus, drop every later copy of a
    * segment already seen earlier in corpus order). Generalizes
    * [[exact]] to composite orderings like (doc_id, chunk_id).
    * ONE hash shuffle on the content key; within a key the window
    * holds only that key's copies.
    */
  def keepFirstOccurrence(df: DataFrame, key: Column, orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-dup groups: content key → survivor id + copy count. */
  def exactGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-dup candidate pairs.
    *
    * tokens → shingle hashes → fused minhash+band keys (single-pass
    * Catalyst expression, [[HE.MinHashBandKeys]]) → explode → ONE
    * groupBy(band) with [[PG.CappedCollectList]] (IDS ONLY —
    * shingle arrays never ride the candidate shuffle; degenerate
    * buckets overflow the cap and are dropped, the standard LSH
    * skew guard) → [[PG.IdPairs]] bucket-local pair enumeration →
    * distinct pairs → re-attach shingle hashes → exact-Jaccard
    * verify ≥ threshold.
    *
    * Scale: one shuffle of n·bands (id, band) rows replaces the r1
    * count-groupBy + semi-join + two-branch self-join (3 extra
    * full-table shuffles); per-bucket memory is bounded by
    * maxBucket ids.
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      maxBucket: Int = 1000
  ): DataFrame = {
    val shingled = df
      .select(col(idCol).as("id"), HE.shingleHashesText(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = shingled
      .select(col("id"), explode(HE.minhashBandKeys(col("sh"), numHashes, rowsPerBand)).as("band"))
    val buckets = banded.groupBy("band")
      .agg(PG.cappedCollectList(col("id"), maxBucket + 1).as("m"))
      .filter(size(col("m")) <= maxBucket)
    val cand = buckets.select(PG.idPairs(col("m")).as(Seq("id_a", "id_b"))).distinct()
    cand
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", graft.plans.JaccardRules.jaccardSim(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup: 64-bit fingerprints; candidates via
    * [[hammingPairs64]]'s multi-index banding (exact 16-bit quarters
    * for maxHamming ≤ 3, probed quarters beyond — complete up to
    * maxHamming 15); verify by full hamming distance ≤ maxHamming.
    */
  def simhash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000
  ): DataFrame = {
    // null text → null sig; drop before bucketing (the groupBy keeps
    // null keys, so null-sig docs would all land in the (q, null)
    // buckets and pair up as spurious hamming-0 "duplicates")
    hammingPairs64(
      df.select(col(idCol).as("id"), HE.simhashText(col(textCol)).as("sig")),
      "id", "sig", maxHamming, maxBucket)
  }

  /** All XOR masks over `width` low bits with popcount ≤ `p` — the
    * multi-index probe set (Norouzi et al. 2012, Fast Search in
    * Hamming Space with Multi-Index Hashing). p=0 → just 0L.
    */
  private def flipMasks(width: Int, p: Int): Seq[Long] = {
    def comb(start: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (start until width).flatMap(i => comb(i + 1, left - 1).map(_ | (1L << i)))
    (0 to p).flatMap(k => comb(0, k))
  }

  /** The banding keys for a 64-bit signature as an array of
    * (q, k) structs — `bands` substrings of 64/bands bits, each
    * probed out to `probe` flipped bits. Shared by the pair pass
    * and the overflow report so the two always agree on buckets.
    */
  private def hammingBandKeys(sig: Column, bands: Int, probe: Int): Column = {
    val width = 64 / bands
    val fieldMask = (1L << width) - 1
    val masks = flipMasks(width, probe)
    flatten(array((0 until bands).map { q =>
      val base = shiftright(sig, q * width).bitwiseAND(lit(fieldMask))
      if (masks.size == 1) array(struct(lit(q).as("q"), base.as("k")))
      else transform(array(masks.map(lit): _*),
        m => struct(lit(q).as("q"), base.bitwiseXOR(m).as("k")))
    }: _*))
  }

  /** Per-band probe radius that makes `bands`-banding
    * candidate-complete for `maxHamming`: by pigeonhole a pair at
    * distance r has some band at distance ≤ ⌊r/bands⌋, and two keys
    * at distance d ≤ p share a probed key (the nearer key itself).
    */
  private def probeRadius(maxHamming: Int, bands: Int): Int = maxHamming / bands

  /** Hamming-≤-`maxHamming` pairs over ANY precomputed 64-bit
    * signature column (simhash, image dHash, audio fingerprints…),
    * via multi-index banding (Norouzi et al. 2012): the signature
    * splits into `bands` substrings of 64/bands bits, each probed
    * out to ⌊maxHamming/bands⌋ flipped bits, so by pigeonhole ANY
    * pair within `maxHamming` shares at least one probed band key —
    * candidate-COMPLETE for every maxHamming ≤ 15 (enforced).
    * Then ONE groupBy(band) with capped member collection and the
    * fused bucket-local hamming verify. Null signatures drop out
    * before bucketing. (id, sig) rows are all that shuffles.
    *
    * Cost shape: rows shuffled per doc = bands · Σ_{i≤p} C(64/bands, i)
    * where p = ⌊maxHamming/bands⌋. With the default bands=4:
    * r ≤ 3 → 4 rows (exact quarters, the classic plan), r ≤ 7 → 68,
    * r ≤ 11 → 548, r ≤ 15 → 2788. `bands = 8` trades that
    * amplification for key-space collapse (8-bit keys → ≤ 2048
    * buckets total): 8 rows/doc up to r ≤ 7 but every bucket holds
    * ~n/256 docs, so at corpus scale the cap (and the overflow
    * report) dominates — prefer the default 16-bit probed quarters
    * beyond toy sizes and keep bands=8 for small skewless sets.
    */
  def hammingPairs64(
      df: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      bands: Int = 4
  ): DataFrame = {
    require(Set(2, 4, 8).contains(bands), s"bands must be 2, 4, or 8, got $bands")
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15] (probe-mask count grows C(64/bands, r/bands)), got $maxHamming")
    // fail fast on non-integral ids: cast('long') would turn e.g. a
    // string id column into silent nulls instead of pairs
    val idType = df.select(col(idCol)).schema.head.dataType
    require(Seq("byte", "short", "int", "long", "integer", "bigint")
        .contains(idType.typeName),
      s"$idCol must be an integral id column, got ${idType.typeName}")
    val sigs = df.select(col(idCol).cast("long").as("id"), col(sigCol).as("sig"))
      .filter(col("sig").isNotNull)
    val keyed = sigs.select(
        col("id"), col("sig"),
        explode(hammingBandKeys(col("sig"), bands, probeRadius(maxHamming, bands))).as("bucket"))
      .select(col("bucket.q"), col("bucket.k"), struct(col("id"), col("sig")).as("member"))
    // one shuffle: bucket members collected (capped), pairs emitted
    // with the hamming verify fused into the bucket scan — only
    // survivors pay the distinct shuffle
    val buckets = keyed.groupBy("q", "k")
      .agg(PG.cappedCollectList(col("member"), maxBucket + 1).as("m"))
      .filter(size(col("m")) <= maxBucket)
    buckets
      .select(PG.hammingPairs(col("m"), maxHamming).as(Seq("id_a", "id_b", "hamming")))
      .distinct()
  }

  /** n-gram Jaccard similarity join with PPJoin-style prefix
    * filtering: under a global shingle ordering, any pair with
    * Jaccard ≥ t must share a shingle within each doc's first
    * ⌊(1−t)·|d|⌋+1 shingles — so only those prefixes are indexed.
    * On repetitive corpora this collapses the candidate count by
    * orders of magnitude vs. a full inverted index.
    *
    * @param orderByFrequency prefix ordering — either total order is
    *   CORRECT (any consistent order admits the prefix-filter
    *   guarantee) and verified output is identical; they trade
    *   plan shape against candidate count:
    *   - true (default): ascending corpus frequency — the classic
    *     PPJoin heuristic. Costs a frequency aggregation + join +
    *     per-doc window (4 hash shuffles), but rarest-first
    *     prefixes keep widely-shared shingles out of the inverted
    *     index. MEASURED on the 20×-dup worst-case probe: 97s vs
    *     347s for hash order — on dup-heavy corpora every shingle
    *     is frequent and hash order floods the buckets.
    *   - false: lowest-hash shingles, computed per row by ONE
    *     expression (`slice(array_sort(sh))`) — 1 hash shuffle
    *     total. Right choice when duplication is known to be low
    *     and shuffle volume dominates.
    */
  /** Exact k-token span overlap pairs — the "exact substring dedup"
    * signal (Lee et al., Deduplicating Training Data Makes Language
    * Models Better: docs sharing a verbatim ≥k-token run): a pair
    * reports when the two docs contain ANY identical contiguous
    * k-token window. Complements [[ngramJaccard]] (thresholded
    * whole-doc similarity) and [[decontaminate]] (doc-vs-eval-set);
    * this is doc-vs-doc, single-span sensitivity.
    *
    * Shape: the standard one-shuffle bucket plan — distinct span
    * hashes per doc from the fused text kernel, ONE
    * groupBy(span-hash) with capped id collection (a span shared by
    * more than maxBucket docs is boilerplate, not duplication — cap
    * overflow drops it, the usual skew guard), bucket-local ordered
    * pair emission, distinct. Spans are 64-bit xxh64 hashes: a
    * false pair needs a hash collision (~(#distinct spans)²/2⁶⁵ —
    * negligible below ~10⁸ spans; re-verify pairs downstream if
    * that matters at your scale).
    */
  def spanOverlapPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 13,
      maxBucket: Int = 1000
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // strict window semantics: a doc with fewer than k tokens has no
    // k-token span (the fused text kernel's short-doc fallback emits
    // a whole-doc shingle for minhash parity — wrong here), so
    // tokenize once, gate on length, shingle the token array
    val spans = df
      .select(col(idCol).as("id"), graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(col("id"), explode(HE.shingleHashes(col("__toks"), k)).as("span"))
    spans.groupBy("span")
      .agg(PG.cappedCollectList(col("id"), maxBucket + 1).as("m"))
      .filter(size(col("m")) between (2, maxBucket))
      .select(PG.idPairs(col("m")).as(Seq("id_a", "id_b")))
      .distinct()
  }

  /** "No silent caps" telemetry, shared by the *OverflowReport
    * family: exact member counts for buckets PAST `maxBucket` — the
    * buckets the capped-collect pass drops wholesale. One count-only
    * partial-agg shuffle (one long per bucket — far lighter than the
    * element-collecting pass it diagnoses). `n_lost_pairs` is the
    * candidate pairs this bucket would have emitted (LSH redundancy
    * may still surface some of them through other buckets).
    */
  private def overflowReport(keyed: DataFrame, keyCols: Seq[String], maxBucket: Int): DataFrame =
    keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBucket)
      .withColumn("n_lost_pairs", (col("n_members") * (col("n_members") - 1) / 2).cast("long"))

  /** Overflowed MinHash bands for [[minhashLsh]]'s cap settings —
    * run when a dedup pass on a skewed corpus reports suspiciously
    * few pairs; at 100 TB this report IS the cap-tuning signal.
    * Returns (band, n_members, n_lost_pairs).
    */
  def minhashOverflowReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      maxBucket: Int = 1000
  ): DataFrame = {
    val banded = df
      .select(col(idCol).as("id"), HE.shingleHashesText(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(explode(HE.minhashBandKeys(col("sh"), numHashes, rowsPerBand)).as("band"))
    overflowReport(banded, Seq("band"), maxBucket)
  }

  /** Overflowed SimHash quarter-buckets for [[simhash]]'s cap
    * settings. Returns (q, k, n_members, n_lost_pairs).
    */
  def simhashOverflowReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxBucket: Int = 1000
  ): DataFrame =
    hammingOverflowReport(
      df.select(col(idCol).as("id"), HE.simhashText(col(textCol)).as("sig")),
      "id", "sig", maxBucket)

  /** Overflowed quarter-band buckets for [[hammingPairs64]]'s cap
    * settings, generic over ANY precomputed 64-bit signature column
    * (simhash, image dHash, audio fingerprint). A constant-signature
    * class past `maxBucket` — a black-image or silent-audio cluster
    * at scrape scale — is dropped wholesale by the capped pass; this
    * surfaces it with exact counts (the "no silent caps" contract
    * the text paths already honor via [[simhashOverflowReport]]).
    * Returns (q, k, n_members, n_lost_pairs).
    */
  def hammingOverflowReport(
      df: DataFrame,
      idCol: String,
      sigCol: String,
      maxBucket: Int = 1000,
      maxHamming: Int = 3,
      bands: Int = 4
  ): DataFrame = {
    val quarters = df
      .select(col(sigCol).as("sig"))
      .filter(col("sig").isNotNull)
      .select(explode(hammingBandKeys(col("sig"), bands, probeRadius(maxHamming, bands))).as("b"))
      .select(col("b.q"), col("b.k"))
    overflowReport(quarters, Seq("q", "k"), maxBucket)
  }

  /** Overflowed span-hash buckets for [[spanOverlapPairs]]'s cap
    * settings — a span shared by more than maxBucket docs is
    * boilerplate the capped pass drops; this names it with exact
    * counts. Returns (span, n_members, n_lost_pairs).
    */
  def spanOverflowReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 13,
      maxBucket: Int = 1000
  ): DataFrame = {
    val spans = df
      .select(graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .select(explode(HE.shingleHashes(col("__toks"), k)).as("span"))
    overflowReport(spans, Seq("span"), maxBucket)
  }

  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      orderByFrequency: Boolean = true
  ): DataFrame = {
    val sh = df.select(col(idCol).as("id"), HE.shingleHashesText(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    lazy val prefixLen = (floor(lit(1.0 - threshold) * size(col("sh"))) + 1).cast("int")
    val prefix =
      if (!orderByFrequency)
        sh.select(
          explode(slice(array_sort(col("sh")), lit(1), prefixLen)).as("g"),
          col("id"), size(col("sh")).as("len"))
      else {
        val inverted = sh.select(col("id"), size(col("sh")).as("len"), explode(col("sh")).as("g"))
        val freq = inverted.groupBy("g").agg(count(lit(1)).as("__f"))
        val wOrd = Window.partitionBy("id").orderBy(col("__f"), col("g"))
        inverted
          .join(freq, Seq("g"))
          .withColumn("__rn", row_number().over(wOrd))
          .filter(col("__rn") <= floor(lit(1.0 - threshold) * col("len")) + 1)
          .select("g", "id", "len")
      }
    // PPJoin length filter: J(A,B) ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t —
    // prunes length-incompatible pairs before the distinct.
    // (Both alternative formulations were MEASURED slower here: the
    // positional overlap-bound aggregation loses on heavy-dup
    // corpora, and the collect+[[PG.IdLenPairs]] bucket shape loses
    // because prefix buckets are mostly 1-2 members — per-group
    // object-aggregation overhead exceeds the codegen'd join, unlike
    // the band/quarter buckets in minhash/simhash.)
    val cand = prefix.select(col("g"), col("id").as("id_a"), col("len").as("len_a"))
      .join(prefix.select(col("g"), col("id").as("id_b"), col("len").as("len_b")), Seq("g"))
      .filter(col("id_a") < col("id_b") &&
        col("len_a") >= lit(threshold) * col("len_b") &&
        col("len_b") >= lit(threshold) * col("len_a"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", graft.plans.JaccardRules.jaccardSim(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Asymmetric n-gram CONTAINMENT pairs: `C(A→B) = |A∩B| / |A|` ≥
    * threshold — the "short doc buried inside a long doc" signal
    * [[ngramJaccard]]'s symmetric score structurally misses (a 20-
    * shingle snippet inside a 200-shingle page has J ≈ 0.1 but
    * C = 1.0). The quote/excerpt/boilerplate-wrapper detector of a
    * curation pipeline, and the asymmetric form used for
    * train-set → eval-set contamination.
    *
    * Candidate generation is the asymmetric prefix filter: if B
    * holds ≥ t·|A| of A's shingles it misses at most
    * ⌊(1−t)·|A|⌋ of them, so A's first ⌊(1−t)·|A|⌋+1 shingles in
    * RAREST-FIRST order must hit B — the A side explodes only that
    * prefix, while the B side is the full inverted index (the cost
    * every containment join pays; rarest-first keeps the per-term
    * candidate product small exactly like [[ngramJaccard]]'s
    * measured default). Verify joins the two shingle sets once and
    * gates on the exact ratio. Pairs emit in the contained→container
    * orientation (|A| < |B|, ties id-ordered).
    *
    * @return (id_a, id_b, containment) — id_a's shingles are
    *         `containment`-covered by id_b's
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8
  ): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val sh = df.select(col(idCol).as("id"), HE.shingleHashesText(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val inverted = sh.select(col("id"), size(col("sh")).as("len"), explode(col("sh")).as("g"))
    val freq = inverted.groupBy("g").agg(count(lit(1)).as("__f"))
    val wOrd = Window.partitionBy("id").orderBy(col("__f"), col("g"))
    val prefixA = inverted
      .join(freq, Seq("g"))
      .withColumn("__rn", row_number().over(wOrd))
      .filter(col("__rn") <= floor(lit(1.0 - threshold) * col("len")) + 1)
      .select(col("g"), col("id").as("id_a"), col("len").as("len_a"))
    val cand = prefixA
      .join(inverted.select(col("g"), col("id").as("id_b"), col("len").as("len_b")), Seq("g"))
      .filter(col("len_a") < col("len_b") ||
        (col("len_a") === col("len_b") && col("id_a") < col("id_b")))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(col("sh_a")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** Bounded estimate of hash-order prefix bucket flooding: each
    * doc's single lowest shingle hash IS its first prefix entry
    * under hash order, so distinct(min-shingle)/docs over a
    * partition-spread sample is the inverse of the mean hash-order
    * bucket size. Dup-heavy corpora collide toward 1/dup-factor;
    * low-dup corpora sit near 1. One bounded job (per-partition
    * prefixes, early-terminated — the same spread-sampling shape as
    * the IVF quantizer fit).
    */
  def ngramPrefixCollisionRatio(
      df: DataFrame,
      textCol: String,
      shingleSize: Int = 3,
      sampleSize: Int = 20000
  ): Double = {
    val minsh = df
      .select(HE.shingleHashesText(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(array_min(col("sh")).as("m"))
    val rdd0 = minsh.rdd
    val perPart = math.max(1, sampleSize / math.max(1, rdd0.getNumPartitions))
    val sample = rdd0.mapPartitions(_.take(perPart)).collect().take(sampleSize)
    if (sample.isEmpty) 1.0
    else sample.map(_.getLong(0)).distinct.length.toDouble / sample.length
  }

  /** [[ngramJaccard]] with the prefix ordering chosen from data:
    * frequency order (rarest-first, 4 shuffles, flood-proof —
    * MEASURED 3.5× faster on the 20×-dup probe) when the sampled
    * min-shingle collision ratio says hash-order buckets would
    * flood; the 1-shuffle hash-order plan otherwise. Output is
    * identical either way — only the plan shape changes.
    */
  def ngramJaccardAuto(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      sampleSize: Int = 20000,
      collisionThreshold: Double = 0.7
  ): DataFrame = {
    val ratio = ngramPrefixCollisionRatio(df, textCol, shingleSize, sampleSize)
    ngramJaccard(df, idCol, textCol, shingleSize, threshold,
      orderByFrequency = ratio < collisionThreshold)
  }

  /** Full dedup pipeline — the recommended entry point at scale:
    * (1) exact dedup on a content fingerprint (cheap, removes the
    * identical-copy clusters that would otherwise blow up LSH
    * buckets quadratically — a corpus with d-sized dup clusters
    * pays O(d²) per cluster in any pair-emitting stage), then
    * (2) MinHash-LSH near-dup over the exact survivors, dropping
    * every near-dup pair's higher id.
    *
    * Returns the surviving rows of `df`.
    */
  /** @param numHashes minhash count = bands·rowsPerBand. Candidate
    *   RECALL at the threshold boundary is 1 − (1 − s^r)^b — with
    *   the 64-hash default (16 bands of 4) a pair at s = 0.70 is
    *   missed with p ≈ 1.2%, which a big-enough corpus WILL realize
    *   (the r12 sf1 sweep caught exactly one such organic pair).
    *   Callers grading against an exact-jaccard oracle want 256
    *   (64 bands → boundary miss ≈ 2.4e-8); production curation
    *   trades bands for shuffle volume knowingly.
    */
  def dedupAll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      threshold: Double = 0.7,
      numHashes: Int = 64
  ): DataFrame = {
    val exactSurvivors = exact(df, idCol, md5(col(textCol)))
    val nearPairs = minhashLsh(exactSurvivors, idCol, textCol, shingleSize,
      numHashes = numHashes, threshold = threshold)
    val losers = nearPairs.select(col("id_b").as(idCol)).distinct()
    exactSurvivors.join(losers, Seq(idCol), "left_anti")
  }

  /** Resolve verified near-dup PAIRS into transitive CLUSTERS:
    * connected components. Pair-drop dedup (keep the lower id of
    * each pair) over-deletes on chains (a~b, b~c deletes both b and
    * c even if a~c is false); clustering keeps exactly one
    * representative per component.
    *
    * Two regimes, chosen by edge count:
    *  - edges ≤ `driverEdgeThreshold` (long ids): exact union-find
    *    on the driver after one bounded collect — near-dup edge
    *    sets are ≪ corpus, and union-find is O(E·α) with zero
    *    further cluster jobs. Driver cost at the default 2M
    *    threshold: ~2M small rows + a boxed parent map of ≤4M
    *    entries — a few hundred MB, bounded. This is the common
    *    case even at 100 TB corpora.
    *  - otherwise: [[GraphOps.connectedComponents]] — alternating
    *    large-star / small-star over the edge table (edges never
    *    grow, O(log n) rounds even for chain-shaped clusters where
    *    plain label propagation needs O(diameter)).
    *
    * Returns (id, cluster_id = component min).
    */
  def dupClusters(
      pairs: DataFrame,
      maxIterations: Int = 20,
      driverEdgeThreshold: Long = -1L /* <0 → spark.graft.dedup.driverEdgeThreshold */
  ): DataFrame = {
    val spark = pairs.sparkSession
    // negative = "use the session conf" (default 2M edges); an
    // explicit 0 disables the driver union-find entirely.
    val edgeThreshold =
      if (driverEdgeThreshold >= 0) driverEdgeThreshold
      else graft.GraftConf.dedupDriverEdgeThreshold(spark)
    require(edgeThreshold >= 0, "driverEdgeThreshold must be >= 0")

    val idType = pairs.schema("id_a").dataType
    if (idType == org.apache.spark.sql.types.LongType && edgeThreshold > 0) {
      // probe one row beyond the threshold; clamp so thresholds near
      // Long.MaxValue can't overflow the Int limit
      val probeLimit = math.min(edgeThreshold + 1, Int.MaxValue.toLong - 1).toInt
      val raw = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .limit(probeLimit)
        .collect()
      // raw.length < probeLimit ⇒ limit() did not truncate AND (since
      // probeLimit ≤ threshold+1) raw.length ≤ threshold. When the Int
      // clamp makes probeLimit < threshold+1, a full probe falls
      // through to the distributed path instead of silently running
      // union-find on a partial edge set.
      if (raw.length < probeLimit) {
        // driver union-find with path compression
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
          var c = x
          while (parent.getOrDefault(c, c) != c) { val n = parent.getOrDefault(c, c); parent.put(c, r); c = n }
          r
        }
        raw.foreach { e =>
          val (a, b) = (e.getLong(0), e.getLong(1))
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
        }
        import scala.jdk.CollectionConverters._
        val labels = parent.keySet().asScala.toSeq.map(id => (id, find(id)))
        import spark.implicits._
        return labels.toDF("id", "cluster_id")
      }
      // fall through to the distributed path when the probe filled up
    }
    GraphOps.connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")), maxIterations)
      .select(col("id"), col("component").as("cluster_id"))
  }

  /** Embedding near-dup: hyperplane-LSH bucket join + cosine
    * verify ≥ threshold. Same candidate/verify shape as minhashLsh.
    *
    * @param nTables OR-amplification: each vector is bucketed under
    *   `nTables` independent hyperplane sets (distinct seeds) and a
    *   pair is a candidate if ANY table agrees — for near-identical
    *   vectors at angle θ the miss probability drops from
    *   1−(1−θ/π)^nBits to (1−(1−θ/π)^nBits)^nTables. The shuffle
    *   stays ONE groupBy, now over n·nTables (table, bucket) rows —
    *   the same O(n·bands) shape as minhash banding.
    */
  def embeddingDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nBits: Int = 16,
      maxBucket: Int = 2000,
      nTables: Int = 1
  ): DataFrame = {
    require(nTables >= 1, "nTables must be >= 1")
    // null vector → null bkt; drop before bucketing (groupBy keeps
    // the null bucket and CosinePairs would NPE on a null member)
    val tableKeys = array((0 until nTables).map(tbl =>
      struct(lit(tbl).as("tbl"), HE.hyperplaneLsh(col(vecCol), nBits, seed = 7L + tbl).as("bits"))): _*)
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"), explode(tableKeys).as("bkt"))
      .filter(col("v").isNotNull)
    // one shuffle: vectors ride into their bucket once; cosine
    // verify is fused into the bucket-local pair scan (norms
    // computed once per member) — no self-join, no second pass
    val buckets = sigs.groupBy("bkt")
      .agg(PG.cappedCollectList(struct(col("id"), col("v")), maxBucket + 1).as("m"))
      .filter(size(col("m")) <= maxBucket)
    buckets
      .select(PG.cosinePairs(col("m"), threshold).as(Seq("id_a", "id_b", "cosine")))
      .select(col("id_a"), col("id_b"), col("cosine"))
      .distinct()
  }

  /** Bloom filter over a single long column in ONE distributed
    * pass — `treeAggregate`, so partial filters merge in a tree
    * instead of all landing on the driver, and the empty-input case
    * degrades to an all-miss filter instead of the NPE
    * `stat.bloomFilter` throws.
    *
    * The filter is [[graft.functions.SeededBloom]], NOT Spark's
    * `util.sketch.BloomFilter`: the latter's double-hashed probe
    * positions give it a false-positive FLOOR of ~nItems/m² that
    * dwarfs a small requested fpp — the r12 sf1 sweep caught it
    * dropping a clean document through a 1e-9 filter (see the
    * SeededBloom scaladoc for the arithmetic). Probe-only callers
    * (the streaming/saved-filter paths, where no exact verify join
    * can follow) need the advertised fpp to be real.
    */
  private def bloomOf(
      keys: DataFrame,
      expectedItems: Long,
      fpp: Double
  ): graft.functions.SeededBloom =
    keys.rdd.treeAggregate(
      graft.functions.SeededBloom.create(math.max(expectedItems, 1L), fpp))(
      (f, row) => { if (!row.isNullAt(0)) f.putLong(row.getLong(0)); f },
      (a, b) => { a.mergeInPlace(b); a })

  /** Drop incoming docs whose `textCol` already exists in a
    * reference corpus — exact membership semantics (equal text),
    * Bloom-gated so the non-matching majority never shuffles.
    *
    * Shape: ONE distributed pass over the corpus builds a Bloom
    * filter of `xxhash64(text)` (`stat.bloomFilter` aggregates it
    * tree-wise; the result broadcasts once per executor). Incoming
    * docs probe the filter inside the scan stage (codegen'd
    * [[graft.functions.CurationExpressions.InBloom]]): a miss is
    * DEFINITIVE (no false negatives) and that row is kept with zero
    * shuffle; only the Bloom-positive minority rides an exact
    * `left_anti` join against the corpus text to clear false
    * positives. At fpp=0.01 that join carries ~1% of clean rows
    * plus the true dups — the corpus-side shuffle is the only
    * full-width exchange, and it happens once.
    */
  def dedupAgainstCorpus(
      docs: DataFrame,
      corpus: DataFrame,
      textCol: String,
      expectedCorpusItems: Long = 1000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    // ONE corpus pass builds the filter (treeAggregate — unlike
    // stat.bloomFilter it is empty-safe: a zero-insert filter
    // misses everything, so an empty corpus keeps every doc with no
    // extra isEmpty job)
    val bf = bloomOf(corpus.select(xxhash64(col(textCol)).as("__k")), expectedCorpusItems, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    val probed = docs.withColumn("__maybe",
      graft.functions.CurationExpressions.inBloom(xxhash64(col(textCol)), bc))
    val clean = probed.filter(!col("__maybe")).drop("__maybe")
    // no distinct() on the corpus side: left_anti is set semantics
    // already, and the pre-dedup would cost an extra full shuffle
    val suspects = probed.filter(col("__maybe")).drop("__maybe")
      .join(corpus.select(col(textCol)), Seq(textCol), "left_anti")
    clean.unionByName(suspects)
  }

  /** Hashes of lines occurring ≥ `minCount` times across the corpus
    * — the duplicated-boilerplate set for [[dedupLines]].
    * `xxhash64` on the raw line (empty lines included: a corpus-wide
    * repeated blank is boilerplate like any other repeated line).
    *
    * Shape: explode is scan-stage; the groupBy map-side-combines, so
    * the ONE exchange carries (hash, partial count) for distinct
    * hashes per partition, never the line text.
    */
  def duplicatedLineHashes(
      df: DataFrame,
      textCol: String,
      delimiter: String = "\n",
      minCount: Int = 2
  ): DataFrame =
    df.select(explode(split(col(textCol),
        java.util.regex.Pattern.quote(delimiter))).as("__line"))
      .select(xxhash64(col("__line")).as("line_hash"))
      .groupBy("line_hash").count()
      .filter(col("count") >= minCount)
      .select("line_hash")

  /** CCNet-style line-level corpus dedup: drop every line that
    * appears ≥ `minCount` times ACROSS the corpus (navigation bars,
    * cookie banners, boilerplate footers), keep the rest of each
    * document in order. The cleaned text lands in `outputCol`; docs
    * that were pure boilerplate come back as "".
    *
    * Shape: one count pass whose exchange carries only distinct
    * line hashes (see [[duplicatedLineHashes]]); the duplicated set
    * — boilerplate lines, a tiny fraction of distinct lines — is
    * collected (driver-bounded by `maxDupHashes`, 8 B per hash) and
    * rides into the scan as a sorted primitive array, so the scrub
    * itself is a ZERO-shuffle codegen'd map
    * ([[graft.functions.CurationExpressions.ScrubDuplicatedLines]]).
    * The corpus text never shuffles. If a corpus legitimately has
    * more than `maxDupHashes` duplicated lines, raise the cap
    * (driver memory is the only constraint) or pre-restrict with a
    * higher `minCount`.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      delimiter: String = "\n",
      minCount: Int = 2,
      outputCol: String = "text_clean",
      maxDupHashes: Int = 1 << 23
  ): DataFrame = {
    val dup = duplicatedLineHashes(df, textCol, delimiter, minCount)
      .limit(maxDupHashes + 1)
      .collect()
      .map(_.getLong(0))
    require(dup.length <= maxDupHashes,
      s"more than $maxDupHashes duplicated lines; raise maxDupHashes or minCount")
    java.util.Arrays.sort(dup)
    df.withColumn(outputCol,
      graft.functions.CurationExpressions.scrubDuplicatedLines(col(textCol), delimiter, dup))
  }

  /** Remove training docs that share any word `n`-gram with an
    * evaluation set — benchmark decontamination (the GPT-3/PaLM
    * style n-gram overlap rule). Identity is the shingle hash from
    * [[HE.shingleHashesText]] (same tokenizer + short-doc
    * whole-window rule as the Jaccard family).
    *
    * Shape: the eval set (small by construction) explodes ONCE to
    * its distinct shingle hashes, which aggregate into a broadcast
    * Bloom filter. Every doc then probes the filter per-shingle
    * inside the scan stage — `exists(shingles, in_bloom)` — so the
    * uncontaminated majority is cleared with ZERO shuffle and no
    * explode. Only Bloom-positive suspects explode their shingles
    * for the exact verify: a broadcast semi-join against the real
    * eval-shingle set, which also clears Bloom false positives.
    */
  /** Distinct eval-set shingle hashes + their broadcast Bloom —
    * shared by the exact and streaming decontaminate paths.
    */
  private def evalShingleBloom(
      docs: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      n: Int,
      expectedEvalShingles: Long,
      fpp: Double
  ): (DataFrame, org.apache.spark.broadcast.Broadcast[graft.functions.SeededBloom]) = {
    val evalShingles = evalSet
      .select(explode(HE.shingleHashesText(col(textCol), n)).as("__sh"))
      .distinct()
    val bf = bloomOf(evalShingles, expectedEvalShingles, fpp)
    (evalShingles, docs.sparkSession.sparkContext.broadcast(bf))
  }

  def decontaminate(
      docs: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5,
      expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.001
  ): DataFrame = {
    val (evalShingles, bc) = evalShingleBloom(docs, evalSet, textCol, n, expectedEvalShingles, fpp)
    val shingles = HE.shingleHashesText(col(textCol), n)
    // null text has no shingles and cannot be contaminated — without
    // the coalesce the null probe fails BOTH branch filters and the
    // row silently vanishes
    val probed = docs.withColumn("__maybe",
      coalesce(exists(shingles, s => graft.functions.CurationExpressions.inBloom(s, bc)), lit(false)))
    val clean = probed.filter(!col("__maybe")).drop("__maybe")
    val suspects = probed.filter(col("__maybe")).drop("__maybe")
    val contaminatedIds = suspects
      .select(col(idCol), explode(shingles).as("__sh"))
      .join(broadcast(evalShingles), Seq("__sh"))
      .select(idCol).distinct()
    clean.unionByName(suspects.join(contaminatedIds, Seq(idCol), "left_anti"))
  }

  /** Streaming-safe corpus-membership dedup: the Bloom probe alone,
    * no verify join — the stream-side twin of [[dedupAgainstCorpus]]
    * for `readStream → filter → writeStream` ingestion against a
    * static reference corpus. Bloom false positives drop
    * conservatively (a clean doc is lost at ≤ fpp probability —
    * tune fpp down when that matters); true members are NEVER kept,
    * since Bloom has no false negatives.
    */
  def dedupAgainstCorpusStream(
      docs: DataFrame,
      corpus: DataFrame,
      textCol: String,
      expectedCorpusItems: Long = 1000000L,
      fpp: Double = 0.0001
  ): DataFrame = {
    val bf = bloomOf(corpus.select(xxhash64(col(textCol)).as("__k")), expectedCorpusItems, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    docs.filter(!graft.functions.CurationExpressions.inBloom(xxhash64(col(textCol)), bc))
  }

  /** Streaming-safe decontamination: the Bloom probe alone, no
    * verify join (distinct + anti-join don't stream). The probe is
    * a stateless scan-stage filter, so this runs identically on a
    * batch frame or inside `readStream → filter → writeStream`.
    *
    * Semantics vs [[decontaminate]]: Bloom false POSITIVES are
    * dropped without verification — the conservative direction for
    * decontamination (a clean doc is lost at ≤ shingles·fpp
    * probability; contaminated docs are NEVER kept, since Bloom has
    * no false negatives). Tune `fpp` down if over-dropping matters.
    */
  def decontaminateStream(
      docs: DataFrame,
      evalSet: DataFrame,
      textCol: String,
      n: Int = 5,
      expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.0001
  ): DataFrame = {
    val (_, bc) = evalShingleBloom(docs, evalSet, textCol, n, expectedEvalShingles, fpp)
    docs.filter(!coalesce(exists(HE.shingleHashesText(col(textCol), n),
      s => graft.functions.CurationExpressions.inBloom(s, bc)), lit(false)))
  }

  /** Per-document n-gram NOVELTY against a reference corpus — the
    * graded complement of [[decontaminate]]'s boolean gate: the
    * fraction of a doc's DISTINCT word n-grams never seen in the
    * reference (1.0 = fully novel, 0.0 = fully memorized). The
    * memorization/"how much of this is verbatim old corpus" score
    * for incremental crawls and synthetic-data audits. Identity is
    * the shingle hash from [[HE.shingleHashesText]] (same
    * tokenizer + short-doc whole-window rule as the Jaccard
    * family).
    *
    * Scale shape: the reference explodes ONCE to its distinct
    * shingle-hash frame, which also aggregates into a broadcast
    * Bloom filter. Each doc's distinct shingles probe the filter
    * INSIDE the scan stage (`filter(arr, in_bloom)` — codegen, no
    * explode): Bloom misses are DEFINITIVELY novel and cost zero
    * shuffle, so a mostly-novel corpus (the common case) barely
    * touches the join. Only Bloom-positive shingles explode into
    * the exact hash equi-join against the reference frame, which
    * clears false positives; ONE groupBy(doc) re-collapses. The
    * reference frame is a full-width shuffle ONCE (vocabulary-
    * sized, never broadcast); novel counts are exact integers and
    * the fraction snaps to the 1e-9 grid.
    */
  def ngramNovelty(
      docs: DataFrame,
      ref: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      expectedRefShingles: Long = 1000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    val refShingles = ref
      .select(explode(HE.shingleHashesText(col(textCol), n)).as("__sh"))
      .distinct()
    val bf = bloomOf(refShingles, expectedRefShingles, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    val inB = (c: Column) => graft.functions.CurationExpressions.inBloom(c, bc)
    val sh = docs.select(col(idCol),
      array_distinct(coalesce(HE.shingleHashesText(col(textCol), n),
        array().cast("array<long>"))).as("__s"))
    val probed = sh.select(
      col(idCol),
      size(col("__s")).as("n_ngrams"),
      size(filter(col("__s"), x => !inB(x))).as("__miss"),
      filter(col("__s"), x => inB(x)).as("__suspects"))
    probed
      .select(col(idCol), col("n_ngrams"), col("__miss"),
        explode_outer(col("__suspects")).as("__sh"))
      .join(refShingles.withColumn("__hit", lit(1)), Seq("__sh"), "left")
      .groupBy(col(idCol), col("n_ngrams"), col("__miss"))
      .agg(sum(when(col("__sh").isNotNull && col("__hit").isNull, 1L).otherwise(0L))
        .as("__fp_novel"))
      .select(col(idCol), col("n_ngrams"),
        (col("__miss") + col("__fp_novel")).as("novel"))
      .withColumn("novelty", when(col("n_ngrams") > 0,
        floor(col("novel").cast("double") / col("n_ngrams").cast("double") * lit(1e9)
          + lit(0.5)) / lit(1e9)))
  }

  /** SemDeDup-style semantic dedup: k-means clusters as dedup
    * buckets (Abbas et al. 2023 — cluster the embedding space, then
    * prune near-duplicate pairs WITHIN each cluster). The
    * data-adaptive complement to [[embeddingDedup]]'s oblivious
    * hyperplane buckets: centroids follow the corpus density, so
    * semantically tight regions land in one bucket without
    * multi-table amplification.
    *
    * Shape mirrors the IVF build + one-shuffle dedup pattern:
    * bounded partition-spread driver sample → Lloyd's (the same
    * seeded k-means++ as [[IvfKnnOps.buildIndex]]) → zero-shuffle
    * [[IvfKnnOps.NearestCentroid]] assignment in the scan → ONE
    * groupBy(cluster) with capped collect → fused cosine pair
    * verify. Caveat (inherent to SemDeDup): a pair straddling a
    * Voronoi boundary is missed; raise `nClusters` resolution or
    * fall back to [[embeddingDedup]] when recall dominates.
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nClusters: Int = 256,
      maxBucket: Int = 2000,
      seed: Long = 42L,
      maxIter: Int = 10,
      maxSample: Int = -1 /* ≤0 → spark.graft.ann.fitMaxSample */,
      nProbe: Int = 1
  ): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sample = IvfKnnOps.sampleVectors(df, vecCol, maxSample)
    // empty / all-null input -> zero duplicate pairs, not a crash
    // (a scheduled pipeline may legitimately hit an empty partition)
    if (sample.isEmpty) {
      val spark = df.sparkSession
      val idType = df.schema(idCol).dataType
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id_a", idType),
          org.apache.spark.sql.types.StructField("id_b", idType),
          org.apache.spark.sql.types.StructField("cosine", org.apache.spark.sql.types.DoubleType))))
    }
    val centers = IvfKnnOps.lloyds(sample, math.min(nClusters, sample.length), maxIter, seed)
    // nProbe > 1 = multi-probe assignment: a near-identical pair
    // straddling a Voronoi boundary under single assignment lands in
    // DIFFERENT buckets and is never compared; probing the nProbe
    // nearest buckets makes boundary twins co-bucket (the final
    // distinct() collapses pairs found in more than one shared
    // bucket). Cost: nProbe x the bucket row count.
    val bkts = ColumnBridge.column(
      IvfKnnOps.TopCentroids(ColumnBridge.expression(col(vecCol)), centers, nProbe))
    val assigned = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        explode(bkts).as("bkt"))
      .filter(col("v").isNotNull)
    val buckets = assigned.groupBy("bkt")
      .agg(PG.cappedCollectList(struct(col("id"), col("v")), maxBucket + 1).as("m"))
      .filter(size(col("m")) <= maxBucket)
    buckets
      .select(PG.cosinePairs(col("m"), threshold).as(Seq("id_a", "id_b", "cosine")))
      .select(col("id_a"), col("id_b"), col("cosine"))
      .distinct()
  }

  /** Overflowed k-means buckets for [[semanticDedup]]'s cap settings
    * — the "no silent caps" telemetry of the D12 family for the
    * SemDeDup path: a bucket past `maxBucket` is dropped wholesale
    * by the capped-collect pass, so this report is THE signal that
    * `nClusters` is undersized for the corpus (the r12 sf1 sweep
    * realized exactly that: a 16-cluster fixture at 4× the vectors
    * averaged `maxBucket` members per bucket and silently lost half
    * the planted twins). Returns (bkt, n_members, n_lost_pairs);
    * re-fit with nClusters scaled to ~corpus/1000 when non-empty.
    * Same seeded fit + assignment as the dedup pass, so the counts
    * are the counts the dedup actually saw.
    */
  def semanticOverflowReport(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int = 256,
      maxBucket: Int = 2000,
      seed: Long = 42L,
      maxIter: Int = 10,
      maxSample: Int = -1 /* ≤0 → spark.graft.ann.fitMaxSample */,
      nProbe: Int = 1
  ): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val sample = IvfKnnOps.sampleVectors(df, vecCol, maxSample)
    val spark = df.sparkSession
    if (sample.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bkt", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("n_members", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_lost_pairs", org.apache.spark.sql.types.LongType))))
    }
    val centers = IvfKnnOps.lloyds(sample, math.min(nClusters, sample.length), maxIter, seed)
    val bkts = ColumnBridge.column(
      IvfKnnOps.TopCentroids(ColumnBridge.expression(col(vecCol)), centers, nProbe))
    val assigned = df.select(col(vecCol).as("v"), explode(bkts).as("bkt"))
      .filter(col("v").isNotNull)
    overflowReport(assigned, Seq("bkt"), maxBucket)
  }

  // ---- D17: persisted cross-run near-dedup band index ---------------------

  private def bandArrOf(c: Column, shingleSize: Int, numHashes: Int, rowsPerBand: Int): Column =
    HE.minhashBandKeys(HE.shingleHashesText(c, shingleSize), numHashes, rowsPerBand)

  /** Persist the corpus's distinct MinHash band keys as a BUCKETED
    * table — the cross-RUN near-dedup index. [[dedupAgainstCorpus]]
    * recomputes corpus bands per invocation; a daily-ingestion
    * pipeline deduping each new crawl against an ever-growing corpus
    * should pay the corpus pass ONCE and append increments. Bucketed
    * by band, the per-run probe join arrives pre-partitioned on the
    * index side — only the NEW docs' bands shuffle, never the index
    * (the [[graft.operators.BucketOps]] contract; at 100 TB the
    * index side is the one you cannot afford to re-exchange).
    *
    * Index rows are distinct band LONGS (8 bytes each, ~bands/doc ×
    * docs) — no text, no ids: membership is all near-dedup needs.
    */
  def saveBandIndex(
      corpus: DataFrame,
      textCol: String,
      table: String,
      shingleSize: Int = 5,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      buckets: Int = 64
  ): Unit =
    BucketOps.writeBucketed(
      corpus.select(explode(bandArrOf(col(textCol), shingleSize, numHashes, rowsPerBand)).as("band"))
        .distinct(),
      table, "band", buckets)

  /** Append a new batch's distinct bands to the saved index (same
    * bucket spec, so co-location survives appends). Appended bands
    * may duplicate existing ones — membership probing is unaffected
    * and a periodic rewrite ([[saveBandIndex]] over the union)
    * compacts if file count grows.
    */
  def appendToBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      newDocs: DataFrame,
      textCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      buckets: Int = 64
  ): Unit =
    newDocs.select(explode(bandArrOf(col(textCol), shingleSize, numHashes, rowsPerBand)).as("band"))
      .distinct()
      .write.mode("append").bucketBy(buckets, "band")
      .format("parquet").saveAsTable(table)

  /** Near-dedup a batch OR STREAM of docs against the saved band
    * index: keep docs sharing NO band with the indexed corpus. The
    * stream-static join re-resolves the table per microbatch, so an
    * index that grows between triggers is picked up automatically —
    * the [[graft.streaming.EventStreams.streamingDedupAgainstCorpus]]
    * serving shape without recomputing corpus bands per run. Null-
    * text docs route through as kept (explode_outer; the
    * keep-unless-duplicate contract).
    *
    * @return (idCol, textCol) — the survivors
    */
  def dedupAgainstBandIndex(
      docs: DataFrame,
      table: String,
      idCol: String,
      textCol: String,
      shingleSize: Int = 5,
      numHashes: Int = 64,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val spark = docs.sparkSession
    val index = spark.table(table).withColumn("__hit", lit(1))
    if (docs.isStreaming) {
      // stream-stream joins are unsupported, so the microbatch path
      // keeps the single-aggregation shape — text copies through the
      // band shuffle are bounded by microbatch size, not corpus size
      docs
        .select(col(idCol), col(textCol),
          explode_outer(bandArrOf(col(textCol), shingleSize, numHashes, rowsPerBand)).as("band"))
        .join(index, Seq("band"), "left_outer")
        .groupBy(col(idCol))
        .agg(first(col(textCol)).as(textCol), max(coalesce(col("__hit"), lit(0))).as("__hits"))
        .filter(col("__hits") === 0)
        .select(col(idCol), col(textCol))
    } else {
      // batch serving shape: the band-keyed exchange carries
      // (id, band) ONLY — never the text column (the old shape
      // shipped docs×bands text copies through the probe shuffle).
      // Hit ids collapse to one row per doc; survivors ship each
      // text exactly once through an id-keyed collapse. The
      // streaming shape's contract is preserved exactly: one output
      // row per id (duplicate-id inputs collapse via first), and a
      // NULL id still groups/matches (null-safe anti-join key — a
      // plain left_anti would wave every null-id doc through the
      // contamination gate unexamined).
      val hitIds = docs
        .select(col(idCol),
          explode_outer(bandArrOf(col(textCol), shingleSize, numHashes, rowsPerBand)).as("band"))
        .join(index, Seq("band"), "left_outer")
        .groupBy(col(idCol))
        .agg(max(coalesce(col("__hit"), lit(0))).as("__hits"))
        .filter(col("__hits") > 0)
        .select(col(idCol).as("__hit_id"))
      docs.groupBy(col(idCol)).agg(first(col(textCol)).as(textCol))
        .join(hitIds, col(idCol) <=> col("__hit_id"), "left_anti")
        .select(col(idCol), col(textCol))
    }
  }


  // ---- D18: persisted decontamination Bloom -------------------------------

  /** Persist the eval-set shingle Bloom filter — the decontamination
    * gate as a saved artifact. [[decontaminateStream]] rebuilds the
    * filter from the eval set per run; a serving pipeline gating
    * every crawl against a stable benchmark suite should build it
    * ONCE, ship the (kilobytes-to-megabytes) filter file, and let
    * each run load + broadcast it — no eval-set access, no build
    * pass, and the eval TEXTS never travel with the job (only
    * hashes, which also matters for holdout secrecy). Written via
    * the Hadoop FileSystem API, so `path` may be any scheme the
    * cluster reaches (file:/, hdfs:/, s3a:/).
    */
  def saveDecontaminationBloom(
      evalSet: DataFrame,
      textCol: String,
      path: String,
      n: Int = 5,
      expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.0001
  ): Unit = {
    val shingles = evalSet
      .select(explode(HE.shingleHashesText(col(textCol), n)).as("__sh"))
      .distinct()
    val bf = bloomOf(shingles, expectedEvalShingles, fpp)
    val spark = evalSet.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try bf.writeTo(out) finally out.close()
  }

  /** Merge a NEW eval set's shingles into the saved filter (same
    * `expectedEvalShingles`/`fpp` so the bit layouts are
    * mergeable) — benchmark-suite accretion without rebuilding.
    */
  def mergeIntoDecontaminationBloom(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      newEval: DataFrame,
      textCol: String,
      n: Int = 5,
      expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.0001
  ): Unit = {
    val existing = loadDecontaminationBloom(spark, path)
    val shingles = newEval
      .select(explode(HE.shingleHashesText(col(textCol), n)).as("__sh"))
      .distinct()
    val incoming = bloomOf(shingles, expectedEvalShingles, fpp)
    existing.mergeInPlace(incoming)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try existing.writeTo(out) finally out.close()
  }

  /** Load a persisted decontamination filter (SBL1/SBL2 streams —
    * see [[graft.functions.SeededBloom.readFrom]]).
    *
    * FORMAT NOTE: releases before the r12 double-hash fix persisted
    * Spark `util.sketch.BloomFilter` streams. Those are detected by
    * magic and rejected with an actionable error — they cannot be
    * converted in place (the old geometry is exactly the fpp-floor
    * defect the new filter fixes), so re-run
    * [[saveDecontaminationBloom]] over the original eval set once;
    * the rebuilt file is then stable across releases.
    */
  def loadDecontaminationBloom(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): graft.functions.SeededBloom = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try graft.functions.SeededBloom.readFrom(in) finally in.close()
  }

  /** [[decontaminateStream]]'s probe against a SAVED filter — batch
    * or streaming docs, stateless scan-stage filter, conservative at
    * the filter's fpp (an FP drops a clean doc; contamination can
    * never leak). Null-text docs have no shingles and pass.
    */
  def decontaminateWithSavedBloom(
      docs: DataFrame,
      path: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    val bf = loadDecontaminationBloom(docs.sparkSession, path)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    docs.filter(!coalesce(exists(HE.shingleHashesText(col(textCol), n),
      s => graft.functions.CurationExpressions.inBloom(s, bc)), lit(false)))
  }

  /** Exact-substring span dedup at token-window granularity (the
    * Lee et al. 2022 "Deduplicating Training Data Makes Language
    * Models Better" operator, re-expressed for Spark): every word
    * `n`-gram that occurs at more than one (doc, position) site
    * ACROSS the corpus keeps its FIRST occurrence in (id, pos)
    * order and is scrubbed from every later site — token-level
    * removal, so a doc that merely quotes an earlier doc loses the
    * quoted span, not the whole doc (the gap [[dedupLines]] leaves:
    * line dedup misses sub-line/reflowed copies, whole-doc minhash
    * misses partial copies). Cleaned text lands in `outputCol`
    * (tokens re-joined single-spaced); `removed_tokens` counts the
    * scrubbed tokens per doc.
    *
    * Scale shape (no suffix array needed): the duplicate-detection
    * passes carry only (id, pos, xxhash64) rows — ONE hash-aggregate
    * on the window hash (count + min(struct(id,pos)), both
    * partial-aggregable, so a million-fold repeated boilerplate
    * window collapses map-side — no row_number sort skew), one
    * sites⋈dup-windows hash join (AQE-skew-splittable), one
    * groupBy(id) covered-index collect bounded by the doc's own
    * token count. The text moves only in the final attach join of
    * the covered-index frame (touched docs only): AQE broadcasts it
    * when the touched set is small, and the worst case is ONE
    * id-keyed text shuffle — the unavoidable colocate-to-rewrite
    * step. Everything is content-derived: layout- and
    * partitioning-invariant.
    *
    * Identity is the 64-bit window hash (the minhash family's
    * convention); tokens are whitespace-split, so reconstruction
    * normalizes runs of whitespace to single spaces.
    *
    * CONTRACT: `idCol` must uniquely identify a row. The covered-
    * index pass groups token positions BY ID — rows sharing an id
    * would conflate their positions and scrub the wrong tokens in
    * every such row (unlike [[decontaminate]], which tolerates
    * duplicate ids by construction). Uniqueness is the caller's
    * responsibility; a full distinct-count pre-pass per call would
    * double the operator's shuffle bill at corpus scale. Set
    * `spark.graft.debug=true` to PAY that pre-pass during pipeline
    * development: duplicate ids then fail loudly here instead of
    * silently mis-scrubbing.
    */
  def removeRepeatedNgrams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      outputCol: String = "text_clean"
  ): DataFrame = {
    require(n >= 2, s"window size must be >= 2 tokens, got $n")
    if (df.sparkSession.conf.getOption("spark.graft.debug").exists(_.toBoolean)) {
      val dups = df.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(5)
        .collect().map(_.get(0)).toSeq
      require(dups.isEmpty,
        s"removeRepeatedNgrams contract violated: duplicate $idCol values ${dups.mkString(", ")}" +
          " (detected because spark.graft.debug=true; the covered-index pass groups by id)")
    }
    val reserved = Seq("__tk", "__cov", "__pos", "__h", "__c", "__f", "__i",
      outputCol, "removed_tokens")
    require(!df.columns.exists(reserved.contains),
      s"input columns collide with reserved/output names ${reserved.mkString(", ")}")
    val sep = "\u0001"
    val base = df.withColumn("__tk",
      split(trim(coalesce(col(textCol), lit(""))), "\\s+"))
    val sites = base
      .select(col(idCol), posexplode(
        when(size(col("__tk")) >= n,
          transform(sequence(lit(0), size(col("__tk")) - n),
            p => xxhash64(concat_ws(sep, slice(col("__tk"), p + lit(1), lit(n))))))
          .otherwise(array().cast("array<bigint>"))))
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__h")
    // duplicated windows + their first site: partial-aggregable, so
    // the exchange carries one row per distinct window per partition
    val dupWins = sites
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col(idCol).as("d"), col("__pos").as("p"))).as("__f"))
      .filter(col("__c") > 1)
      .select(col("__h"), col("__f"))
    val dupSites = sites.join(dupWins, Seq("__h"))
      .filter(!(col(idCol) === col("__f.d") && col("__pos") === col("__f.p")))
    // per-doc covered-index sets are unbounded state (up to the
    // doc's token count) — the collect must stay OFF the hot
    // ObjectHashAggregate hash path (FunnelOps.funnel has the full
    // rationale). Collect the dup SITES (one row per site, not the
    // n-exploded positions: n× fewer window rows and a sites-sized
    // array materialized per row instead of a covered-sized one)
    // through a window collect_set — WindowExec buffers one doc at a
    // time, spillable — then reduce to one row per doc with
    // first(): a DeclarativeAggregate over an array buffer plans as
    // SortAggregate, which streams one already-sorted group at a
    // time (the window's doc_id sort satisfies its ordering, so no
    // new sort or exchange), holding a single prebuilt array —
    // never an unbounded growing buffer on a hash path. The keyed
    // Aggregate also restores the unique-join-key property the
    // row_number()=1 filter it replaces hid from the optimizer: a
    // downstream count/exists over the scrub can eliminate the left
    // join again (it could through r14's groupBy, and lost that
    // through r15's window+filter — a measured 0.2 s → 2.5 s cliff
    // on count-shaped actions at sf0.1).
    val wId = Window.partitionBy(col(idCol))
    val covered = dupSites
      .select(col(idCol), col("__pos"))
      .withColumn("__sites", collect_set(col("__pos")).over(wId))
      .groupBy(col(idCol))
      .agg(first(col("__sites")).as("__sites"))
    // kept tokens via array_except over the index range — a hash-set
    // build over __cov then a linear walk, O(tokens + covered); the
    // per-token array_contains lambda this replaces rescanned the
    // covered array for every token, O(tokens · covered) on
    // boilerplate-heavy docs (the r14 verdict's measured bottleneck).
    // __cov (the distinct covered positions) expands from the sites
    // array AFTER the join, doc-locally — same set as the exploded
    // collect it replaces, never shuffled.
    base.join(covered, Seq(idCol), "left")
      .withColumn("__cov",
        when(col("__sites").isNull, lit(null).cast("array<int>"))
          .otherwise(array_distinct(flatten(transform(col("__sites"),
            p => sequence(p, p + lit(n - 1)))))))
      .withColumn(outputCol,
        when(col("__cov").isNull, concat_ws(" ", col("__tk")))
          .otherwise(concat_ws(" ", transform(
            array_except(sequence(lit(0), size(col("__tk")) - 1), col("__cov")),
            i => element_at(col("__tk"), i + 1)))))
      .withColumn("removed_tokens",
        when(col("__cov").isNull, lit(0)).otherwise(size(col("__cov"))))
      .drop("__tk", "__cov", "__sites")
  }

  /** Corpus-level telemetry for [[removeRepeatedNgrams]]: one row
    * per duplicated window hash with its site count — the "how much
    * boilerplate is there" profile (heavy hashes = hot boilerplate),
    * and the observability half of the scrub's contract.
    */
  def repeatedNgramReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    require(n >= 2, s"window size must be >= 2 tokens, got $n")
    val sep = "\u0001"
    df.select(explode(
        when(size(split(trim(coalesce(col(textCol), lit(""))), "\\s+")) >= n,
          transform(sequence(lit(0),
              size(split(trim(coalesce(col(textCol), lit(""))), "\\s+")) - n),
            p => xxhash64(concat_ws(sep,
              slice(split(trim(coalesce(col(textCol), lit(""))), "\\s+"), p + lit(1), lit(n))))))
          .otherwise(array().cast("array<bigint>"))).as("window_hash"))
      .groupBy("window_hash").agg(count(lit(1)).as("n_sites"))
      .filter(col("n_sites") > 1)
  }

}
