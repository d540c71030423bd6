package graft.operators

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
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

  /** Exact-dup groups: content key → survivor id + copy count. */
  def exactGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-dup candidate pairs.
    *
    * shingle → minhash signature (numHashes) → band keys → explode
    * → self-join on (band key) → distinct pairs → exact-Jaccard
    * verify ≥ threshold.
    *
    * Scale: the exploded table has n·bands small rows; the join
    * shuffles only (band_key, id, shingles-hash), pairs are
    * verified per-bucket. Huge buckets (degenerate keys, e.g. empty
    * docs) are capped via `maxBucket` to bound worst-case pair
    * blowup — the standard LSH skew guard.
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
      .select(col(idCol).as("id"), TF.wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = shingled
      .withColumn("band", explode(TF.lshBandKeys(TF.minhashSignature(col("sh"), numHashes), rowsPerBand)))
    // skew guard: drop degenerate buckets
    val bucketSizes = banded.groupBy("band").agg(count(lit(1)).as("__bn")).filter(col("__bn") <= maxBucket)
    val pruned = banded.join(bucketSizes.select("band"), Seq("band"), "left_semi")
    val a = pruned.select(col("band"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = pruned.select(col("band"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct()
      .withColumn("jaccard", TF.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup: 64-bit fingerprints; candidates = equal
    * 16-bit quarters (any doc pair within hamming distance 3 shares
    * at least one of 4 quarters — pigeonhole); verify by full
    * hamming distance ≤ maxHamming.
    */
  def simhash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000
  ): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), TF.simhash64(TF.tokens(col(textCol))).as("sig"))
    val quarters = sigs.select(
      col("id"),
      col("sig"),
      explode(
        array((0 until 4).map(q => struct(lit(q).as("q"), shiftright(col("sig"), q * 16).bitwiseAND(lit(0xffffL)).as("k"))): _*)
      ).as("bucket")
    )
    val keyed = quarters.select(col("id"), col("sig"), col("bucket.q"), col("bucket.k"))
    val sized = keyed.groupBy("q", "k").agg(count(lit(1)).as("__bn")).filter(col("__bn") <= maxBucket)
    val pruned = keyed.join(sized.select("q", "k"), Seq("q", "k"), "left_semi")
    val a = pruned.select(col("q"), col("k"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = pruned.select(col("q"), col("k"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("q", "k"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .distinct()
      .withColumn("hamming", VF.hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** n-gram Jaccard similarity join via shared-shingle candidate
    * generation: pairs sharing ≥1 shingle, verified by exact
    * Jaccard. Rare-shingle pruning (`maxShingleFreq`) removes
    * stop-shingles that would otherwise create giant buckets.
    */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxShingleFreq: Int = 500
  ): DataFrame = {
    val sh = df.select(col(idCol).as("id"), TF.wordShingles(col(textCol), shingleSize).as("sh"))
    val inverted = sh.select(col("id"), explode(col("sh")).as("g"))
    val common = inverted.groupBy("g").agg(count(lit(1)).as("__f")).filter(col("__f") <= maxShingleFreq)
    val pruned = inverted.join(common.select("g"), Seq("g"), "left_semi")
    val cand = pruned.select(col("g"), col("id").as("id_a"))
      .join(pruned.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", TF.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-dup: hyperplane-LSH bucket join + cosine
    * verify ≥ threshold. Same candidate/verify shape as minhashLsh.
    */
  def embeddingDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nBits: Int = 16,
      maxBucket: Int = 2000
  ): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"), VF.hyperplaneLshBits(col(vecCol), nBits).as("bkt"))
    val sized = sigs.groupBy("bkt").agg(count(lit(1)).as("__bn")).filter(col("__bn") <= maxBucket)
    val pruned = sigs.join(sized.select("bkt"), Seq("bkt"), "left_semi")
    val a = pruned.select(col("bkt"), col("id").as("id_a"), col("v").as("v_a"))
    val b = pruned.select(col("bkt"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bkt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VF.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .distinct()
  }
}
