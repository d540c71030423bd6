package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for dedup and analysis — all built from Spark's
  * codegen'd collection/string expressions (no UDFs).
  */
object TextFunctions {

  /** Lower-cased word tokens (runs of letters/digits). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** BPE-ish token count: words + punctuation marks each count as a
    * token (approximates subword tokenizer counts on natural text).
    */
  def tokenCountBpeish(text: Column): Column =
    size(filter(split(text, "(?<=[\\p{Punct}])|(?=[\\p{Punct}])|\\s+"), t => length(t) > 0))

  /** Character n-gram shingles of the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    array_distinct(
      transform(
        sequence(lit(0), greatest(length(norm) - n, lit(0))),
        i => norm.substr(i + 1, lit(n))
      )
    )
  }

  /** Word n-gram shingles (space-joined token windows). */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(ts) - n, lit(0))),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))
      )
    )
  }

  /** MinHash signature: for each of `numHashes` seeded hash
    * functions, the minimum xxhash64 over the shingle set. Pure
    * column expression → codegen, no UDF, no shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long = 13L): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(lit(seed), i, s)))
    )

  /** LSH band keys from a minhash signature: hash of each band of
    * `rowsPerBand` signature entries. Docs sharing any band key are
    * near-dup candidates.
    */
  def lshBandKeys(signature: Column, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), floor(size(signature) / rowsPerBand).cast("int") - 1),
      b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)).cast("string"))
    )

  /** Exact Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** 64-bit SimHash over word tokens: per-bit majority vote of
    * token hashes. Expressed as a sum over tokens of ±1 per bit,
    * packed back into a long — stays in codegen'd expressions.
    */
  def simhash64(tokens: Column, seed: Long = 17L): Column = {
    val hashed = transform(tokens, t => xxhash64(lit(seed), t))
    val bits = (0 until 64).map { i =>
      val vote = aggregate(
        hashed,
        lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1)).otherwise(lit(-1))
      )
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Rolling (polynomial) hash fingerprint of the full normalized
    * text — an order-sensitive content fingerprint (exact-dup key
    * that, unlike md5, can be computed incrementally/windowed).
    *
    * Double-modulus Rabin-Karp: ANSI mode (Spark 4 default) rejects
    * wraparound multiplication, so each hash stays below a 32-bit
    * prime (acc·base + c < 2^63 always) and the two streams are
    * packed into one long.
    */
  def rollingHashFingerprint(text: Column, base: Long = 1000003L): Column = {
    val p1 = 4294967291L // 2^32 - 5
    val p2 = 4294967279L // 2^32 - 17
    val norm = regexp_replace(lower(text), "\\s+", " ")
    val codes = transform(split(norm, ""), ch => ascii(ch).cast("long"))
    def roll(p: Long) = aggregate(codes, lit(0L), (acc, c) => pmod(acc * base + c, lit(p)))
    shiftleft(roll(p1), 31).bitwiseXOR(roll(p2))
  }
}
