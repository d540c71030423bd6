package graft.functions

import java.io.{DataInputStream, DataOutputStream, InputStream, OutputStream}

import org.apache.spark.sql.catalyst.expressions.XXH64

/** Bloom filter over 64-bit keys whose k probe positions are k
  * INDEPENDENTLY SEEDED xxhash64 evaluations — not the classic
  * Kirsch–Mitzenmacher double-hash `h1 + i·h2 (mod m)` progression
  * Spark's `util.sketch.BloomFilter` uses.
  *
  * Why that matters (found by the r12 sf1 sweep): with double
  * hashing, a probe key whose `(h1 mod m, h2 mod m)` pair collides
  * with an inserted key's pair shares ALL k positions, so the
  * filter's false-positive rate has a hard floor of about
  * `nInserted / m²` REGARDLESS of the requested fpp. At the
  * decontamination settings (fpp 1e-9 → m ≈ 43k bits for 1k items)
  * that floor is ~5·10⁻⁷ — 500× the advertised rate — and a 2M-probe
  * sweep measurably dropped a clean document (doc 4319, sf1) whose
  * shingle never matched any eval shingle. With k independent
  * position hashes the full-collision probability is the honest
  * `(setBits/m)^k` ≈ 10⁻⁶⁶ at the same settings: the advertised fpp
  * is real again, and the exact SQL oracle stays stable at any SF.
  *
  * The bit array is LONG-indexed (up to ~2³⁷ bits ≈ 17 GB — the JVM
  * array-length limit on the word array), so billion-item/low-fpp
  * sizings get their honest geometry instead of a silent Int clamp
  * that would quietly degrade the realized fpp; sizings past the
  * word-array limit fail loudly in [[SeededBloom.create]].
  *
  * Mergeable (bitwise OR of same-layout filters), serializable to a
  * versioned byte stream (SBL1 for filters that fit Int bits — byte
  * compatible with every previously persisted filter — and SBL2 with
  * a long bit count past that), and probe-able from codegen via
  * [[CurationExpressions.inBloom]]. No false negatives, ever.
  */
final class SeededBloom private[functions] (
    val numBits: Long,
    val k: Int,
    private[functions] val words: Array[Long]
) extends Serializable {

  def putLong(key: Long): Unit = {
    var i = 0
    while (i < k) {
      val pos = SeededBloom.position(key, i, numBits)
      words((pos >>> 6).toInt) |= (1L << (pos & 63L).toInt)
      i += 1
    }
  }

  def mightContainLong(key: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = SeededBloom.position(key, i, numBits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR merge; layouts must match (same create parameters). */
  def mergeInPlace(other: SeededBloom): SeededBloom = {
    require(other.numBits == numBits && other.k == k,
      s"incompatible bloom layouts: ($numBits, $k) vs (${other.numBits}, ${other.k})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def writeTo(out: OutputStream): Unit = {
    val d = new DataOutputStream(out)
    if (numBits <= Int.MaxValue.toLong - 63) {
      // legacy-compatible layout: every filter persisted before the
      // long-index upgrade parses identically
      d.writeInt(SeededBloom.Magic1)
      d.writeInt(numBits.toInt)
    } else {
      d.writeInt(SeededBloom.Magic2)
      d.writeLong(numBits)
    }
    d.writeInt(k)
    d.writeInt(words.length)
    var i = 0
    while (i < words.length) { d.writeLong(words(i)); i += 1 }
    d.flush()
  }
}

object SeededBloom {
  private val Magic1 = 0x53424c31 // "SBL1" — Int numBits (legacy-compatible)
  private val Magic2 = 0x53424c32 // "SBL2" — Long numBits

  /** Largest admissible word-array length (JVM array limit with the
    * customary safety margin) → numBits ≤ MaxWords·64 ≈ 1.37e11.
    */
  private val MaxWords = Int.MaxValue - 8

  /** Position of probe `i` for `key`: an independent xxhash64 under
    * a per-probe seed, folded onto [0, numBits). The seed constant
    * is the 64-bit golden ratio (splitmix64's increment — public).
    */
  @inline private[functions] def position(key: Long, i: Int, numBits: Long): Long = {
    val h = XXH64.hashLong(key, 0x9e3779b97f4a7c15L * (i + 1))
    // floorMod onto the bit range (numBits > 0)
    val m = h % numBits
    if (m < 0L) m + numBits else m
  }

  /** Standard sizing: `m = ⌈−n·ln p ÷ ln²2⌉` bits (rounded up to a
    * word), `k = max(1, round(m/n·ln 2))` probes. Sizings past the
    * word-array limit (≈1.37e11 bits ≈ 17 GB) throw instead of
    * silently clamping — a clamp would shrink both m and k and
    * degrade the realized fpp by orders of magnitude with no error,
    * exactly the silent-fpp failure class this filter exists to fix.
    * For larger sets, shard keys across several filters (e.g. by
    * `key mod nShards`) — each shard keeps the honest geometry.
    */
  def create(expectedItems: Long, fpp: Double): SeededBloom = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    // guard in the double domain: past the word-array limit the Long
    // round-up arithmetic below could overflow and wrap SMALL, which
    // would be the silent-clamp failure all over again
    val mBits = -expectedItems.toDouble * math.log(fpp) / (ln2 * ln2)
    require(mBits <= MaxWords.toDouble * 64.0,
      s"SeededBloom sizing overflow: expectedItems=$expectedItems fpp=$fpp needs " +
        f"$mBits%.3g bits (> ${MaxWords.toLong * 64}); shard the key space across " +
        "several filters instead")
    val mRaw = math.ceil(mBits).toLong
    val m = math.max(((mRaw + 63) / 64) * 64, 64L)
    val nWords = m >>> 6
    val k = math.max(1, math.round(m.toDouble / expectedItems.toDouble * ln2).toInt)
    new SeededBloom(m, k, new Array[Long](nWords.toInt))
  }

  def readFrom(in: InputStream): SeededBloom = {
    val d = new DataInputStream(in)
    val magic = d.readInt()
    if (magic == 1 || magic == 2) {
      // Spark's util.sketch.BloomFilter streams start with the
      // version int (V1 = 1): a filter persisted by a pre-SeededBloom
      // release. It cannot be migrated bit-for-bit — its double-hash
      // geometry is exactly the fpp-floor defect this class replaces —
      // so the only honest path is a rebuild from the source rows.
      throw new IllegalArgumentException(
        "this is a Spark BloomFilter stream (persisted by a release before the " +
          "SeededBloom format change). It cannot be converted in place: rebuild it " +
          "from the original eval/corpus rows, e.g. DedupOps.saveDecontaminationBloom(" +
          "evalSet, textCol, path) — the rebuild also fixes the double-hash fpp floor " +
          "the old format suffered from (see SeededBloom scaladoc).")
    }
    require(magic == Magic1 || magic == Magic2,
      f"not a SeededBloom stream (magic 0x$magic%08x)")
    val numBits = if (magic == Magic1) d.readInt().toLong else d.readLong()
    val k = d.readInt()
    val n = d.readInt()
    require(numBits > 0 && k > 0 && n.toLong == numBits / 64,
      s"corrupt SeededBloom header: numBits=$numBits k=$k words=$n")
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = d.readLong(); i += 1 }
    new SeededBloom(numBits, k, words)
  }
}
