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
  * Mergeable (bitwise OR of same-layout filters), serializable to a
  * versioned byte stream, and probe-able from codegen via
  * [[CurationExpressions.inBloom]]. No false negatives, ever.
  */
final class SeededBloom private[functions] (
    val numBits: Int,
    val k: Int,
    private[functions] val words: Array[Long]
) extends Serializable {

  def putLong(key: Long): Unit = {
    var i = 0
    while (i < k) {
      val pos = SeededBloom.position(key, i, numBits)
      words(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  def mightContainLong(key: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = SeededBloom.position(key, i, numBits)
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
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
    d.writeInt(SeededBloom.Magic)
    d.writeInt(numBits)
    d.writeInt(k)
    d.writeInt(words.length)
    var i = 0
    while (i < words.length) { d.writeLong(words(i)); i += 1 }
    d.flush()
  }
}

object SeededBloom {
  private val Magic = 0x53424c31 // "SBL1"

  /** Position of probe `i` for `key`: an independent xxhash64 under
    * a per-probe seed, folded onto [0, numBits). The seed constant
    * is the 64-bit golden ratio (splitmix64's increment — public).
    */
  @inline private[functions] def position(key: Long, i: Int, numBits: Int): Int = {
    val h = XXH64.hashLong(key, 0x9e3779b97f4a7c15L * (i + 1))
    // floorMod onto the bit range (numBits is an Int > 0)
    val m = (h % numBits).toInt
    if (m < 0) m + numBits else m
  }

  /** Standard sizing: `m = ⌈−n·ln p ÷ ln²2⌉` bits (rounded up to a
    * word), `k = max(1, round(m/n·ln 2))` probes.
    */
  def create(expectedItems: Long, fpp: Double): SeededBloom = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-expectedItems.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val m = math.min(math.max(((mRaw + 63) / 64) * 64, 64L), Int.MaxValue.toLong - 63).toInt
    val k = math.max(1, math.round(m.toDouble / expectedItems.toDouble * ln2).toInt)
    new SeededBloom(m, k, new Array[Long](m >>> 6))
  }

  def readFrom(in: InputStream): SeededBloom = {
    val d = new DataInputStream(in)
    val magic = d.readInt()
    require(magic == Magic, f"not a SeededBloom stream (magic 0x$magic%08x)")
    val numBits = d.readInt()
    val k = d.readInt()
    val n = d.readInt()
    require(numBits > 0 && k > 0 && n == numBits / 64,
      s"corrupt SeededBloom header: numBits=$numBits k=$k words=$n")
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = d.readLong(); i += 1 }
    new SeededBloom(numBits, k, words)
  }
}
