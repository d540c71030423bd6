package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

class SeededBloomSpec extends AnyFunSuite {

  test("no false negatives; round-trips through serialization") {
    val bf = SeededBloom.create(1000L, 1e-9)
    val keys = (0 until 500).map(i => i.toLong * 0x9e3779b97f4a7c15L + 17L)
    keys.foreach(bf.putLong)
    assert(keys.forall(bf.mightContainLong))
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val back = SeededBloom.readFrom(new ByteArrayInputStream(bos.toByteArray))
    assert(back.numBits == bf.numBits && back.k == bf.k)
    assert(keys.forall(back.mightContainLong))
  }

  test("merge is bitwise union; incompatible layouts rejected") {
    val a = SeededBloom.create(100L, 1e-6)
    val b = SeededBloom.create(100L, 1e-6)
    a.putLong(1L); b.putLong(2L)
    a.mergeInPlace(b)
    assert(a.mightContainLong(1L) && a.mightContainLong(2L))
    intercept[IllegalArgumentException] {
      a.mergeInPlace(SeededBloom.create(10000L, 1e-6))
    }
  }

  test("fpp holds at volume — the r12 sf1 regression class") {
    // The decontamination settings that dropped a clean doc at sf1
    // under Spark's double-hashed BloomFilter: ~9 items in a filter
    // sized for 1000 at fpp 1e-9. With k independent position
    // hashes the FP probability is (setBits/m)^k ~ 1e-66, so FIVE
    // MILLION probes must produce exactly zero hits; the
    // double-hashed progression's (h1,h2) mod m collision floor
    // (~nItems/m^2 per probe) fails this gate about 2% of the time
    // per seed — and did, on real sf1 data.
    val bf = SeededBloom.create(1000L, 1e-9)
    (1 to 9).foreach(i => bf.putLong(i.toLong * 0x2545f4914f6cdd1dL))
    var fp = 0
    var key = 0L
    var i = 0
    while (i < 5000000) {
      key = key * 6364136223846793005L + 1442695040888963407L
      if (bf.mightContainLong(key)) fp += 1
      i += 1
    }
    assert(fp == 0, s"expected zero false positives at fpp 1e-9, got $fp")
  }

  test("sizing: bits per item and probe count follow the standard formulas") {
    val bf = SeededBloom.create(1000L, 1e-9)
    // m = ceil(1000 * 43.1) rounded to a word; k = round(m/n ln2)
    assert(bf.numBits >= 43072 && bf.numBits <= 43200)
    assert(bf.k == 30)
    intercept[IllegalArgumentException] { SeededBloom.create(0L, 0.01) }
    intercept[IllegalArgumentException] { SeededBloom.create(10L, 1.5) }
  }

  test("long-indexed geometry: big sizings are honest, overflow is loud") {
    // 1e9 items at fpp 1e-4 needs ~19.2e9 bits — far past Int bits.
    // The old code silently clamped m (and thereby k) to ~2^31,
    // degrading the realized fpp by orders of magnitude with no
    // error; now the geometry must come out full-size.
    // (Allocates ~2.4 GB transiently — fine on the 128 GiB test box.)
    val big = SeededBloom.create(1000000000L, 1e-4)
    assert(big.numBits > Int.MaxValue.toLong,
      s"expected >2^31 bits, got ${big.numBits}")
    assert(big.k == 13, s"k should follow m/n·ln2 uncapped, got ${big.k}")
    val keys = Seq(0L, -1L, Long.MaxValue, Long.MinValue, 42L)
    keys.foreach(big.putLong)
    assert(keys.forall(big.mightContainLong))

    // sizings past the word-array limit fail loudly, never clamp
    val e = intercept[IllegalArgumentException] {
      SeededBloom.create(Long.MaxValue / 64, 1e-9)
    }
    assert(e.getMessage.contains("shard"), e.getMessage)
  }

  test("probe positions stay in range for >Int.MaxValue bit counts") {
    val m = (Int.MaxValue.toLong + 1L) * 3L
    var i = 0
    while (i < 64) {
      val p = SeededBloom.position(0xdeadbeefL * (i + 1), i % 8, m)
      assert(p >= 0L && p < m, s"position $p out of [0, $m)")
      i += 1
    }
  }

  test("legacy SBL1 streams still parse (persisted-filter compatibility)") {
    // a filter small enough for Int bits must serialize byte-for-byte
    // as the r12 SBL1 layout: magic "SBL1", Int numBits
    val bf = SeededBloom.create(1000L, 1e-6)
    bf.putLong(7L)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    val magic = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
    assert(magic == 0x53424c31, f"small filters must stay SBL1, got 0x$magic%08x")
    val back = SeededBloom.readFrom(new ByteArrayInputStream(bytes))
    assert(back.numBits == bf.numBits && back.k == bf.k && back.mightContainLong(7L))
  }

  test("a Spark BloomFilter stream is detected and rejected with a rebuild hint") {
    // Spark util.sketch streams begin with the version int (V1 = 1)
    val spark = org.apache.spark.util.sketch.BloomFilter.create(100L, 0.01)
    spark.putLong(5L)
    val bos = new ByteArrayOutputStream()
    spark.writeTo(bos)
    val e = intercept[IllegalArgumentException] {
      SeededBloom.readFrom(new ByteArrayInputStream(bos.toByteArray))
    }
    assert(e.getMessage.contains("saveDecontaminationBloom"), e.getMessage)
  }
}
