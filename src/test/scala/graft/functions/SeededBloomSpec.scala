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
}
