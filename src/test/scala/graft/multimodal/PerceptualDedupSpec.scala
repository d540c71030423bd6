package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MultimodalOps.imageDHash]] + [[MultimodalOps.perceptualDedup]]:
  * real PNG decode → 64-bit difference hash → hamming-banded pairs.
  */
class PerceptualDedupSpec extends SparkSpec {
  import spark.implicits._

  private def expectedSig(cls: Int): Long = {
    var sig = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if ((x + y + cls) % 8 < 4) sig |= 1L << (y * 8 + x)
    sig
  }

  test("dHash of the class pattern is exactly the class bit pattern") {
    for (cls <- 0 until 8) {
      val sig = MultimodalOps.imageDHash(MultimodalOps.classPatternPng(cls, 0))
      assert(sig !== null)
      assert(sig.longValue() === expectedSig(cls), s"class $cls")
    }
  }

  test("brightness shift changes the bytes but not the hash") {
    val a = MultimodalOps.classPatternPng(3, 0)
    val b = MultimodalOps.classPatternPng(3, 4)
    assert(!java.util.Arrays.equals(a, b))
    assert(MultimodalOps.imageDHash(a) === MultimodalOps.imageDHash(b))
  }

  test("distinct classes are >= 16 hamming apart (banding cannot cross-pair them)") {
    val sigs = (0 until 8).map(c => MultimodalOps.imageDHash(MultimodalOps.classPatternPng(c, 0)).longValue())
    for (i <- 0 until 8; j <- (i + 1) until 8)
      assert(java.lang.Long.bitCount(sigs(i) ^ sigs(j)) >= 16, s"classes $i vs $j")
  }

  test("a 10x upscale through imageResize keeps the hash within pairing range") {
    val orig = MultimodalOps.classPatternPng(5, 0)
    val big = MultimodalOps.imageResize(90, 80)(orig)
    val h = java.lang.Long.bitCount(
      MultimodalOps.imageDHash(orig).longValue() ^ MultimodalOps.imageDHash(big).longValue())
    assert(h <= 3, s"resize moved the hash by $h bits")
  }

  test("perceptualDedup pairs exactly the same-class twins, hamming 0") {
    // ids 0..5: class = id % 2, brightness = id (bytes all distinct)
    val df = (0L to 5L)
      .map(id => (id, MultimodalOps.classPatternPng((id % 2).toInt, id.toInt)))
      .toDF("id", "content")
    val pairs = MultimodalOps.perceptualDedup(df, "id", "content")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val want = (for {
      a <- 0L to 5L; b <- (a + 1) to 5L; if a % 2 == b % 2
    } yield (a, b, 0)).sorted
    assert(pairs === want)
  }

  test("undecodable blobs drop out instead of pairing up") {
    val junk = Array[Byte](1, 2, 3, 4)
    val df = Seq(
      (1L, MultimodalOps.classPatternPng(0, 0)),
      (2L, MultimodalOps.classPatternPng(0, 1)),
      (3L, junk),
      (4L, junk)
    ).toDF("id", "content")
    val pairs = MultimodalOps.perceptualDedup(df, "id", "content")
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 0)))
  }

  test("hammingPairs64 rejects maxHamming above the banding guarantee") {
    val df = Seq((1L, 0L)).toDF("id", "sig")
    assertThrows[IllegalArgumentException] {
      graft.operators.DedupOps.hammingPairs64(df, "id", "sig", maxHamming = 4)
    }
  }

  // ---- audio fingerprint twin ----

  private def expectedAudioSig(cls: Int): Long = {
    var sig = 0L
    for (i <- 0 until 64) if ((i + cls) % 8 < 4) sig |= 1L << i
    sig
  }

  test("audio fingerprint of the class WAV is exactly the class bit pattern") {
    for (cls <- 0 until 8) {
      val sig = MultimodalOps.audioFingerprint(MultimodalOps.classPatternWav(cls, 1.0))
      assert(sig !== null)
      assert(sig.longValue() === expectedAudioSig(cls), s"class $cls")
    }
  }

  test("gain scaling changes the bytes but not the fingerprint") {
    val a = MultimodalOps.classPatternWav(2, 1.0)
    val b = MultimodalOps.classPatternWav(2, 0.5)
    val c = MultimodalOps.classPatternWav(2, 1.0 / 3)
    assert(!java.util.Arrays.equals(a, b))
    assert(MultimodalOps.audioFingerprint(a) === MultimodalOps.audioFingerprint(b))
    assert(MultimodalOps.audioFingerprint(a) === MultimodalOps.audioFingerprint(c))
  }

  test("audioDedup pairs exactly the same-class clips; junk drops out") {
    val df = ((0L to 5L).map(id =>
      (id, MultimodalOps.classPatternWav((id % 2).toInt, 1.0 / (1 + id % 3)))) :+
      (6L, Array[Byte](9, 9, 9))).toDF("id", "content")
    val pairs = MultimodalOps.audioDedup(df, "id", "content")
      .as[(Long, Long, Int)].collect().sorted.toSeq
    val want = (for {
      a <- 0L to 5L; b <- (a + 1) to 5L; if a % 2 == b % 2
    } yield (a, b, 0)).sorted
    assert(pairs === want)
  }

  // ---- "no silent caps" for the hamming family ----

  test("over-cap constant-signature class: pairs drop AND the overflow report names it") {
    // class 0: 6 brightness-shifted copies (constant signature),
    // class 1: 3 copies — with maxBucket=4 the class-0 quarter
    // buckets (6 members each) are over cap
    val df = ((0L to 5L).map(id => (id, MultimodalOps.classPatternPng(0, id.toInt))) ++
      (10L to 12L).map(id => (id, MultimodalOps.classPatternPng(1, id.toInt)))).toDF("id", "content")
    val pairs = MultimodalOps.perceptualDedup(df, "id", "content", maxBucket = 4)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    // class-0 pairs silently dropped by the cap; class-1 pairs survive
    assert(pairs === Seq((10L, 11L, 0), (10L, 12L, 0), (11L, 12L, 0)))
    // ...and the report surfaces exactly the 4 over-cap quarter
    // buckets of the dropped class with closed-form lost pairs
    val rep = MultimodalOps.perceptualOverflowReport(df, "id", "content", maxBucket = 4)
      .select("n_members", "n_lost_pairs").as[(Long, Long)].collect().toSeq
    assert(rep === Seq.fill(4)((6L, 15L)))
  }

  test("audio overflow report: silent-class WAVs past the cap are surfaced") {
    val df = (0L to 5L).map(id =>
      (id, MultimodalOps.classPatternWav(3, 1.0 / (1 + id % 3)))).toDF("id", "content")
    val rep = MultimodalOps.audioOverflowReport(df, "id", "content", maxBucket = 4)
      .select("n_members", "n_lost_pairs").as[(Long, Long)].collect().toSeq
    assert(rep === Seq.fill(4)((6L, 15L)))
    // under-cap: empty report, nothing lost
    assert(MultimodalOps.audioOverflowReport(df, "id", "content", maxBucket = 10).count() === 0L)
  }

  test("non-integral id columns are rejected loudly, not silently nulled") {
    val df = Seq(("a", MultimodalOps.classPatternPng(0, 0))).toDF("id", "content")
    assertThrows[IllegalArgumentException] {
      MultimodalOps.perceptualDedup(df, "id", "content")
    }
    assertThrows[IllegalArgumentException] {
      MultimodalOps.audioDedup(df, "id", "content")
    }
  }

  // ---- codegen'd hash expressions (K-series discipline) ----

  test("ImageDHash64/AudioFingerprint64 run with codegen fallback disabled") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val img = (0 until 4).map(c => Tuple1(MultimodalOps.classPatternPng(c, 1))).toDF("content")
      val got = img.select(graft.functions.PerceptualExpressions.imageDHash64(col("content")).as("sig"))
        .as[Long].collect().toSeq
      assert(got === (0 until 4).map(expectedSig))
      val wav = (0 until 4).map(c => Tuple1(MultimodalOps.classPatternWav(c, 0.5))).toDF("content")
      val gotA = wav.select(graft.functions.PerceptualExpressions.audioFingerprint64(col("content")).as("sig"))
        .as[Long].collect().toSeq
      assert(gotA === (0 until 4).map(expectedAudioSig))
      // null result path (undecodable bytes) through generated code
      val junk = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("content")
      assert(junk.select(graft.functions.PerceptualExpressions.imageDHash64(col("content")))
        .collect().head.isNullAt(0))
      assert(junk.select(graft.functions.PerceptualExpressions.audioFingerprint64(col("content")))
        .collect().head.isNullAt(0))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
