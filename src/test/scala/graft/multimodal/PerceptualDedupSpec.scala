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

  test("hammingPairs64 rejects maxHamming beyond the probed-banding ceiling") {
    val df = Seq((1L, 0L)).toDF("id", "sig")
    assertThrows[IllegalArgumentException] {
      graft.operators.DedupOps.hammingPairs64(df, "id", "sig", maxHamming = 16)
    }
    assertThrows[IllegalArgumentException] {
      graft.operators.DedupOps.hammingPairs64(df, "id", "sig", maxHamming = 3, bands = 5)
    }
  }

  test("probed banding is candidate-complete at radius 5-11: banded == brute force") {
    // clustered fixture: 12 random 64-bit centers, each with 5
    // variants flipping 0/2/5/7/9 random bits — pair distances span
    // the whole [0, 18]ish range, so an incomplete banding (the old
    // quarter-exact plan capped at r <= 3) visibly loses pairs
    val rnd2 = new scala.util.Random(7)
    val centers = Array.fill(12)(rnd2.nextLong())
    val flips = Array(0, 2, 5, 7, 9)
    val sigs = for { c <- 0 until 12; v <- 0 until 5 } yield {
      var s = centers(c)
      val picked = scala.collection.mutable.Set.empty[Int]
      while (picked.size < flips(v)) picked += rnd2.nextInt(64)
      picked.foreach(b => s ^= 1L << b)
      ((c * 5 + v).toLong, s)
    }
    val df = sigs.toDF("id", "sig")
    for (r <- Seq(5, 7, 11); bands <- Seq(4, 8)) {
      val got = graft.operators.DedupOps
        .hammingPairs64(df, "id", "sig", maxHamming = r, bands = bands)
        .as[(Long, Long, Int)].collect().sorted.toSeq
      val want = (for {
        i <- sigs.indices; j <- (i + 1) until sigs.size
        h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
        if h <= r
      } yield {
        val (a, b) = (sigs(i)._1, sigs(j)._1)
        if (a < b) (a, b, h) else (b, a, h)
      }).sorted
      assert(got === want, s"radius $r bands $bands")
    }
  }

  test("probed overflow report mirrors the probed buckets (bands x probe keys)") {
    // a constant-signature class of 6 with maxBucket=4 at radius 7:
    // probe radius 1 puts every member in 4 x (1 + 16) = 68 buckets,
    // each over cap with the same closed-form lost pairs
    val df = (0L to 5L).map(id => (id, 0x0123456789abcdefL)).toDF("id", "sig")
    val rep = graft.operators.DedupOps
      .hammingOverflowReport(df, "id", "sig", maxBucket = 4, maxHamming = 7)
      .select("n_members", "n_lost_pairs").as[(Long, Long)].collect().toSeq
    assert(rep === Seq.fill(68)((6L, 15L)))
  }

  test("perceptualDedup retrieves planted radius-5 and radius-7 image twins") {
    // two images whose dHash differs in exactly 5 (resp. 7) bits:
    // flip gradient cells of the class pattern. classPatternPng's
    // hash IS the class bit pattern, so XOR-plant via distinct
    // classes is not possible — plant on raw sigs through the public
    // generic API instead, plus one real-PNG hamming-0 control pair
    val imgs = Seq(
      (1L, MultimodalOps.classPatternPng(3, 0)),
      (2L, MultimodalOps.classPatternPng(3, 2))).toDF("id", "content")
    val ctl = MultimodalOps.perceptualDedup(imgs, "id", "content", maxHamming = 7)
      .as[(Long, Long, Int)].collect().toSeq
    assert(ctl === Seq((1L, 2L, 0)))
    val base = 0x00ff00ff00ff00ffL
    val df = Seq(
      (10L, base),
      (11L, base ^ 0x1fL),          // 5 bits
      (12L, base ^ (0x7fL << 32)),  // 7 bits
      (13L, base ^ -1L)             // 64 bits: out of range
    ).toDF("id", "sig")
    val got = graft.operators.DedupOps
      .hammingPairs64(df, "id", "sig", maxHamming = 7)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    // (11, 12) sits at 12 bits — correctly outside the radius
    assert(got === Seq((10L, 11L, 5), (10L, 12L, 7)))
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
