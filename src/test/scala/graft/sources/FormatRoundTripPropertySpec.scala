package graft.sources

import graft.SparkSpec

/** Seeded randomized round-trip checks for the r6 format codecs —
  * many small random instances per property, fixed seeds so
  * failures reproduce.
  */
class FormatRoundTripPropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: NpzWriter → NpzReader round-trips random sparse matrices exactly") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val nRows = 1 + rng.nextInt(50)
      val nCols = 1 + rng.nextInt(40)
      // unique (row, col) positions, values incl. zeros and negatives
      val cells = rng.shuffle(
        (for (r <- 0 until nRows; c <- 0 until nCols) yield (r.toLong, c.toLong)).toList)
        .take(rng.nextInt(nRows * nCols + 1))
      val values = cells.map(_ => (rng.nextDouble() - 0.5) * math.pow(10, rng.nextInt(6)))
        .zipWithIndex.map { case (v, i) => if (i % 7 == 0) 0.0 else v }
      val path = java.io.File.createTempFile(s"prop-npz-$trial", ".npz").getAbsolutePath
      NpzWriter.writeCsr(path, nRows.toLong, nCols.toLong,
        cells.map(_._1).toArray, cells.map(_._2).toArray, values.toArray)
      val expected = cells.zip(values).map { case ((r, c), v) => (r, c, v) }.toSet
      val whole = NpzReader.read(spark, Seq(path))
        .select("row", "col", "value").as[(Long, Long, Double)].collect().toSet
      assert(whole == expected, s"trial $trial whole-file: ${whole.size} vs ${expected.size}")
      val split = NpzReader.readSplit(spark, path, rowsPerTask = 1 + rng.nextInt(8))
        .select("row", "col", "value").as[(Long, Long, Double)].collect().toSet
      assert(split == expected, s"trial $trial row-range")
    }
  }

  test("property: Mp4 synth → parse round-trips random container metadata exactly") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 50) {
      val w = 1 + rng.nextInt(8192)
      val h = 1 + rng.nextInt(8192)
      val dur = rng.nextInt(100000000).toLong
      val frames = rng.nextInt(10000000).toLong
      val m = graft.multimodal.Mp4.parse(graft.multimodal.Mp4.synth(w, h, dur, frames))
      assert(m != null, s"trial $trial: parse null")
      assert(m.width == w && m.height == h && m.durationMs == dur && m.frameCount == frames,
        s"trial $trial: $m vs ($w,$h,$dur,$frames)")
    }
  }

  test("property: Mp4.parse never throws on random garbage or random truncations") {
    val rng = new scala.util.Random(13)
    for (trial <- 1 to 100) {
      val garbage = new Array[Byte](rng.nextInt(2000))
      rng.nextBytes(garbage)
      graft.multimodal.Mp4.parse(garbage) // any result, just no throw
      val valid = graft.multimodal.Mp4.synth(64, 48, 1000L, 24L)
      val cut = valid.take(rng.nextInt(valid.length + 1))
      graft.multimodal.Mp4.parse(cut)
      val flipped = valid.clone()
      flipped(rng.nextInt(flipped.length)) = rng.nextInt(256).toByte
      graft.multimodal.Mp4.parse(flipped)
    }
  }

  test("property: ArrowIpcWriter → ArrowIpcReader round-trips random typed rows with nulls") {
    val rng = new scala.util.Random(17)
    for (trial <- 1 to 6) {
      val n = 1 + rng.nextInt(300)
      val rows = (0 until n).map { i =>
        (i.toLong,
          if (rng.nextInt(5) == 0) null else "s" + rng.nextInt(1000000),
          if (rng.nextInt(5) == 0) null else java.lang.Double.valueOf(rng.nextDouble() * 1e6),
          rng.nextBoolean())
      }
      val df = rows.toDF("id", "s", "d", "b")
      val path = java.io.File.createTempFile(s"prop-arrow-$trial", ".arrow").getAbsolutePath
      ArrowIpcWriter.write(df, path, batchRows = 1 + rng.nextInt(64))
      val back = ArrowIpcReader.read(spark, Seq(path))
        .as[(Long, Option[String], Option[Double], Boolean)].collect().toSet
      val expected = rows.map { case (i, s, d, b) =>
        (i, Option(s), Option(d).map(_.doubleValue()), b)
      }.toSet
      assert(back == expected, s"trial $trial: ${back.size} vs ${expected.size}")
    }
  }
}
