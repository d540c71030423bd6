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

  test("property: Arrow IPC round-trips nested struct / list<struct> / list<list<long>> with nulls") {
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val n = 1 + rng.nextInt(200)
      val rows: Seq[(Long, (Int, String), Seq[(Long, String)], Seq[Seq[Long]])] =
        (0 until n).map { i =>
          (i.toLong,
            (rng.nextInt(100), if (rng.nextInt(4) == 0) null else "v" + rng.nextInt(1000)),
            (0 until rng.nextInt(4)).map(j => (j.toLong * i, "t" + rng.nextInt(100))),
            (0 until rng.nextInt(3)).map(_ => (0 until rng.nextInt(4)).map(_ => rng.nextLong() % 1000).toSeq))
        }
      val df = rows.toDF("id", "st", "tags", "mat")
      val path = java.io.File.createTempFile(s"prop-arrow-nest-$trial", ".arrow").getAbsolutePath
      ArrowIpcWriter.write(df, path, batchRows = 1 + rng.nextInt(64))
      val back = ArrowIpcReader.read(spark, Seq(path))
        .as[(Long, (Int, Option[String]), Seq[(Long, String)], Seq[Seq[Long]])].collect()
        .map { case (id, (a, b), tags, mat) => (id, (a, b.orNull), tags, mat) }.toSet
      assert(back == rows.toSet, s"trial $trial: ${back.size} vs ${rows.size}")
    }
  }

  test("property: nested columns survive the sharded writeDir → read path too") {
    val rng = new scala.util.Random(29)
    val n = 200
    val rows = (0 until n).map { i =>
      (i.toLong, (i % 7, "s" + i), (0 until (i % 3)).map(j => (j.toLong, "x" + (i + j))))
    }
    val df = rows.toDF("id", "st", "tags").repartition(5)
    val dir = java.nio.file.Files.createTempDirectory("prop-arrow-dir").toString + "/out"
    ArrowIpcWriter.writeDir(df, dir)
    val parts = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".arrow"))
      .map(_.getAbsolutePath).sorted
    assert(parts.nonEmpty)
    val back = ArrowIpcReader.read(spark, parts.toIndexedSeq)
      .as[(Long, (Int, String), Seq[(Long, String)])].collect().toSet
    assert(back == rows.toSet)
  }
}
