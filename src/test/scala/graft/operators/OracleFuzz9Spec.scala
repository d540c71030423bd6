package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 late-wave fuzz: randomized independent replays for the
  * hash-sample quantile read, synchronous Louvain rounds, and the
  * exact-ratio mixture maximizer. Fixed seeds, plain-Scala replays.
  */
class OracleFuzz9Spec extends SparkSpec {
  import spark.implicits._

  private def snap6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** The identical md5-derived 52-bit rank SketchOps.h52 computes. */
  private def h52(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    hex.take(13).foldLeft(0L)((acc, c) => acc * 16 + Character.digit(c, 16))
  }

  test("fuzz: quantileSampleSketch+Quantiles equals the local bottom-k type-7 replay") {
    val rng = new scala.util.Random(911)
    for (trial <- 1 to 5) {
      val n = 50 + rng.nextInt(500)
      val k = 16 + rng.nextInt(64)
      val rows = (1 to n).map(i => (i.toLong, "g", rng.nextDouble() * math.pow(10, rng.nextInt(6))))
      val probs = Seq(0.25, 0.5, 0.9)
      val sk = SketchOps.quantileSampleSketch(rows.toDF("id", "g", "v"), Seq("g"), "id", "v", k)
      val got = SketchOps.quantileSampleQuantiles(sk, Seq("g"), probs)
        .collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("q")).toMap
      // replay: k smallest ranks, sample sorted by value, type-7
      val sample = rows.sortBy(r => (h52(r._1), r._3)).take(k).map(_._3).sorted
      val m = sample.length
      probs.foreach { p =>
        val h = (m - 1) * p
        val lo = math.floor(h).toInt
        val frac = h - lo
        val v1 = sample(lo)
        val v2 = sample(math.min(lo + 1, m - 1))
        val want = snap6(v1 + frac * (v2 - v1))
        assert(got(p) == want, s"trial $trial p=$p got ${got(p)} want $want")
      }
    }
  }

  test("fuzz: louvainMoves equals the local synchronous integer-gain replay") {
    val rng = new scala.util.Random(912)
    for (trial <- 1 to 6) {
      val n = 6 + rng.nextInt(10)
      val edges0 = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rng.nextDouble() < 0.4
      } yield (a, b)).distinct
      if (edges0.nonEmpty) {
        val rounds = 1 + rng.nextInt(3)
        val got = GraphOps.louvainMoves(edges0.toDF("src", "dst"), rounds)
          .as[(Long, Long)].collect().toMap
        // local replay of the exact integer recurrence
        val m = edges0.size.toLong
        val adj = (edges0 ++ edges0.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        val deg = adj.view.mapValues(_.size.toLong).toMap
        var lab: Map[Long, Long] = adj.keys.map(x => x -> x).toMap
        for (_ <- 1 to rounds) {
          // .keys is a Set — map through a Seq or equal degrees dedupe
          val vol = lab.groupBy(_._2).view.mapValues(_.keys.toSeq.map(deg).sum).toMap
          lab = adj.keys.map { i =>
            val kC = adj(i).groupBy(lab).view.mapValues(_.size.toLong).toMap
            val own = lab(i)
            val best = kC.toSeq.map { case (c, kc) =>
              val volAdj = vol(c) - (if (c == own) deg(i) else 0L)
              (c, 2L * m * kc - deg(i) * volAdj)
            }.sortBy { case (c, s) => (-s, c) }.head._1
            i -> best
          }.toMap
        }
        assert(got == lab, s"trial $trial rounds=$rounds edges=$edges0:\n got $got\nwant $lab")
      }
    }
  }

  test("fuzz: solveMixtureMax equals the closed-form min replay") {
    val rng = new scala.util.Random(913)
    for (trial <- 1 to 6) {
      val n = 2 + rng.nextInt(8)
      val src = (0 until n).map(i => (s"s$i", 100.0 + rng.nextInt(10000), 1.0 + rng.nextInt(9)))
      val maxRate = 0.3 + rng.nextInt(7) * 0.1
      val got = MixOps.solveMixtureMax(src.toDF("source", "avail", "w"),
          "source", "avail", "w", maxRate)
        .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("take")).toMap
      val wSum = src.map(_._3).sum
      val t = src.map { case (_, a, w) => a * maxRate / (w / wSum) }.min
      src.foreach { case (s, _, w) =>
        val want = snap6(w / wSum * t)
        assert(got(s) == want, s"trial $trial $s: ${got(s)} vs $want")
      }
    }
  }

  test("fuzz: TFRecord round-trips random rows across random shard counts") {
    import org.apache.spark.sql.types._
    val rng = new scala.util.Random(914)
    for (trial <- 1 to 3) {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("s", StringType),
        StructField("xs", ArrayType(LongType))))
      val rows = (1 to 20 + rng.nextInt(80)).map { i =>
        org.apache.spark.sql.Row(
          i.toLong,
          if (rng.nextBoolean()) rng.alphanumeric.take(rng.nextInt(40)).mkString else null,
          if (rng.nextBoolean()) Seq.fill(rng.nextInt(5))(rng.nextLong()) else null)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rng.nextInt(5)), schema)
      val tmp = java.nio.file.Files.createTempDirectory(s"tfz$trial").toString
      graft.sources.TfRecordIO.write(df, s"file:$tmp/o")
      val back = graft.sources.TfRecordIO.read(spark, s"file:$tmp/o", schema)
      assert(back.count() == rows.size)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty, s"trial $trial")
    }
  }
}
