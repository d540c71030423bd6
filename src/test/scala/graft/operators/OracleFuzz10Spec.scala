package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 fuzz: randomized independent replays for the capped
  * fuzzy join + overflow telemetry, the streaming TFRecord/
  * WebDataset readers (stream == whole-shard parse over random
  * framings), and the IVF refit swap's row preservation. Fixed
  * seeds, plain-Scala replays.
  */
class OracleFuzz10Spec extends SparkSpec {
  import spark.implicits._

  test("fuzz: capped fuzzyJoinJaro == uncapped minus locally-replayed over-cap blocks") {
    // isolates the CAP semantics (the r10 addition) from the JW
    // kernel, which q_jaro_join already pins against DuckDB
    val rng = new scala.util.Random(1001)
    for (trial <- 1 to 4) {
      val prefixes = Seq("aa", "ab", "zz", "qq").take(2 + rng.nextInt(3))
      val n = 30 + rng.nextInt(60)
      val mk = (i: Int) => s"${prefixes(rng.nextInt(prefixes.size))} name ${rng.nextInt(8)} $i"
      val lefts = (0 until n).map(i => mk(i))
      val rights = (0 until n).map(i => mk(i + 1000))
      val cap = 5 + rng.nextInt(25)
      val minSim = 0.85
      def run(c: Int) = FuzzyJoinOps.fuzzyJoinJaro(
          lefts.toDF("name_a"), rights.toDF("name_b"),
          "name_a", "name_b", minSim = minSim, blockPrefix = 2, maxBlockSize = c)
        .select("name_a", "name_b").as[(String, String)].collect().toSet
      val lBlk = lefts.groupBy(_.take(2)); val rBlk = rights.groupBy(_.take(2))
      val big = lBlk.filter(_._2.size > cap).keySet ++ rBlk.filter(_._2.size > cap).keySet
      val want = run(Int.MaxValue).filterNot { case (l, _) => big(l.take(2)) }
      assert(run(cap) == want, s"trial $trial cap=$cap blocks=$big")
    }
  }

  test("fuzz: jaroBlockOverflowReport equals the local count replay") {
    val rng = new scala.util.Random(1002)
    for (trial <- 1 to 4) {
      val n = 40 + rng.nextInt(80)
      val mk = () => s"${('a' + rng.nextInt(3)).toChar}${('a' + rng.nextInt(2)).toChar} x"
      val lefts = (0 until n).map(_ => mk())
      val rights = (0 until n / 2).map(_ => mk())
      val cap = 2 + rng.nextInt(12)
      val got = FuzzyJoinOps.jaroBlockOverflowReport(
          lefts.toDF("name_a"), rights.toDF("name_b"),
          "name_a", "name_b", blockPrefix = 2, maxBlockSize = cap)
        .as[(String, Long, Long, Long)].collect().toSet
      val ln = lefts.groupBy(_.take(2)).view.mapValues(_.size.toLong).toMap
      val rn = rights.groupBy(_.take(2)).view.mapValues(_.size.toLong).toMap
      val want = (ln.keySet ++ rn.keySet).toSeq
        .map(b => (b, ln.getOrElse(b, 0L), rn.getOrElse(b, 0L)))
        .filter { case (_, l, r) => l > cap || r > cap }
        .map { case (b, l, r) => (b, l, r, l * r) }.toSet
      assert(got == want, s"trial $trial cap=$cap: got $got want $want")
    }
  }

  test("fuzz: TFRecord streamRecords equals parseShard over random record sizes") {
    val rng = new scala.util.Random(1003)
    for (trial <- 1 to 4) {
      val recs = (0 until 1 + rng.nextInt(30)).map { _ =>
        val b = new Array[Byte](rng.nextInt(200)); rng.nextBytes(b); b
      }
      val out = new java.io.ByteArrayOutputStream()
      recs.foreach { data =>
        val lenBytes = new Array[Byte](8)
        var l = data.length.toLong
        var i = 0
        while (i < 8) { lenBytes(i) = (l & 0xFF).toByte; l >>>= 8; i += 1 }
        out.write(lenBytes)
        writeU32le(out, TfRecordIOAccess.maskedCrc(lenBytes, 0, 8))
        out.write(data)
        writeU32le(out, TfRecordIOAccess.maskedCrc(data, 0, data.length))
      }
      val bytes = out.toByteArray
      val streamed = graft.sources.TfRecordIO.streamRecords(
        new java.io.ByteArrayInputStream(bytes), bytes.length.toLong, "f").toList
      val parsed = graft.sources.TfRecordIO.parseShard(bytes).toList
      assert(streamed.size == recs.size &&
        streamed.zip(parsed).forall { case (a, b) => java.util.Arrays.equals(a, b) })
    }
  }

  private def writeU32le(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private object TfRecordIOAccess {
    def maskedCrc(b: Array[Byte], off: Int, len: Int): Int =
      graft.sources.TfRecordIO.maskedCrc(b, off, len)
  }

  test("fuzz: WebDataset stream read groups random adjacent samples correctly") {
    val rng = new scala.util.Random(1004)
    for (trial <- 1 to 3) {
      val n = 5 + rng.nextInt(40)
      val rows = (0 until n).map { i =>
        (s"k$i", if (rng.nextBoolean()) s"text $i ${rng.nextInt(100)}" else null,
          rng.nextInt(1000).toLong)
      }
      val df = rows.toDF("key", "txt", "num").repartition(1 + rng.nextInt(3))
      val tmp = java.nio.file.Files.createTempDirectory(s"wdsf$trial").toString
      graft.sources.WebDatasetIO.write(df, s"file:$tmp/w", "key")
      val back = graft.sources.WebDatasetIO.read(spark, s"file:$tmp/w", df.schema, "key")
        .as[(String, String, Long)].collect().toSet
      assert(back == rows.toSet, s"trial $trial: ${back.diff(rows.toSet)} vs ${rows.toSet.diff(back)}")
    }
  }
}
