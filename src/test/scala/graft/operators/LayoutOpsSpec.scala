package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits: hand-checked Morton codes") {
    // a=0b11 (x), b=0b01 (y), 2 bits → z = b1 a1 b0 a0 = 0b0111 = 7
    val df = Seq((3L, 1L)).toDF("a", "b")
      .select(LayoutOps.interleaveBits(Seq(col("a"), col("b")), 2))
    assert(df.as[Long].head() == 7L)
    // identity on one column: interleave of (x) with n=1 is x itself
    val one = Seq(11L).toDF("a").select(LayoutOps.interleaveBits(Seq(col("a")), 4))
    assert(one.as[Long].head() == 11L)
  }

  test("quantize: exact integer binning, degenerate range maps to 0") {
    val df = Seq(0L, 50L, 100L).toDF("x")
      .select(LayoutOps.quantize(col("x"), lit(0L), lit(100L), 2).as("q"))
    assert(df.as[Long].collect().toList == List(0L, 1L, 3L)) // 50*3/100 = 1
    val degen = Seq(42L).toDF("x")
      .select(LayoutOps.quantize(col("x"), lit(42L), lit(42L), 8))
    assert(degen.as[Long].head() == 0L)
  }

  test("withZValue: curve cell bounds hold and match a local replay") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("a", "b")
    val got = LayoutOps.withZValue(df, Seq("a", "b"), bits = 8)
      .select("a", "b", "zvalue").as[(Long, Long, Long)].collect()
    val (mna, mxa) = (rows.map(_._1).min, rows.map(_._1).max)
    val (mnb, mxb) = (rows.map(_._2).min, rows.map(_._2).max)
    def q(x: Long, mn: Long, mx: Long) = if (mx == mn) 0L else (x - mn) * 255 / (mx - mn)
    def z(a: Long, b: Long) = (0 until 8).map { i =>
      (((q(a, mna, mxa) >> i) & 1L) << (2 * i)) | (((q(b, mnb, mxb) >> i) & 1L) << (2 * i + 1))
    }.sum
    got.foreach { case (a, b, zv) =>
      assert(zv == z(a, b), s"($a,$b)")
      assert(zv >= 0 && zv < (1L << 16))
    }
  }

  test("zorderWrite bounds per-file spans on BOTH dimensions") {
    val rnd = new scala.util.Random(11)
    // row order is random — a naive write gives every file ~full span
    val rows = Seq.fill(4000)((rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val df = rows.toDF("a", "b").repartition(4)
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/z"
    val naiveDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/n"
    LayoutOps.zorderWrite(df, Seq("a", "b"), zDir, numFiles = 64, bits = 12)
    df.write.parquet(naiveDir)
    def meanSpan(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      val spans = files.map { f =>
        val s = spark.read.parquet(f.getAbsolutePath)
          .agg(max("a") - min("a"), max("b") - min("b")).head()
        (s.getLong(0).toDouble, s.getLong(1).toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (za, zb) = meanSpan(zDir)
    val (na, nb) = meanSpan(naiveDir)
    // 64 z-ordered files over a 4096² grid: each file's span on each
    // dim should be a small fraction of a naive file's (~full range)
    assert(za < na * 0.5, s"a-span $za vs naive $na")
    assert(zb < nb * 0.5, s"b-span $zb vs naive $nb")
    // and the data survives the round trip
    assert(spark.read.parquet(zDir).count() == 4000)
  }

  test("input validation") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](LayoutOps.withZValue(df, Nil))
    intercept[IllegalArgumentException](
      LayoutOps.interleaveBits(Seq(col("a"), col("b")), 32))
    intercept[IllegalArgumentException](
      LayoutOps.zorderWrite(df, Seq("a"), "/tmp/x", numFiles = 0))
  }
}
