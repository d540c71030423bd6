package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.operators.IvfKnnOps

/** r16 scale probe: the named next-10× ANN lever from the r15
  * verdict — the `nLists ∝ √n` sizing rule, measured as a
  * three-point curve at 10M vectors instead of asserted.
  *
  * For nLists ∈ {4096, 16384, 65536} over the SAME 10M-vector corpus
  * (byte-identical to SCALEPROBE_r15 §2's generator, 16384 synthetic
  * clusters), measure:
  *   - buildIndex wall (sample collect + driver Lloyd's): the driver
  *     fit is O(sampleCap · nLists · dim) — the cost that bounds how
  *     far the rule can be pushed before a two-level quantizer is
  *     needed;
  *   - Σ|list|² (predicted kNN-graph candidate volume at nProbe=1)
  *     vs the ideal n²/nLists, plus maxList — whether quantizer
  *     allocation keeps tracking the ideal as nLists moves 4× in
  *     each direction;
  *   - coarse-assignment wall (the one full-corpus NearestCentroid
  *     pass): O(n · nLists · dim) — the scan-side cost of more lists.
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.ScaleProbeR16"`
  * (reuses SCALEPROBE_r15's landed vectors at tmp/probe_r15/vec10m
  * when present).
  */
object ScaleProbeR16 {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val base = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/root/repo/tmp/probe_r15")
    val n = 10000000L
    val dim = 16
    val path = s"$base/vec10m"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      timed(s"nlists: land $n dim-$dim vectors in parquet (r15 generator, 16384 clusters)") {
        val cluster = pmod(xxhash64(col("id"), lit(11)), lit(16384))
        val comps = (0 until dim).map { j =>
          ((pmod(xxhash64(col("cl"), lit(100 + j)), lit(2000001)) / 1e6 - 1.0) * 4.0 +
            (pmod(xxhash64(col("id"), lit(200 + j)), lit(2000001)) / 1e6 - 1.0))
            .cast("float")
        }
        spark.range(0, n)
          .withColumn("cl", cluster)
          .select(col("id"), array(comps: _*).as("vec"))
          .write.mode("overwrite").parquet(path)
      }
    }
    val corpus = spark.read.parquet(path)
    val lists = if (args.isEmpty) Seq(4096, 16384, 65536) else args.toSeq.map(_.toInt)
    lists.foreach { nLists =>
      val index = timed(s"nlists=$nLists: buildIndex (sample collect + driver Lloyd's)")(
        IvfKnnOps.buildIndex(corpus, "id", "vec", nLists, maxIter = 3))
      val sizes = timed(s"nlists=$nLists: coarse assignment + list-size rollup") {
        index.assigned.groupBy("list_id").count()
          .agg(sum(col("count") * col("count")).as("pred"), max("count").as("maxList"),
            count(lit(1)).as("lists"))
          .head()
      }
      val ideal = n * n / nLists
      println(f"[r16probe] nlists=$nLists: sum|list|^2=${sizes.getLong(0)} " +
        f"ideal=$ideal ratio=${sizes.getLong(0).toDouble / ideal}%.3f " +
        s"maxList=${sizes.getLong(1)} nonEmptyLists=${sizes.getLong(2)}")
    }
    spark.stop()
  }

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[r16probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }
}
