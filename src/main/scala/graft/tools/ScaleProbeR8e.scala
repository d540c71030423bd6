package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Round-8 wave-7..10 probes — the new operators against their
  * worst plausible shapes:
  *
  *   1. attribution with a HOT user (100k touches, 1k conversions
  *      on one key) — the per-conversion window is the hazard: the
  *      user-keyed join emits touches×convs pairs for the hot key
  *      if the lookback doesn't bound it. Measure a bounded
  *      lookback vs the user's full span.
  *   2. activeUsers at 20M events / 500k users / 30 days — the
  *      28× fan-out of the distinct user-day frame plus a
  *      3-way filtered count-distinct expand.
  *   3. hllRollingDistinct on the same log — the sketch path must
  *      be dramatically cheaper than the exact path at this shape.
  *   4. snapshotDiff 10M vs 10M with 1% mutations — one full-outer
  *      join, output bounded by the diff.
  *   5. qualityChecks over 20M rows — five row checks must stay
  *      ONE pass (a second pass would double the wall-clock).
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR8e"`. Findings →
  * SCALEPROBE_r08.md.
  */
object ScaleProbeR8e {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    hotUserAttribution(spark)
    bigActiveUsers(spark)
    bigSnapshotDiff(spark)
    bigQualityChecks(spark)
    spark.stop()
  }

  /** One user with 100k touches + 1k conversions (plus 1M normal
    * users): the hot key's join fan-out is convs×touches unless the
    * lookback bounds it.
    */
  def hotUserAttribution(spark: SparkSession): Unit = {
    val normal = spark.range(1000000L).select(
      (col("id") % 100000L).as("u"),
      (col("id") * 60000L).cast("timestamp").as("ts"),
      col("id").as("eid"),
      when(col("id") % 10 === 0, "buy").otherwise("view").as("typ"))
    val hot = spark.range(101000L).select(
      lit(999999L).as("u"),
      (col("id") * 3600L).cast("timestamp").as("ts"),
      (col("id") + 10000000L).as("eid"),
      when(col("id") % 101 === 0, "buy").otherwise("view").as("typ"))
    val ev = normal.unionByName(hot)
    val bounded = time("attribution 1.1M events, hot user 100k touches, 1-day lookback") {
      FunnelOps.attribution(ev, "u", "ts", "eid", "typ", "buy", Seq("view"), 86400L)
        .collect()
    }
    println(s"[probe]   channels: ${bounded.length}")
    val wide = time("attribution same, 30-day lookback (hot-key fan-out regime)") {
      FunnelOps.attribution(ev, "u", "ts", "eid", "typ", "buy", Seq("view"), 30L * 86400L)
        .collect()
    }
    println(s"[probe]   channels: ${wide.length}")
  }

  /** 20M events / 500k users / 30 days: exact vs sketch path. */
  def bigActiveUsers(spark: SparkSession): Unit = {
    val ev = spark.range(20000000L).select(
      pmod(col("id") * 2654435761L, lit(500000L)).as("u"),
      (lit(1700000000L) + pmod(col("id") * 40503L, lit(30L)) * 86400L +
        pmod(col("id"), lit(86400L))).cast("timestamp").as("ts"))
    val exact = time("activeUsers EXACT 20M events / 500k users / 30 days / w=1,7,28") {
      SequenceOps.activeUsers(ev, "u", "ts", Seq(1, 7, 28)).collect()
    }
    println(s"[probe]   days: ${exact.length}")
    val sk = time("hllRollingDistinct SKETCH same log (p=12)") {
      SketchOps.hllRollingDistinct(ev, "ts", "u", Seq(1, 7, 28), p = 12).collect()
    }
    val pair = exact.map(r => r.getDate(0).toString -> r.getLong(3)).toMap
    val errs = sk.map { r =>
      val t = pair(r.getDate(0).toString).toDouble
      math.abs(r.getDouble(3) - t) / t
    }
    println(f"[probe]   sketch MAU rel-err: max ${errs.max * 100}%.2f%% (HLL p=12 expects ~1.6%%)")
  }

  /** 10M-row snapshots, 1% changed / 0.5% removed / 0.5% added. */
  def bigSnapshotDiff(spark: SparkSession): Unit = {
    val base = spark.range(10000000L).select(col("id").as("k"),
      (col("id") % 1000L).cast("double").as("v"),
      (col("id") % 7L).cast("string").as("s"))
    val next = base.filter(col("k") % 200L =!= 0)
      .withColumn("v", when(col("k") % 100L === 0, col("v") + 1.0).otherwise(col("v")))
      .unionByName(spark.range(10000000L, 10050000L).select(col("id").as("k"),
        lit(0.0).as("v"), lit("n").as("s")))
    val d = time("snapshotDiff 10M vs 10M, ~2% diff") {
      MergeOps.snapshotDiff(base, next, Seq("k"), Seq("v", "s")).groupBy("status").count().collect()
    }
    println(s"[probe]   ${d.map(r => r.getString(0) + "=" + r.getLong(1)).mkString(" ")}")
  }

  /** 20M rows, five row-level checks + uniqueness. */
  def bigQualityChecks(spark: SparkSession): Unit = {
    val df = spark.range(20000000L).select(col("id"),
      when(col("id") % 1000 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 500L).cast("double")).as("v"),
      (col("id") % 3L).cast("string").as("st"))
    val r = time("qualityChecks 20M rows: 4 row checks (one pass) + unique (one shuffle)") {
      QualityOps.check(df, Seq(
        QualityOps.NotNull("v"),
        QualityOps.InRange("v", 0.0, 400.0),
        QualityOps.InSet("st", Seq("0", "1", "2")),
        QualityOps.Matches("st", "[0-9]"),
        QualityOps.Unique(Seq("id")))).collect()
    }
    r.foreach(x => println(s"[probe]   ${x.getString(0)}: ${x.getLong(2)} violations"))
  }
}
