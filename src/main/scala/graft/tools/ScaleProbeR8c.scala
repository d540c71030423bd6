package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Round-8 wave-3 probes — the new operators against their worst
  * plausible shapes:
  *
  *   1. radiusJoin on 5M×5M uniform points plus ONE dense cell
  *      (10k points co-located in a single grid cell): the dense
  *      cell is a hot equi-join key — measure the candidate
  *      explosion and whether the uniform bulk stays linear.
  *   2. kCore on a 1M-node PATH — the adversarial peel shape:
  *      peeling removes only the two endpoints per round, so
  *      convergence needs O(diameter) rounds and the cap is the
  *      honest cost bound (the capped result is the documented
  *      semantics, NOT the converged core). Measure per-round cost
  *      decay plus a 200k-node blocked core that converges fast.
  *   3. rfm at 20M orders / 2M customers — one partial-agg groupBy
  *      + a 1-row threshold broadcast; the customer frame never
  *      sorts globally.
  *   4. Jaro-Winkler kernel throughput + the hot-block contract:
  *      id-style names share a long constant stem, so blockPrefix
  *      must reach past it (the FuzzyJoinOps scaladoc rule) — probe
  *      both sides of that line.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbeR8c"`. Findings →
  * SCALEPROBE_r08.md.
  */
object ScaleProbeR8c {

  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    denseCellRadiusJoin(spark)
    pathKCore(spark)
    bigRfm(spark)
    jaroHotBlock(spark)
    spark.stop()
  }

  /** 5M uniform points in [0, 10000)² (cell side 10 → ~0.5 points
    * per cell) + 10k points packed into one cell. */
  def denseCellRadiusJoin(spark: SparkSession): Unit = {
    import spark.implicits._
    val uniform = spark.range(5000000L).select(col("id"),
      (pmod(col("id") * 2654435761L, lit(1000000L)) / 100.0).as("x"),
      (pmod(col("id") * 40503L, lit(1000000L)) / 100.0).as("y"))
    val dense = spark.range(10000L).select((col("id") + 10000000L).as("id"),
      (lit(55.0) + pmod(col("id"), lit(1000L)) / 100.0).as("x"),
      (lit(55.0) + pmod(col("id") * 7L, lit(1000L)) / 100.0).as("y"))
    val pts = uniform.unionByName(dense).localCheckpoint(true)
    val n = time("radius 5M uniform-only build") { pts.count() }
    println(s"[probe]   points: $n")
    val out = time("radiusJoin r=10 with 10k-point dense cell") {
      SpatialOps.radiusJoin(pts.select(col("id").as("lid"), col("x"), col("y")),
        pts.select(col("id").as("rid"), col("x"), col("y")),
        "x", "y", 10.0, Seq("lid"), Seq("rid"))
        .filter(col("lid") < col("rid")).count()
    }
    println(s"[probe]   pairs within r: $out (dense cell contributes ~10k²·frac/2)")
  }

  /** 1M-node path (diameter 1M): k=2 peeling strips two endpoints
    * per round — the cap, not convergence, bounds the cost. */
  def pathKCore(spark: SparkSession): Unit = {
    val path = spark.range(999999L).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val capped = time("kCore 1M path, k=2, maxRounds=8") {
      GraphOps.kCore(path, k = 2, maxRounds = 8).count()
    }
    println(s"[probe]   surviving nodes after 8 capped rounds: $capped (converged answer: 0)")
    // blocked 200k-node cycle: converges in ONE round (already a 2-core)
    val cycle = spark.range(200000L).select(col("id").as("src"),
      pmod(col("id") + 1, lit(200000L)).as("dst"))
    val c = time("kCore 200k cycle, k=2 (one-round fixpoint)") {
      GraphOps.kCore(cycle, k = 2).count()
    }
    println(s"[probe]   cycle core nodes: $c")
  }

  /** 20M orders over 2M customers. */
  def bigRfm(spark: SparkSession): Unit = {
    val orders = spark.range(20000000L).select(
      pmod(col("id") * 48271L, lit(2000000L)).as("cust"),
      timestamp_seconds(lit(800000000L) + pmod(col("id") * 7919L, lit(200000000L))).as("d"),
      (pmod(col("id") * 104729L, lit(100000L)) / 100.0 + 1.0).as("amt"))
    val out = time("rfm 20M orders / 2M customers") {
      FunnelOps.rfm(orders, "cust", "d", "amt", "2005-01-01").count()
    }
    println(s"[probe]   customers scored: $out")
  }

  /** Kernel throughput on 10M pairs; then the hot-block rule. */
  def jaroHotBlock(spark: SparkSession): Unit = {
    import graft.functions.StringSimilarity
    val pairs = spark.range(10000000L).select(
      concat(lit("Customer#"), pmod(col("id") * 48271L, lit(100000L)).cast("string")).as("a"),
      concat(lit("Customer#"), pmod(col("id") * 7919L, lit(100000L)).cast("string")).as("b"))
    val s = time("jaro kernel 10M pairs") {
      pairs.select(sum(StringSimilarity.jaroWinkler(col("a"), col("b")))).head().getDouble(0)
    }
    println(f"[probe]   mean sim: ${s / 1e7}%.4f")
    // 200k×200k id-style names: a short blockPrefix keeps the whole
    // frame in one or two blocks (the
    // documented hazard) — blockPrefix=14 reaches past the stem and zero-pad and
    // the join is linear. Probe only the sane side; the hazard side
    // is arithmetic (4e10 candidates).
    val names = spark.range(200000L).select(col("id").as("lid"),
      concat(lit("Customer#"), lpad(col("id").cast("string"), 9, "0")).as("name_a"))
    val names2 = spark.range(200000L).select(col("id").as("rid"),
      concat(lit("Customer#"), lpad(((col("id") + 7) % 200000L).cast("string"), 9, "0")).as("name_b"))
    val m = time("fuzzyJoinJaro 200k×200k, blockPrefix=14 (past the stem)") {
      FuzzyJoinOps.fuzzyJoinJaro(names, names2, "name_a", "name_b", 0.95, blockPrefix = 14).count()
    }
    println(s"[probe]   matches: $m")
  }
}
