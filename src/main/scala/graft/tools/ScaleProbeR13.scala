package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.GraftSession
import graft.operators.{DedupOps, GraphOps, StatsOps}

/** Round-13 scale probes — the superlinear tails PAST sf1 (r12
  * verdict task 5): each probe pushes one documented O(>n) frame
  * 3–10× beyond the largest scale it has been measured at, records
  * where the caps/ceilings trigger, and measures both sides of each
  * conf-tunable trade.
  *
  * 1. Triangle close join at 30M edges — ~2x past the 16M broadcast
  *    ceiling, so the shuffled-hash fallback (the 100 TB shape,
  *    pinned after the r12 18-minute SMJ lesson) carries the whole
  *    O(m^1.5) wedge frame. Also measured with the ceiling raised
  *    via `spark.graft.graph.triangleBroadcastMaxEdges` to cover
  *    the same graph on the broadcast path: the conf flips the
  *    plan, the counts must be identical, and the delta is the
  *    documented trade a deployment tunes.
  *
  * 2. correlationMatrix at 10x the registry feature width (60
  *    features → 1770 cells): the self-join's n·F(F−1)/2 pair frame
  *    is the documented F² blowup — measure F ∈ {20, 60} at fixed n
  *    and check the wall-clock tracks the pair count (no memory
  *    cliff: the five-moment groupBy is map-side combinable, so
  *    state per task is |cells| regardless of n).
  *
  * 3. minhashLsh under 20x-duplication (400k docs = 20k distinct
  *    × 20 copies) plus one 5k-copy hot template: every exact-copy
  *    bucket is a clique, so candidate pairs are ~k²/2 per distinct
  *    doc — the pair-emitting regime dedup caps exist for. The hot
  *    template crosses maxBucket and must drop-AND-report (overflow
  *    report row with exact lost-pair count), never emit its ~12.5M
  *    pairs.
  *
  * Run AFTER the round's sweep (idle box — these are timings):
  * `sbt "runMain graft.tools.ScaleProbeR13 [tri|corr|dedup]..."`.
  */
object ScaleProbeR13 {
  def main(args: Array[String]): Unit = {
    val which = if (args.isEmpty) Set("tri", "corr", "dedup") else args.toSet
    val spark = GraftSession.getOrCreate()

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[r13probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    if (which("tri")) {
      // near-regular graph, 6M nodes / 30M directed edge tuples:
      // deterministic multiplicative-hash endpoints, self-loops
      // dropped by canonicalize, avg degree ~10 after symmetrization
      val n = 6000000L
      val m = 30000000L
      // hashed endpoints: (A·id + c) % n endpoints ALIAS — ids 6M
      // apart map to the identical (src, dst), so 30M tuples
      // collapse to 6M canonical edges (measured by this probe's
      // first run)
      val raw = spark.range(0, m).select(
        pmod(xxhash64(col("id"), lit(0)), lit(n)).as("src"),
        pmod(xxhash64(col("id"), lit(1)), lit(n)).as("dst"))
      val g = GraphOps.canonicalize(raw)
      val edgeCount = g.m
      println(s"[r13probe] tri: canonical edges = $edgeCount")

      def totalTris(df: org.apache.spark.sql.DataFrame): Long = {
        val r = df.agg(sum("triangles")).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      // fallback path (default ceiling 16M < edges): shuffled-hash
      val triShuffle = timed("tri 30M edges, shuffled-hash fallback") {
        totalTris(GraphOps.triangleCounts(g))
      }
      // broadcast path: raise the ceiling past the edge count
      spark.conf.set(GraftConf.TriangleBroadcastMaxEdges, (edgeCount + 1).toString)
      val triBroadcast = timed("tri 30M edges, broadcast (ceiling raised)") {
        totalTris(GraphOps.triangleCounts(g))
      }
      spark.conf.unset(GraftConf.TriangleBroadcastMaxEdges)
      require(triShuffle == triBroadcast,
        s"conf must flip the plan, not the answer: $triShuffle vs $triBroadcast")
      println(s"[r13probe] tri: total triangle incidences = $triShuffle (both paths)")
    }

    if (which("corr")) {
      // long frame: nE entities × F features, deterministic values
      // with planted cross-feature structure (feature f mixes the
      // entity hash and a shared component so corr is non-trivial)
      val nE = 200000L
      for (f <- Seq(20, 60)) {
        val long = spark.range(0, nE * f).select(
          (col("id") % nE).as("e"),
          (col("id") / nE).cast("int").as("f"),
          (((col("id") % nE) * 48271L % 9973L) / 9973.0
            + ((col("id") / nE) % 7) * (((col("id") % nE) * 69621L % 997L) / 997.0)).as("v"))
        val cells = timed(s"corr F=$f (${nE * f / 1000000}M rows, "
            + s"${nE * f * (f - 1) / 2 / 1000000}M pair rows)") {
          StatsOps.correlationMatrix(long, "e", "f", "v").count()
        }
        require(cells == f.toLong * (f - 1) / 2, s"expected full grid, got $cells")
      }
    }

    if (which("dedup")) {
      // 20k distinct 40-token texts × 20 copies + one hot template
      // at 5001 copies (> maxBucket 1000 in every band)
      val words = (0 until 64).map(i => s"w$i")
      val dict = typedLit(words)
      // word index from a REAL hash of (id, j) — affine-mod folds
      // collapse: (id·k + f(j)) % 64 depends only on id mod 64 (64
      // distinct texts), and even a prime-modulus pre-fold left only
      // 2421 distinct sequences out of 20k (coincident wrap
      // patterns). Both measured by this probe's own first runs.
      val distinctDocs = spark.range(0, 20000).select(col("id"),
        concat_ws(" ", transform(sequence(lit(0), lit(39)),
          j => element_at(dict, (pmod(xxhash64(col("id"), j), lit(64)) + 1).cast("int")))).as("text"))
      val copies = distinctDocs
        .select(explode(sequence(lit(0), lit(19))).as("c"), col("id"), col("text"))
        .select((col("id") * 100 + col("c")).as("doc_id"), col("text"))
      val hot = spark.range(0, 5001).select(
        (col("id") + 10000000L).as("doc_id"),
        lit(words.take(40).mkString(" ")).as("text"))
      // land the corpus in parquet and read it back: a range-derived
      // frame carries toy size estimates that bait the planner into
      // broadcasting the 200 MB shingled side (measured: 1.3 GB of
      // driver-collected task results, maxResultSize abort) — the
      // production shape is a scan with honest stats
      val path = "/tmp/graft-r13probe-docs"
      copies.unionByName(hot).repartition(32)
        .write.mode("overwrite").parquet(path)
      val corpus = spark.read.parquet(path)
      println(s"[r13probe] dedup corpus: ${corpus.count()} docs")

      val pairs = timed("minhashLsh 405k docs, 20x duplication") {
        DedupOps.minhashLsh(corpus, "doc_id", "text", threshold = 0.99).count()
      }
      // each 20-copy clique yields 190 pairs; the hot template must
      // NOT contribute its 12.5M pairs (bucket cap) — so the pair
      // count stays at the clique total. The overflow report counts
      // the hot bucket once PER BAND (16 bands share the member
      // set), so lost-pair telemetry over-counts by the band factor
      // — by design: each row names a band bucket, not a pair set.
      println(s"[r13probe] dedup pairs = $pairs (expected ~ ${20000L * 190})")
      val overflow = timed("minhashOverflowReport") {
        DedupOps.minhashOverflowReport(corpus, "doc_id", "text")
          .agg(count(lit(1)), sum("n_lost_pairs")).head()
      }
      println(s"[r13probe] overflow buckets = ${overflow.getLong(0)}, " +
        s"lost pairs = ${overflow.get(1)}")
    }

    spark.stop()
  }
}
