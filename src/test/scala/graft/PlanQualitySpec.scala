package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Guards on the PHYSICAL plans of the flagship queries — the
  * scale contract: filters/projections reach the parquet scan,
  * dimension joins broadcast, aggregations have a partial
  * (map-side) phase, and the hot per-row paths stay inside
  * whole-stage codegen.
  */
class PlanQualitySpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  test("q_load_project pushes filter and prunes columns at the scan") {
    val p = planOf(q("q_load_project"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    // only the 4 referenced columns are read, not all 11
    assert(p.contains("ReadSchema") && !p.contains("l_returnflag"), p)
  }

  test("sample-metadata join broadcasts the metadata side, never shuffles the fact side") {
    val p = planOf(q("q_sample_meta_join"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dim-chain enrich join is all broadcasts") {
    val p = planOf(q("q_join_enrich"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("grouped aggregation has a partial (map-side) phase") {
    val p = planOf(q("q_agg"))
    assert(p.split("HashAggregate").length >= 3, p) // partial + final
  }

  test("label encode is a pure projection — no join, no shuffle in the encode step") {
    val p = planOf(q("q_label_encode"))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("train/test split is shuffle-free") {
    val p = planOf(q("q_train_test_split"))
    assert(!p.contains("Exchange"), p)
  }

  test("prevalence filter semi-join broadcasts the kept-features side") {
    val p = planOf(q("q_prevalence"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("bucketed co-located join never exchanges on the join key") {
    val p = planOf(q("q_bucketed_join"))
    // both sides arrive pre-bucketed: the only Exchange allowed is
    // the downstream groupBy's, never one on the join key
    assert(!p.contains("Exchange hashpartitioning(o_custkey"), p)
  }

  test("dedup plans never contain a cartesian or nested-loop join") {
    for (name <- Seq("q_dedup_minhash", "q_dedup_simhash", "q_ngram_jaccard", "q_embed_dedup")) {
      val p = planOf(q(name))
      assert(!p.contains("CartesianProduct"), s"$name: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name: $p")
    }
  }

  test("as-of join is one windowed pass, not a range join") {
    val p = planOf(q("q_asof_join"))
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("rollup broadcast-joins the feature mapping") {
    val p = planOf(q("q_rollup"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("per-row text analysis: no shuffle, stats expression evaluated exactly once per row") {
    val p = planOf(q("q_quality"))
    assert(!p.contains("Exchange"), p) // per-row scoring must not shuffle
    // the fused text_stats expression appears once (in the Generate),
    // not once per derived column
    assert("text_stats".r.findAllIn(p).size == 1, p)
  }

  test("simhash candidate stage is ONE bucket shuffle with fused pair verification") {
    val p = planOf(q("q_dedup_simhash"))
    // capped bucket collect + hamming-fused generator replace the r1
    // count-groupBy + semi-join + self-join shape
    assert(p.contains("capped_collect_list"), p)
    assert(p.contains("hamming_pairs"), p)
    assert(!p.contains("LeftSemi"), p)
    // hash shuffles: bucket groupBy + pair distinct only (the third
    // exchange in the full plan is the driver query's orderBy range
    // partitioning)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("minhash candidates collect ids only; shingle arrays never ride the candidate shuffle") {
    val p = planOf(q("q_dedup_minhash"))
    assert(p.contains("capped_collect_list"), p)
    assert(p.contains("id_pairs"), p)
  }

  test("knn ranking is a bounded top-k aggregate, not a window sort over all scored rows") {
    for (name <- Seq("q_knn_brute", "q_knn_ivf", "q_knn_lsh")) {
      val p = planOf(q(name))
      assert(p.contains("top_k"), s"$name: $p")
    }
    // brute + lsh have no window at all; ivf keeps one TINY window
    // for per-query probe selection (|Q|·nLists rows), never over
    // the scored corpus
    for (name <- Seq("q_knn_brute", "q_knn_lsh"))
      assert(!planOf(q(name)).contains("Window"), name)
  }

  test("broadcast as-of rides Spark's BroadcastExchange; fact side never shuffles") {
    val p = planOf(q("q_asof_broadcast"))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("Exchange hashpartitioning(user_id"), p)
  }

  test("vec centroid aggregates map-side; shuffle carries one buffer per (group, task)") {
    val p = planOf(q("q_vec_centroid"))
    assert(p.contains("partial_vec_mean") || p.contains("partial_vecmean") ||
      ("vec_mean".r.findAllIn(p).size >= 2), p) // partial + final
  }

  test("multi-table embedding dedup stays ONE bucket shuffle (tables ride the same exchange)") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = planOf(graft.operators.DedupOps.embeddingDedup(
      emb, "vec_id", "embedding", threshold = 0.99, nBits = 8, nTables = 4))
    // one groupBy(bucket) exchange + the distinct's exchange — the 4
    // tables must NOT add per-table shuffles
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("classEncode broadcast fallback: dictionary broadcasts, fact side never shuffles") {
    import org.apache.spark.sql.functions._
    val big = spark.range(30000).select(
      concat(lit("label_"), format_string("%07d", (col("id") * 7919) % 25000)).as("y"))
    val plan = planOf(graft.operators.LabelOps.classEncodeBroadcast(big, "y"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("IVF-PQ probe: encoded corpus joins broadcast probes, codes never shuffle") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val index = graft.operators.IvfKnnOps.buildPqIndex(
      emb, "vec_id", "embedding", nLists = 4, m = 8, kPerSub = 16, maxIter = 2)
    val plan = planOf(graft.operators.IvfKnnOps.pqTopK(
      emb.filter(col("vec_id") < 3), index, "vec_id", "embedding", 3, nProbe = 2))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the encoded corpus side reaches the join without an exchange of
    // its own: scored rows only shuffle inside the bounded top-k agg
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("partial_top_k") || "top_k".r.findAllIn(plan).size >= 2, plan)
  }

  test("repetition + normalization are pure scan-stage projections — zero shuffle, no join") {
    for (name <- Seq("q_repetition", "q_normalize")) {
      val p = planOf(q(name))
      assert(!p.contains("Exchange"), s"$name: $p")
      assert(!p.contains("Join"), s"$name: $p")
    }
  }

  test("decontaminate: in-bloom probe clears the majority in the scan; verify join broadcasts") {
    val p = planOf(q("q_decontaminate"))
    // the per-doc bloom probe must sit in a Filter over the scan
    // (exists+in_bloom), not behind any exchange
    assert(p.contains("in_bloom"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("chunking is a pure scan-stage generator — zero shuffle, no join") {
    val p = planOf(q("q_chunk"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("quantile filter: one aggregate for the threshold, broadcast back — the fact side never shuffles") {
    val p = planOf(q("q_quantile_filter"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the fact-side scan feeds the filter without an exchange of its
    // own: the only exchange below the join is the 1-row aggregate's
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
  }

  test("per-source quota is one hash shuffle on the group key, no global sort") {
    val p = planOf(q("q_mix_quota"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p) // tree + details for ONE exchange
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("semantic dedup is ONE cluster-bucket exchange; assignment rides the scan") {
    val p = planOf(q("q_semantic_dedup"))
    // multi-probe assignment (top_centroids + explode) since r9 —
    // still a zero-shuffle scan-stage expression
    assert(p.contains("top_centroids"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("corpus-membership dedup: bloom-negative branch reaches the union with no join above it") {
    val p = planOf(q("q_corpus_dedup"))
    assert(p.contains("in_bloom"), p)
    // exactly one anti-join (the suspects verify; formatted explain
    // names each operator twice — tree + details); the clean branch
    // is join-free
    assert("LeftAnti".r.findAllIn(p).size == 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("range join plans as a hash equi-join on bins — never the BNLJ a theta join would get") {
    val p = planOf(q("q_range_join"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("temperature sample broadcasts the tiny rates frame — the doc side never shuffles") {
    val p = planOf(q("q_temp_sample"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("heavy hitters and weighted sample aggregate with map-side partials, no window sort") {
    for (name <- Seq("q_heavy_hitters", "q_weighted_sample")) {
      val p = planOf(q(name))
      assert(p.contains("ObjectHashAggregate"), s"$name:\n$p")
      assert(p.split("ObjectHashAggregate").length >= 3, s"$name has no partial phase:\n$p")
      assert(!p.contains("Window"), s"$name:\n$p")
    }
  }

  test("unbounded per-group collects run through spillable WindowExec, never ObjectHashAggregate") {
    // the session holds the ObjectHashAggregate hash path to 1M keys
    // for BOUNDED aggregate buffers (GraftSession fallbackThreshold
    // note); operators whose per-group state is unbounded (a user's
    // events, a doc's lines, a doc's covered token indices) must
    // therefore aggregate through window functions, whose one-group-
    // at-a-time buffer spills. This pins the plan shape.
    for (name <- Seq("q_funnel", "q_boilerplate", "q_substring_dedup")) {
      val p = planOf(q(name))
      assert(p.contains("Window"), s"$name lost its window rewrite:\n$p")
      assert(!p.contains("ObjectHashAggregate"),
        s"$name has an unbounded collect on the hash-aggregate path:\n$p")
      // the one-row-per-group reduction over the window output is a
      // keyed first() that plans as a STREAMING SortAggregate (one
      // prebuilt array held at a time), never a second window pass
      assert(p.contains("SortAggregate"), s"$name lost its streaming reduction:\n$p")
    }
  }

  test("scrub/boilerplate rebuild joins are eliminable under count-shaped actions") {
    // the covered/rebuilt side ends in a KEYED Aggregate, so its
    // join keys are provably unique and a count over the operator
    // (the r14-r16 bench action shape) eliminates the left join and
    // the whole scrub subtree — the row_number()=1 filter this
    // replaced hid the uniqueness and cost a measured 0.2 s → 2.5 s
    // cliff at sf0.1 (OPTIMIZATION_r16.md)
    import org.apache.spark.sql.functions.{count, lit}
    for (name <- Seq("q_substring_dedup", "q_boilerplate")) {
      val p = q(name).agg(count(lit(1))).queryExecution.optimizedPlan.toString
      assert(!p.contains("Join"), s"$name count no longer eliminates its left join:\n$p")
    }
  }

  test("BPE scoring-side queries stay zero-shuffle scan projections (encode/decode/chunk inline)") {
    // q_bpe is a pure per-row projection; q_bpe_chunk's only
    // exchange is the reassembly harness groupBy, not the chunker
    val p = planOf(q("q_bpe"))
    assert(!p.contains("Exchange"), p)
    assert(p.contains("bpe_"), p)
    val pc = planOf(q("q_bpe_chunk"))
    assert("Exchange".r.findAllIn(pc).size <= 4, pc) // one hash exchange (tree+details naming)
  }
}
