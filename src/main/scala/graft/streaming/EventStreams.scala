package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value) — the streaming
  * analogue of the reference's IterableDataset surface
  * (reference: streaming.py; biosets streams batches of the same
  * tables it loads statically).
  *
  * Batch/stream parity: each operator takes a DataFrame that may be
  * batch (`spark.read`) or streaming (`spark.readStream`) — the
  * logical plan is identical, which is how graft tests streaming
  * semantics deterministically (run the same transform in batch =
  * the query's oracle, then assert the streaming run converges to
  * it).
  */
object EventStreams {

  /** Scope the stream's state-partition count to `body` and restore
    * the previous setting after. A streaming query fixes its
    * state-store partition count from `spark.sql.shuffle.partitions`
    * at START (one store instance — one RocksDB — per partition per
    * stateful operator), so a small stream paying 32 store
    * instantiations for a few thousand rows should start under a
    * smaller count; the big-cluster default stays untouched for
    * everything outside the scope. Fewer state partitions is a
    * per-stream capacity choice, not a semantics change — results
    * are partition-count-invariant.
    *
    * Scope discipline: the setting applies to EVERY shuffle planned
    * while `body` runs — including any static subplan inside the
    * streaming query's microbatches — so wrap only the query start
    * (the `writeStream.start()` call path), never eager batch prep
    * like corpus bloom builds, and size `n` for the stream's whole
    * plan, not just its state.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, n.toString)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Tumbling-window counts/sums per event type with a watermark
    * for state eviction. At scale the state store only holds open
    * windows per (window, type) — closed windows emit and evict.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val withTs = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withTs
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, totalValue: Double)
  final case class Session(user_id: Long, start_ts: Long, end_ts: Long, n_events: Long, total_value: Double)

  /** Sessionization: contiguous activity per user with a gap
    * timeout. Custom state machine via flatMapGroupsWithState — the
    * Spark-native replacement for imperative per-entity loops; state
    * is partitioned by user across executors and checkpointed.
    *
    * Streaming inputs get a watermark + EventTimeTimeout: once the
    * event-time watermark passes `lastSeen + gapMs`, the open
    * session is closed, EMITTED, and its state evicted — so a
    * user's final session doesn't wait for a newer event and
    * per-user state is bounded by the watermark horizon (in batch
    * mode timeouts never fire; use [[sessionizeBatchComplete]] for
    * the tail flush there).
    *
    * @param watermark how late events may arrive; also bounds how
    *                  long an open session's state survives past
    *                  its gap timeout
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "2 hours"
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    // captured at plan time: in batch mode there is no watermark and
    // GroupState.getCurrentWatermarkMs/setTimeoutTimestamp THROW —
    // timeouts never fire in batch anyway, so skip them entirely
    val isStreaming = events.isStreaming
    val src = if (isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evts: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap elapsed past the watermark: close + emit the open
            // session and evict its state (sessionizeBatchComplete's
            // tail flush, streamed)
            val st = state.get
            state.remove()
            Iterator.single(Session(userId, st.start, st.lastSeen, st.nEvents, st.totalValue))
          } else {
            // deterministic in-group ordering (batch runs hand the whole
            // group at once; streaming hands per-trigger slices)
            val sorted = evts.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.lastSeen <= gapMs =>
                  cur = Some(st.copy(lastSeen = t, nEvents = st.nEvents + 1, totalValue = st.totalValue + e.value))
                case Some(st) =>
                  closed += Session(userId, st.start, st.lastSeen, st.nEvents, st.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // fire once the watermark passes the session's gap
              // horizon (must stay strictly ahead of the watermark)
              if (isStreaming)
                state.setTimeoutTimestamp(math.max(st.lastSeen + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Batch sessionize including tail sessions — gaps-and-islands
    * with native window functions (lag → gap flag → running count
    * = session id → groupBy), fully inside whole-stage codegen.
    * One shuffle by user + per-user sort; no typed encoders, no
    * per-row JVM object materialization — the batch-scale shape
    * (the typed state machine above stays for streaming, where
    * incremental state is the point).
    *
    * Emits the same rows as running [[sessionize]] + a tail flush:
    * per (user, session): start/end/count/sum.
    */
  def sessionizeBatchComplete(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("__t"), col("event_id"))
    events.toDF()
      .withColumn("__t", expr("unix_micros(ts) div 1000")) // epoch millis, integer division
      .withColumn("__gap", when(col("__t") - lag("__t", 1).over(w) > gapMs, 1).otherwise(0))
      .withColumn("__sess", sum("__gap").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__sess"))
      .agg(
        min("__t").as("start_ts"),
        max("__t").as("end_ts"),
        count(lit(1)).as("n_events"),
        sum("value").as("total_value"))
      .drop("__sess")
      .select("user_id", "start_ts", "end_ts", "n_events", "total_value")
  }

  /** Streaming exact-dedup on a key expression within the
    * watermark horizon — the streaming face of
    * [[graft.operators.DedupOps.exact]]. State holds one entry per
    * distinct key inside the watermark and is evicted as the
    * watermark advances.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Streaming NEAR-dedup: drop documents whose 64-bit SimHash
    * signature has already been seen inside the watermark horizon.
    * Signature-equality is the streaming-compatible near-dup
    * criterion (exact state-store lookups); it catches the
    * identical-and-lightly-edited duplicates that dominate crawl
    * streams, while full hamming-radius matching stays a batch job
    * ([[graft.operators.DedupOps.simhash]]).
    */
  def streamingNearDedup(
      docs: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      watermark: String = "1 hour"
  ): DataFrame = {
    import graft.functions.{HashExpressions => HE}
    val sig = docs.withColumn("__sig", HE.simhashText(col(textCol)))
    val out =
      if (docs.isStreaming)
        sig.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(Seq("__sig"))
      else sig.dropDuplicates("__sig")
    out.drop("__sig")
  }

  /** Streaming near-dedup against a STATIC reference corpus — the
    * production shape for incremental ingestion: drop incoming
    * documents that near-duplicate anything already in the corpus.
    *
    * Stream-static join, no state store: the corpus's MinHash LSH
    * band keys form a static (broadcastable) index; each incoming
    * doc is exploded to its band keys, left-joined against the
    * index, and kept only if NO band matches (windowed count of
    * hits per doc = 0). The static side is re-resolved per
    * micro-batch, so a corpus parquet dir that grows between
    * batches is picked up automatically.
    *
    * Catch-rate follows standard LSH guarantees (a true near-dup
    * shares ≥1 band with probability 1-(1-s^r)^b); exact dups are
    * always caught.
    */
  def streamingDedupAgainstCorpus(
      docs: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String = "ts",
      shingleSize: Int = 5,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      watermark: String = "1 hour",
      windowLen: String = "10 minutes"
  ): DataFrame = {
    import graft.functions.{HashExpressions => HE}
    def bandArr(c: org.apache.spark.sql.Column) =
      HE.minhashBandKeys(HE.shingleHashesText(c, shingleSize), numHashes, rowsPerBand)
    val corpusBands = corpus.select(explode(bandArr(col(textCol))).as("band")).distinct()
      .withColumn("__hit", lit(1))
    // explode_outer, not explode: a null-text doc has a NULL band
    // array, and a keep-unless-duplicate operator must pass it
    // through (null band never equi-joins the corpus → hit 0), not
    // silently delete it by dropping the row at the explode.
    val streamBands = (if (docs.isStreaming) docs.withWatermark(tsCol, watermark) else docs)
      .select(col(idCol), col(tsCol), col(textCol), explode_outer(bandArr(col(textCol))).as("band"))
    streamBands
      .join(corpusBands, Seq("band"), "left_outer")
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(first(col(textCol)).as(textCol), max(coalesce(col("__hit"), lit(0))).as("__hits"))
      .filter(col("__hits") === 0)
      .select(col(idCol), col(textCol))
  }

  final case class BandDoc(band: Long, doc_id: Long, ts: java.sql.Timestamp, text: String)
  final case class BandVerdict(doc_id: Long, ts: java.sql.Timestamp, text: String, hit: Int)

  /** Per-band dedup state machine for [[streamingMinhashDedup]]'s
    * streaming branch, on Spark 4's transformWithState: state is
    * one lastSeen timestamp per band; an event-time timer evicts
    * the marker once the watermark passes lastSeen + TTL (timers
    * that fire early — because the marker refreshed — re-arm).
    * Declaring `ts` as the OUTPUT event-time column is what makes
    * the downstream windowed aggregation legal without touching
    * the chained-stateful correctness checker: every verdict
    * carries its input row's own event time, which is ≥ the
    * watermark by construction.
    */
  private class BandDedupProcessor(stateTtlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, BandDoc, BandVerdict] {
    @transient private var lastSeen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      lastSeen = getHandle.getValueState[Long]("lastSeen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        band: Long,
        rows: Iterator[BandDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[BandVerdict] = {
      // deterministic in-batch ordering: earlier (ts, id) owns the band
      val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
      var seen = if (lastSeen.exists()) Some(lastSeen.get()) else None
      val out = sorted.map { r =>
        // hit only within the TTL gap: state that outlived its TTL
        // but has not yet been evicted (eviction waits for the
        // WATERMARK to pass lastSeen+TTL) must not count, or the
        // stream over-drops relative to the batch twin's gap
        // semantics
        val hit = if (seen.exists(s => r.ts.getTime - s <= stateTtlMs)) 1 else 0
        val t = r.ts.getTime
        seen = Some(math.max(t, seen.getOrElse(t)))
        BandVerdict(r.doc_id, r.ts, r.text, hit)
      }
      seen.foreach { s =>
        lastSeen.update(s)
        // evict once the watermark passes the TTL (kept strictly
        // ahead of the current watermark)
        getHandle.registerTimer(
          math.max(s + stateTtlMs, timerValues.getCurrentWatermarkInMs() + 1))
      }
      out.iterator
    }

    override def handleExpiredTimer(
        band: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[BandVerdict] = {
      if (lastSeen.exists()) {
        val s = lastSeen.get()
        if (timerValues.getCurrentWatermarkInMs() >= s + stateTtlMs) lastSeen.clear()
        else getHandle.registerTimer(math.max(s + stateTtlMs, timerValues.getCurrentWatermarkInMs() + 1))
      }
      Iterator.empty
    }
  }

  /** Streaming MinHash-LSH near-dedup WITHIN the stream.
    *
    * LATE-DATA CONTRACT: rows arriving with event time behind the
    * watermark (past the declared lateness) are best-effort, the
    * standard Structured Streaming contract — a late duplicate of a
    * band whose marker the watermark already TTL-evicted scores
    * hit=0 and is retained. The batch twin assumes on-time data, so
    * a fixture that generates beyond-watermark rows (e.g. unioned
    * file sources racing a far-future row ahead of constant-ts
    * docs) diverges from the twin; keep every role of a planted
    * fixture in ONE source so batch assignment is deterministic.
    *
    * REQUIRED SESSION CONF (streaming runs only):
    * `spark.sql.streaming.stateStore.providerClass=org.apache.spark.
    * sql.execution.streaming.state.RocksDBStateStoreProvider` —
    * transformWithState runs on the RocksDB state store (the
    * provider any large deployment runs anyway). No correctness
    * checks are disabled. Batch-twin calls need no conf.
    *
    * Band keys live in the state store: each of a doc's LSH band
    * keys is a
    * state-store group; a doc is a near-dup when ANY of its bands
    * was emitted by an earlier doc inside the TTL horizon. This is
    * the full-LSH complement to [[streamingNearDedup]]'s
    * signature-equality criterion: catch-rate follows the standard
    * LSH bound (a true near-dup shares ≥1 band with probability
    * 1−(1−s^r)^b), not just exact-signature collisions.
    *
    * Shape: explode to band keys (stateless, codegen) →
    * transformWithState keyed BY BAND (state = one lastSeen
    * timestamp per distinct band inside the TTL — evicted by an
    * event-time timer) emitting per-band verdicts WITH `ts`
    * declared as the output event-time column (SPARK-47960), which
    * legalizes the downstream windowed doc-level combine (kept iff
    * zero band hits). Per-band state is one long; total state is
    * O(distinct bands in horizon), the same O(n·bands) budget as
    * the batch shuffle.
    *
    * Batch twin (the oracle): same TTL semantics via a per-band
    * lag — a band row is a hit iff the previous (ts, doc_id)
    * sighting of that band lies within `stateTtlMs` (markers
    * refresh on every sighting, evict after a quiet TTL, exactly
    * the state-store behavior; streaming eviction lands at the
    * next watermark crossing past the TTL, so the stream converges
    * to the twin as the watermark advances).
    */
  def streamingMinhashDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String = "ts",
      shingleSize: Int = 5,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      watermark: String = "1 hour",
      stateTtlMs: Long = 60 * 60 * 1000L,
      windowLen: String = "10 minutes"
  ): DataFrame = {
    val vdf = minhashVerdicts(docs, idCol, textCol, tsCol, shingleSize,
      numHashes, rowsPerBand, watermark, stateTtlMs)
    vdf.groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(first(col("text")).as(textCol), max(col("hit")).as("__hits"))
      .filter(col("__hits") === 0)
      .select(col("doc_id").as(idCol), col(textCol))
  }

  /** Band-level verdict frame (doc_id, ts, text, hit) behind
    * [[streamingMinhashDedup]] — package-visible so specs can pin
    * the per-band hit layer directly.
    */
  private[streaming] def minhashVerdicts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      shingleSize: Int,
      numHashes: Int,
      rowsPerBand: Int,
      watermark: String,
      stateTtlMs: Long
  ): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.{HashExpressions => HE}
    val isStreaming = docs.isStreaming
    val withWm = if (isStreaming) docs.withWatermark(tsCol, watermark) else docs
    val withBands = withWm.select(
      HE.minhashBandKeys(HE.shingleHashesText(col(textCol), shingleSize), numHashes, rowsPerBand).as("__bands"),
      col(idCol).cast("long").as("doc_id"),
      col(tsCol).as("ts"), // no cast: a Cast wrapper would strip the event-time watermark metadata
      col(textCol).cast("string").as("text"))
    // A null-text doc has a NULL band array; it must ROUTE AROUND the
    // band explode (which would silently drop it) and rejoin the
    // survivor stream as hit=0 — keep-unless-duplicate never deletes
    // a doc it cannot band. (Empty/short text still bands: the
    // all-sentinel MinHash signature makes empty texts exact dups of
    // each other, which is the intended verdict.)
    val nullText = withBands.filter(col("__bands").isNull)
      .select(col("doc_id"), col("ts"), col("text"), lit(0).as("hit"))
    val banded = withBands.filter(col("__bands").isNotNull).select(
      explode(col("__bands")).as("band"), col("doc_id"), col("ts"), col("text"))
    val verdicts: DataFrame =
      if (!isStreaming) {
        // batch twin with the SAME TTL semantics as the state store:
        // the band marker refreshes on every sighting and evicts
        // after stateTtlMs of silence, so a row is a hit iff the
        // PREVIOUS sighting of its band is within the TTL gap — a
        // plain row_number (any earlier sighting, ever) would drop
        // docs the stream keeps once the corpus spans more than the
        // TTL horizon
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band").orderBy(col("ts"), col("doc_id"))
        banded
          .withColumn("__tms", expr("unix_micros(ts) div 1000"))
          .withColumn("__gap", col("__tms") - lag(col("__tms"), 1).over(w))
          .withColumn("hit", when(col("__gap").isNotNull && col("__gap") <= stateTtlMs, 1).otherwise(0))
          .select("doc_id", "ts", "text", "hit")
      } else {
        banded.as[BandDoc]
          .groupByKey(_.band)
          .transformWithState[BandVerdict](
            new BandDedupProcessor(stateTtlMs), "ts", OutputMode.Append)
          .toDF()
      }
    // the transformWithState output already carries `ts` as its
    // event-time column; the batch twin needs no watermark at all
    verdicts.unionByName(nullText)
  }

  final case class ChartIn(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Option[Double])
  // state case classes are qualified-private, NOT `private`: plain
  // `private` stamps ACC_PRIVATE into the InnerClasses attribute,
  // which Janino honors — every encoder UnsafeProjection for the
  // class then fails to compile and falls back to the interpreter
  // on each task (measured: ~220 fallbacks per 5-query bench pass)
  private[streaming] final case class ChartState(b: Double, w: Double, cnt: Long, s1: Double, s2: Double)
  final case class ChartOut(event_id: Long, user_id: Long, ewma: Option[Double], is_anomaly: Option[Int])

  /** Per-key EWMA control-chart state machine for
    * [[streamingEwmaChart]]: an event-time-ordered sequential
    * statistic cannot process rows in arrival order, so rows BUFFER
    * in ListState until the watermark passes them, then replay in
    * (ts, event_id) order through the exact
    * [[graft.functions.EwmaAggregate]] recurrence (same 1e-9
    * per-step snap, same multiply-chain decay, same lagged
    * running-moment band as the batch chart) — the streamed rows
    * are bit-identical to [[graft.operators.DriftOps.ewmaChart]] on
    * the same prefix. Per-key state = the in-watermark event buffer
    * (the inherent cost of ANY order-correct streaming sequential
    * statistic) + five running doubles.
    */
  private class EwmaChartProcessor(lambda: Double, nSigma: Double, minPrior: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ChartIn, ChartOut] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[ChartIn] = _
    @transient private var st: org.apache.spark.sql.streaming.ValueState[ChartState] = _

    private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[ChartIn]("buf",
        org.apache.spark.sql.Encoders.product[ChartIn],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      st = getHandle.getValueState[ChartState]("st",
        org.apache.spark.sql.Encoders.product[ChartState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChartIn],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ChartOut] = {
      rows.foreach(buf.appendValue)
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ChartOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buf.get().toSeq
      val (ready, rest) = all.partition(_.ts.getTime <= wm)
      val out =
        if (ready.isEmpty) Iterator.empty
        else {
          var s = if (st.exists()) st.get() else ChartState(0.0, 1.0, 0L, 0.0, 0.0)
          val res = ready.sortBy(r => (r.ts.getTime, r.event_id)).map { r =>
            // lag of the raw debiased EWMA — the batch chart's
            // ewma_prev (unsnapped; dev snaps after the subtract)
            val ewmaPrevRaw = if (s.w == 1.0) None else Some(s.b / (1.0 - s.w))
            val cntp = s.cnt; val s1p = s.s1; val s2p = s.s2
            val (nb, nw) = r.value match {
              case Some(x) => (snap9(lambda * x + (1.0 - lambda) * s.b), s.w * (1.0 - lambda))
              case None    => (s.b, s.w)
            }
            val ewmaOut = if (nw == 1.0) None else Some(snap9(nb / (1.0 - nw)))
            val anomaly: Option[Int] = r.value match {
              case Some(x) if cntp >= minPrior && ewmaPrevRaw.isDefined =>
                val np = cntp.toDouble
                val variance = math.max((s2p - s1p * s1p / np) / np, 0.0)
                val sigma = snap9(math.sqrt(variance))
                val dev = snap9(math.abs(x - ewmaPrevRaw.get))
                Some(if (dev > snap9(nSigma * sigma)) 1 else 0)
              case _ => None
            }
            s = r.value match {
              case Some(x) => ChartState(nb, nw, s.cnt + 1, s.s1 + x, s.s2 + x * x)
              case None    => s.copy(b = nb, w = nw)
            }
            ChartOut(r.event_id, r.user_id, ewmaOut, anomaly)
          }
          st.update(s)
          res.iterator
        }
      buf.clear()
      if (rest.nonEmpty) {
        rest.foreach(buf.appendValue)
        getHandle.registerTimer(wm + 1)
      }
      out
    }
  }

  final case class CusumOut(event_id: Long, user_id: Long,
      s_pos: Option[Double], s_neg: Option[Double], alarm: Option[Int])
  private[streaming] final case class CusumState(sp: Double, sn: Double)

  /** Per-key tabular-CUSUM state machine for [[streamingCusum]] —
    * the same buffer-until-watermark / replay-in-event-time-order
    * shape as [[EwmaChartProcessor]] (a sequential statistic cannot
    * process arrival order), but the carried state is just the two
    * snapped one-sided sums: `S⁺ = max(0, S⁺ + x − target − k)`,
    * `S⁻ = max(0, S⁻ + (target − k − x))` — bit-identical to
    * [[graft.operators.DriftOps.cusum]] on the sealed prefix. Null
    * values leave state untouched and emit null statistics, matching
    * the batch scan.
    */
  private class CusumProcessor(target: Double, k: Double, h: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ChartIn, CusumOut] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[ChartIn] = _
    @transient private var st: org.apache.spark.sql.streaming.ValueState[CusumState] = _

    private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[ChartIn]("buf",
        org.apache.spark.sql.Encoders.product[ChartIn],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      st = getHandle.getValueState[CusumState]("st",
        org.apache.spark.sql.Encoders.product[CusumState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChartIn],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[CusumOut] = {
      rows.foreach(buf.appendValue)
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[CusumOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buf.get().toSeq
      val (ready, rest) = all.partition(_.ts.getTime <= wm)
      val out =
        if (ready.isEmpty) Iterator.empty
        else {
          var s = if (st.exists()) st.get() else CusumState(0.0, 0.0)
          val res = ready.sortBy(r => (r.ts.getTime, r.event_id)).map { r =>
            r.value match {
              case Some(x) =>
                val sp = snap9(math.max(0.0, s.sp + x - target - k))
                val sn = snap9(math.max(0.0, s.sn + (target - k - x)))
                s = CusumState(sp, sn)
                CusumOut(r.event_id, r.user_id, Some(sp), Some(sn),
                  Some(if (sp > h || sn > h) 1 else 0))
              case None => CusumOut(r.event_id, r.user_id, None, None, None)
            }
          }
          st.update(s)
          res.iterator
        }
      buf.clear()
      if (rest.nonEmpty) {
        rest.foreach(buf.appendValue)
        getHandle.registerTimer(wm + 1)
      }
      out
    }
  }

  /** STREAMING tabular CUSUM per user — N24's sustained-drift
    * detector in stream state (the small-persistent-shift
    * complement of [[streamingEwmaChart]]'s pointwise band). Same
    * conf contract as [[streamingMinhashDedup]] (RocksDB state
    * store); rows emit once the watermark seals them, replayed in
    * event-time order, so the streamed chart equals
    * [[graft.operators.DriftOps.cusum]] row-for-row on the sealed
    * prefix — the batch form IS the oracle. Per-key durable state
    * beyond the in-watermark buffer is exactly two doubles.
    */
  def streamingCusum(
      events: DataFrame,
      target: Double,
      k: Double,
      h: Double,
      watermark: String = "1 hour"
  ): DataFrame = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      graft.operators.DriftOps.cusum(events, Seq("user_id"), Seq("ts", "event_id"),
          "value", target, k, h)
        .select(col("event_id"), col("user_id"), col("s_pos"), col("s_neg"),
          col("alarm").cast("int").as("alarm"))
    } else {
      events.withWatermark("ts", watermark)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[ChartIn]
        .groupByKey(_.user_id)
        .transformWithState[CusumOut](
          new CusumProcessor(target, k, h),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
        .toDF()
    }
  }

  /** STREAMING EWMA control chart per user — N18's sequential
    * anomaly detector running in stream state (M-family: the
    * monitoring twin of the windowed sketches). Same conf contract
    * as [[streamingMinhashDedup]] (RocksDB state store). Rows emit
    * once the watermark passes them, replayed in event-time order,
    * so the streamed chart equals the batch chart row-for-row on
    * everything the watermark has sealed — one call site serves
    * batch (delegating to [[graft.operators.DriftOps.ewmaChart]])
    * and stream, and the batch form IS the oracle.
    */
  def streamingEwmaChart(
      events: DataFrame,
      lambda: Double = 0.25,
      nSigma: Double = 3.0,
      minPrior: Int = 5,
      watermark: String = "1 hour"
  ): DataFrame = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      graft.operators.DriftOps.ewmaChart(events, Seq("user_id"), Seq("ts", "event_id"),
          "value", lambda, nSigma, minPrior)
        .select(col("event_id"), col("user_id"), col("ewma"),
          col("is_anomaly").cast("int").as("is_anomaly"))
    } else {
      events.withWatermark("ts", watermark)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[ChartIn]
        .groupByKey(_.user_id)
        .transformWithState[ChartOut](
          new EwmaChartProcessor(lambda, nSigma, minPrior),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
        .toDF()
    }
  }

  final case class ForecastOut(event_id: Long, user_id: Long,
      s1: Double, s2: Double, level: Double, trend: Double, forecast: Double)
  private[streaming] final case class BrownState(b1: Double, w1: Double, b2: Double, w2: Double)

  /** Per-key Brown double-smoothing state machine for
    * [[streamingBrownForecast]] — the same buffer-until-watermark /
    * event-time-ordered replay as [[EwmaChartProcessor]], carrying
    * the four affine-scan state doubles (b₁,w₁,b₂,w₂). Null values
    * emit nothing and leave state untouched (the batch operator
    * drops them), so the streamed rows are bit-identical to
    * [[graft.operators.DriftOps.doubleEwmaForecast]] on the sealed
    * prefix.
    */
  private class BrownProcessor(lambda: Double, horizon: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ChartIn, ForecastOut] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[ChartIn] = _
    @transient private var st: org.apache.spark.sql.streaming.ValueState[BrownState] = _

    private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[ChartIn]("buf",
        org.apache.spark.sql.Encoders.product[ChartIn],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      st = getHandle.getValueState[BrownState]("st",
        org.apache.spark.sql.Encoders.product[BrownState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChartIn],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ForecastOut] = {
      rows.foreach(buf.appendValue)
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ForecastOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buf.get().toSeq
      val (ready, rest) = all.partition(_.ts.getTime <= wm)
      val out =
        if (ready.isEmpty) Iterator.empty
        else {
          var s = if (st.exists()) st.get() else BrownState(0.0, 1.0, 0.0, 1.0)
          val res = ready.sortBy(r => (r.ts.getTime, r.event_id)).flatMap { r =>
            r.value match {
              case Some(x) =>
                val b1 = snap9(lambda * x + (1.0 - lambda) * s.b1)
                val w1 = s.w1 * (1.0 - lambda)
                val s1 = snap9(b1 / (1.0 - w1))
                val b2 = snap9(lambda * s1 + (1.0 - lambda) * s.b2)
                val w2 = s.w2 * (1.0 - lambda)
                val s2 = snap9(b2 / (1.0 - w2))
                s = BrownState(b1, w1, b2, w2)
                val level = snap9(2.0 * s1 - s2)
                val trend = snap9(lambda / (1.0 - lambda) * (s1 - s2))
                val forecast = snap9(level + horizon.toDouble * trend)
                Some(ForecastOut(r.event_id, r.user_id, s1, s2, level, trend, forecast))
              case None => None
            }
          }
          st.update(s)
          res.iterator
        }
      buf.clear()
      if (rest.nonEmpty) {
        rest.foreach(buf.appendValue)
        getHandle.registerTimer(wm + 1)
      }
      out
    }
  }

  /** STREAMING Brown double-exponential-smoothing forecast per user
    * — N30 in stream state (the trend-aware forecaster next to
    * [[streamingEwmaChart]]'s flat band and [[streamingCusum]]'s
    * shift detector). Same conf contract as
    * [[streamingMinhashDedup]] (RocksDB state store); rows emit once
    * the watermark seals them, replayed in (ts, event_id) order
    * through the identical chained snapped recurrences, so the
    * streamed forecast equals
    * [[graft.operators.DriftOps.doubleEwmaForecast]] row-for-row —
    * one call site serves batch and stream, and the batch form IS
    * the oracle. Durable per-key state beyond the in-watermark
    * buffer is exactly four doubles.
    */
  def streamingBrownForecast(
      events: DataFrame,
      lambda: Double = 0.25,
      horizon: Int = 3,
      watermark: String = "1 hour"
  ): DataFrame = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      graft.operators.DriftOps.doubleEwmaForecast(events, Seq("user_id"),
          Seq("ts", "event_id"), "value", lambda, horizon)
        .select(col("event_id"), col("user_id"), col("s1"), col("s2"),
          col("level"), col("trend"), col("forecast"))
    } else {
      events.withWatermark("ts", watermark)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[ChartIn]
        .groupByKey(_.user_id)
        .transformWithState[ForecastOut](
          new BrownProcessor(lambda, horizon),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
        .toDF()
    }
  }

  final case class HwOut(event_id: Long, user_id: Long, level: Double,
      trend: Double, seasonal: Double, forecast: Option[Double])
  private[streaming] final case class HwState(started: Boolean, l: Double, b: Double,
      i: Long, s: Seq[Double])

  /** Per-key Holt–Winters state machine for [[streamingHoltWinters]]
    * — the [[BrownProcessor]] buffer-until-watermark / event-time-
    * ordered replay, carrying (ℓ, b, obs count, m seasonal
    * offsets). Null values emit nothing and leave state untouched,
    * so the streamed rows are bit-identical to
    * [[graft.operators.DriftOps.holtWinters]] on the sealed prefix.
    */
  private class HwProcessor(seasonLen: Int, alpha: Double, beta: Double, gamma: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ChartIn, HwOut] {
    @transient private var buf: org.apache.spark.sql.streaming.ListState[ChartIn] = _
    @transient private var st: org.apache.spark.sql.streaming.ValueState[HwState] = _

    private def snap9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[ChartIn]("buf",
        org.apache.spark.sql.Encoders.product[ChartIn],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      st = getHandle.getValueState[HwState]("st",
        org.apache.spark.sql.Encoders.product[HwState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[ChartIn],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[HwOut] = {
      rows.foreach(buf.appendValue)
      getHandle.registerTimer(timerValues.getCurrentWatermarkInMs() + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[HwOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buf.get().toSeq
      val (ready, rest) = all.partition(_.ts.getTime <= wm)
      val out =
        if (ready.isEmpty) Iterator.empty
        else {
          var state = if (st.exists()) st.get()
            else HwState(started = false, 0.0, 0.0, 0L, Vector.fill(seasonLen)(0.0))
          val res = ready.sortBy(r => (r.ts.getTime, r.event_id)).flatMap { r =>
            r.value match {
              case Some(x) =>
                val idx = (state.i % seasonLen).toInt
                if (!state.started) {
                  state = HwState(started = true, x, 0.0, state.i + 1, state.s)
                  Some(HwOut(r.event_id, r.user_id, x, 0.0, 0.0, None))
                } else {
                  val sHat = state.s(idx)
                  val forecast = snap9(state.l + state.b + sHat)
                  val lNew = snap9(alpha * (x - sHat) + (1.0 - alpha) * (state.l + state.b))
                  val bNew = snap9(beta * (lNew - state.l) + (1.0 - beta) * state.b)
                  val sNew = snap9(gamma * (x - lNew) + (1.0 - gamma) * sHat)
                  state = HwState(started = true, lNew, bNew, state.i + 1,
                    state.s.updated(idx, sNew))
                  Some(HwOut(r.event_id, r.user_id, lNew, bNew, sNew, Some(forecast)))
                }
              case None => None
            }
          }
          st.update(state)
          res.iterator
        }
      buf.clear()
      if (rest.nonEmpty) {
        rest.foreach(buf.appendValue)
        getHandle.registerTimer(wm + 1)
      }
      out
    }
  }

  /** STREAMING Holt–Winters additive forecast per user — the
    * seasonal member of the streaming-monitor family
    * ([[streamingEwmaChart]] flat band, [[streamingCusum]] shift
    * detector, [[streamingBrownForecast]] trend): N31 in stream
    * state via the same buffer-until-watermark / event-time-ordered
    * replay. Same conf contract as [[streamingMinhashDedup]]
    * (RocksDB state store). Durable per-key state beyond the
    * in-watermark buffer is seasonLen+3 scalars; the streamed rows
    * are bit-identical to the batch scan, so the batch recursion
    * grades the streamed run directly — one call site serves both.
    */
  def streamingHoltWinters(
      events: DataFrame,
      seasonLen: Int = 4,
      alpha: Double = 0.5,
      beta: Double = 0.25,
      gamma: Double = 0.125,
      watermark: String = "1 hour"
  ): DataFrame = {
    import events.sparkSession.implicits._
    if (!events.isStreaming) {
      graft.operators.DriftOps.holtWinters(events, Seq("user_id"), Seq("ts", "event_id"),
          "value", seasonLen, alpha, beta, gamma)
        .select(col("event_id"), col("user_id"), col("level"), col("trend"),
          col("seasonal"), col("forecast"))
    } else {
      events.withWatermark("ts", watermark)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[ChartIn]
        .groupByKey(_.user_id)
        .transformWithState[HwOut](
          new HwProcessor(seasonLen, alpha, beta, gamma),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
        .toDF()
    }
  }

  /** Streaming top-k: the k highest-`value` event ids per
    * (window, event_type), continuously maintained. The bounded
    * [[graft.functions.TopKAggregate.TopK]] aggregate is exactly
    * the right state shape for streaming — per-group state is k
    * entries regardless of stream length, and map-side partials
    * bound the state-store write amplification. Works identically
    * on a batch frame (the oracle twin).
    */
  def topKPerWindow(
      events: DataFrame,
      k: Int,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"
  ): DataFrame = {
    import graft.functions.{TopKAggregate => TK}
    val withWm = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(TK.topK(col("value"), col("event_id"), k).as("tk"))
      .select(col("w.start").as("window_start"), col("event_type"),
        posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("window_start"), col("event_type"),
        col("e.id").as("event_id"), col("e.score").as("value"), (col("pos") + 1).as("rank"))
  }

  /** Stream-STREAM interval join: every (l, r) pair with matching
    * keys where `r`'s event time lands in `[l.ts, l.ts + maxLag]` —
    * the attribution join (view→purchase, impression→click,
    * request→response) that stream-STATIC joins (M6/M9/M10) cannot
    * express because BOTH sides arrive continuously.
    *
    * Spark's stream-stream inner join is exactly the right engine:
    * both sides hash-partition on the join key into the state store
    * (co-partitioned — ONE shuffle each, no rescan), and the
    * watermark + the time-range bound on both event-time columns
    * let the engine evict state as the watermark passes `maxLag` —
    * per-key state is bounded by the lag horizon, not the stream
    * length. Inner-join matches emit in the microbatch where both
    * sides are present; no result waits on watermark advance.
    *
    * Batch parity: on batch frames the same plan is a plain
    * range-predicated equi-join (watermarks are no-ops), so one
    * call site serves both the streaming path and its oracle twin.
    *
    * Column names must be disjoint across the two sides (rename
    * before joining — keeps the output schema unambiguous without
    * prefix-mangling).
    */
  def streamIntervalJoin(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      maxLag: String,
      watermark: String = "1 hour"
  ): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"left/right column names must be disjoint, shared: $overlap")
    val l = if (left.isStreaming) left.withWatermark(leftTs, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, watermark) else right
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxLag"))
  }

  /** File-source streaming read of an events directory with the
    * static schema — the entry point for a real deployment
    * (swap for Kafka by changing format only).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(dir)
}
