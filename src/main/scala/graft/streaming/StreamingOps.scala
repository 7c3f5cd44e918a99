package graft.streaming

import graft.operators.{TopN, TopNConfig}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming surface of the engine (Structured Streaming).
  *
  * The reference plugin is registered for CDAP's `cdap-data-streams`,
  * where the host applies the *batch* aggregator independently to each
  * micro-batch window (`pom.xml:39-42` — no stream-specific logic in
  * the plugin itself). [[StreamingOps.perBatchTopN]] reproduces those
  * semantics exactly with `foreachBatch`. The windowed and stateful
  * variants are the Spark-native generalizations: event-time windows
  * with watermarks, and the reference's bounded heap
  * (`TopN.java:117-118`) re-expressed as `GroupState`.
  */
object StreamingOps {

  /** CDAP-parity streaming top-N: the batch operator applied per
    * micro-batch; each trigger's result is handed to `sink`
    * independently (no cross-batch state).
    */
  def perBatchTopN(stream: DataFrame, cfg: TopNConfig)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(TopN.transform(cfg)(batch.toDF()), batchId)
      }

  /** Per-micro-batch distribution-drift monitor: each trigger's rows
    * are histogram-compared against the static `ref` slice via
    * [[graft.operators.DataQuality.histogramDrift]] (exact integer
    * cross-multiplied flags — a drift alert that cannot flap on
    * partitioning), and the per-bin result is handed to `sink` with
    * the batch id. The streaming face of `q_drift_bins`: the batch
    * operator applied unchanged per trigger (the same batch/stream
    * unification as [[perBatchTopN]]); `ref` is re-read per batch —
    * cache() it for a long-running monitor.
    */
  def perBatchDriftMonitor(stream: DataFrame, ref: DataFrame,
                           valueCol: String, binWidth: Long,
                           thresholdPct: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(graft.operators.DataQuality.histogramDrift(
          ref, batch.toDF(), valueCol, binWidth, thresholdPct), batchId)
      }

  /** Event-time windowed aggregation with a watermark for late-data
    * expiry: counts + value bounds per (window, event_type). State is
    * bounded by the watermark — the 100 TB-stream posture is that
    * state size is O(active windows x keys), never O(events).
    */
  def windowedEventAgg(events: DataFrame, tsCol: String,
                       watermarkDelay: String, windowDuration: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("mn"), max(col("value")).as("mx"))

  /** Stream-STREAM inner interval join: each left event matches the
    * right events with the same key whose time falls in
    * `[leftTs - lookbackUs, leftTs]` — the streaming form of the
    * batch `q_interval_join` family (attribution: purchases joined to
    * the clicks that preceded them). Both sides carry watermarks and
    * the time-range predicate, which is what lets the engine compute
    * a state-retention bound per side (Spark derives "right rows
    * older than watermark − lookback can never match" from the
    * BETWEEN constraint and evicts them): state is
    * O(events inside the lookback + delay horizon), not the stream.
    *
    * Requirements: `keyCol` has the same name on both sides; every
    * OTHER column name must be disjoint (loudly checked) so the
    * output can carry both payloads unambiguously.
    *
    * `joinType`: "inner" (default) emits a match as soon as both rows
    * have arrived, so a bounded replay's output is independent of
    * batch interleaving (the property the multi-batch oracle replay
    * certifies). "left_outer" additionally emits each UNMATCHED left
    * row with null right columns — but only once the watermark passes
    * its `leftTs` (before that, a matching right row could still
    * arrive); un-flushed left rows at end-of-stream stay in state, so
    * a bounded replay must push the final watermark past the last
    * real left event (far-future sentinel rows) to recover the full
    * left-outer relation. This deferral is not a harness artifact:
    * it is exactly the incremental-correctness contract any
    * streaming outer join must satisfy.
    */
  def streamingIntervalJoin(left: DataFrame, right: DataFrame,
                            keyCol: String, leftTs: String, rightTs: String,
                            lookbackUs: Long,
                            watermarkDelay: String,
                            joinType: String = "inner"): DataFrame = {
    require(lookbackUs >= 0, s"lookbackUs must be >= 0, got $lookbackUs")
    require(Set("inner", "left_outer")(joinType),
      s"streamingIntervalJoin supports inner | left_outer, got $joinType")
    val overlap = (left.columns.toSet - keyCol)
      .intersect(right.columns.toSet - keyCol)
    require(overlap.isEmpty,
      s"streamingIntervalJoin: non-key columns must be disjoint, both " +
        s"sides carry ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
      .withColumnRenamed(keyCol, "__graft_rk")
    l.join(r,
        col(keyCol) === col("__graft_rk") &&
          col(rightTs) >= col(leftTs) -
            expr(s"INTERVAL $lookbackUs MICROSECOND") &&
          col(rightTs) <= col(leftTs),
        joinType)
      .drop("__graft_rk")
  }

  /** Sliding (hopping) variant of [[windowedEventAgg]]: each event
    * lands in `windowDuration / slideDuration` overlapping windows
    * (the same constant-fan-out Expand as the batch `q_hop_window`).
    * Watermark expiry still bounds state: closed window starts are
    * dropped once the watermark passes their end.
    */
  def slidingEventAgg(events: DataFrame, tsCol: String, watermarkDelay: String,
                      windowDuration: String, slideDuration: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration, slideDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("mn"), max(col("value")).as("mx"))

  /** Streaming exact dedup — the streaming analog of
    * [[graft.operators.ExactDedup]]: the first document with a given
    * content survives, later copies arriving within the watermark
    * horizon are dropped. State holds one 8-byte content hash per
    * distinct document inside the horizon — never the payload — and is
    * expired by the watermark, so state size is
    * O(distinct docs per horizon), not O(stream).
    */
  def streamingDedup(docs: DataFrame, tsCol: String, contentCol: String,
                     watermarkDelay: String): DataFrame =
    docs
      .withColumn("__graft_h", xxhash64(col(contentCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__graft_h")
      .drop("__graft_h")

  /** Streaming NEAR-dup dedup at Hamming radius 0: later documents
    * whose 64-bit SimHash equals that of a document inside the
    * watermark horizon are dropped. SimHash is a bag-of-tokens
    * signature, so unlike [[streamingDedup]]'s content hash this also
    * catches byte-different copies with the same token multiset
    * (reordered boilerplate, shuffled field order) — at the same
    * 8-bytes-per-doc watermark-expired state bound. Radius > 0 would
    * need any-of-k-band-keys dedup semantics that
    * `dropDuplicatesWithinWatermark` cannot express — use the batch
    * [[graft.operators.SimHash.pairs]] for that.
    */
  def streamingSimhashDedup(docs: DataFrame, tsCol: String, textCol: String,
                            watermarkDelay: String): DataFrame =
    docs
      .withColumn("__graft_sh", graft.operators.SimHash.simhash(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__graft_sh")
      .drop("__graft_sh")

  /** Streaming admission against a GROWING fingerprint index — the
    * continuous form of [[graft.operators.IncrementalDedup]]'s
    * daily-ingest loop: each micro-batch is filtered against the
    * index (exact hash + near-dup signature agreement), the
    * survivors are handed to `onBatch`, and the survivors'
    * fingerprints join the index BEFORE the next batch. Unlike
    * [[streamingDedup]]'s watermark-horizon state, the index is
    * intentionally unbounded-by-time (a corpus remembers forever) and
    * bounded per doc (~0.5 KB of fingerprint, never text); persist it
    * with IncrementalDedup.save at shutdown to resume the loop.
    * Within-batch duplicates are NOT resolved here (run the one-shot
    * batch dedup inside `onBatch` if batches can self-collide).
    *
    * Replay-safe under foreachBatch's at-least-once contract: before
    * filtering, any index rows carrying the BATCH'S OWN ids are
    * scrubbed (a re-delivered batch would otherwise find its own
    * fingerprints — appended by the failed attempt — and self-reject
    * every document, silently losing them). Doc ids are assumed
    * stable across redelivery, the usual CDC contract.
    *
    * Cost shape: only the per-batch survivor DELTA is eagerly
    * materialized; the cross-batch index is the lazy union of those
    * immutable checkpointed deltas, so per-batch work is O(batch),
    * not O(index) re-materialization (the union plan grows one leaf
    * per batch — restart the query from a saved index long before
    * that lineage width matters).
    */
  def streamingIncrementalDedup(
      docs: DataFrame, idCol: String, textCol: String,
      initialIndex: DataFrame, minAgree: Int,
      p: graft.operators.MinHashLSH.Params = graft.operators.MinHashLSH.Params())(
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    var index = initialIndex.localCheckpoint(eager = true)
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val batchDf = batch.localCheckpoint(eager = true) // read 3x below
        // replay idempotence: drop any fingerprints a failed prior
        // attempt at THIS batch already appended
        val cleanIdx = index.join(batchDf.select(col(idCol)), Seq(idCol), "left_anti")
        val survivors = graft.operators.IncrementalDedup
          .filterNew(batchDf, idCol, textCol, cleanIdx, minAgree, p)
          .localCheckpoint(eager = true) // materialize before the index grows
        index = graft.operators.IncrementalDedup.appended(cleanIdx,
          graft.operators.IncrementalDedup.fitIndex(survivors, idCol, textCol, p)
            .localCheckpoint(eager = true)) // eager DELTA only — O(batch)/batch
        onBatch(survivors, batchId)
      }
  }

  /** Streaming gap-sessionization — the streaming twin of the batch
    * `q_sessionize` (lag + running-sum over micros gaps): each event
    * is tagged with its session's START time (micros), where a
    * >`gapUs` silence per key opens a new session. Emitting the start
    * as the session id (rather than a per-key running index) is what
    * makes state EVICTABLE: once the watermark passes
    * `lastTs + gapUs`, any future event for that key must open a new
    * session anyway, so dropping the 16-byte (lastTs, sessionStart)
    * state changes nothing — state is O(keys active within the gap
    * horizon), the same bounding argument the watermark gives
    * [[streamingDedup]]. (A running session INDEX would have to
    * survive forever per key; a session START is self-identifying.
    * Batch parity: rank starts per key to recover the index.)
    *
    * Within a micro-batch, a key's rows are buffered and sorted by
    * (ts, id) — bounded by the key's per-trigger volume, never the
    * stream. Events arriving LATER than the watermark may mis-assign
    * (their session state may already be evicted) — the standard
    * flatMapGroupsWithState late-data caveat; size `watermarkDelay`
    * to the tolerated disorder.
    *
    * Input: `keyCol` (long), `idCol` (long, order tiebreak),
    * `tsCol` (TIMESTAMP). Output columns: key, id, ts_us,
    * session_start_us.
    */
  def streamingGapSessionize(events: DataFrame, keyCol: String, idCol: String,
                             tsCol: String, gapUs: Long,
                             watermarkDelay: String): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapUs / 1000L + 1L
    val typed = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        unix_micros(col(tsCol)), col(tsCol))
      .as[(Long, Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap: any future event opens a
            // new session, so the state is semantically dead weight
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.map(r => (r._2, r._3)).toArray.sortBy {
              case (id, ts) => (ts, id)
            }
            var (last, start) = state.getOption.getOrElse((Long.MinValue, Long.MinValue))
            val out = sorted.map { case (id, ts) =>
              if (start == Long.MinValue || ts - last > gapUs) start = ts
              last = ts
              (key, id, ts, start)
            }
            state.update((last, start))
            // clamp above the current watermark: a batch made entirely
            // of late events could otherwise request a past timeout,
            // which throws
            state.setTimeoutTimestamp(math.max(last / 1000L + gapMs,
              state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
      .toDF(keyCol, idCol, "ts_us", "session_start_us")
  }

  /** Streaming ordered-funnel progression — the streaming twin of the
    * batch `q_funnel` (view → click → purchase at strictly increasing
    * timestamps), with the ATTRIBUTION-WINDOW semantics a continuous
    * conversion tracker needs: a key's funnel must complete within
    * `horizonUs` of its FIRST stage, which is exactly what makes the
    * per-key state evictable — once the watermark passes
    * firstTs + horizon, no event can legally advance that funnel, so
    * dropping the 24-byte (firstTs, lastTs, stageIdx) state is
    * semantics-preserving (the [[streamingGapSessionize]] argument;
    * an unwindowed funnel would pin state per key forever). A key's
    * next attempt after expiry starts a fresh funnel at stage 0 —
    * UNCONDITIONALLY, whether the prior funnel completed or stalled,
    * so output depends only on event times, never on micro-batch /
    * timeout-sweep timing.
    *
    * Semantics note vs the batch `q_funnel_windowed`: the batch query
    * is FIRST-TOUCH attribution — every stage anchors to the key's
    * first stage-0 event ever and never restarts — while this
    * streaming form restarts a fresh funnel after horizon expiry
    * (restarting is what makes state evictable). For single-attempt
    * keys the two agree exactly (pinned in StreamingOpsSpec); a key
    * with a second attempt past the horizon counts again here and
    * not in the batch query. The divergence is deliberate and tested.
    *
    * Emits one row per stage ADVANCE (append mode):
    * key, stage_idx (0-based), ts_us of the advancing event. Within a
    * micro-batch a key's rows are sorted by (ts, id); an event only
    * advances the funnel if it is the NEXT stage, strictly later than
    * the previous advance, and within the horizon of stage 0. Events
    * later than the watermark may miss an already-evicted funnel —
    * the standard late-data caveat; size `watermarkDelay` to the
    * tolerated disorder.
    */
  def streamingFunnel(events: DataFrame, keyCol: String, idCol: String,
                      tsCol: String, typeCol: String, stages: Seq[String],
                      horizonUs: Long, watermarkDelay: String): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val typed = events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("long"), col(idCol).cast("long"),
        unix_micros(col(tsCol)), col(typeCol).cast("string"), col(tsCol))
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
    // state: (firstTs, lastTs, stagesDone) — stagesDone = how many
    // stages have matched (next needed stage == stagesDone)
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Int), (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long,
         rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Int)]) =>
          if (state.hasTimedOut) {
            state.remove() // horizon passed: nothing can advance this funnel
            Iterator.empty
          } else {
            val sorted = rows.map(r => (r._2, r._3, r._4)).toArray
              .sortBy { case (id, ts, _) => (ts, id) }
            var (first, last, done) =
              state.getOption.getOrElse((Long.MinValue, Long.MinValue, 0))
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
            sorted.foreach { case (_, ts, typ) =>
              // a funnel past its horizon restarts on the next event —
              // INCLUDING a completed funnel, so a key's second attempt
              // starts at stage 0 deterministically whether the event
              // arrives before or after the timeout sweep evicts the
              // state (the advance condition below still prevents
              // re-advancing a completed funnel WITHIN the horizon)
              if (first != Long.MinValue && ts - first > horizonUs) {
                first = Long.MinValue; last = Long.MinValue; done = 0
              }
              if (done < stages.size && stageIdx.get(typ).contains(done) &&
                  (done == 0 || ts > last) &&
                  (first == Long.MinValue || ts - first <= horizonUs)) {
                if (done == 0) first = ts
                last = ts
                out += ((key, done.toLong, ts, first))
                done += 1
              }
            }
            if (first == Long.MinValue) {
              state.remove()
            } else {
              state.update((first, last, done))
              // evict once the watermark passes the horizon of stage 0;
              // clamp above the current watermark (a late batch could
              // otherwise request a timeout in the past, which throws)
              state.setTimeoutTimestamp(math.max(
                first / 1000L + horizonUs / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
      .toDF(keyCol, "stage_idx", "ts_us", "funnel_start_us")
  }

  /** Continuous top-K per key across the whole stream: a bounded
    * top-K list kept in `GroupState` — the streaming generalization of
    * the reference's `MinMaxPriorityQueue` with `maximumSize(topSize)`
    * (`TopN.java:117-118`): state per key is O(K), eviction on insert.
    * Emits the key's refreshed top-K on every batch that touches it
    * (update semantics).
    *
    * WARNING — state is unbounded in KEY CARDINALITY: every key ever
    * seen holds its O(K) list forever. On a stream with churning keys
    * (user ids, session ids) state grows without bound; prefer
    * [[statefulTopKWithTTL]] unless the key domain is known-small and
    * closed (e.g. a fixed category dimension).
    */
  def statefulTopK[K, V](ds: Dataset[(K, V)], k: Int)(
      implicit ord: Ordering[V],
      kEnc: Encoder[K],
      stateEnc: Encoder[List[V]],
      outEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[List[V], (K, V)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[List[V]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++ rows.map(_._2))
            .sorted(ord.reverse).take(k)
          state.update(merged)
          merged.iterator.map(v => (key, v))
      }

  /** [[statefulTopK]] re-expressed on `transformWithState` — Spark's
    * current arbitrary-state API (4.x "state v2"): the per-key bounded
    * heap lives in a named `ValueState` on the RocksDB state store
    * (required by the API; set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `RocksDBStateStoreProvider` before starting the query). Same
    * contract as statefulTopK — O(K) state per key, update-mode
    * emission of the key's refreshed top-K on every batch that touches
    * it — so the two APIs are interchangeable and the replay oracle
    * certifies them against the same batch rule. The v2 API is what a
    * production deployment should prefer: per-state TTL, typed
    * composite state (value/list/map), timers, and state schema
    * evolution come with it.
    */
  def statefulTopKTws(ds: Dataset[(String, (Double, Long))],
                      k: Int): Dataset[(String, (Double, Long))] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(
        new TopKTwsProcessor(k), TimeMode.None(), OutputMode.Update())
  }

  private class TopKTwsProcessor(k: Int) extends StatefulProcessor[
      String, (String, (Double, Long)), (String, (Double, Long))] {
    import implicits._
    @transient private var heap: ValueState[List[(Double, Long)]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      heap = getHandle
        .getValueState[List[(Double, Long)]]("topk", TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[(String, (Double, Long))],
        timerValues: TimerValues): Iterator[(String, (Double, Long))] = {
      val cur = if (heap.exists()) heap.get() else Nil
      val merged = (cur ++ rows.map(_._2))
        .sorted(Ordering[(Double, Long)].reverse).take(k)
      heap.update(merged)
      merged.iterator.map(v => (key, v))
    }
  }

  /** Streaming CDC/upsert materialization — the streaming analog of
    * the batch `q_latest_by_key` compaction: GroupState holds the
    * single LATEST value per key under `ord` (order by event time with
    * a unique tiebreaker), and each batch that touches a key emits the
    * key's refreshed latest row (update semantics). Out-of-order
    * arrivals are handled by construction: an older change arriving
    * late loses the `max` and cannot overwrite a newer one.
    *
    * State is one V per key — the size of the COMPACTED table, which
    * is exactly what an upsert view materializes, so `NoTimeout` is
    * the correct default here (unlike [[statefulTopK]], whose per-key
    * payload is O(K)): drop-and-restart semantics would silently
    * resurrect overwritten rows. If the key domain churns without
    * bound, apply the [[statefulTopKWithTTL]] TTL pattern with k=1
    * instead.
    */
  def streamingLatestByKey[K, V](ds: Dataset[(K, V)])(
      implicit ord: Ordering[V],
      kEnc: Encoder[K],
      stateEnc: Encoder[V],
      outEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    ds.groupByKey(_._1)
      .mapGroupsWithState[V, (K, V)](GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[V]) =>
          val latest = (state.getOption.iterator ++ rows.map(_._2)).max(ord)
          state.update(latest)
          (key, latest)
      }

  /** [[statefulTopK]] with a processing-time TTL per key: a key whose
    * state is untouched for `ttlMillis` is evicted at the next batch
    * boundary. [[statefulTopK]]'s state is O(K) per key but unbounded
    * in KEY CARDINALITY — on a 100 TB stream with churning keys (user
    * ids, session ids) state grows forever; with a TTL it is
    * O(keys active within the TTL horizon), the same bounding argument
    * the watermark gives [[streamingDedup]]. Idle keys restart from
    * empty state on their next event — the semantics trade-off TTL
    * always implies — so size `ttlMillis` to the longest silence a key
    * must survive.
    *
    * Test-harness note: `StreamingQuery.processAllAvailable()` can
    * block indefinitely while timeouts are armed (the engine keeps
    * scheduling timeout batches); await sink contents instead (see
    * StreamingOpsSpec).
    */
  def statefulTopKWithTTL[K, V](ds: Dataset[(K, V)], k: Int, ttlMillis: Long)(
      implicit ord: Ordering[V],
      kEnc: Encoder[K],
      stateEnc: Encoder[List[V]],
      outEnc: Encoder[(K, V)]): Dataset[(K, V)] = {
    require(ttlMillis > 0, s"ttlMillis must be positive, got $ttlMillis")
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[List[V], (K, V)](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (key: K, rows: Iterator[(K, V)], state: GroupState[List[V]]) =>
          if (state.hasTimedOut) {
            state.remove() // eviction: drop the idle key's heap entirely
            Iterator.empty
          } else {
            val merged = (state.getOption.getOrElse(Nil) ++ rows.map(_._2))
              .sorted(ord.reverse).take(k)
            state.update(merged)
            state.setTimeoutDuration(ttlMillis)
            merged.iterator.map(v => (key, v))
          }
      }
  }
}
