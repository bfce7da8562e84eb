package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user running totals maintained by custom state. */
final case class UserStats(user_id: Long, n_events: Long, total_value: Double,
                           last_ts: Timestamp)

/** Running distinct-count estimate per key (streaming KMV, see
  * [[StreamOps.streamingDistinctEstimate]]). */
final case class DistinctEstimate(event_type: String, n_kept: Int,
                                  kth_hash: Long, est_distinct: Double)

/** One attributed purchase (streaming last-touch, see
  * [[StreamOps.streamingAttribution]]). */
final case class Attributed(user_id: Long, event_id: Long, channel: String,
                            value: Double)

/** Per-user last-touch state carried across micro-batches. */
final case class TouchState(touch: String, last_us: Long)

/** Per-user interval-coverage state (streaming dual of batch e22, see
  * [[StreamOps.streamingIntervalCoverage]]): the running-max interval
  * end plus the accumulated totals — four longs per user, forever. */
final case class CoverageState(user_id: Long, n_events: Long,
                               n_stretches: Long, covered_us: Long,
                               pmax_us: Long)

/** The last two event types per user (streaming dual of batch e23, see
  * [[StreamOps.streamingTopPaths]]) — the whole n-gram window. */
final case class PathState(a: String, b: String)

/** One completed 3-step path emitted by [[StreamOps.streamingTopPaths]]. */
final case class PathHit(user_id: Long, path: String)

/** Streaming transforms for the `events` shape (ts, user_id, event_type,
  * value). Each takes and returns a DataFrame so the SAME logic runs on a
  * batch frame or a `readStream` frame — the batch duals are oracle-checked
  * in [[graft.operators.EventOps]], and the streaming specs drive these
  * through MemoryStream with watermarks.
  *
  * The reference is one-shot batch only (Boot.java:17-20); streaming is
  * north-star extension surface (Structured Streaming + JDBC sinks).
  */
object StreamOps {

  /** Tumbling-window counts/sums per event type with a watermark: late
    * events beyond `lateness` are dropped and state is bounded — the
    * standard unbounded-stream aggregation shape. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  lateness: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupBy(window($"ts", windowLen).as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
           sum($"value".cast("decimal(28,8)")).cast("double").as("total_value"))
      .select($"w.start".as("win_start"), $"event_type", $"n_events", $"total_value")
  }

  /** Streaming dual of the batch e19 hopping-window distinct-users
    * query: stateful dedup on (window, user) chained into a windowed
    * count — the two-stateful-operator pipeline (dedup → agg) Spark
    * supports in append mode. The dedup state holds one entry per
    * (window, user) and is dropped with the watermark, exactly the
    * bounded-state shape of the batch form's first-level hash agg;
    * the downstream count then sees each user once per window. */
  def hoppingDistinct(events: DataFrame, windowLen: String = "2 hours",
                      hop: String = "30 minutes",
                      lateness: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .select(window($"ts", windowLen, hop).as("w"), $"user_id", $"ts")
      .dropDuplicates("w", "user_id")
      .groupBy($"w")
      .agg(count(lit(1)).as("n_users"))
      .select($"w.start".as("win_start"), $"n_users")
  }

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count + value total, updated each micro-batch. This is the escape
    * hatch for stateful logic Spark's built-in windows can't express
    * (counters, ML feature state, CDC reconciliation); values are summed
    * in (ts, event_id) order within each batch so results are
    * deterministic for tests.
    *
    * `eventTimeTtl`: evict users whose last event is older than the TTL
    * in EVENT time — the timer is an event-time timestamp and fires when
    * the WATERMARK passes it, so eviction is driven purely by the data's
    * own clock (advance the watermark, keys expire; no wall-clock in the
    * loop, so the processing-time no-data-batch busy-loop documented on
    * [[streamingDistinctEstimate]] cannot arise and
    * `processAllAvailable` terminates). The evicted key's final stats
    * are emitted once more, then its state drops. */
  def runningUserStats(events: DataFrame,
                       eventTimeTtl: Option[String] = None,
                       lateness: String = "10 minutes"): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    def update(userId: Long, rows: Iterator[(Long, Timestamp, Long, Double)],
               state: GroupState[UserStats]): UserStats =
      if (state.hasTimedOut) {
        // final emit for the evicted user, then drop its state
        val last = state.get
        state.remove()
        last
      } else {
        val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
        val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0, new Timestamp(0)))
        val next = sorted.foldLeft(prev) { (acc, r) =>
          UserStats(userId, acc.n_events + 1, acc.total_value + r._4,
            if (r._2.after(acc.last_ts)) r._2 else acc.last_ts)
        }
        state.update(next)
        // timer = last event time + ttl, clamped above the current
        // watermark (late rows reach mapGroupsWithState unfiltered, and
        // Spark rejects a timer at or below the watermark)
        eventTimeTtl.foreach(ttl => state.setTimeoutTimestamp(
          math.max(next.last_ts.getTime, state.getCurrentWatermarkMs + 1), ttl))
        next
      }
    val timeoutConf =
      if (eventTimeTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val src =
      if (eventTimeTtl.isDefined) events.withWatermark("ts", lateness)
      else events
    src
      .select($"user_id", $"ts", $"event_id", $"value")
      .as[(Long, Timestamp, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(timeoutConf)(update)
  }

  /** Streaming dual of batch e22's merged-interval coverage: each event
    * opens a 5-minute activity interval, and per user the state carries
    * the running max of interval ENDS plus the accumulated coverage —
    * the ONLINE form of the batch sweep, updating billable-seconds /
    * uptime metering as events arrive instead of rescanning history.
    *
    * The state is exactly the sweep's loop variable: FOUR LONGS per
    * user, bounded forever, where a naive online form would buffer the
    * user's intervals. Within a batch rows fold in (ts, event_id)
    * order; across batches correctness needs per-user event-time order
    * (the interval sweep is order-sensitive, unlike KMV's commutative
    * merge) — ingest through a watermark-sorted stage or accept the
    * batch boundary as the ordering unit, the same contract as
    * [[streamingAttribution]]. Key cardinality is unbounded; for an
    * open-ended user universe bolt on [[runningUserStats]]'s
    * event-time-TTL eviction pattern. */
  def streamingIntervalCoverage(events: DataFrame): Dataset[CoverageState] = {
    import events.sparkSession.implicits._
    val IntervalUs = 300000000L
    def update(userId: Long, rows: Iterator[(Long, Long, Long)],
               state: GroupState[CoverageState]): CoverageState = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      val prev = state.getOption.getOrElse(
        CoverageState(userId, 0L, 0L, 0L, Long.MinValue))
      val next = sorted.foldLeft(prev) { (acc, r) =>
        val s = r._2
        val e = s + IntervalUs
        val fresh = acc.pmax_us == Long.MinValue || acc.pmax_us < s
        val floor = if (acc.pmax_us == Long.MinValue) s else math.max(s, acc.pmax_us)
        CoverageState(userId, acc.n_events + 1,
          acc.n_stretches + (if (fresh) 1L else 0L),
          acc.covered_us + math.max(0L, e - floor),
          math.max(acc.pmax_us, e))
      }
      state.update(next)
      next
    }
    events
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming dual of batch e23's path mining: emit each completed
    * 3-step event-type sequence as it happens. The per-user state is
    * the ENTIRE n-gram window — the last two event types, two short
    * strings, bounded forever — which is why sequence n-gram mining is
    * one of the cheapest stateful streaming operators there is (the
    * batch form's `lead()` window becomes two fields). Downstream the
    * emitted paths feed any streaming count (the alphabet is
    * |event_types|³, so a windowed count on top stays metadata-sized).
    * Cross-batch correctness needs per-user event-time order, the same
    * contract as [[streamingIntervalCoverage]]. */
  def streamingTopPaths(events: DataFrame): Dataset[PathHit] = {
    import events.sparkSession.implicits._
    def update(uid: Long, rows: Iterator[(Long, Long, Long, String)],
               state: GroupState[PathState]): Iterator[PathHit] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var st = state.getOption.getOrElse(PathState(null, null))
      val out = Seq.newBuilder[PathHit]
      for (r <- sorted) {
        val c = r._4
        if (st.a != null && st.b != null) out += PathHit(uid, s"${st.a}>${st.b}>$c")
        st = PathState(st.b, c)
      }
      state.update(st)
      out.result().iterator
    }
    events
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        $"event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Running distinct-user estimate per event type: a KMV bottom-k sketch
    * ([[graft.functions.KmvAgg]]'s reduce/finish — the streaming dual of
    * batch q33) maintained in keyed state. The state is the k smallest
    * distinct md5 hashes — BOUNDED at k longs per key FOREVER, where an
    * exact streaming countDistinct would grow state with the id universe
    * (the reason exact distinct isn't offered on unbounded streams).
    * Emits the updated estimate for each key touched by the micro-batch;
    * the estimate is deterministic in the set of ids seen, independent of
    * batch boundaries or arrival order (KMV is a commutative,
    * idempotent merge).
    *
    * State is k longs per key — bounded per key, but unbounded in key
    * cardinality. For the fixed `event_type` domain that is fine; before
    * pointing this at a high-cardinality/open-ended key, pass a TTL to
    * evict idle keys (an evicted key that reappears restarts its sketch
    * from empty — the estimate becomes a lower bound for such keys,
    * which is the standard TTL trade-off). Two TTL clocks are offered:
    *
    *  - `eventTimeTtl` (PREFER THIS): the eviction timer is an
    *    event-time timestamp (last event seen + ttl) and fires when the
    *    WATERMARK passes it. Eviction follows the data's own clock —
    *    deterministic, replayable, and the engine only schedules extra
    *    no-data batches until pending timers fire, so
    *    `processAllAvailable` terminates normally.
    *  - `idleTimeout`: wall-clock eviction (processing-time timeout).
    *    OPERATIONAL CAVEAT (Spark semantics, not specific to this op):
    *    a processing-time timeout can only fire inside a micro-batch,
    *    so Spark keeps scheduling no-data batches for the query's
    *    LIFETIME — always run such queries with a positive trigger
    *    interval (`Trigger.ProcessingTime(...)`) or the default 0 ms
    *    trigger busy-loops, and do not drive them with
    *    `StreamingQuery.processAllAvailable`, which never returns once
    *    `shouldRunAnotherBatch` is permanently true (verified against
    *    Spark 4.1; the spec pins that wiring at plan level instead). */
  def streamingDistinctEstimate(events: DataFrame, k: Int = 64,
                                idleTimeout: Option[String] = None,
                                eventTimeTtl: Option[String] = None,
                                lateness: String = "10 minutes")
      : Dataset[DistinctEstimate] = {
    import events.sparkSession.implicits._
    import graft.functions.EngineFns.md5Long
    require(idleTimeout.isEmpty || eventTimeTtl.isEmpty,
      "streamingDistinctEstimate: pass at most one of idleTimeout/eventTimeTtl")
    val kmv = new graft.functions.KmvAgg(k)
    val timeoutConf =
      if (eventTimeTtl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val src =
      if (eventTimeTtl.isDefined) events.withWatermark("ts", lateness)
      else events
    src
      .select($"event_type", md5Long($"user_id".cast("string")).as("h"), $"ts")
      .as[(String, Long, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(timeoutConf)(
        distinctEstimateUpdate(kmv, k, idleTimeout, eventTimeTtl))
  }

  /** The state-update function behind [[streamingDistinctEstimate]],
    * exposed so the spec can drive the eviction branch through
    * `TestGroupState` (wall-clock timeouts can't fire deterministically
    * in a test). */
  private[streaming] def distinctEstimateUpdate(
      kmv: graft.functions.KmvAgg, k: Int, idleTimeout: Option[String],
      eventTimeTtl: Option[String] = None)(
      key: String, rows: Iterator[(String, Long, Timestamp)],
      state: GroupState[List[Long]]): DistinctEstimate =
    if (state.hasTimedOut) {
      // final emit for the evicted key, then drop its sketch
      val (n, kth) = kmv.finish(state.get)
      state.remove()
      DistinctEstimate(key, n, kth, graft.functions.KmvAgg.estimate(k, n, kth))
    } else {
      var maxTs = Long.MinValue
      val buf = rows.foldLeft(state.getOption.getOrElse(kmv.zero)) { (b, r) =>
        if (r._3 != null && r._3.getTime > maxTs) maxTs = r._3.getTime
        kmv.reduce(b, r._2)
      }
      state.update(buf)
      idleTimeout.foreach(state.setTimeoutDuration)
      // timer = last event time + ttl, clamped above the watermark (late
      // rows reach mapGroupsWithState unfiltered, and Spark rejects a
      // timer at or below the watermark)
      eventTimeTtl.foreach(ttl => state.setTimeoutTimestamp(
        math.max(maxTs, state.getCurrentWatermarkMs + 1), ttl))
      val (n, kth) = kmv.finish(buf)
      DistinctEstimate(key, n, kth, graft.functions.KmvAgg.estimate(k, n, kth))
    }

  /** Session windows (30-minute gap) per user via Spark's native
    * session_window — state is merged incrementally in streaming mode. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 lateness: String = "10 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window($"ts", gap).as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"w.start".as("sess_start"), $"w.end".as("sess_end"),
              $"user_id", $"n_events")
  }

  /** Streaming corpus-ingest filter — the stateless streaming dual of
    * p8's batch refresh funnel: each arriving document is flagged by
    * t3's quality gate and a compiled decontamination check before it
    * reaches the sink, with WHY attached so the funnel is observable.
    *
    * Both stages are per-row map work — the quality rules are column
    * expressions and the benchmark shingle set (bounded, t11's argument)
    * ships as a LITERAL array probed with `arrays_overlap` (the
    * query-compiled pattern; a deployment with a larger set swaps in a
    * bloom filter, q34's shape, still a per-row probe). No watermark, no
    * state, no shuffle: the filter runs in append mode and adds nothing
    * to the ingest path's state store at any volume. */
  def corpusIngestFilter(docsStream: DataFrame,
                         benchShingles: Array[Long]): DataFrame = {
    val sp = docsStream.sparkSession
    graft.functions.NgramHash60.register(sp)
    import sp.implicits._
    val toks = split($"text", " ")
    val nTok = size(toks)
    val nStop = size(filter(toks,
      tk => tk.isInCollection(graft.operators.TextOps.stopwords)))
    val stopMilli = floor(lit(1000.0) * nStop / nTok).cast("long")
    docsStream
      .withColumn("quality_ok",
        nTok >= 20 && stopMilli >= 10 && stopMilli <= 150)
      .withColumn("contaminated",
        arrays_overlap(expr("ngram_hashes(text, 8)"),
          typedLit(benchShingles)))
      .withColumn("accepted", $"quality_ok" && !$"contaminated")
  }

  /** Streaming Count-Min sketch — e18's batch build run as a LIVE
    * aggregation: because a CMS is a mergeable grouped count, the same
    * `groupBy(r, b).count()` that builds it in batch IS its streaming
    * maintenance; Spark's state store holds exactly the 192 fixed-width
    * cells and each micro-batch folds in map-side partials. No custom
    * state function needed — the mergeable-sketch property collapses
    * "maintain a sketch over a stream" to a native streaming aggregate
    * with O(d·w) state REGARDLESS of stream volume or key cardinality
    * (contrast [[streamingDistinctEstimate]], whose KMV state is also
    * bounded but needs mapGroupsWithState because a k-minimum set is
    * not a grouped count). Run in Complete/Update mode; the spec
    * asserts cells after N micro-batches equal e18's batch build over
    * the same prefix — the mergeability proof, live. */
  def streamingCmsCells(events: DataFrame): DataFrame =
    graft.operators.EventOps.cmsCells(events)

  /** Streaming exact dedup: at-least-once delivery → exactly-once rows,
    * keyed on event_id. `dropDuplicatesWithinWatermark` bounds the dedup
    * state to the watermark horizon (plain dropDuplicates would grow
    * state forever on an unbounded stream) — the streaming dual of the
    * batch d1 operator. */
  def streamingDedup(events: DataFrame,
                     lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: each micro-batch joins against a
    * static dimension frame. The dim side is broadcast per batch (no
    * stream state), which is the scale-correct shape for slowly-changing
    * small dimensions; re-reading the frame each batch picks up dim
    * updates between batches. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join (streaming dual of the batch e6 range
    * join): per user, pair each `left` event with `right` events that
    * occur within [left.ts, left.ts + horizon]. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can expire buffered state — an unbounded-condition
    * stream-stream join would hold both streams forever. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   horizon: String = "5 minutes",
                   lateness: String = "10 minutes"): DataFrame = {
    import left.sparkSession.implicits._
    val l = left.withWatermark("ts", lateness)
      .select($"user_id".as("l_user"), $"ts".as("l_ts"),
              $"event_type".as("l_type"))
    val r = right.withWatermark("ts", lateness)
      .select($"user_id".as("r_user"), $"ts".as("r_ts"),
              $"event_type".as("r_type"), $"value".as("r_value"))
    l.join(r,
      $"l_user" === $"r_user" &&
        $"r_ts" >= $"l_ts" &&
        $"r_ts" <= $"l_ts" + expr(s"interval $horizon"))
  }

  /** Streaming NEAR-dup ingest — d15's streaming dual, probing the
    * PERSISTED corpus band table (d17's standing state): each
    * micro-batch of (doc_id, text) documents is shingled, minhashed and
    * LSH-banded with exactly the batch pipeline's hashes
    * ([[graft.operators.DedupOps.bandKeysFor]] — per-doc and stateless,
    * so a doc's band keys do not depend on which micro-batch carried
    * it), then joined against the bucketed standing table (merge hint:
    * the corpus side reads exchange-free and is never broadcastable at
    * scale). Matched (batch_id, corpus_id) pairs append to `sinkTable`.
    *
    * Banding needs a per-doc aggregation (the 16 min-hash slots), which
    * streaming append mode cannot host without watermark gymnastics —
    * and needs none: foreachBatch runs the SAME batch plan per
    * micro-batch, which is exactly the daily-ingest shape d17
    * materializes the state for. The streamed union over any batch
    * split equals the one-shot batch d15 (spec-pinned). */
  def streamingNeardupIngest(docsStream: DataFrame, corpusBandTable: String,
                             sinkTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val matches = graft.operators.DedupOps.bandKeysFor(batch.toDF())
          .withColumn("bk", concat_ws(":", $"band", $"key"))
          .select($"bk", $"doc_id".as("batch_id"))
          .join(sp.table(corpusBandTable).hint("merge")
            .withColumnRenamed("doc_id", "corpus_id"), Seq("bk"))
          .select($"batch_id", $"corpus_id").distinct()
        graft.sources.LayoutOps.clearStaleLocation(sp, sinkTable)
        matches.write.mode("append").format("parquet").saveAsTable(sinkTable)
      }

  /** Streaming last-touch attribution — e21's online dual: each
    * arriving purchase is credited to the user's most recent preceding
    * touch within `lookbackUs`, else "organic", with the last touch
    * carried ACROSS micro-batches in keyed state (two longs + a string
    * per user — bounded forever). Within a batch, a user's rows apply
    * in (ts, touch-before-purchase, event_id) order, matching the
    * batch operator's window ordering exactly.
    *
    * Semantics note (inherent to streaming attribution, documented
    * rather than hidden): credit is FORWARD-ONLY — a touch that
    * arrives in a later micro-batch than the purchase it preceded in
    * event time cannot retro-attribute it; the batch dual re-reading
    * the full log is the reconciliation path. As long as each user's
    * events arrive in event-time order across batches, the streamed
    * output equals batch e21 (spec-pinned on a time-split feed). */
  def streamingAttribution(events: DataFrame,
                           lookbackUs: Long = 3600L * 1000000L)
      : Dataset[Attributed] = {
    import events.sparkSession.implicits._
    def us(t: Timestamp): Long =
      (t.getTime / 1000) * 1000000L + t.getNanos / 1000
    def update(user: Long,
               rows: Iterator[(Long, Timestamp, Long, String, Double)],
               state: GroupState[TouchState]): Iterator[Attributed] = {
      val sorted = rows.toSeq.sortBy(r =>
        (us(r._2), if (r._4 == "purchase") 1 else 0, r._3))
      var st = state.getOption.getOrElse(TouchState("", Long.MinValue))
      val out = Seq.newBuilder[Attributed]
      sorted.foreach { r =>
        val t = us(r._2)
        r._4 match {
          case "purchase" =>
            val ch = if (st.last_us != Long.MinValue && t - st.last_us <= lookbackUs)
              st.touch else "organic"
            out += Attributed(user, r._3, ch, r._5)
          case "click" | "view" | "signup" =>
            st = TouchState(r._4, t)
          case _ => ()
        }
      }
      state.update(st)
      out.result().iterator
    }
    events.select($"user_id", $"ts", $"event_id", $"event_type", $"value")
      .as[(Long, Timestamp, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming ANN SERVING — the online half of s10's build/serve
    * split: query vectors arrive as a stream, and every micro-batch is
    * answered against the PERSISTED index (cell-partitioned code
    * lists + saved codebooks) with top-K per query appended to
    * `sinkTable`. The index must already exist
    * ([[graft.operators.SimilarityOps.s10EnsureIndex]] — day-1 build);
    * the per-batch work is exactly s10's serve step: read the
    * codebooks ONCE per batch (driver-cached, metadata-sized), compile
    * the batch's probe lists + ADC lookup literals, one
    * partition-pruned scan of the probed cells. ZERO k-means jobs per
    * batch — training never appears in this lineage, which is what
    * makes per-arrival latency proportional to nprobe·cell size, not
    * corpus size. Schema in: (vec_id LONG, v ARRAY<DOUBLE>); out:
    * (qid, nid, rnk, adc_micro). */
  def streamingAnnServe(queryStream: DataFrame, dir: String,
                        sinkTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        val qs = batch.select("vec_id", "v").collect().toSeq
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
        if (qs.nonEmpty) {
          val res = graft.operators.SimilarityOps.s10ServeFrom(sp, dir, qs)
          graft.sources.LayoutOps.clearStaleLocation(sp, sinkTable)
          res.write.mode("append").format("parquet").saveAsTable(sinkTable)
        }
      }

  /** Streaming point-in-time enrichment — q38's SCD2 lookup as an
    * ONLINE operator: each micro-batch of events joins the dimension
    * version valid AT THE EVENT'S OWN event time (not the current
    * version — [[enrichWithDim]] answers that simpler question), so a
    * replayed or late event enriches identically to the batch PIT join.
    * Events with no valid version (before the key's first version, or
    * an unknown key) pass through with a null segment rather than being
    * dropped — the reconciliation query decides their fate.
    *
    * Scale shape: the dimension is the q40-maintained standing table,
    * BUCKETED on the entity key, so the per-batch join plans no
    * exchange on the dimension side; the (small) event batch is the
    * side that moves. The version predicate
    * (valid_from ≤ ts < valid_to) rides the equi-join on the key as a
    * codegen'd residual — never a range-only join. Versions per key are
    * bounded by churn, not event volume, so the matched row count
    * equals the batch size. */
  def streamingPitEnrich(events: DataFrame, dimTable: String,
                         sinkTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val dim = sp.table(dimTable)
        val enriched = batch.toDF().as("e")
          .join(dim.as("d"),
            $"e.user_id" === $"d.k" &&
              $"e.ts" >= $"d.valid_from" && $"e.ts" < $"d.valid_to",
            "left")
          .select($"e.event_id", $"e.user_id", $"e.ts", $"d.seg_v")
        graft.sources.LayoutOps.clearStaleLocation(sp, sinkTable)
        enriched.write.mode("append").format("parquet").saveAsTable(sinkTable)
      }

  /** Streaming incremental aggregate maintenance — q41's ONLINE dual:
    * the per-(returnflag, linestatus) summary is a standing table and
    * every micro-batch of lineitem arrivals folds in additively
    * (batch-local partial aggregate → union with the standing summary →
    * re-aggregate groups-sized rows → copy-on-write publish). Counts
    * and exact-decimal sums are the additive parts, so after ANY batch
    * split the summary is bit-identical to the from-scratch aggregate
    * over everything that has arrived (spec-pinned) — no retraction
    * handling needed because lineitem is append-only.
    *
    * Scale shape: the per-batch cost is one partial aggregate of the
    * BATCH (map-side combine collapses to groups-sized before any
    * shuffle) plus a rewrite of the groups-sized summary — never a
    * rescan of history. The CoW publish materializes before
    * overwriting the scanned location (Scd2Ops' discipline) and
    * releases the staging blocks after. */
  /** Streaming day-2 GRAPH maintenance — q48's online dual (r9/r10
    * verdicts' open item): a stream of basket items `(o, p)` folds
    * into the standing triangle state per micro-batch. First batch is
    * day-1 (persist bucketed canonical edges + per-node triangle
    * counts); every later batch computes ΔE = batch pairs \ E_standing,
    * counts ONLY the triangles touching ΔE
    * ([[graft.operators.RelationalOps.q48DeltaTriangles]], the exact
    * probe batch q48 runs), merges them into the count table, and
    * appends ΔE to the bucketed edge table — per-batch work is
    * O(|ΔE|·min-deg), never a graph re-enumeration.
    *
    * Contract (documented, corpusIngestFilter's discipline): each
    * micro-batch carries COMPLETE baskets — the ingest unit is an
    * order, so an order's lines never straddle a batch boundary (a
    * splitting feed would need per-order reassembly state upstream).
    * Under that contract the fold is exactly batch q48's: edges are
    * canonical/deduped, the delta anti-join makes re-delivery of a
    * whole batch a no-op (ΔE = ∅ → counts unchanged), so a replayed
    * micro-batch after a restart is idempotent — spec-pinned.
    *
    * State write order matters: the delta counts are materialized
    * (localCheckpoint) BEFORE the count table is overwritten and
    * before the edge append mutates the standing set the probe reads. */
  def streamingTriangles(basketStream: DataFrame, edgesTable: String,
                         triTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    basketStream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val pairs = graft.operators.RelationalOps
          .basketPairs(batch.select($"o", $"p").distinct()).distinct()
        if (!sp.catalog.tableExists(edgesTable) ||
            !sp.catalog.tableExists(triTable)) {
          Seq(edgesTable, triTable)
            .foreach(graft.sources.LayoutOps.clearStaleLocation(sp, _))
          graft.operators.RelationalOps.q48InitState(
            pairs, edgesTable, triTable)
        } else {
          // the previous batch rewrote these tables behind the relation
          // cache — re-list or the read plans reference deleted files
          Seq(edgesTable, triTable).foreach(sp.catalog.refreshTable)
          val edOld = sp.table(edgesTable)
          val delta = pairs.join(edOld, Seq("a", "b"), "left_anti")
            .localCheckpoint() // pin: the append below mutates edOld
          try {
            // a replayed batch (restart re-delivery) has ΔE = ∅: make
            // it a TRUE no-op — no state rewrite, no file churn
            if (!delta.isEmpty) {
              val deltaTri = graft.operators.RelationalOps
                .q48DeltaTriangles(edOld, delta)
              val merged = sp.table(triTable)
                .unionByName(deltaTri.select($"n", $"dtri".as("tri")))
                .groupBy($"n").agg(sum($"tri").as("tri"))
              val next = merged.localCheckpoint()
              try next.write.mode("overwrite").format("parquet")
                .saveAsTable(triTable)
              finally graft.operators.DedupOps.unpersistCheckpointed(next)
              delta.repartition(32, $"a")
                .write.mode("append").format("parquet")
                .bucketBy(32, "a").sortBy("a").saveAsTable(edgesTable)
            }
          } finally graft.operators.DedupOps.unpersistCheckpointed(delta)
        }
      }

  /** Streaming SCD2 dimension maintenance — q40's online dual, the
    * CDC shape every warehouse runs: a stream of dimension-change
    * records `(k, seg_v, valid_from)` folds into the standing
    * versioned dimension per micro-batch. The first batch is the
    * initial load ([[graft.operators.Scd2Ops.initDim]] — full history,
    * multiple versions per key close each other in order); every later
    * batch is [[graft.operators.Scd2Ops.upsertDim]]'s MERGE, inheriting
    * its daily-digest contract (intra-batch churn collapses to the
    * latest row per key) and its bucketed-dimension scale shape (the
    * close-join plans no exchange on the dimension side; only the
    * batch shuffles).
    *
    * Re-delivery discipline: the digest is computed BEFORE the replay
    * guard — a re-delivered batch collapses to exactly the rows its
    * first delivery landed, and the anti-join on `(k, valid_from)`
    * against the standing dimension then drops them all, so a replayed
    * micro-batch after a restart is a TRUE no-op (no CoW rewrite, no
    * file churn — spec-pinned). Without the digest-first order, a
    * replayed two-version key would re-apply its SUPERSEDED earlier
    * version on top of the landed latest one. */
  def streamingScd2(changeStream: DataFrame, dimTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changeStream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val changes = batch.select($"k", $"seg_v", $"valid_from").distinct()
        if (!sp.catalog.tableExists(dimTable)) {
          graft.sources.LayoutOps.clearStaleLocation(sp, dimTable)
          graft.operators.Scd2Ops.initDim(sp, dimTable, changes)
        } else {
          sp.catalog.refreshTable(dimTable)
          // upsertDim's digest, replicated ahead of the replay guard
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy($"k").orderBy($"valid_from".desc, $"seg_v".desc)
          val digest = changes
            .withColumn("rn", row_number().over(w))
            .filter($"rn" === 1).drop("rn")
          val delta = digest.join(
              sp.table(dimTable).select($"k", $"valid_from"),
              Seq("k", "valid_from"), "left_anti")
            .localCheckpoint() // pin: the MERGE rewrites the probe table
          try {
            if (!delta.isEmpty)
              graft.operators.Scd2Ops.upsertDim(sp, dimTable, delta)
          } finally graft.operators.DedupOps.unpersistCheckpointed(delta)
        }
      }

  /** Streaming day-2 RETRIEVAL-INDEX maintenance — t26's online dual,
    * completing the pattern pairing every day-2 batch maintainer with
    * a foreachBatch stream (q41↔streamingIvm, q48↔streamingTriangles,
    * d16↔streamingNeardupIngest): a stream of documents `(doc_id,
    * text)` folds into the standing BM25 index tables per micro-batch.
    * First batch is day-1 (posting list `(term, doc_id, tf)` BUCKETED
    * BY TERM — the probe join's key — plus doc-length and per-term df
    * tables); every later batch explodes ONLY its new docs and merges:
    * postings/dl APPEND (doc sets are disjoint, so no read-modify-
    * write), df folds by ADDITION (CoW overwrite of a vocabulary-sized
    * table). The corpus text is never re-read — per-batch cost is the
    * batch explode plus metadata-sized folds, t26's exact scale story.
    *
    * Re-delivery discipline (streamingTriangles'): new docs are the
    * batch MINUS doc_ids already in the standing dl table, so a
    * replayed micro-batch after a restart has Δdocs = ∅ and is a TRUE
    * no-op — no state rewrite, no file churn (spec-pinned). The
    * anti-join probes dl (doc-count-sized), never the posting list.
    *
    * State write order: Δdocs is pinned (localCheckpoint) before any
    * table mutates; df — the only read-modify-write — is materialized
    * before its overwrite (CoW, Scd2Ops' discipline); appends land
    * last. */
  def streamingBm25Index(docStream: DataFrame, postTable: String,
                         dlTable: String, dfTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val docs = batch.select($"doc_id", $"text").distinct()
        if (!sp.catalog.tableExists(postTable) ||
            !sp.catalog.tableExists(dlTable) ||
            !sp.catalog.tableExists(dfTable)) {
          Seq(postTable, dlTable, dfTable)
            .foreach(graft.sources.LayoutOps.clearStaleLocation(sp, _))
          val tf = graft.operators.TextOps.bm25TfOf(docs)
            .localCheckpoint() // three writes below share the explode
          try {
            graft.sources.LayoutOps.writeBucketed(tf, postTable, "term", 32)
            tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
              .write.mode("overwrite").format("parquet").saveAsTable(dlTable)
            tf.groupBy($"term").agg(count(lit(1)).as("df"))
              .write.mode("overwrite").format("parquet").saveAsTable(dfTable)
          } finally graft.operators.DedupOps.unpersistCheckpointed(tf)
        } else {
          // the previous batch rewrote these tables behind the relation
          // cache — re-list or the read plans reference deleted files
          Seq(postTable, dlTable, dfTable).foreach(sp.catalog.refreshTable)
          val newDocs = docs.join(
              sp.table(dlTable).select($"doc_id"), Seq("doc_id"), "left_anti")
            .localCheckpoint() // pin: the appends below mutate the probe
          try {
            if (!newDocs.isEmpty) {
              val tfNew = graft.operators.TextOps.bm25TfOf(newDocs)
                .localCheckpoint() // shared by the three merges
              try {
                // df is the one read-modify-write: fold by addition
                // (disjoint doc sets), materialize before overwriting
                val dfMerged = sp.table(dfTable)
                  .unionByName(tfNew.groupBy($"term")
                    .agg(count(lit(1)).as("df")))
                  .groupBy($"term").agg(sum($"df").as("df"))
                  .localCheckpoint()
                try dfMerged.write.mode("overwrite").format("parquet")
                  .saveAsTable(dfTable)
                finally graft.operators.DedupOps.unpersistCheckpointed(dfMerged)
                tfNew.groupBy($"doc_id").agg(sum($"tf").as("dl"))
                  .write.mode("append").format("parquet").saveAsTable(dlTable)
                tfNew.repartition(32, $"term")
                  .write.mode("append").format("parquet")
                  .bucketBy(32, "term").sortBy("term").saveAsTable(postTable)
              } finally graft.operators.DedupOps.unpersistCheckpointed(tfNew)
            }
          } finally graft.operators.DedupOps.unpersistCheckpointed(newDocs)
        }
      }

  def streamingIvm(lineitemStream: DataFrame, summaryTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    lineitemStream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val delta = batch
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            sum($"l_quantity".cast("decimal(28,8)")).as("sum_qty"),
            sum($"l_extendedprice".cast("decimal(12,2)").cast("decimal(28,8)"))
              .as("sum_price"))
        val merged =
          if (sp.catalog.tableExists(summaryTable))
            sp.table(summaryTable).unionByName(delta)
              .groupBy($"l_returnflag", $"l_linestatus")
              .agg(sum($"n_rows").as("n_rows"),
                sum($"sum_qty").as("sum_qty"),
                sum($"sum_price").as("sum_price"))
          else {
            graft.sources.LayoutOps.clearStaleLocation(sp, summaryTable)
            delta
          }
        val next = merged.localCheckpoint()
        try next.write.mode("overwrite").format("parquet")
          .saveAsTable(summaryTable)
        finally graft.operators.DedupOps.unpersistCheckpointed(next)
      }

  /** Streaming connected-component maintenance — q50's online dual: a
    * stream of basket rows `(o, p)` folds into the standing support
    * counts and component labels per micro-batch. First batch is day 1
    * ([[graft.operators.RelationalOps.q50InitState]]: counts bucketed
    * on the (a, b) fold key, labels = converged propagation over the
    * edges at/above the support threshold); every later batch folds
    * ONLY its new baskets' pair counts in by addition
    * ([[graft.operators.RelationalOps.q50Fold]] — co-partitioned with
    * the bucketed counts, delta-sized shuffle) and repairs labels
    * through the contracted graph
    * ([[graft.operators.RelationalOps.q50Relabel]] — CC over the
    * labels actually touched, never |V|). Counts only grow, so
    * components only MERGE — the monotonicity that makes the
    * incremental fold sound under any batch slicing.
    *
    * Re-delivery discipline: support counts are READ-MODIFY-WRITE, so
    * (unlike streamingTriangles' set-semantics edge state) a replayed
    * batch cannot be detected from the counts themselves — a standing
    * processed-baskets table (order-id-sized, bucketed by o: the
    * anti-join's key) supplies the replay guard. Δbaskets = batch ∖
    * processed; a replayed micro-batch after a restart has Δbaskets =
    * ∅ and is a TRUE no-op — no state rewrite, no file churn
    * (spec-pinned). The processed-id append lands LAST as the batch's
    * commit marker; a crash in the middle of the multi-table write
    * (counts landed, marker not) re-folds on replay — the same
    * non-transactional window every foreachBatch dual here has; a
    * production lake closes it with a transactional catalog commit,
    * the testbed documents it instead.
    *
    * State write order: Δbaskets pinned first; the folded counts and
    * the repaired labels are BOTH materialized before EITHER table is
    * overwritten (each rewrite would otherwise yank files from under
    * the other's read plan); the marker append lands last.
    *
    * Contract (streamingTriangles'): baskets arrive WHOLE within one
    * micro-batch — a basket split across batches would under-count its
    * cross-slice pairs, and the order-id replay guard would drop a
    * second slice as a replay. The upstream source keys delivery by
    * order, which is what every CDC/outbox feed of order lines gives. */
  def streamingComponents(basketStream: DataFrame, cntTable: String,
                          lblTable: String, procTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    basketStream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val pl = batch.select($"o", $"p").distinct()
        if (!sp.catalog.tableExists(cntTable) ||
            !sp.catalog.tableExists(lblTable) ||
            !sp.catalog.tableExists(procTable)) {
          Seq(cntTable, lblTable, procTable)
            .foreach(graft.sources.LayoutOps.clearStaleLocation(sp, _))
          graft.operators.RelationalOps.q50InitState(pl, cntTable, lblTable)
          graft.sources.LayoutOps.writeBucketed(
            pl.select($"o").distinct(), procTable, "o", 32)
        } else {
          // the previous batch rewrote these tables behind the relation
          // cache — re-list or the read plans reference deleted files
          Seq(cntTable, lblTable, procTable).foreach(sp.catalog.refreshTable)
          val newBaskets = pl
            .join(sp.table(procTable), Seq("o"), "left_anti")
            .localCheckpoint()
          try {
            if (!newBaskets.isEmpty) {
              val sup = graft.operators.RelationalOps.Q49MinSupport
              val merged = graft.operators.RelationalOps
                .q50Fold(cntTable, newBaskets)
                .localCheckpoint() // pin: the overwrite below reads cntTable
              try {
                val labels = graft.operators.RelationalOps.q50Relabel(
                  sp.table(lblTable),
                  merged.filter($"n" >= sup)
                    .select($"a", $"b", ($"n_old" < sup).as("is_new")))
                try {
                  merged.select($"a", $"b", $"n").repartition(32, $"a", $"b")
                    .write.mode("overwrite").format("parquet")
                    .bucketBy(32, "a", "b").sortBy("a", "b")
                    .saveAsTable(cntTable)
                  labels.write.mode("overwrite").format("parquet")
                    .saveAsTable(lblTable)
                  newBaskets.select($"o").distinct().repartition(32, $"o")
                    .write.mode("append").format("parquet")
                    .bucketBy(32, "o").sortBy("o").saveAsTable(procTable)
                } finally
                  graft.operators.DedupOps.unpersistCheckpointed(labels)
              } finally
                graft.operators.DedupOps.unpersistCheckpointed(merged)
            }
          } finally
            graft.operators.DedupOps.unpersistCheckpointed(newBaskets)
        }
      }

  /** Streaming media near-dup maintenance — m9's online dual, and the
    * first streaming maintainer here whose fold is DECREMENTAL: a
    * micro-batch can push a frame signature over the boilerplate
    * df-cap, which retracts that sig's intersection from standing
    * pairs and shrinks doc set sizes (m9's churn semantics, via the
    * shared [[graft.operators.MultimodalOps.m9Fold]] core — batch and
    * stream provably run the same fold). First batch is day 1
    * ([[graft.operators.MultimodalOps.m9InitState]]).
    *
    * Replay guard: streamingComponents' processed-id marker (pair
    * intersections and df counts are read-modify-write, so a replay
    * cannot be detected from the state itself) — Δdocs = batch ∖
    * processed; a replayed batch is a TRUE no-op. The marker append
    * lands last as the commit marker; the mid-batch crash window is
    * the same documented non-transactional window every foreachBatch
    * dual here has.
    *
    * State write order: Δdocs and the batch sigs pinned first; the
    * folded df/pairs/sizes are ALL materialized before ANY table is
    * overwritten (each fold reads the tables being rewritten); the
    * posting append (disjoint docs — safe append) and the marker land
    * last. */
  def streamingMediaDedup(docStream: DataFrame, postTable: String,
                          dfTable: String, pairTable: String,
                          nTable: String, procTable: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        import graft.operators.{DedupOps, MultimodalOps}
        val docsB = batch.select($"doc_id", $"text", $"n_chars").distinct()
        val all = Seq(postTable, dfTable, pairTable, nTable, procTable)
        if (!all.forall(sp.catalog.tableExists)) {
          all.foreach(graft.sources.LayoutOps.clearStaleLocation(sp, _))
          MultimodalOps.m9InitState(docsB, postTable, dfTable, pairTable,
            nTable)
          graft.sources.LayoutOps.writeBucketed(
            docsB.select($"doc_id").distinct(), procTable, "doc_id", 32)
        } else {
          all.foreach(sp.catalog.refreshTable)
          val newDocs = docsB
            .join(sp.table(procTable), Seq("doc_id"), "left_anti")
            .localCheckpoint()
          try {
            if (!newDocs.isEmpty) {
              val sigsNew = MultimodalOps.m9SigsFrom(newDocs)
                .localCheckpoint()
              try {
                val (dfj, pairsF, nF) = MultimodalOps.m9Fold(
                  postTable, dfTable, pairTable, nTable, sigsNew)
                try {
                  val pairsM = pairsF.localCheckpoint()
                  val nM = nF.localCheckpoint()
                  try {
                    dfj.select($"frame_sig", $"df")
                      .write.mode("overwrite").format("parquet")
                      .saveAsTable(dfTable)
                    pairsM.write.mode("overwrite").format("parquet")
                      .saveAsTable(pairTable)
                    nM.write.mode("overwrite").format("parquet")
                      .saveAsTable(nTable)
                    sigsNew.repartition(32, $"frame_sig")
                      .write.mode("append").format("parquet")
                      .bucketBy(32, "frame_sig").sortBy("frame_sig")
                      .saveAsTable(postTable)
                    newDocs.select($"doc_id").distinct()
                      .repartition(32, $"doc_id")
                      .write.mode("append").format("parquet")
                      .bucketBy(32, "doc_id").sortBy("doc_id")
                      .saveAsTable(procTable)
                  } finally {
                    DedupOps.unpersistCheckpointed(pairsM)
                    DedupOps.unpersistCheckpointed(nM)
                  }
                } finally DedupOps.unpersistCheckpointed(dfj)
              } finally DedupOps.unpersistCheckpointed(sigsNew)
            }
          } finally DedupOps.unpersistCheckpointed(newDocs)
        }
      }
}
