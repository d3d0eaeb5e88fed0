package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import graft.Tables
import graft.functions.{fxSum, rnd}

/** Streaming operators (the ref ingests in streaming batches —
  * ingestion/ingest.py:52-80 `run_*_ingest_stream`; here re-expressed
  * as Structured Streaming).
  *
  * Each operator comes in two forms with identical semantics:
  *  - a *streaming* form (`readStream`/`writeStream`, watermarks,
  *    `flatMapGroupsWithState`) exercised in ScalaTest via rate/memory
  *    sources, and
  *  - a *batch-equivalent* form over the events table, which is what the
  *    DuckDB oracle verifies (a correct streaming windowed agg must
  *    produce exactly the batch answer once the watermark closes).
  */
object StreamOps {
  val SessionGapMin = 30

  // ---------- batch-equivalent (verified) forms ----------

  /** Event-time hourly windowed counts/sums per event_type. */
  def windowedAggBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), rnd(fxSum(col("value"), 6), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Sliding-window counts/sums (1-hour windows, 30-minute slide):
    * every event contributes to exactly two windows. Spark expands the
    * window set at the map side; the oracle mirrors the expansion with
    * an explicit two-start unnest. */
  def slidingAggBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), rnd(fxSum(col("value"), 6), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Hourly-window per-type binned value counts — the batch-equivalent
    * (verified) form of [[histogramStream]]: same binning map, same
    * windowed aggregate, minus the watermark. */
  def histogramBatch(spark: SparkSession, dir: String): DataFrame = {
    val bin = graft.operators.EventsAnalytics.binCol(col("value"))
    Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), bin.as("bin"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("bin"), col("cnt"))
      .orderBy("window_start", "event_type", "bin")
  }

  /** Trending detection: the top-3 event types per hourly window by
    * event count (ties by type name). The rank runs AFTER the windowed
    * aggregation — the frame is already reduced to (windows × types)
    * rows, so the partitioned row_number sorts a handful of rows per
    * window, not the event stream; the only full-data shuffle is the
    * windowed groupBy with map-side partials. */
  def trendingTopKBatch(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy("w").orderBy(col("n").desc, col("event_type"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("w.start").as("window_start"), col("rank"),
        col("event_type"), col("n"))
      .orderBy("window_start", "rank")
  }

  /** Streaming form of [[trendingTopKBatch]]: watermarked windowed
    * counts (append mode — a window is emitted once, when it closes),
    * then the per-window top-k rank runs in foreachBatch over the few
    * CLOSED window rows of that micro-batch. Ranking state never grows:
    * each batch ranks only windows finalized in it. */
  def trendingTopKStream(events: DataFrame, k: Int = 3)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(batch
          .withColumn("rank", row_number().over(
            Window.partitionBy("w").orderBy(col("n").desc, col("event_type"))).cast("long"))
          .filter(col("rank") <= k)
          .select(col("w.start").as("window_start"), col("rank"),
            col("event_type"), col("n")))
      }

  /** Sessionization with a 30-minute inactivity gap: batch equivalent
    * via lag + cumulative session starts (single shuffle on user_id). */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > SessionGapMin * 60000L,
          1L).otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(cum))
      .groupBy("user_id", "sess_id")
      .agg(min("ts").as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_millis(max("ts")) - unix_millis(min("ts"))).as("duration_ms"))
      .orderBy("user_id", "sess_id")
  }

  // ---------- streaming forms (tested with MemoryStream) ----------

  /** File-source streaming read of an events directory (parquet), with
    * the same nanos→µs timestamp handling as the batch reader. New
    * files landing in `dir` flow through incrementally. */
  def eventsReadStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // A streaming source needs its schema fixed upfront, but the events
    // parquet has shipped three ts encodings across driver data
    // refreshes (see Tables.events). Sniff the encoding from whatever
    // static files are already in the directory (falling back to
    // TIMESTAMP_NTZ, the current testdata encoding, for an empty one),
    // then normalize through the same loader contract as batch.
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: Throwable => TimestampNTZType }
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    graft.Tables.normalizeEventTs(spark.readStream.schema(schema).parquet(dir))
  }

  /** Streaming hourly windowed agg with a 2-hour watermark. */
  def windowedAggStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), rnd(fxSum(col("value"), 6), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Checkpointed parquet sink for the windowed aggregate — the
    * production exactly-once path: the checkpoint records committed
    * source offsets + sink batch ids, so a crashed/restarted query
    * resumes from the last committed batch and the file sink's commit
    * log makes replayed batches idempotent (no duplicated windows).
    * Append mode emits each window exactly once, when the watermark
    * closes it. */
  def windowedAggToParquet(events: DataFrame, outDir: String,
                           checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedAggStream(events)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming exact dedup — the streaming form of `Dedup.exact`: a row
    * whose content hash was already seen within the watermark horizon
    * is dropped. State is bounded BY the watermark (full-history dedup
    * state cannot exist on an unbounded stream; the batch operator is
    * the full-history form), which is exactly the training-data
    * ingest-dedup contract: duplicates arrive close together. */
  def dedupStream(docs: DataFrame, horizon: String = "2 hours"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming corpus cleaning — the ingest-side form of
    * [[graft.operators.Shaping.qualityFilterPipeline]]: the same
    * quality gate (stateless per-row map, shared expression via
    * `Shaping.withQualityColumns`) followed by exact dedup on the
    * normalized-text hash within the watermark horizon. Gate state: 0;
    * dedup state: bounded by the watermark — the pipeline runs forever
    * on an unbounded ingest stream. Input needs (doc_id, ts, text,
    * lang); output is the kept docs with their gate columns. */
  def cleanDocsStream(docs: DataFrame, horizon: String = "2 hours",
                      minToks: Long = 20L, minQuality: Double = 0.6): DataFrame =
    graft.operators.Shaping.withQualityColumns(docs)
      .filter(col("n_toks") >= minToks && col("quality") >= minQuality)
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("norm_hash")
      .select(col("doc_id"), col("ts"), col("lang"), col("n_toks"), col("quality"))

  /** Streaming sliding-window chunker — the ingest-side form of
    * [[graft.operators.Chunking.chunkSliding]]: each arriving document
    * explodes into its overlapping token windows (pure stateless
    * narrow ops — zero streaming state, works in append mode at any
    * rate). Input needs (doc_id, ts, text); output keeps ts per chunk
    * so downstream stages can watermark. Chain after
    * [[cleanDocsStream]]'s gate+dedup for the full
    * ingest→clean→passage pipeline. */
  def chunkStream(docs: DataFrame,
                  w: Int = graft.operators.Chunking.W,
                  s: Int = graft.operators.Chunking.Stride): DataFrame =
    graft.operators.Chunking.chunkRows(docs, w, s)

  /** Stream-stream inner join: events of two streams for the same user
    * within a ±10-minute event-time bound. Both sides carry watermarks
    * so the join state is GC'd once the bound passes — the unbounded-
    * state failure mode of a naive stream join is designed out. */
  def streamStreamJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val a = left.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("a_ts"), col("value").as("a_value"))
    val b = right.withWatermark("ts", "1 hour")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("value").as("b_value"))
    a.join(b, col("user_id") === col("b_user") &&
      col("b_ts") >= col("a_ts") - expr("INTERVAL 10 MINUTES") &&
      col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("a_ts"), col("b_ts"),
        col("a_value"), col("b_value"))
  }

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp, n_events: Long, duration_sec: Long)
  case class SessState(start: Long, last: Long, n: Long)

  case class LatestOut(user_id: Long, event_id: Long, event_type: String, value: Double)

  /** Streaming upsert compaction — the streaming form of
    * Relational.latestByKey (the ref's batch_upsert replace-by-id
    * semantics, applied continuously): state holds the max-(ts,
    * event_id) row per key; every micro-batch emits the current winner
    * for keys it touched (update output mode). State is one row per
    * key — the same footprint any streaming upsert view needs. */
  def latestByKeyStream(events: Dataset[Ev]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Ev, LatestOut](GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Ev]) =>
          val best = (evs ++ state.getOption.iterator)
            .maxBy(e => (e.ts.getTime, e.event_id))
          state.update(best)
          LatestOut(user, best.event_id, best.event_type, best.value)
      }
  }

  /** Streaming per-window value histogram — the live form of
    * [[graft.operators.EventsAnalytics.histogram]]: binning stays a
    * per-row map before the watermarked window aggregate, so the
    * stream shuffles (window, type, bin) partial counts only; append
    * mode emits each window's bins exactly once when it closes. */
  def histogramStream(events: DataFrame, horizon: String = "2 hours"): DataFrame = {
    val bin = graft.operators.EventsAnalytics.binCol(col("value"))
    events
      .withWatermark("ts", horizon)
      .select(col("ts"), col("event_type"), bin.as("bin"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("bin"), col("cnt"))
  }

  /** Online anomaly filter — the production anomaly shape: per-type
    * mean/std are TRAINED OFFLINE (the batch
    * [[graft.operators.EventsAnalytics.anomalies]] stats pass) and
    * applied to the live stream as a stateless broadcast (stream-static)
    * join + filter. No streaming state at all, so it scales to any
    * event rate; retraining is swapping the static side. */
  def anomalyStream(events: DataFrame, stats: DataFrame, z: Double = 3.0): DataFrame =
    events.join(broadcast(stats), "event_type")
      .filter(col("std") > 0 && abs(col("value") - col("mean")) > lit(z) * col("std"))
      .select(col("event_id"), col("event_type"), col("value"),
        rnd((col("value") - col("mean")) / col("std"), 4).as("z_score"))

  /** Funnel progress state: events still above the watermark (held for
    * ordering; timestamps in MICROSECONDS, matching the batch funnel's
    * unix_micros arithmetic) + the drained horizon + stage timestamps
    * (-1 = unset). */
  case class FunnelSt(buf: Seq[(Long, Long, String)], drainedTo: Long,
                      t1: Long, t2: Long, t3: Long)
  case class FunnelOut(user_id: Long, stage: Long, t1_us: Long, t2_us: Long, t3_us: Long)

  /** Microseconds since epoch — java.sql.Timestamp.getTime truncates to
    * ms, and the batch funnel's strict `ts > t1` comparisons are µs
    * (unix_micros), so a ms fold would miss sub-ms stage gaps. */
  private def usOf(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** Streaming conversion funnel — the streaming form of
    * [[graft.operators.EventsAnalytics.funnel]] (first view, first
    * click strictly after it, first purchase strictly after that),
    * correct under OUT-OF-ORDER arrival: new events buffer in state
    * until the watermark passes them, then fold into the stage machine
    * in (event-time µs, event_id) order and leave the buffer. Because
    * drains are watermark-monotone, the fold sees events in global
    * event-time order however they arrived, so the converged state
    * equals the batch funnel on the same data. Events at-or-below the
    * drained horizon are dropped, the standard late-data contract.
    *
    * State stays bounded on an open-ended user population: the buffer
    * drains with the watermark, a COMPLETED journey (stage 3, empty
    * buffer) removes its state immediately, and an idle user's state
    * expires `idleMs` after their last drained event (event-time
    * timeout). A group with held events instead arms its timeout at
    * the EARLIEST held timestamp — mapGroupsWithState only runs for
    * groups with new input, so without a timeout a quiet user would
    * never drain. Emits the user's current stage each invocation
    * (update semantics, [[latestByKeyStream]]'s shape). */
  def funnelStream(events: Dataset[Ev], horizon: String = "10 minutes",
                   stages: Seq[String] = graft.operators.EventsAnalytics.FunnelStages,
                   idleMs: Long = 24L * 3600 * 1000): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", horizon)
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelSt, FunnelOut](GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[FunnelSt]) =>
          val st0 = state.getOption.getOrElse(FunnelSt(Nil, Long.MinValue, -1L, -1L, -1L))
          val fresh = evs.map(e => (usOf(e.ts), e.event_id, e.event_type))
            .filter(_._1 > st0.drainedTo).toSeq
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, hold) = (st0.buf ++ fresh).partition(_._1 <= wmUs)
          var (t1, t2, t3) = (st0.t1, st0.t2, st0.t3)
          ripe.sortBy(e => (e._1, e._2)).foreach { case (ts, _, tpe) =>
            if (tpe == stages(0)) { if (t1 < 0) t1 = ts }
            else if (tpe == stages(1)) { if (t2 < 0 && t1 >= 0 && ts > t1) t2 = ts }
            else if (tpe == stages(2)) { if (t3 < 0 && t2 >= 0 && ts > t2) t3 = ts }
          }
          val stage = Seq(t1, t2, t3).count(_ >= 0).toLong
          if (hold.isEmpty && (stage == 3 ||
              (state.hasTimedOut && ripe.isEmpty))) {
            // journey complete, or a GENUINE idle timeout (nothing
            // drained this invocation, nothing held — quiet for
            // idleMs): drop the state row — unbounded user populations
            // must not accumulate one state entry per user forever.
            // A drain-timeout (armed at the oldest held event) also
            // has hasTimedOut=true but ripe non-empty; removing then
            // would discard stage progress (t1/t2) and the drainedTo
            // late-data guard after any stage gap longer than the
            // watermark horizon, undercounting conversions vs batch.
            if (state.exists) state.remove()
          } else {
            state.update(FunnelSt(hold, math.max(st0.drainedTo, wmUs), t1, t2, t3))
            if (hold.nonEmpty)
              // re-wake when the watermark reaches the oldest held
              // event (ceil to ms keeps it > the current watermark)
              state.setTimeoutTimestamp(hold.map(_._1).min / 1000L + 1L)
            else
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleMs)
          }
          FunnelOut(user, stage, t1, t2, t3)
      }
  }

  /** Live daily-active-users counter — the streaming form of
    * [[graft.operators.EventsAnalytics.activeUsers]]'s DAU side: the
    * stream first deduplicates (user, day) within the watermark
    * horizon (state = one row per active user-day, dropped as the
    * watermark passes — bounded however many events repeat), then a
    * per-day windowed count emits each closed day exactly once in
    * append mode. The horizon must cover a full day plus allowed
    * lateness so a user's second event on the same day always meets
    * the dedup state. */
  def dauStream(events: DataFrame, horizon: String = "25 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .select(col("ts"), col("user_id"), to_date(col("ts")).as("day"))
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("dau"))
      .select(col("w.start").cast("date").as("day"), col("dau"))

  /** Moving-average state: held (us, event_id, fx) events above the
    * watermark + the trailing ≤ w−1 drained fixed-point values + the
    * drained horizon. */
  case class MovAvgSt(buf: Seq[(Long, Long, Long)], tail: Seq[Long], drainedTo: Long)
  case class MovAvgOut(user_id: Long, event_id: Long, mov_avg: Double)

  /** Streaming per-user trailing moving average — the streaming form of
    * [[graft.operators.EventsAnalytics.movingAvg]], correct under
    * OUT-OF-ORDER arrival via [[funnelStream]]'s watermark-ordered
    * fold: events buffer in state until the watermark passes them, then
    * drain in (event-time µs, event_id) order through the trailing
    * window, so each emitted average equals the batch operator's row
    * for that event. State stays bounded: the buffer drains with the
    * watermark, the tail holds w−1 longs, and an idle user's state
    * (tail included) expires `idleMs` after their last drained event —
    * a user returning later starts a fresh smoothing window, the
    * documented trade for not holding one state row per ever-seen user. */
  def movingAvgStream(events: Dataset[Ev],
                      w: Int = graft.operators.EventsAnalytics.MovAvgWindow,
                      horizon: String = "10 minutes",
                      idleMs: Long = 24L * 3600 * 1000): Dataset[MovAvgOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", horizon)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MovAvgSt, MovAvgOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[MovAvgSt]) =>
          val st0 = state.getOption.getOrElse(MovAvgSt(Nil, Nil, Long.MinValue))
          val fresh = evs
            .map(e => (usOf(e.ts), e.event_id, math.floor(e.value * 1e6 + 0.5).toLong))
            .filter(_._1 > st0.drainedTo).toSeq
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, hold) = (st0.buf ++ fresh).partition(_._1 <= wmUs)
          var tail = st0.tail
          val out = ripe.sortBy(e => (e._1, e._2)).map { case (_, id, fx) =>
            val win = (tail :+ fx).takeRight(w)
            tail = win.takeRight(w - 1)
            MovAvgOut(user, id,
              math.floor(win.sum.toDouble / win.length / 1e6 * 1e4 + 0.5) / 1e4)
          }
          if (state.hasTimedOut && ripe.isEmpty && hold.isEmpty) {
            // a GENUINE idle timeout: nothing drained this invocation
            // and nothing held — the user has been quiet for idleMs. A
            // drain-timeout (armed at the oldest held event) also
            // arrives with hasTimedOut=true but with ripe non-empty;
            // removing state then would discard the tail and drainedTo
            // right after a drain, restarting the window and
            // re-admitting late duplicates after ANY gap longer than
            // the watermark horizon instead of after idleMs.
            if (state.exists) state.remove()
          } else {
            state.update(MovAvgSt(hold, tail, math.max(st0.drainedTo, wmUs)))
            if (hold.nonEmpty)
              state.setTimeoutTimestamp(hold.map(_._1).min / 1000L + 1L)
            else
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleMs)
          }
          out.iterator
      }
  }

  /** Streaming sessionization via flatMapGroupsWithState: a session is
    * emitted when a later event for the user passes the inactivity gap,
    * or (with ProcessingTimeTimeout, the production default) when the
    * state times out with no further events. */
  def sessionizeStream(events: Dataset[Ev],
                       timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, timeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start), s.n, (s.last - s.start) / 1000))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= SessionGapMin * 60000L =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  out += SessionOut(user, new Timestamp(s.start), s.n, (s.last - s.start) / 1000)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(s"$SessionGapMin minutes")
            }
            out.result().iterator
          }
      }
  }

  object SqlOracle {
    val windowedAgg: String =
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, (floor((${graft.functions.Sql.fxSum("value", 6)}) * 1e4 + 0.5e0) / 1e4) AS sum_value
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin

    val slidingAgg: String =
      s"""WITH ev AS (SELECT * FROM ${graft.functions.Sql.eventsUs} e),
         |x AS (
         |  SELECT event_type, value,
         |    date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
         |      THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS b
         |  FROM ev),
         |w AS (
         |  SELECT unnest([b - INTERVAL 30 MINUTE, b]) AS window_start,
         |    event_type, value
         |  FROM x)
         |SELECT window_start, event_type, count(*) AS n,
         |  (floor((${graft.functions.Sql.fxSum("value", 6)}) * 1e4 + 0.5e0) / 1e4) AS sum_value
         |FROM w GROUP BY window_start, event_type
         |ORDER BY window_start, event_type""".stripMargin

    val histogram: String =
      s"""WITH b AS (
         |  SELECT date_trunc('hour', ts) AS window_start, event_type,
         |    ${graft.operators.EventsAnalytics.SqlOracle.binSql} AS bin
         |  FROM events)
         |SELECT window_start, event_type, bin, count(*) AS cnt
         |FROM b GROUP BY window_start, event_type, bin
         |ORDER BY window_start, event_type, bin""".stripMargin

    val trendingTopK: String =
      s"""WITH counts AS (
         |  SELECT date_trunc('hour', ts) AS window_start, event_type,
         |    count(*) AS n
         |  FROM ${graft.functions.Sql.eventsUs} e
         |  GROUP BY window_start, event_type),
         |ranked AS (
         |  SELECT window_start, event_type, n,
         |    row_number() OVER (PARTITION BY window_start
         |                       ORDER BY n DESC, event_type) AS rank
         |  FROM counts)
         |SELECT window_start, CAST(rank AS BIGINT) AS rank, event_type, n
         |FROM ranked WHERE rank <= 3
         |ORDER BY window_start, rank""".stripMargin

    val sessionize: String =
      s"""WITH x AS (
         |  SELECT user_id, ts, event_id,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM ${graft.functions.Sql.eventsUs} events),
         |y AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN prev_ts IS NULL
         |           OR epoch_ms(ts) - epoch_ms(prev_ts) > ${SessionGapMin * 60000} THEN 1 ELSE 0 END AS new_sess
         |  FROM x),
         |z AS (
         |  SELECT user_id, ts,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM y)
         |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, min(ts) AS session_start,
         |  count(*) AS n_events,
         |  CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms
         |FROM z GROUP BY user_id, sess_id
         |ORDER BY user_id, sess_id""".stripMargin
  }

  // ---------- streaming index ingest (serving-side write path) ----------

  /** Streaming ANN ingest into the persisted GRAPH index — the ref's
    * serving-side ingest loop (ingestion/ingest.py:52-80 drip-feeds
    * vectors into the index) over a [[graft.operators.KnnGraph
    * .writeGraphIndex]] layout: every micro-batch of (id, vec) rows
    * runs the batch insert rule (beam-search the existing graph for
    * neighbors → forward + reverse edges → bucket-aligned appends).
    *
    * Delivery semantics: the checkpoint gives at-least-once appends —
    * a batch replayed across a crash re-appends its rows. That is
    * semantically EXACTLY-ONCE for every reader of this index: scores
    * are deterministic, self-loops are filtered at append, and every
    * search-side keep runs through the id-distinct bounded heap, so
    * duplicate node/edge rows collapse before any result
    * (StreamingSpec asserts a full duplicate re-ingest changes no
    * search result). */
  def annIngestStream(vecs: DataFrame, indexName: String,
                      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.KnnGraph.appendToGraphIndex(
            batch.sparkSession, batch, indexName)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming ingest into the partitioned IVF index
    * ([[graft.operators.Ann.writeIvfIndex]]): each micro-batch of
    * (doc_id, doc_vec) rows is assigned to the FIXED trained centroids
    * and appended into its `c_id=` directories. Unlike the graph path,
    * a replayed IVF append is NOT absorbed by a distinct heap at read
    * time, so each batch is anti-joined against the index's existing
    * doc_ids first — replays and overlapping feeds become no-ops and
    * the append is idempotent by construction (the doc_id column is
    * pruned straight off the index scan). */
  def ivfIngestStream(docs: DataFrame, dir: String, indexPath: String,
                      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing = spark.read.parquet(indexPath).select("doc_id")
        // dedupe WITHIN the batch too: a producer retry can land the
        // same doc twice in one trigger, where the index anti-join
        // can't see it — one row per doc_id keeps the index invariant
        val fresh = batch.dropDuplicates("doc_id")
          .join(existing, Seq("doc_id"), "left_anti")
        if (!fresh.isEmpty)
          graft.operators.Ann.appendToIvfIndex(spark, dir, fresh, indexPath)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming ingest into the persisted hashing-TF postings index
    * ([[graft.operators.Encoders.writeHashingIndex]]): each
    * micro-batch of (doc_id, text) documents is tokenized/bucketed
    * FROM THE BATCH ALONE (per-doc norms make a disjoint append
    * bit-equal to a rebuild) and appended to the stored layout. Same
    * idempotence discipline as [[ivfIngestStream]]: a replayed or
    * overlapping batch is anti-joined against the index's existing
    * doc_ids, so at-least-once delivery becomes an exactly-once
    * index. Self-seeding: a missing layout means nothing to dedupe
    * against, and the first appended batch creates it. */
  /** The two analysis conditions that genuinely mean "no layout yet":
    * the path does not exist, or it exists but holds only
    * underscore-hidden fit files (`_vocab`/`_fit`) so parquet cannot
    * infer a schema. Anything else is a real analysis failure. */
  private val MissingLayoutConditions =
    Seq("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")

  /** Batch-minus-stored anti-join shared by every write-time-idempotent
    * ingest stream, with the "no layout yet" case NARROWED to
    * [[MissingLayoutConditions]] (ADVICE r11): any other
    * AnalysisException — schema drift, a store missing `key` —
    * propagates and fails the stream instead of silently disabling
    * dedup, which would append duplicates that later replays freeze in
    * place. The stored side is not pre-distinct'd: anti-join semantics
    * are duplicate-insensitive, so the extra pre-aggregation shuffle
    * buys nothing. */
  private def minusStored(unique: DataFrame, path: String,
                          key: String = "doc_id"): DataFrame = {
    val spark = unique.sparkSession
    val existing =
      try Some(spark.read.parquet(path).select(key))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              MissingLayoutConditions.exists(c.startsWith)) => None
      }
    existing.fold(unique)(ex => unique.join(ex, Seq(key), "left_anti"))
  }

  def postingsIngestStream(docs: DataFrame, indexPath: String,
                           checkpointDir: String, dim: Int = graft.operators.Encoders.Dim)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // dedupe WITHIN the batch first (a producer retry can land the
        // same doc twice in one trigger, where the index anti-join
        // can't see it): duplicated postings would double cnt/norm and
        // then be frozen forever by the anti-join on later replays
        val fresh = minusStored(batch.dropDuplicates("doc_id"), indexPath)
        if (!fresh.isEmpty)
          graft.operators.Encoders.appendToHashingIndex(spark, fresh, indexPath, dim)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming ingest into a persisted TF-IDF index
    * ([[graft.operators.Encoders.writeTfidfIndex]]) under its FROZEN
    * fit: each micro-batch of (doc_id, text) documents is weighted
    * with the index's own stored `_vocab` (idf never moves — the ref's
    * fitted-TfidfVectorizer transform contract, encoder.py:76-92) and
    * appended. NOT self-seeding, by design: the frozen fit must exist
    * before any transform, so the index is created by a batch
    * [[graft.operators.Encoders.writeTfidfIndex]] build (possibly over
    * an empty corpus snapshot, leaving just `_vocab`) and the stream
    * only appends. Idempotence is the [[postingsIngestStream]]
    * discipline: intra-batch dropDuplicates + anti-join against the
    * index's existing doc_ids, so at-least-once delivery and full
    * replays land exactly once. Refit + rebuild when drift
    * accumulates, exactly like the IVF centroid contract. */
  def tfidfIngestStream(docs: DataFrame, indexPath: String,
                        checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // vocab-only layout (fresh index, no postings yet) is the
        // UNABLE_TO_INFER_SCHEMA arm of minusStored — `_vocab` is
        // underscore-hidden from the postings read, so that is the
        // empty-snapshot case, not a missing index (that throws in the
        // append); any other analysis failure propagates
        val fresh = minusStored(batch.dropDuplicates("doc_id"), indexPath)
        if (!fresh.isEmpty)
          graft.operators.Encoders.appendToTfidfIndex(spark, fresh, indexPath)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming ingest into a persisted SQ8 code layout
    * ([[graft.operators.Ann.writeSq8Index]]) under its FROZEN stored
    * `_fit`: each micro-batch of (doc_id, doc_vec) rows is encoded
    * with the index's own quantization grid (the FAISS
    * add-to-trained-index contract) and appended. NOT self-seeding
    * (the fit must exist first — same contract as
    * [[tfidfIngestStream]]); idempotent via intra-batch
    * dropDuplicates + the doc_id anti-join. Refit + rebuild when
    * range drift accumulates. */
  def sq8IngestStream(vecs: DataFrame, indexPath: String,
                      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // fit-only layout (fresh index, no codes yet — `_fit` is
        // underscore-hidden from the codes read) is minusStored's
        // UNABLE_TO_INFER_SCHEMA arm; real analysis failures propagate
        val fresh = minusStored(batch.dropDuplicates("doc_id"), indexPath)
        if (!fresh.isEmpty)
          graft.operators.Ann.appendToSq8Index(spark, fresh, indexPath)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming ingest into a persisted PQ-codes index
    * ([[graft.operators.Ann.writePqIndex]]): each micro-batch of
    * (doc_id, doc_vec) vectors is encoded under the index's OWN
    * stored `_fit` codebook (frozen-fit — codes depend only on the
    * fit, so disjoint append ≡ rebuild) and appended. Same
    * at-least-once idempotence discipline as [[sq8IngestStream]]. */
  def pqIngestStream(vecs: DataFrame, indexPath: String,
                     checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = minusStored(batch.dropDuplicates("doc_id"), indexPath)
        if (!fresh.isEmpty)
          graft.operators.Ann.appendToPqIndex(spark, fresh, indexPath)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming ingest into a persisted IVF+PQ composed index
    * ([[graft.operators.Ann.writeIvfPqIndex]]): each micro-batch is
    * assigned under the stored `_cent` grid AND encoded under the
    * stored `_fit` codebook (both frozen), appending only into the
    * batch's own cell directories. Same at-least-once idempotence
    * discipline as [[pqIngestStream]]. */
  def ivfPqIngestStream(vecs: DataFrame, indexPath: String,
                        checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = minusStored(batch.dropDuplicates("doc_id"), indexPath)
        if (!fresh.isEmpty)
          graft.operators.Ann.appendToIvfPqIndex(spark, fresh, indexPath)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming ingest into a persisted chunk-postings index
    * ([[graft.operators.Chunking.writeChunkIndex]]): each micro-batch
    * of (doc_id, text) documents is chunked/bucketed from the batch
    * alone (per-CHUNK norms ⇒ disjoint append ≡ rebuild) and
    * appended. Self-seeding and idempotent — the
    * [[postingsIngestStream]] discipline at chunk granularity. */
  def chunkIndexIngestStream(docs: DataFrame, indexPath: String,
                             checkpointDir: String,
                             dim: Int = graft.operators.Encoders.Dim,
                             w: Int = graft.operators.Chunking.W,
                             s: Int = graft.operators.Chunking.Stride)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = minusStored(batch.dropDuplicates("doc_id"), indexPath)
        if (!fresh.isEmpty)
          graft.operators.Chunking.appendToChunkIndex(spark, fresh, indexPath,
            dim, w, s)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming maintenance of the span-dedup window-hash STORE
    * ([[graft.operators.Dedup.spanIncremental]]'s corpus-side
    * artifact): each micro-batch's distinct w-token window hashes are
    * appended — minus those already stored, so the store stays a SET
    * and a full replay is a no-op (write-time idempotent, the
    * postings-ingest discipline). Self-seeding: the first batch
    * creates the layout. At 100 TB this is how the between-runs hash
    * store tracks a live feed without ever re-scanning the corpus. */
  def spanStoreIngestStream(docs: DataFrame, storePath: String,
                            checkpointDir: String,
                            w: Int = graft.operators.Dedup.SpanW)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hashes = graft.operators.Dedup.windowHashes(
          batch.dropDuplicates("doc_id"), w)
        val fresh = minusStored(hashes, storePath, key = "h")
        if (!fresh.isEmpty)
          fresh.write.mode("append").parquet(storePath)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
