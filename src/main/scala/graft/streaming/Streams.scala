package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's incremental-ingest
  * patterns (SURVEY.md §2.9). The reference batch-polls paginated sources,
  * stops on repeated page hashes, dedups by URL and tolerates per-row
  * failures; in Spark those become: micro-batch sources, `dropDuplicates`
  * with a watermark-bounded state, event-time windowed aggregation, and
  * stateful per-key processing with timeouts.
  *
  * All operators take/return (streaming) DataFrames — the same column
  * contracts as the batch pipeline, so `foreachBatch` can reuse the batch
  * cleaner verbatim (batch-over-stream, Trigger.AvailableNow).
  */
object Streams {

  /** Cross-engine URL dedup on a stream (J3 streaming form): state bounded
    * by the watermark — a link older than `delay` can no longer produce a
    * duplicate, so its dedup state is dropped instead of growing forever
    * (the unbounded-state trap of naive streaming dedup).
    */
  def dedupLinks(links: DataFrame, tsCol: String = "ts",
                 delay: String = "10 minutes"): DataFrame =
    links.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("se_link")

  /** Event-time tumbling/sliding window counts + value sum per event_type
    * (events-table shape). Late rows beyond `delay` are dropped at the
    * watermark; the aggregation state closes per window.
    */
  def windowedEventStats(events: DataFrame, tsCol: String = "ts",
                         windowLen: String = "1 minute",
                         slide: Option[String] = None,
                         delay: String = "2 minutes"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None    => window(col(tsCol), windowLen)
    }
    events.withWatermark(tsCol, delay)
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  final case class Event(ts: Timestamp, user_id: Long, event_type: String,
                         value: Double)
  final case class SessionState(nEvents: Long, sumValue: Double,
                                lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long,
                              sum_value: Double, closed_by_timeout: Boolean)

  /** Stateful per-user sessionization via mapGroupsWithState: accumulates
    * per-user counters; with `timeoutMs` set, the session closes (state
    * dropped) when the user goes quiet that long (custom state the
    * reference's batch loops can't express incrementally). Timeout is
    * opt-in: ProcessingTimeTimeout keeps micro-batches firing on a clock,
    * which deterministic tests (processAllAvailable) must avoid.
    */
  def sessionize(events: Dataset[Event],
                 timeoutMs: Option[Long] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (timeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOut(userId, s.nEvents, s.sumValue, closed_by_timeout = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            val batch = rows.toSeq
            val next = SessionState(
              prev.nEvents + batch.size,
              prev.sumValue + batch.map(_.value).sum,
              batch.map(_.ts.getTime).foldLeft(prev.lastTs)(math.max))
            state.update(next)
            timeoutMs.foreach(state.setTimeoutDuration)
            SessionOut(userId, next.nEvents, next.sumValue, closed_by_timeout = false)
          }
      }
  }

  final case class ClosedSession(user_id: Long, n_events: Long,
                                 sum_value: Double, last_ts: Long)

  /** Session-close emission via flatMapGroupsWithState: a batch of events
    * for a user may close zero, one, or many sessions (every gap ≥ `gapMs`
    * between consecutive events ends one) — the 0..n-outputs-per-key shape
    * that mapGroups cannot express. Emits ONLY closed sessions (Append
    * mode); the open tail stays in state for the next micro-batch. Gap
    * detection is event-time against the stored last timestamp, so the
    * operator is deterministic under processAllAvailable (no clock
    * timeouts).
    */
  def emitClosedSessions(events: Dataset[Event], gapMs: Long,
                         eventTimeTimeout: Boolean = false): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    // Without a timeout an idle user's FINAL session never emits and its
    // state is retained forever (ADVICE r04). EventTimeTimeout fires when
    // the watermark passes lastTs+gap — deterministic under
    // processAllAvailable, unlike a wall-clock timeout — flushing and
    // clearing the state. Requires `withWatermark` on the input stream.
    val timeoutConf = if (eventTimeTimeout) GroupStateTimeout.EventTimeTimeout
                      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              ClosedSession(userId, s.nEvents, s.sumValue, s.lastTs))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.lastTs >= gapMs =>
                  closed += ClosedSession(userId, s.nEvents, s.sumValue, s.lastTs)
                  cur = Some(SessionState(1L, e.value, e.ts.getTime))
                case Some(s) =>
                  cur = Some(SessionState(s.nEvents + 1, s.sumValue + e.value,
                    math.max(s.lastTs, e.ts.getTime)))
                case None =>
                  cur = Some(SessionState(1L, e.value, e.ts.getTime))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (eventTimeTimeout)
                // must stay ahead of the current watermark or Spark rejects it
                state.setTimeoutTimestamp(
                  math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Page-hash quiescence detection (the reference's md5-page stop,
    * link_extractor.py:317-324, as a streaming filter): drop micro-batch
    * rows whose page content hash repeats the previous page's — state
    * bounded by watermark, keyed per engine.
    */
  def dropRepeatedPages(pages: DataFrame, tsCol: String = "ts",
                        delay: String = "10 minutes"): DataFrame =
    pages.withColumn("page_md5", md5(col("page_html")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("engine", "page_md5")
}
