package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analytics over an event stream — the streaming
  * operators a training-data pipeline needs beyond the reference's
  * foreachBatch bookkeeping (which has no watermarks or event-time
  * windows, SURVEY §2.10): watermarked tumbling-window aggregation and
  * custom sessionization state via mapGroupsWithState.
  *
  * All transforms take a DataFrame so they run identically on a
  * readStream source or a batch frame (tests drive them both ways).
  */
object EventStream {

  /** Watermarked tumbling-window counts/sums per event type. Late rows
    * beyond the watermark are dropped by the engine; state for closed
    * windows is reclaimed — bounded state at any scale. */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact deduplication: drop every record whose key columns
    * were already seen within the watermark horizon — the continuous
    * form of the batch fingerprint dedup, for deduping a document/event
    * feed AS it is ingested.
    *
    * `dropDuplicatesWithinWatermark` keeps a key's state only until the
    * watermark passes its event time + delay, so state is BOUNDED at
    * any scale (a plain streaming dropDuplicates would retain every key
    * forever). The documented trade: a duplicate arriving later than
    * the watermark horizon after its first occurrence is not caught —
    * cross-horizon dedup belongs to the batch pass
    * ([[graft.text.Dedup]]). */
  def dedupedStream(events: DataFrame, keyCols: Seq[String],
                    tsCol: String = "ts",
                    watermarkDelay: String = "10 minutes"): DataFrame = {
    require(keyCols.nonEmpty, "dedupedStream needs at least one key column")
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Watermarked stream-stream interval join — attribute each left
    * event to the right-side events of the same key that happen within
    * `horizon` AFTER it (the click-to-conversion / view-to-click
    * attribution shape). Both sides carry the same watermark and the
    * join condition time-bounds the right side relative to the left,
    * which is exactly what lets the engine reclaim join state: a
    * buffered row is dropped once the watermark passes its horizon.
    * Without the interval bound a stream-stream join would buffer both
    * streams forever. Runs identically on batch frames (tests drive
    * both ways). */
  def joinWithinHorizon(left: DataFrame, right: DataFrame,
                        keyCol: String = "user_id",
                        horizon: String = "10 minutes",
                        watermarkDelay: String = "20 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("__l")
    val r = right.withWatermark("ts", watermarkDelay).alias("__r")
    l.join(r,
      col(s"__l.$keyCol") === col(s"__r.$keyCol") &&
        col("__r.ts") >= col("__l.ts") &&
        col("__r.ts") <= col("__l.ts") + expr(s"INTERVAL $horizon"))
      .select(col(s"__l.$keyCol").as(keyCol),
        col("__l.ts").as("left_ts"), col("__l.event_type").as("left_type"),
        col("__r.ts").as("right_ts"), col("__r.event_type").as("right_type"),
        col("__r.value").as("right_value"))
  }

  /** LEFT OUTER variant of [[joinWithinHorizon]] — unattributed left
    * events must still flow through (a click with no conversion is a
    * data point, not a dropped row). The engine can only emit the
    * null-padded row once the watermark proves no matching right event
    * can still arrive, so unmatched results trail by the watermark
    * delay — the correctness/latency trade every outer stream join
    * makes. Same state reclamation as the inner form. */
  def leftJoinWithinHorizon(left: DataFrame, right: DataFrame,
                            keyCol: String = "user_id",
                            horizon: String = "10 minutes",
                            watermarkDelay: String = "20 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("__l")
    val r = right.withWatermark("ts", watermarkDelay).alias("__r")
    l.join(r,
        col(s"__l.$keyCol") === col(s"__r.$keyCol") &&
          col("__r.ts") >= col("__l.ts") &&
          col("__r.ts") <= col("__l.ts") + expr(s"INTERVAL $horizon"),
        "left_outer")
      .select(col(s"__l.$keyCol").as(keyCol),
        col("__l.ts").as("left_ts"), col("__l.event_type").as("left_type"),
        col("__r.ts").as("right_ts"), col("__r.event_type").as("right_type"),
        col("__r.value").as("right_value"))
  }

  /** Stream-static enrichment: join each streaming event against a
    * slowly-changing dimension snapshot. The static side is explicitly
    * broadcast — per micro-batch the dimension is a map-side hash
    * lookup, so the stream NEVER shuffles and no join state is kept
    * (unlike a stream-stream join there is nothing to watermark; the
    * static side is re-resolved per batch, which is what picks up
    * dimension updates between batches). Left join: an event with no
    * dimension row must flow through, not vanish. */
  def enrich(events: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    events.join(broadcast(dim), Seq(keyCol), "left")

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  /** start/last are epoch MICROSECONDS: `Timestamp.getTime` is millis
    * and silently drops the micros parquet event times carry, which
    * shifted session intervals by up to a millisecond against the
    * batch oracle. */
  final case class SessionState(start: Long, last: Long, events: Int, value: Double)

  private def toMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Int, total_value: Double)

  /** Gap-based sessionization: a user's events belong to one session
    * until `gapMs` of event-time silence; each closed session is
    * emitted once. State is bounded by EVENT-TIME timeouts: when the
    * watermark passes a user's last event + gap, their open session is
    * closed, emitted, and the state removed — so one-time users never
    * accumulate while the stream flows. (Event-time timeouts are
    * deterministic and replayable, unlike wall-clock ones — and
    * wall-clock timeouts keep the engine's should-run-another-batch
    * loop spinning, which blocks processAllAvailable-style draining.) */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // the watermark passed last + gap: close and emit the open
            // session, free the state
            val closed = state.getOption.map(s => Session(userId,
              fromMicros(s.start), fromMicros(s.last), s.events, s.value))
            state.remove()
            closed.iterator
          } else {
            // events within a micro-batch arrive unordered — sort by time
            val gapUs = gapMs * 1000L
            val sorted = rows.toSeq.sortBy(e => toMicros(e.ts))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = toMicros(e.ts)
              cur match {
                // a straggler more than gap BEFORE the open session's
                // start cannot belong to it (t - s.last <= gapMs alone
                // would merge arbitrarily old events across a silence
                // wider than the gap) — close it as its own single-event
                // session, leave the open session untouched. Best-effort
                // vs batch sessionization: in-between events that could
                // have bridged arrived in an earlier batch or not at all.
                case Some(s) if t < s.start - gapUs =>
                  closed += Session(userId, fromMicros(t),
                    fromMicros(t), 1, e.value)
                // within gap of the open session. A later batch can
                // carry events OLDER than the restored state (late but
                // inside the watermark) — extend with min/max so the
                // session interval never moves backwards.
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), events = s.events + 1,
                    value = s.value + e.value))
                case Some(s) =>
                  closed += Session(userId, fromMicros(s.start),
                    fromMicros(s.last), s.events, s.value)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // timeout must sit strictly beyond the current watermark;
                // last is micros, the timeout clock is millis (ceil so
                // the timeout never lands before last + gap)
                state.setTimeoutTimestamp(
                  math.max(Math.floorDiv(s.last + 999L, 1000L) + gapMs,
                    state.getCurrentWatermarkMs() + 1))
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }

  final case class FunnelState(stage: Int, t: Long)
  final case class StageHit(user_id: Long, stage: Int)

  /** Sequential-pattern matching (the CEP / MATCH_RECOGNIZE shape
    * Spark lacks) as per-user stream state: a funnel stage machine
    * advances when the NEXT step's event type arrives strictly after
    * the current stage's event time and within `windowMs` of it; one
    * [[StageHit]] is emitted per advance, so counting hits per stage
    * reproduces the batch funnel exactly — PROVIDED micro-batches
    * arrive in event-time order per user (the entry splits its files
    * chronologically; events late beyond that discipline would need
    * the watermark treatment [[sessionize]] implements). Stage-1
    * anchoring to the FIRST qualifying event equals the batch form's
    * min() because within a batch events are sorted and across
    * batches arrival is chronological.
    *
    * State is two numbers per user that has started the funnel and is
    * KEPT after completion — removing it would let a completed user's
    * later events start a second funnel and double-count; the machine,
    * not the events, is the state, so memory is bounded by users, not
    * activity. */
  def funnel(events: Dataset[Event], steps: Seq[String], windowMs: Long)(
      implicit spark: SparkSession): Dataset[StageHit] = {
    import spark.implicits._
    require(steps.nonEmpty)
    val winUs = windowMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => toMicros(e.ts))
          var st = state.getOption.getOrElse(FunnelState(0, 0L))
          val hits = Seq.newBuilder[StageHit]
          sorted.foreach { e =>
            if (st.stage < steps.length && e.event_type == steps(st.stage)) {
              val t = toMicros(e.ts)
              if (st.stage == 0 || (t > st.t && t <= st.t + winUs)) {
                st = FunnelState(st.stage + 1, t)
                hits += StageHit(uid, st.stage)
              }
            }
          }
          if (st.stage > 0) state.update(st)
          hits.result().iterator
      }
  }

  /** Flush any still-open sessions from a batch run (batch semantics:
    * end-of-input closes every session). Used by tests and batch mode. */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, rows) =>
      val sorted = rows.toSeq.sortBy(e => toMicros(e.ts))
      val out = Seq.newBuilder[Session]
      var cur: Option[SessionState] = None
      val gapUs = gapMs * 1000L
      sorted.foreach { e =>
        val t = toMicros(e.ts)
        cur match {
          case Some(s) if t - s.last <= gapUs =>
            cur = Some(s.copy(last = t, events = s.events + 1, value = s.value + e.value))
          case Some(s) =>
            out += Session(userId, fromMicros(s.start), fromMicros(s.last),
              s.events, s.value)
            cur = Some(SessionState(t, t, 1, e.value))
          case None => cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach(s => out += Session(userId, fromMicros(s.start),
        fromMicros(s.last), s.events, s.value))
      out.result()
    }
  }
}
