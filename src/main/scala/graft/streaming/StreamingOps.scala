package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forms of the pipeline operators (beyond-reference surface:
  * the reference is bounded-batch only, SURVEY §2.10 — its streams are
  * incremental emission of finite remote results, sql.rs:304-309).
  *
  * Both operators keep per-key state BOUNDED, which is the whole game at
  * 100 TB/day ingest:
  *  - [[dedupWithinWatermark]] drops duplicate keys with state expiring at
  *    the watermark (no unbounded seen-set).
  *  - [[sessionize]] holds exactly one open session per key; sessions
  *    close eagerly when a later event exceeds the gap and by event-time
  *    timeout when the watermark passes the gap.
  */
object StreamingOps {

  /** One event on a sessionizable stream. `tsMicros` is the event time in
    * micros; `et` is the SAME instant as a timestamp column — it must be
    * the column `withWatermark` was declared on (Spark requires the
    * watermarked attribute to be present in the Dataset feeding an
    * event-time-timeout flatMapGroupsWithState).
    */
  final case class KeyedEvent(key: Long, tsMicros: Long, et: java.sql.Timestamp)

  /** A closed session. */
  final case class Session(key: Long, startMicros: Long, endMicros: Long, nEvents: Long)

  /** State: the one open session per key (public: the state Encoder's
    * generated code instantiates it reflectively).
    */
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** Exact streaming dedup on `keys` with duplicate-tracking state that
    * expires `delay` past the watermark — the streaming analog of the d01
    * batch operator (state is O(distinct keys per watermark window), not
    * O(stream)).
    */
  def dedupWithinWatermark(
      df: DataFrame,
      eventTimeCol: String,
      delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Gap-based sessionization (the streaming analog of the q36 batch
    * query): one `flatMapGroupsWithState` pass, Append output of CLOSED
    * sessions. Input must already carry a watermark on the event-time
    * column feeding `tsMicros`.
    *
    * In-batch events are sorted per key (bounded by the micro-batch);
    * across batches the open session lives in `GroupState`, timing out —
    * and emitting — once the watermark passes `last + gap`.
    */
  def sessionize(
      events: Dataset[KeyedEvent],
      gapMicros: Long): Dataset[Session] = {
    import events.sparkSession.implicits._

    def fn(key: Long, it: Iterator[KeyedEvent], state: GroupState[OpenSession])
      : Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(key, s.start, s.last, s.n))
      }
      val sorted = it.map(_.tsMicros).toArray
      java.util.Arrays.sort(sorted)
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { ts =>
        open = open match {
          case Some(s) if ts - s.last > gapMicros =>
            closed += Session(key, s.start, s.last, s.n)
            Some(OpenSession(ts, ts, 1))
          case Some(s) =>
            Some(s.copy(last = math.max(s.last, ts), n = s.n + 1))
          case None =>
            Some(OpenSession(ts, ts, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close by watermark once no successor can extend the session
        state.setTimeoutTimestamp((s.last + gapMicros) / 1000L + 1L)
      }
      closed.result().iterator
    }

    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
