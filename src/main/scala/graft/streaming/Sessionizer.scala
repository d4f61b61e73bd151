package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the engine
  * capability `session_window` can't cover: sessions that must close on
  * *processing-time inactivity* (a source that stops sending data entirely
  * never advances an event-time watermark, but its open session should
  * still be emitted), carrying arbitrary per-session state.
  *
  * This is the Spark-native generalization of the reference's per-source
  * runtime state (`{proxy, lastRun, lastRemove}`, reference
  * index.js:215-223): keyed state in the state store, fault-tolerant via
  * checkpointing, instead of mutable fields in a single process.
  *
  * Scale: state is partitioned by the group key across executors; each
  * key's state is O(1) (count/min/max/sum) regardless of session length.
  */
object Sessionizer {

  final case class Sample(series: String, ts: Timestamp, value: Double)

  final case class SessionState(count: Long, startMs: Long, lastMs: Long,
                                sum: Double)

  final case class SessionOut(series: String, startMs: Long, endMs: Long,
                              count: Long, sum: Double)

  /** Close a session after `gapMs` of event-time silence within the
    * arriving data. With `timeoutMs > 0`, additionally flush open
    * sessions for keys that stop arriving entirely via a processing-time
    * timeout (production mode; leave 0 in tests — continuous empty
    * timeout batches never let `processAllAvailable` settle).
    */
  def sessionize(samples: Dataset[Sample], gapMs: Long = 30 * 60 * 1000L,
                 timeoutMs: Long = 0L): Dataset[SessionOut] = {
    val spark = samples.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    samples
      .groupByKey(_.series)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        case (series, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // source went silent: flush the open session
            val out = state.getOption.map(s =>
              SessionOut(series, s.startMs, s.lastMs + gapMs, s.count, s.sum))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { r =>
              val ms = r.ts.getTime
              open match {
                case Some(s) if ms - s.lastMs < gapMs =>
                  open = Some(s.copy(count = s.count + 1, lastMs = math.max(s.lastMs, ms),
                    sum = s.sum + r.value))
                case Some(s) => // gap exceeded: close previous, start new
                  closed += SessionOut(series, s.startMs, s.lastMs + gapMs, s.count, s.sum)
                  open = Some(SessionState(1, ms, ms, r.value))
                case None =>
                  open = Some(SessionState(1, ms, ms, r.value))
              }
            }
            open.foreach(state.update)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            closed.iterator
          }
      }
  }
}
