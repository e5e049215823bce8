package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom-state streaming operator family
  * (KeyValueGroupedDataset.flatMapGroupsWithState) with a window-function
  * batch twin that the DuckDB oracle mirrors 1:1.
  *
  * Batch path: lag/running-sum window — ONE sort-shuffle per key partition,
  * spill-safe, no per-group buffering (the scalable shape for a 100 TB
  * event log). Streaming path: explicit per-key session state with
  * event-time timeout — closed sessions emit exactly once in append mode.
  * Both produce (key, sid, start_ts, end_ts, n) with sid numbered 1..k in
  * event-time order within key.
  */
object Sessionize {

  case class Ev(key: String, ts: java.sql.Timestamp)
  case class Session(key: String, sid: Int, start_ts: Long, end_ts: Long, n: Long)
  case class SessState(start: Long, last: Long, n: Long, emitted: Int)

  /** Batch sessionization: break when the gap to the previous event exceeds
    * `gapSec`; sid = running count of breaks. */
  def sessionsBatch(df: DataFrame, keyCol: String, tsCol: String,
                    gapSec: Long): DataFrame = {
    val w = Window.partitionBy("key").orderBy("ts")
    val cum = Window.partitionBy("key").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).cast("string").as("key"),
        unix_timestamp(col(tsCol).cast("timestamp")).as("ts"))
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) > gapSec, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(cum).cast("int"))
      .groupBy("key", "sid")
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n"))
  }

  /** Streaming sessionization with explicit state + event-time timeout.
    * Emits a session when the watermark passes its close (gap elapsed).
    * sid is the per-key emission counter (sessions close in event-time
    * order per key under a monotone watermark). */
  def sessionsStream(events: Dataset[Ev], gapSec: Long,
                     watermark: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[SessState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // gap elapsed past the watermark → close the open session
            val s = state.get
            state.remove()
            Iterator(Session(key, s.emitted + 1, s.start, s.last, s.n))
          } else {
            val ts = rows.map(_.ts.getTime / 1000).toArray.sorted
            var st = state.getOption.getOrElse(
              SessState(ts.head, ts.head, 0L, 0))
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            ts.foreach { t =>
              if (st.n > 0 && t - st.last > gapSec) {
                out += Session(key, st.emitted + 1, st.start, st.last, st.n)
                st = SessState(t, t, 1L, st.emitted + 1)
              } else {
                st = st.copy(last = math.max(st.last, t), n = st.n + 1,
                  start = math.min(st.start, t))
              }
            }
            state.update(st)
            // wake up when the gap has certainly elapsed for the open session
            state.setTimeoutTimestamp((st.last + gapSec + 1) * 1000)
            out.iterator
          }
      }
  }
}
