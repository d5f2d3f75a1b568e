package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Event-time sessionization with custom streaming state
  * (`flatMapGroupsWithState` + event-time timeout) — the Structured
  * Streaming custom-state surface of the engine (SURVEY §2.8; the
  * reference's bounded-channel per-key accumulation re-expressed as
  * watermark-driven keyed state).
  *
  * Semantics: per user, events closer than `gap` belong to one session; a
  * session is EMITTED once the watermark passes its end + gap (it can no
  * longer grow). Trailing sessions still inside the watermark stay in
  * state (delivered on a later trigger in a live stream).
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp)
  final case class Sess(start_ms: Long, end_ms: Long, n: Int)
  final case class UserSessions(sessions: Seq[Sess])
  final case class SessionOut(user_id: Long, session_start_ms: Long,
                              session_end_ms: Long, n_events: Int)

  private def mergeInto(existing: Seq[Sess], batch: Seq[Long], gapMs: Long): Seq[Sess] = {
    // interval sweep: existing sessions are intervals (count-carrying),
    // new events are point intervals; anything within `gap` chains. A new
    // point INSIDE an existing span extends nothing but must not split it
    // (hence intervals, not endpoint folding).
    val ivs = (existing ++ batch.map(t => Sess(t, t, 1))).sortBy(s => (s.start_ms, s.end_ms))
    val out = scala.collection.mutable.ArrayBuffer.empty[Sess]
    var cur: Sess = null
    ivs.foreach { iv =>
      if (cur == null) cur = iv
      else if (iv.start_ms - cur.end_ms <= gapMs)
        cur = Sess(cur.start_ms, math.max(cur.end_ms, iv.end_ms), cur.n + iv.n)
      else { out += cur; cur = iv }
    }
    if (cur != null) out += cur
    out.toSeq
  }

  def sessionFn(gapMs: Long)(
      user: Long, rows: Iterator[Ev], state: GroupState[UserSessions]): Iterator[SessionOut] = {
    val wm = state.getCurrentWatermarkMs()
    if (state.hasTimedOut) {
      val sessions = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      val (closed, open) = sessions.partition(s => s.end_ms + gapMs <= wm)
      if (open.isEmpty) state.remove()
      else {
        state.update(UserSessions(open))
        // fire again when the EARLIEST remaining session can seal — using
        // max would hold sealed sessions hostage behind a trailing open one
        state.setTimeoutTimestamp(math.max(open.map(_.end_ms).min + gapMs, wm + 1))
      }
      closed.iterator.map(s => SessionOut(user, s.start_ms, s.end_ms, s.n))
    } else {
      val ts = rows.map(_.ts.getTime).toSeq.sorted
      val merged = mergeInto(state.getOption.map(_.sessions).getOrElse(Seq.empty), ts, gapMs)
      // emit what the watermark has already sealed; keep the rest
      val (closed, open) = merged.partition(s => s.end_ms + gapMs <= wm)
      if (open.nonEmpty) {
        state.update(UserSessions(open))
        state.setTimeoutTimestamp(math.max(open.map(_.end_ms).min + gapMs, wm + 1))
      } else if (closed.nonEmpty) state.remove()
      closed.iterator.map(s => SessionOut(user, s.start_ms, s.end_ms, s.n))
    }
  }

  /** Run sessionization over a parquet events directory as a file stream;
    * results append to `outDir` as parquet.
    *
    * `watermark` must be set at or above the stream's maximum event-time
    * disorder ACROSS triggers: the event-time-timeout stateful operator
    * DROPS input rows older than the watermark before they reach the
    * session state — the same bounded-state trade StreamingReplay's
    * dedup documents. Two empirically-pinned (4.1.2) subtleties, both
    * spec-driven: (a) the filter's watermark lags one batch beyond the
    * advance (a late file arriving in the very next micro-batch after
    * the watermark driver escapes the filter — do NOT rely on this, it
    * is lag, not tolerance); (b) with a watermark ≥ the disorder the
    * late rows survive, merge into their still-open session, and the
    * stream reproduces the batch oracle exactly. Under-sized watermark =
    * silently truncated sessions; recovery is the batch oracle
    * ([[batchSessions]]) over the full log, which has no watermark. */
  def run(spark: SparkSession, eventsGlob: String, outDir: String, checkpoint: String,
          gap: String = "1 hour", maxFilesPerTrigger: Int = 4,
          watermark: String = "0 seconds"): Unit = {
    import spark.implicits._
    val gapMs = graft.ingest.StreamingReplay.durationMs(gap)
    val schema = spark.read.parquet(eventsGlob).schema
    val evs: Dataset[Ev] = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsGlob)
      // watermarks require TIMESTAMP (ltz); driver parquet carries NTZ.
      // The watermarked column itself must flow into the stateful
      // operator (event-time timeouts are validated against it).
      .withColumn("ts", col("ts").cast("timestamp_ltz"))
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[Ev]
    val sessions = evs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionFn(gapMs))
    val q = sessions.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Batch reference implementation (window-lag gap split) for tests. */
  def batchSessions(spark: SparkSession, eventsGlob: String, gap: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMs = graft.ingest.StreamingReplay.durationMs(gap)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    spark.read.parquet(eventsGlob)
      .select(col("user_id"),
        // unix_millis, NOT a double round-trip: (cast double)*1000 can
        // truncate 1 ms below the stream path's exact getTime and shift
        // session endpoints between the oracle and the stream
        unix_millis(col("ts").cast("timestamp_ltz")).as("ts_ms"))
      .withColumn("new_sess",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) <= gapMs, 0).otherwise(1))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).cast("int").as("n_events"))
      .drop("sess_id")
  }
}
