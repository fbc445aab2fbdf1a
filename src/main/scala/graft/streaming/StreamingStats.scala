package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the event stream (§2.9 beyond the reference's
  * batch-only surface): the idiomatic Structured Streaming forms of the
  * engine's aggregation semantics.
  *
  *  - [[windowedEventCounts]]: tumbling event-time windows with a
  *    watermark — late events beyond the watermark are DROPPED, windows
  *    finalize (append mode) once the watermark passes their end. The
  *    streaming twin of the batch q12-style per-type counting.
  *  - [[sessionizeStream]]: the reference's gap-threshold 1-D clustering
  *    (A2, table_detection.py:387-441 — relationally q7) as CUSTOM STATE:
  *    flatMapGroupsWithState keyed by user, state = (last event second,
  *    session count, event count). On one batch it folds exactly like the
  *    batch query, so its output equals q7 on the same input; across
  *    batches the state carries open sessions over the boundary.
  */
object StreamingStats {

  /** 10-minute tumbling windows per event_type with a 1-hour watermark. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n_events"))

  final case class SessEvent(user_id: Long, event_id: Long, sec: Long)
  final case class SessState(lastSec: Long, sessions: Long, events: Long,
                             late: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long,
                                n_events: Long, n_late: Long)

  /** Per-user gap sessionization (gap > gapSec opens a new session) as a
    * stateful stream. Events within a batch are sorted by (sec, event_id)
    * before folding — the same total order the batch form (q7) uses.
    *
    * Cross-batch ordering contract: the file source delivers micro-batches
    * in MODIFICATION-TIME order, not event-time order, and state carries
    * only lastSec across the boundary — an event arriving BEHIND a later
    * batch's lastSec cannot be folded into its (already closed) session.
    * Such late events are DROPPED AND COUNTED (`n_late`), the same policy
    * as the watermarked window above, instead of silently folding a
    * negative gap into the wrong session. Equality with the batch oracle
    * (q7) therefore holds exactly when n_late = 0, i.e. when input files
    * arrive in event-time order — and a violation is visible in the
    * output rather than a silent count skew. */
  def sessionizeStream(events: Dataset[SessEvent], gapSec: Long = 1800L)
      : Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
                              GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[SessEvent],
         state: GroupState[SessState]) => {
          val sorted = it.toVector.sortBy(e => (e.sec, e.event_id))
          var st = state.getOption.getOrElse(
            SessState(Long.MinValue, 0L, 0L, 0L))
          for (e <- sorted) {
            if (st.lastSec != Long.MinValue && e.sec < st.lastSec) {
              st = st.copy(late = st.late + 1L) // behind state: drop, count
            } else {
              val newSession = st.lastSec == Long.MinValue ||
                               e.sec - st.lastSec > gapSec
              st = SessState(e.sec,
                             st.sessions + (if (newSession) 1L else 0L),
                             st.events + 1L, st.late)
            }
          }
          state.update(st)
          Iterator.single(
            UserSessions(user, st.sessions, st.events, st.late))
        })
  }

  /** AvailableNow run of the stateful sessionizer over an events parquet
    * directory; latest per-user counts land in outPath (overwritten per
    * batch id — replay-idempotent like StreamingExtract's sink). Returns
    * the final per-user counts. */
  def runSessionize(spark: SparkSession, inputPath: String, outPath: String,
                    ckptDir: String, gapSec: Long = 1800L): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(inputPath).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // state carries across micro-batches
      .parquet(inputPath)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
              col("ts").cast("timestamp").cast("long").as("sec"))
      .as[SessEvent]
    val q = sessionizeStream(stream, gapSec).toDF()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    // latest state per user across batches
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("batch").desc)
    spark.read.parquet(outPath)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_sessions"), col("n_events"),
              col("n_late"))
  }
}
