package graft

import graft.core.{Doc, Span}
import graft.streaming.StreamingExtract
import graft.synth.CorpusGen
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** §2.9: incremental extraction via Structured Streaming file source +
  * Trigger.AvailableNow — the reference's per-year incremental loop with
  * resume, minus its watermark blind spot. */
class StreamingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private def spansOf(docs: Seq[Doc]): Map[String, Seq[(String, String, String, Int)]] =
    docs.map(d => d.doc_id ->
      d.spans.sortBy(_.offset).map(s => (s.kind, s.text, s.media_ref, s.offset))).toMap

  test("AvailableNow processes backlog, stops, and resumes on new files only") {
    import spark.implicits._
    val in = tmp("sin"); val out = tmp("sout"); val ck = tmp("sck")
    val (inputs, goldens) = CorpusGen.corpus(12)
    val (first, second) = (inputs.take(7), inputs.drop(7))

    // batch 1: initial backlog
    first.toDS().toDF().coalesce(2).write.mode("append").parquet(in)
    val n1 = StreamingExtract.runAvailableNow(spark, in, out, ck)
    assert(n1 == 7, s"first run processed $n1")

    // batch 2: new files arrive; a new AvailableNow run picks up ONLY them
    second.toDS().toDF().coalesce(2).write.mode("append").parquet(in)
    val n2 = StreamingExtract.runAvailableNow(spark, in, out, ck)
    assert(n2 == 5, s"second run processed $n2")

    // nothing new → zero work
    val n3 = StreamingExtract.runAvailableNow(spark, in, out, ck)
    assert(n3 == 0, s"third run processed $n3")

    // accumulated output equals the goldens exactly, no duplicates
    val got = spark.read.parquet(out).select("doc_id", "spans").as[Doc]
      .collect().toSeq
    assert(got.size == 12)
    assert(spansOf(got) == spansOf(goldens))
  }

  test("stateful gap sessionization equals the batch oracle and carries " +
       "state across micro-batches") {
    import graft.streaming.StreamingStats
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = tmp("sess-in"); val out = tmp("sess-out"); val ck = tmp("sess-ck")
    // deterministic multi-session event history per user, split into two
    // time-ordered files so sessions CROSS the micro-batch boundary
    val rng = new graft.synth.Rng(17L)
    val evs = (for (u <- 0L until 6L) yield {
      var sec = 1000000L + u
      (0 until 40).map { i =>
        sec += (if (rng.nextInt(5) == 0) 2000L else rng.between(30, 900))
        (u, u * 1000 + i, new java.sql.Timestamp(sec * 1000L))
      }
    }).flatten.toVector
    val (early, lateHalf) = evs.partition(_._3.getTime < 1022000L * 1000L)
    early.toDF("user_id", "event_id", "ts").coalesce(1)
      .write.mode("append").parquet(in)
    lateHalf.toDF("user_id", "event_id", "ts").coalesce(1)
      .write.mode("append").parquet(in)
    val full = StreamingStats.runSessionize(spark, in, out, ck).collect()
    // event-time-ordered input: nothing is late
    assert(full.forall(_.getLong(3) == 0L), full.mkString(","))
    val got = full.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch oracle: q7 semantics over the same rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val want = evs.toDF("user_id", "event_id", "ts")
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .withColumn("brk", when(col("gap").isNull || col("gap") > 1800, 1)
                           .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("brk")).cast("long").as("n_sessions"),
           count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"stream=$got batch=$want")
    // at least one user's session must span the two files for the test to
    // mean anything
    assert(early.nonEmpty && lateHalf.nonEmpty)
    // an out-of-order file (event BEHIND user 0's folded history) is
    // dropped and COUNTED, never folded into the wrong session
    Vector((0L, 9999L, new java.sql.Timestamp(1000500L * 1000L)))
      .toDF("user_id", "event_id", "ts").coalesce(1)
      .write.mode("append").parquet(in)
    val after = StreamingStats.runSessionize(spark, in, out, ck).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val before = full
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(after(0L)._3 == 1L, s"late not counted: ${after(0L)}")
    assert((after(0L)._1, after(0L)._2) == before(0L),
           "late event changed session/event counts")
  }

  test("watermarked tumbling windows finalize once and drop late events") {
    import graft.streaming.StreamingStats
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val agg = StreamingStats.windowedEventCounts(ms.toDF().toDF("ts", "event_type"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_counts").start()
    try {
      ms.addData((ts("2026-01-01 10:01:00"), "a"),
                 (ts("2026-01-01 10:02:00"), "a"),
                 (ts("2026-01-01 10:03:00"), "b"))
      q.processAllAvailable()
      // nothing finalized yet: watermark still inside the window
      assert(spark.table("wm_counts").count() == 0)
      // an event far ahead advances the watermark past 10:10
      ms.addData((ts("2026-01-01 12:00:00"), "a"))
      q.processAllAvailable()
      val closed = spark.table("wm_counts")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
                             r.getLong(2))).toSet
      assert(closed == Set(("2026-01-01 10:00:00.0", "a", 2L),
                           ("2026-01-01 10:00:00.0", "b", 1L)), closed)
      // a late event behind the watermark is dropped, the closed window
      // is never amended or duplicated
      ms.addData((ts("2026-01-01 10:05:00"), "a"))
      ms.addData((ts("2026-01-01 13:30:00"), "a")) // push watermark further
      q.processAllAvailable()
      val after = spark.table("wm_counts")
        .filter(col("win_start") === ts("2026-01-01 10:00:00"))
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
      assert(after == Set(("a", 2L), ("b", 1L)), after)
    } finally q.stop()
  }

  test("sink is idempotent under batch replay (crash between write and " +
       "checkpoint commit)") {
    import graft.pipeline.ExtractJob
    import spark.implicits._
    val out = tmp("sreplay")
    val (inputs, goldens) = CorpusGen.corpus(5)
    val batch = inputs.toDS().toDF()
    // a run that died after the sink committed but before the streaming
    // checkpoint recorded batch 0 re-delivers the same batch on restart
    StreamingExtract.writeBatch(spark, batch, out, 0L, ExtractJob.Config())
    StreamingExtract.writeBatch(spark, batch, out, 0L, ExtractJob.Config())
    val got = spark.read.parquet(out).select("doc_id", "spans").as[Doc]
      .collect().toSeq
    assert(got.size == 5, s"replay duplicated docs: ${got.size}")
    assert(spansOf(got) == spansOf(goldens.take(5)))
  }
}
