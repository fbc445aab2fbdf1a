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
