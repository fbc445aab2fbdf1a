package graft.streaming

import graft.core.Doc
import graft.pipeline.ExtractJob
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Incremental extraction as Structured Streaming (SURVEY §2.9) — the
  * idiomatic Spark form of the reference's incremental per-year run loop
  * with filename-watermark resume (joradp_parse.py:160-167 loop,
  * :101-114 watermark): a file-source stream over the corpus table picks
  * up exactly the files not seen by previous runs (the streaming
  * checkpoint's file log is the resume state — stronger than the
  * reference's max-filename watermark, which can skip unprocessed
  * lexicographically-smaller docs), and `Trigger.AvailableNow` catches up
  * on the backlog and stops, so the job runs as a restartable batch. The
  * fused extraction kernel runs unchanged inside foreachBatch.
  */
object StreamingExtract {

  /** Process all corpus files not yet seen by this checkpoint; append
    * extracted docs to outPath. Returns input docs processed this run. */
  def runAvailableNow(spark: SparkSession, inputPath: String,
                      outPath: String, ckptDir: String,
                      cfg: ExtractJob.Config = ExtractJob.Config()): Long = {
    import spark.implicits._
    val processed = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = spark.readStream
      .schema(Encoders.product[Doc].schema)
      .option("pathGlobFilter", "*.parquet") // data files only, not _snapshots
      .parquet(inputPath)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = batch.as[Doc].persist()
        ExtractJob.extract(spark, docs, cfg)
          .write.mode("append").parquet(outPath)
        processed.addAndGet(docs.count())
        docs.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
    processed.get()
  }
}
