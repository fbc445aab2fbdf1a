package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Checkpoint + lineage tables (north_rule: "resumable from checkpoint with
  * per-partition lineage + metrics"). Layout:
  *
  *   <ckptDir>/done/     (snapshot_id, doc_id, part_id, completed_at)
  *   <ckptDir>/lineage/  (snapshot_id, part_id, doc_count, span_count,
  *                        media_span_count, text_span_count,
  *                        conf_histogram: array<long>[10], completed_at)
  *
  * Resume = left-anti join of the input on done(snapshot_id) — strictly
  * better than the reference's max-filename watermark
  * (joradp_parse.py:101-114), which can skip unprocessed smaller names.
  */
object Checkpoint {

  /** doc_ids already completed for this input snapshot. */
  def doneDocs(spark: SparkSession, ckptDir: String, snapshotId: String): DataFrame = {
    val p = s"$ckptDir/done"
    if (Files.exists(Paths.get(p)))
      spark.read.parquet(p)
        .filter(col("snapshot_id") === snapshotId)
        .select("doc_id").distinct()
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "doc_id", org.apache.spark.sql.types.StringType))))
  }

  /** Running done-doc total per snapshot, kept as a tiny driver-side
    * metadata file beside the tables — the run SUMMARY must never cost a
    * scan of the done table (at 100 TB that scan is a real job, and it
    * carries no information the lineage appends didn't already have).
    * Crash-safe via write-temp-then-atomic-move; if the file is ever lost
    * the next [[append]] restarts the total from this run (summary-only
    * metadata — resume correctness never reads it). */
  private def totalPath(ckptDir: String, snapshotId: String) =
    Paths.get(ckptDir, "meta", s"done_total_$snapshotId")

  /** The running done-doc total for this snapshot (0 if never written). */
  def doneTotal(ckptDir: String, snapshotId: String): Long = {
    val p = totalPath(ckptDir, snapshotId)
    if (Files.exists(p))
      new String(Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  private def bumpTotal(ckptDir: String, snapshotId: String, delta: Long): Long = {
    val p = totalPath(ckptDir, snapshotId)
    Files.createDirectories(p.getParent)
    val next = doneTotal(ckptDir, snapshotId) + delta
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp,
      next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Append done + lineage rows derived from a run's written OutRows.
    * The scan is column-pruned: only the small metadata columns are read,
    * never the span payloads. Returns the docs completed this run — taken
    * from the (tiny, cached) lineage aggregation so callers need no extra
    * count job over the run's files. */
  def append(spark: SparkSession, ckptDir: String, snapshotId: String,
             written: DataFrame): Long = {
    val ts = System.currentTimeMillis()
    written.select(
        lit(snapshotId).as("snapshot_id"),
        col("doc_id"),
        col("part_id"),
        lit(ts).as("completed_at"))
      .write.mode(SaveMode.Append).parquet(s"$ckptDir/done")

    val lineageRows = written.groupBy(col("part_id"))
      .agg(
        count(lit(1)).as("doc_count"),
        sum(col("span_count")).as("span_count"),
        sum(col("media_span_count")).as("media_span_count"),
        sum(col("text_span_count")).as("text_span_count"),
        aggregate(
          collect_list(col("conf_hist")),
          array_repeat(lit(0L), 10),
          (acc, x) => zip_with(acc, x, (a, b) => a + b)
        ).as("conf_histogram"))
      .select(
        lit(snapshotId).as("snapshot_id"),
        col("part_id"),
        col("doc_count"), col("span_count"),
        col("media_span_count"), col("text_span_count"),
        col("conf_histogram"),
        lit(ts).as("completed_at"))
      .persist()
    lineageRows.write.mode(SaveMode.Append).parquet(s"$ckptDir/lineage")
    val docsThisRun = lineageRows
      .agg(coalesce(sum(col("doc_count")), lit(0L))).head().getLong(0)
    lineageRows.unpersist()
    bumpTotal(ckptDir, snapshotId, docsThisRun)
    docsThisRun
  }

  def lineage(spark: SparkSession, ckptDir: String): DataFrame =
    spark.read.parquet(s"$ckptDir/lineage")
}
