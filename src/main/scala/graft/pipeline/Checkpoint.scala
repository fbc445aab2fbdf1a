package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint + lineage tables (north_rule: "resumable from checkpoint with
  * per-partition lineage + metrics"). Layout:
  *
  *   <ckptDir>/done/run=<runId>/     (snapshot_id, doc_id, part_id, completed_at)
  *   <ckptDir>/lineage/run=<runId>/  (snapshot_id, part_id, doc_count, span_count,
  *                                    media_span_count, text_span_count,
  *                                    conf_histogram: array<long>[10], completed_at)
  *
  * Resume = left-anti join of the input on done(snapshot_id) — strictly
  * better than the reference's max-filename watermark
  * (joradp_parse.py:101-114), which can skip unprocessed smaller names.
  *
  * Both tables are written per run into a `run=<runId>` partition
  * subdirectory with Overwrite semantics, which makes [[append]]
  * IDEMPOTENT per run: a crash anywhere inside it leaves a state that a
  * re-append for the same runId repairs exactly (the done subdir is
  * rewritten, never double-appended). The lineage subdir's `_SUCCESS`
  * marker is the commit point — lineage is written after done, so its
  * marker implies both tables are complete ([[isRecorded]]); ExtractJob's
  * startup reconcile re-appends any output run the marker is missing for.
  */
object Checkpoint {

  private def exists(spark: SparkSession, pathStr: String): Boolean = {
    val p = new Path(pathStr)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** doc_ids already completed for this input snapshot. */
  def doneDocs(spark: SparkSession, ckptDir: String, snapshotId: String): DataFrame = {
    val p = s"$ckptDir/done"
    if (exists(spark, p))
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

  /** Done-doc total for the snapshot, summed from the LINEAGE table — the
    * per-partition metadata rows, 3-4 orders of magnitude smaller than the
    * one-row-per-doc done table (which at 100 TB must never be scanned for
    * a log line). Unlike the driver-side counter file this replaces, it
    * cannot go stale: the same write that records a run's docs as done is
    * what this sums, and [[append]]'s per-run Overwrite keeps re-appended
    * (reconciled) runs counted exactly once. */
  def doneTotal(spark: SparkSession, ckptDir: String, snapshotId: String): Long = {
    val p = s"$ckptDir/lineage"
    if (!exists(spark, p)) 0L
    else
      spark.read.parquet(p)
        .filter(col("snapshot_id") === snapshotId)
        .agg(coalesce(sum(col("doc_count")), lit(0L))).head().getLong(0)
  }

  /** True iff [[append]] for this run committed completely (lineage is
    * written last, so its `_SUCCESS` marker implies the done rows too). */
  def isRecorded(spark: SparkSession, ckptDir: String, runId: String): Boolean =
    exists(spark, s"$ckptDir/lineage/run=$runId/_SUCCESS")

  /** Record a run's written OutRows as done + lineage, idempotently: both
    * tables get a `run=<runId>` subdirectory written with Overwrite, so
    * calling this again for the same run (the crash-recovery path) repairs
    * rather than duplicates. The scan is column-pruned: only the small
    * metadata columns are read, never the span payloads. Returns the docs
    * completed this run — taken from the (tiny, cached) lineage
    * aggregation so callers need no extra count job over the run's files. */
  def append(spark: SparkSession, ckptDir: String, snapshotId: String,
             runId: String, written: DataFrame): Long = {
    val ts = System.currentTimeMillis()
    written.select(
        lit(snapshotId).as("snapshot_id"),
        col("doc_id"),
        col("part_id"),
        lit(ts).as("completed_at"))
      .write.mode(SaveMode.Overwrite).parquet(s"$ckptDir/done/run=$runId")

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
    lineageRows.write.mode(SaveMode.Overwrite)
      .parquet(s"$ckptDir/lineage/run=$runId")
    val docsThisRun = lineageRows
      .agg(coalesce(sum(col("doc_count")), lit(0L))).head().getLong(0)
    lineageRows.unpersist()
    docsThisRun
  }

  def lineage(spark: SparkSession, ckptDir: String): DataFrame =
    spark.read.parquet(s"$ckptDir/lineage")
}
