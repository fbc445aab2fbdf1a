package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rendered failure report — the engine's analog of the reference's
  * HtmlReporter (test_tables.py:131-193), which writes one HTML page per
  * mismatching input with the predicted vs ground-truth boxes for eval
  * debugging. Input is the x7 eval-report table (one row per prediction /
  * missed GT with status tp/fp/fn and iou_e6); output is one small HTML
  * file per FAILING (doc, page): a status table plus an SVG overlay
  * (predictions solid, ground truth dashed; fp/fn red, tp green).
  *
  * Scale shape: the grouping and rendering run data-parallel
  * (groupBy + collect_list per page — a page's report rows are tiny by
  * construction), and files are written from the executors via
  * foreachPartition; `outDir` stands in for the object store the
  * reference's `results/tables/` directory plays. Only the count of pages
  * written returns to the driver.
  */
object HtmlReport {

  final case class ReportRow(kind: String, status: String,
                             px1: Int, py1: Int, px2: Int, py2: Int,
                             gx1: Int, gy1: Int, gx2: Int, gy2: Int,
                             iou_e6: Long)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;") // status lands in a class="..." attribute

  /** Filesystem-safe page filename stem: doc_id comes from arbitrary
    * input parquet and lands in a file PATH, so anything outside
    * letters/digits/._- becomes '_' (a crafted id containing '/' or
    * '..' can never escape outDir). Sanitization can COLLIDE
    * ('a/b' and 'a_b' both map to 'a_b'), and two colliding failing
    * pages would silently overwrite each other's HTML — so whenever
    * sanitization changed the string, a short hash of the RAW doc_id is
    * appended, making distinct ids distinct filenames. */
  private def safeName(s: String): String = {
    val sanitized =
      s.map(c => if (c.isLetterOrDigit || c == '.' || c == '_' || c == '-') c
                 else '_')
    if (sanitized == s) s
    else f"${sanitized}-${graft.functions.TextHashes.fnv64(s) & 0xFFFFFFFFL}%08x"
  }

  /** One failing page → self-contained HTML (deterministic row order). */
  def renderPage(docId: String, page: Int, rows: Seq[ReportRow]): String = {
    val sorted = rows.sortBy(r =>
      (r.kind, r.status, r.px1, r.py1, r.gx1, r.gy1))
    val maxX = math.max(1, sorted.map(r => math.max(r.px2, r.gx2)).max)
    val maxY = math.max(1, sorted.map(r => math.max(r.py2, r.gy2)).max)
    val svg = new StringBuilder
    for (r <- sorted) {
      val color = if (r.status == "tp") "#2a2" else "#c22"
      if (r.px1 >= 0) // prediction box: solid
        svg.append(
          s"""<rect x="${r.px1}" y="${r.py1}" width="${r.px2 - r.px1}" height="${r.py2 - r.py1}" style="fill:none;stroke:$color;stroke-width:2"/>""")
      if (r.gx1 >= 0) // ground-truth box: dashed
        svg.append(
          s"""<rect x="${r.gx1}" y="${r.gy1}" width="${r.gx2 - r.gx1}" height="${r.gy2 - r.gy1}" style="fill:none;stroke:$color;stroke-width:1;stroke-dasharray:6 3"/>""")
    }
    val trs = sorted.map { r =>
      s"<tr><td>${esc(r.kind)}</td><td class=\"${esc(r.status)}\">${esc(r.status)}</td>" +
      s"<td>${r.px1},${r.py1},${r.px2},${r.py2}</td>" +
      s"<td>${r.gx1},${r.gy1},${r.gx2},${r.gy2}</td>" +
      s"<td>${r.iou_e6 / 10000.0}%</td></tr>"
    }.mkString("\n")
    s"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>${esc(docId)} page $page</title>
<style>table{border-collapse:collapse}td,th{border:1px solid #999;padding:2px 6px;font:12px monospace}
td.fp,td.fn{color:#c22;font-weight:bold}td.tp{color:#2a2}</style></head>
<body><h1>${esc(docId)} page $page</h1>
<table><tr><th>kind</th><th>status</th><th>pred box</th><th>gt box</th><th>IoU</th></tr>
$trs</table>
<svg viewBox="0 0 $maxX $maxY" width="${maxX / 2}" height="${maxY / 2}" style="border:1px solid #ccc">$svg</svg>
</body></html>
"""
  }

  /** Render every failing (doc, page) of an x7-shaped report table to
    * `<outDir>/<doc_id>_p<page>.html`; returns the number of pages
    * written. Pages whose rows are all `tp` produce no file — exactly the
    * reference's only-on-mismatch behavior. */
  def write(spark: SparkSession, report: DataFrame, outDir: String): Long = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val failing = report
      .groupBy(col("doc_id"), col("page"))
      .agg(collect_list(struct(
        col("kind"), col("status"),
        col("px1"), col("py1"), col("px2"), col("py2"),
        col("gx1"), col("gy1"), col("gx2"), col("gy2"),
        col("iou_e6"))).as("rows"))
      .filter(exists(col("rows"),
        r => r.getField("status").isin("fp", "fn")))
      .as[(String, Int, Seq[ReportRow])]
    val written = spark.sparkContext.longAccumulator("html_pages")
    failing.foreachPartition { (it: Iterator[(String, Int, Seq[ReportRow])]) =>
      // executors may run on OTHER nodes: the output dir must exist where
      // the task writes, not (only) on the driver
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      for ((docId, page, rows) <- it) {
        val p = java.nio.file.Paths.get(outDir, s"${safeName(docId)}_p$page.html")
        java.nio.file.Files.write(p,
          renderPage(docId, page, rows)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        written.add(1)
      }
    }
    written.value
  }
}
