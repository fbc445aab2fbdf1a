package graft

import org.scalatest.funsuite.AnyFunSuite

/** x7 failure-triage report (HtmlReporter analog, test_tables.py:131-193):
  * its per-row statuses must reconcile exactly with x6's aggregate
  * precision/recall counters — same detector, same greedy matcher. */
class EvalReportSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("HTML renderer: one file per FAILING page, tp-only pages skipped, " +
       "boxes and statuses in the markup (HtmlReporter analog)") {
    import graft.pipeline.HtmlReport
    import spark.implicits._
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-html").toString
    val rows = Seq(
      // page 1 of F1970001: one tp + one fn -> failing, file written
      ("F1970001", 1, "table", "tp", 10, 10, 100, 60, 12, 11, 99, 58, 912345L),
      ("F1970001", 1, "cell", "fn", -1, -1, -1, -1, 20, 20, 40, 30, 0L),
      // page 2: all tp -> no file (only-on-mismatch, like the reference)
      ("F1970001", 2, "table", "tp", 10, 10, 100, 60, 10, 10, 100, 60, 1000000L),
      // another doc, fp only
      ("F1980002", 3, "cell", "fp", 5, 5, 25, 15, -1, -1, -1, -1, 120000L))
      .toDF("doc_id", "page", "kind", "status",
            "px1", "py1", "px2", "py2", "gx1", "gy1", "gx2", "gy2", "iou_e6")
    val n = HtmlReport.write(spark, rows, outDir)
    assert(n == 2, s"wrote $n pages")
    val f1 = java.nio.file.Paths.get(outDir, "F1970001_p1.html")
    val f2 = java.nio.file.Paths.get(outDir, "F1970001_p2.html")
    val f3 = java.nio.file.Paths.get(outDir, "F1980002_p3.html")
    assert(java.nio.file.Files.exists(f1) && java.nio.file.Files.exists(f3))
    assert(!java.nio.file.Files.exists(f2), "tp-only page rendered")
    val html = new String(java.nio.file.Files.readAllBytes(f1), "UTF-8")
    // status cells, both boxes of the tp row, the fn's missing pred (-1)
    assert(html.contains(">fn<") && html.contains(">tp<"))
    assert(html.contains("10,10,100,60") && html.contains("12,11,99,58"))
    // SVG overlay: solid pred rect + dashed gt rect for the tp row, and
    // only a dashed gt rect for the fn row -> 3 rects total
    assert("<rect ".r.findAllIn(html).size == 3, html)
    assert(html.contains("stroke-dasharray"))
  }

  test("doc_ids colliding under sanitization get distinct filenames") {
    import graft.pipeline.HtmlReport
    import spark.implicits._
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-html-collide").toString
    // 'a/b' sanitizes to 'a_b' — identical to the literal doc_id 'a_b';
    // without disambiguation one page would overwrite the other
    val rows = Seq(
      ("a/b", 1, "table", "fn", -1, -1, -1, -1, 1, 1, 9, 9, 0L),
      ("a_b", 1, "table", "fn", -1, -1, -1, -1, 2, 2, 8, 8, 0L))
      .toDF("doc_id", "page", "kind", "status",
            "px1", "py1", "px2", "py2", "gx1", "gy1", "gx2", "gy2", "iou_e6")
    val n = HtmlReport.write(spark, rows, outDir)
    assert(n == 2)
    val files = new java.io.File(outDir).listFiles.map(_.getName).toSet
    assert(files.size == 2, s"collision: only $files written")
    // the untouched id keeps its plain name; the sanitized one is hashed
    assert(files.contains("a_b_p1.html"), files.toString)
  }

  test("report rows reconcile with the x6 counters") {
    val report = SparkEntry.queries("x7_eval_report")(spark, "unused").collect()
    val agg = SparkEntry.queries("x6_table_eval")(spark, "unused").collect().head
    def n(kind: String, status: String): Long =
      report.count(r => r.getAs[String]("kind") == kind &&
                        r.getAs[String]("status") == status).toLong
    assert(n("table", "tp") == agg.getAs[Long]("table_tp"))
    assert(n("table", "fp") == agg.getAs[Long]("table_fp"))
    assert(n("table", "fn") == agg.getAs[Long]("table_fn"))
    assert(n("cell", "tp") == agg.getAs[Long]("cell_tp"))
    assert(n("cell", "fp") == agg.getAs[Long]("cell_fp"))
    assert(n("cell", "fn") == agg.getAs[Long]("cell_fn"))
    // triage semantics: tp rows carry both boxes and a real IoU; fn rows
    // carry only the ground-truth box
    for (r <- report) {
      val st = r.getAs[String]("status")
      if (st == "tp")
        assert(r.getAs[Int]("px1") >= 0 && r.getAs[Int]("gx1") >= 0 &&
               r.getAs[Long]("iou_e6") >= 500000L)
      if (st == "fn")
        assert(r.getAs[Int]("px1") == -1 && r.getAs[Int]("gx1") >= 0)
    }
  }
}
