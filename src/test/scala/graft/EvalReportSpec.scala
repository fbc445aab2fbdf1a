package graft

import org.scalatest.funsuite.AnyFunSuite

/** x7 failure-triage report (HtmlReporter analog, test_tables.py:131-193):
  * its per-row statuses must reconcile exactly with x6's aggregate
  * precision/recall counters — same detector, same greedy matcher. */
class EvalReportSpec extends AnyFunSuite with SparkSessionTestWrapper {

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
