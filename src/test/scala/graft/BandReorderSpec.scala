package graft

import graft.pipeline.BandReorder
import graft.synth.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

/** A6 as a pipeline op — the banded re-order correction pass
  * (textheight-median.py:204-222): y-jitter within a visual line must not
  * leak into reading order; correctly ordered pages must be fixpoints. */
class BandReorderSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("wide-block fixture: jittered same-line regions re-order by x") {
    import spark.implicits._
    // two regions on one visual line with 1px y-jitter (right one higher,
    // so naive (y, x) order reads right-before-left), plus a lower line;
    // heights 20 → tol = 6, bands snap both top regions together
    val rows = Seq(
      // (doc_id, page, position, x1, y1, y2, text)
      ("D1", 0, 0, 150, 100, 120, "RIGHT"),
      ("D1", 0, 1, 10, 101, 121, "LEFT"),
      ("D1", 0, 2, 10, 160, 180, "BELOW"))
      .toDF("doc_id", "page", "position", "x1", "y1", "y2", "text")
    val got = BandReorder.reorder(rows)
      .orderBy("position").collect()
      .map(r => (r.getAs[Int]("position"), r.getAs[String]("text")))
    assert(got.toSeq == Seq((0, "LEFT"), (1, "RIGHT"), (2, "BELOW")), got.toSeq)
  }

  test("correctly ordered pages are fixpoints of the pass") {
    import spark.implicits._
    val inputs = CorpusGen.inputDS(spark, 6)
    val regions = BandReorder.regions(spark, inputs)
      .persist()
    val before = regions
      .select("doc_id", "page", "position", "label")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    val after = BandReorder.reorder(regions)
      .select("doc_id", "page", "position", "label")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(before.nonEmpty)
    assert(after == before,
      s"pass changed ordering on clean pages: ${(after -- before).take(5)}")
    regions.unpersist()
    ()
  }
}
