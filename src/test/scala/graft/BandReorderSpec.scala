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

  test("correctly ordered pages are fixpoints of the pass (reading order " +
       "preserved; positions may densify over Picture gaps)") {
    import spark.implicits._
    val inputs = CorpusGen.inputDS(spark, 6)
    val regions = BandReorder.regions(spark, inputs)
      .persist()
    // region identity = (x1, y1, label); compare per-page reading ORDER —
    // matched regions skip text-free Picture blocks, so raw position
    // values have gaps that the re-rank legitimately densifies
    def orderOf(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "page", "position", "x1", "y1", "label")
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
                 (r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5))))
      .groupBy(_._1)
      .map { case (k, vs) =>
        k -> vs.map(_._2).sortBy(_._1).map(v => (v._2, v._3, v._4)).toVector
      }
    val before = orderOf(regions)
    val after = orderOf(BandReorder.reorder(regions))
    assert(before.nonEmpty)
    assert(after == before,
      s"pass changed ordering on clean pages: " +
      s"${after.collect { case (k, v) if before(k) != v => (k, v, before(k)) }.take(2)}")
    regions.unpersist()
    ()
  }
}
