package graft.kernel

import graft.core.{BBox, LayoutBox, TextLine}

/** The core extraction join — exact port of
  * classes/image_builder.py:199-274 (J2 containment join + J3 anti-join +
  * O1 reading-order sort, SURVEY §2.4):
  *  - each layout bbox is expanded by `margin` (NOT clamped, :217-222);
  *  - a text line matches a layout if fully contained (:228-231);
  *  - a text line may match multiple layouts; the matched-index set only
  *    drives the unmatched "rest" (:212, :237, :257);
  *  - texts within a layout sorted by (y, x) (:239-243), layouts emitted
  *    only if non-empty (:246);
  *  - rest = texts matched by no layout, sorted (y, x) (:255-269).
  */
object MatchMaking {

  final case class Matched(layoutBBox: BBox, label: String, position: Int,
                           texts: Vector[TextLine],
                           topK: Map[String, Double] = Map.empty)
  final case class Result(matched: Vector[Matched], rest: Vector[TextLine])

  def matchTextsToLayouts(layouts: Seq[LayoutBox], texts: Seq[TextLine],
                          margin: Int = 10): Result = {
    val matchedIdx = scala.collection.mutable.Set[Int]()
    val matched = Vector.newBuilder[Matched]
    for (layout <- layouts) {
      val lb = BBox(layout.bbox.x1 - margin, layout.bbox.y1 - margin,
                    layout.bbox.x2 + margin, layout.bbox.y2 + margin)
      val inLayout = Vector.newBuilder[(Int, TextLine)]
      for ((t, i) <- texts.zipWithIndex) {
        if (lb.x1 <= t.bbox.x1 && lb.y1 <= t.bbox.y1 &&
            lb.x2 >= t.bbox.x2 && lb.y2 >= t.bbox.y2) {
          inLayout += ((i, t))
          matchedIdx += i
        }
      }
      val sorted = inLayout.result()
        .sortBy { case (_, t) => (t.bbox.y1, t.bbox.x1) }
        .map(_._2)
      if (sorted.nonEmpty)
        matched += Matched(lb, layout.label, layout.position, sorted,
                           layout.topK)
    }
    val rest = texts.zipWithIndex
      .collect { case (t, i) if !matchedIdx(i) => t }
      .sortBy(t => (t.bbox.y1, t.bbox.x1))
      .toVector
    Result(matched.result(), rest)
  }
}
