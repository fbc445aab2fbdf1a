package graft.kernel

import graft.core.{BBox, TextLine}

/** J7 — token-in-table selection + crop-frame remap, the semantics of the
  * reference's `objects_to_crops` (TATR notebook cell 27): a table
  * detection's bbox is padded, the page's OCR tokens with
  * IoB(token, crop) >= 0.5 are selected, their coordinates are translated
  * into the crop frame, and for a `table rotated` detection the crop is
  * rotated upright and each token bbox remapped with the notebook's exact
  * formula `[w' - y2 - 1, x1, w' - y1 - 1, x2]` (w' = crop height, the
  * width after the 270° expand-rotate).
  */
object TokenCrop {

  /** Crop padding around the detected table (TATR cell 27 default). */
  val Padding = 10

  /** Intersection-over-box: inter(a, b) / area(a) — the containment
    * fraction of `a` inside `b` (TATR notebook `iob`, also used by the
    * reference's token routing; F10's IoU is the symmetric cousin).
    * Integer areas → deterministic double. */
  def iob(a: BBox, b: BBox): Double =
    if (a.area == 0L) 0.0
    else a.intersectionArea(b).toDouble / a.area.toDouble

  /** Select the tokens belonging to a table crop and translate them into
    * the crop frame. `rotated` applies the rotated-table remap. Returns
    * (crop box in page coords, tokens in crop coords). The pad is
    * UNCLAMPED, exactly like TATR cell 27 (`bbox[0] - padding, ...` with
    * no page bound; PIL's crop pads out-of-page area): for a table within
    * `padding` px of a page edge the crop origin goes negative/past the
    * edge and token coordinates (and the rotated remap's w' = crop.h)
    * follow the reference's frame bit-for-bit. `imgW`/`imgH` are kept in
    * the signature for the pixel-reading callers that must intersect the
    * crop with the page before touching the plane. */
  def tokensToCrop(tokens: Seq[TextLine], table: BBox, imgW: Int, imgH: Int,
                   rotated: Boolean = false,
                   padding: Int = Padding): (BBox, Vector[TextLine]) = {
    val crop = BBox(table.x1 - padding, table.y1 - padding,
                    table.x2 + padding, table.y2 + padding)
    val kept = tokens.filter(t => iob(t.bbox, crop) >= 0.5)
    val translated = kept.map { t =>
      t.copy(bbox = BBox(t.bbox.x1 - crop.x1, t.bbox.y1 - crop.y1,
                         t.bbox.x2 - crop.x1, t.bbox.y2 - crop.y1))
    }
    val out =
      if (!rotated) translated
      else {
        val wPrime = crop.h // crop width after the 270 expand-rotate
        translated.map { t =>
          t.copy(bbox = BBox(wPrime - t.bbox.y2 - 1, t.bbox.x1,
                             wPrime - t.bbox.y1 - 1, t.bbox.x2))
        }
      }
    (crop, out.toVector)
  }
}
