package graft.kernel

import graft.core.Crop

/** Lexicographic doc-id interval → crop-margin lookup: a direct port of the
  * reference's inline config table + first-match lookup with error-on-miss
  * (joradp_parse.py:13-82 table, :84-90 lookup; duplicated in both
  * correction scripts). Margins are in logical pixels of our synthetic
  * page (360x480); the renderer places header/footer strictly inside these
  * bands so cropping removes them before recognition.
  */
object CropConfig {
  final case class Interval(start: String, end: String, crop: Crop)

  /** Six intervals like the reference's (joradp_parse.py:13-82), plus
    * one synthetic pre-era block: CorpusGen's scale ids beyond the
    * 60k-capacity reference era (docIdFor scaladoc) land in
    * F1462000-F1961999, and config-table growth is exactly how the
    * reference admits new id ranges — the lookup's first-match +
    * error-on-miss semantics are untouched (F2026000+ still misses). */
  val table: Vector[Interval] = Vector(
    Interval("F1962000", "F1979999", Crop(36, 16, 16, 28)),
    Interval("F1980000", "F1997199", Crop(40, 20, 20, 30)),
    Interval("F1997200", "F2005999", Crop(38, 18, 18, 26)),
    Interval("F2006000", "F2015999", Crop(42, 22, 22, 32)),
    Interval("F2016000", "F2020999", Crop(36, 20, 20, 28)),
    Interval("F2021000", "F2025999", Crop(40, 24, 24, 30)),
    // the synthetic pre-era scale block (listed last so the reference's
    // six intervals keep their positions; ranges are disjoint, so
    // first-match order is immaterial)
    Interval("F1462000", "F1961999", Crop(38, 18, 18, 28)),
  )

  /** First interval containing docId lexicographically; error if none
    * (the reference raises on unknown ids, joradp_parse.py:89-90). */
  def lookup(docId: String): Crop =
    table.collectFirst {
      case Interval(s, e, c) if s <= docId && docId <= e => c
    }.getOrElse(
      throw new IllegalArgumentException(s"no crop config for doc $docId"))
}
