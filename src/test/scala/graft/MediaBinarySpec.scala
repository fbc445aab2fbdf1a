package graft

import graft.img.Gray
import graft.synth.{GrayPack, PageRenderer}
import org.scalatest.funsuite.AnyFunSuite

/** Opaque-binary multimodal column path: codec roundtrip + the x8 query's
  * frame-sampled feature extraction over (content: binary, meta) rows. */
class MediaBinarySpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("GrayPack codec roundtrips bit-exactly and rejects junk") {
    val pooled = PageRenderer.render("F1963001", 1)
    val g = new Gray(pooled.w, pooled.h, pooled.px.clone())
    assert(GrayPack.decode(GrayPack.encode(g)) == g)
    intercept[IllegalArgumentException] {
      GrayPack.decode(Array[Byte](1, 2, 3, 4))
    }
    intercept[IllegalArgumentException] { // truncated payload
      GrayPack.decode(GrayPack.encode(g).dropRight(1))
    }
  }

  test("x8: binary-column decode + resize + frame sampling + features") {
    val rows = SparkEntry.queries("x8_media_binary")(spark, "unused").collect()
    assert(rows.nonEmpty)
    // frame sampling kept every 3rd page only
    assert(rows.forall(_.getAs[Int]("page") % 3 == 0))
    // resize landed at logical scale (portrait or rotated)
    assert(rows.forall { r =>
      val (w, h) = (r.getAs[Int]("w"), r.getAs[Int]("h"))
      (w, h) == (360, 480) || (w, h) == (480, 360)
    })
    // Otsu threshold separates the ink/background modes on every frame
    // (ink noise band tops at 49+mean-blur, background starts at 215)
    assert(rows.forall { r =>
      val t = r.getAs[Int]("otsu_t"); t > 17 && t < 215
    })
    // ink density is plausible page ink, never blank or inverted
    assert(rows.forall { r =>
      val d = r.getAs[Long]("ink_e6"); d > 1000 && d < 500000
    })
    // generator-owned golden (metadata dims + exact mask ink count,
    // carried through codec + downsample) holds on every sampled frame
    assert(rows.forall(_.getAs[Long]("golden_mismatch") == 0L))
  }

  test("x4: decode-seam stats match the generator's metadata goldens exactly") {
    val rows = SparkEntry.queries("x4_media_stats")(spark, "unused").collect()
    assert(rows.nonEmpty)
    // every media span self-verifies: stored dims from rotation metadata,
    // ink_e6 from the drawing mask + shear survival (Otsu-exactness:
    // noise modes [18,49]/[215,246] never overlap any threshold between)
    assert(rows.forall(_.getAs[Long]("golden_mismatch") == 0L))
    // the check is not vacuous: rotated pages exist in the sample, so the
    // dims golden exercises both orientations
    assert(rows.exists(r => r.getAs[Int]("w") > r.getAs[Int]("h")))
    assert(rows.exists(r => r.getAs[Int]("w") < r.getAs[Int]("h")))
  }
}
