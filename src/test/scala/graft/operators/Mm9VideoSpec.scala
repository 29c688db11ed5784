package graft.operators

import graft.{Registry, SparkSpec}

/** mm9_video_keyframes: the decoded-pixel keyframe rule must land
  * exactly on the generator's scene cuts — within-scene L1 diffs are
  * EXACTLY 0 (constant scene content through a real codec round trip)
  * and cut diffs clear the threshold by construction (per-channel
  * deltas mod 256 contribute ≥ min(Δ, 256−Δ) per pixel).
  */
class Mm9VideoSpec extends SparkSpec {

  test("keyframes are exactly frame 0 plus the deterministic scene cuts") {
    val out = Registry.queries("mm9_video_keyframes")(spark, sf("sf0.001"))
      .collect()
    assert(out.nonEmpty && out.length % 8 == 0)
    out.foreach { r =>
      val (id, f, diff, kf) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
      val isCut = f > 0 && (id + f) % 3 == 0
      assert(kf === (f == 0 || isCut), s"doc $id frame $f")
      if (isCut) assert(diff >= 9856L, s"cut diff too small: doc $id frame $f = $diff")
      else assert(diff === 0L, s"non-cut diff nonzero: doc $id frame $f = $diff")
    }
  }
}
