package graft.operators

import graft.SparkSpec

/** Sketch quality, measured: on the driver corpus the 4×3 MinHash bands
  * recall every true Jaccard ≥ 0.8 pair (theoretical detection
  * probability at the threshold is 1−(1−0.8³)⁴ ≈ 0.94; the corpus's
  * true pairs sit far enough above threshold that recall is exactly 1),
  * so the LSH-then-verify composite dd6 must emit exactly the all-pairs
  * dd2 result. Deterministic — no RNG anywhere in the pipeline.
  */
class LshRecallSpec extends SparkSpec {

  test("dd6 (LSH candidates + exact verify) == dd2 (exact all-pairs) at sf0.01") {
    val exact = graft.SparkEntry.queries("dd2_ngram_jaccard")(spark, sf("sf0.01"))
    val composite = graft.SparkEntry.queries("dd6_lsh_jaccard")(spark, sf("sf0.01"))
    assert(exact.exceptAll(composite).count() === 0,
      "LSH candidate generation missed a true near-dup pair")
    assert(composite.exceptAll(exact).count() === 0,
      "verification let a sub-threshold pair through")
    assert(exact.count() > 0)
  }
}
