package graft.operators

import graft.SparkSpec

/** dd9 (banded sign-LSH + exact verify) quality, measured against dd5
  * (exact all-pairs) on the driver corpus. The corpus' true near-dups
  * sit at cos 0.45–0.6 — a deliberately hard operating point for
  * angular LSH (per-hyperplane agreement p ≈ 0.65) — so recall is the
  * tunable quantity here, not 1.0: the spec pins the measured value and
  * the sub-brute candidate count so a regression in the hyperplane
  * derivation or banding surfaces immediately. Deterministic (fixed
  * multiplicative-hash hyperplanes, no RNG).
  */
class Dd9RecallSpec extends SparkSpec {

  test("dd9 == dd5 restricted to banded candidates; recall and cost measured") {
    val d = sf("sf0.01")
    val exact = graft.SparkEntry.queries("dd5_embed_neardup")(spark, d)
    val composite = graft.SparkEntry.queries("dd9_embed_lsh")(spark, d)

    // no false positives, ever: verification is exact
    assert(composite.exceptAll(exact).count() === 0,
      "verification let a sub-threshold pair through")

    // measured recall on this corpus (11/14 with r=4, B=32 hyperplane
    // banding); the floor guards the sketch derivation, the ceiling
    // (subset) is asserted above
    val nExact = exact.count()
    val nFound = composite.count()
    assert(nExact === 14L) // corpus ground truth; update if testdata changes
    assert(nFound >= 11L, s"recall regressed: $nFound/$nExact")

    // the whole point of the bucketed path: strictly fewer verified
    // pairs than the brute-force pair space
    val n = graft.Tables.embeddings(spark, d).count()
    val brutePairs = n * (n - 1) / 2
    val candidates = Dedup.dd9Candidates(Dedup.dd9Sketch(spark, d)).count()
    assert(candidates < brutePairs,
      s"banding generated $candidates candidates ≥ brute $brutePairs")
  }
}
