package graft.operators

import graft.SparkSpec

/** Multi-probe LSH recall, measured (see Similarity.sim5 scaladoc for
  * the full curve: single bucket 0.20 → +H1 probes 0.50 → 4 tables H≤1
  * 0.87 → 4 tables H≤2 = 1.00 on this corpus). Deterministic — fixed
  * hyperplanes, no RNG.
  */
class Sim5RecallSpec extends SparkSpec {

  test("sim5 multiprobe recall vs brute top-3 is >= 0.9 at sf0.01") {
    val r = graft.SparkEntry.queries("sim6_mp_recall")(spark, sf("sf0.01"))
      .collect().head
    assert(r.getAs[Long]("n_truth") === 30L)
    assert(r.getAs[Double]("recall") >= 0.9,
      s"multiprobe recall regressed: ${r.getAs[Double]("recall")}")
  }
}
