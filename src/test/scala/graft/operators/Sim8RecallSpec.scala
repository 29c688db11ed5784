package graft.operators

/** PQ quantization quality: the ADC coarse pass (m=8 subspaces × k=64
  * codebook, top-50 pool) + exact rerank must recover most of the true
  * global top-3 (sim1 brute force). Deterministic — seed-vector
  * codebook, exact-int argmin assignment, no RNG. Measured 0.90 at
  * sf0.01; pinned at ≥0.85 (k=16/top-10 scored 0.30 — this gate exists
  * so nobody shrinks the codebook without noticing).
  */
class Sim8RecallSpec extends graft.SparkSpec {

  test("sim8 PQ+rerank recall@3 vs sim1 exact global top-3 at sf0.01") {
    val d = sf("sf0.01")
    val exact = graft.SparkEntry.queries("sim1_ann_brute")(spark, d)
      .filter(org.apache.spark.sql.functions.col("rnk") <= 3)
      .select("qid", "nbr")
    val pq = graft.SparkEntry.queries("sim8_ann_pq")(spark, d)
      .select("qid", "nbr")
    val nTruth = exact.count()
    assert(nTruth > 0L)
    val hit = exact.intersect(pq).count()
    assert(hit.toDouble / nTruth >= 0.85,
      s"PQ recall regressed: $hit / $nTruth")
  }
}
