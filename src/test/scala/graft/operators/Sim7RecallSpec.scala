package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 quantization quality: the coarse int8 pass + exact rerank must
  * recover (nearly) the same neighbors as full-precision scoring over
  * the same buckets (sim2). Deterministic — one global scale, no RNG.
  * A miss can only happen when the true #3 neighbor falls outside the
  * quantized top-10 coarse candidates, which needs ~1/127-level cosine
  * gaps; on real corpus data recall@3 is 1.0.
  */
class Sim7RecallSpec extends SparkSpec {

  test("sim7 SQ8+rerank recall vs exact bucket-local top-3 at sf0.01") {
    val d = sf("sf0.01")
    val exact = graft.SparkEntry.queries("sim2_ann_lsh")(spark, d)
      .select("qid", "nbr")
    val sq8 = graft.SparkEntry.queries("sim7_ann_sq8")(spark, d)
      .select("qid", "nbr")
    val nTruth = exact.count()
    assert(nTruth > 0L)
    val hit = exact.intersect(sq8).count()
    assert(hit.toDouble / nTruth >= 0.9,
      s"SQ8 recall regressed: $hit / $nTruth")
  }
}
