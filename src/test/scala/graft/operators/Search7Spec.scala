package graft.operators

import graft.{Registry, SparkSpec}

/** search7_rag_context: the packed context must be a prefix of the MMR
  * pick order under the token budget, lead with the pure-relevance
  * winner (MMR round 1 has no similarity term), and draw only from
  * search6's fused candidates.
  */
class Search7Spec extends SparkSpec {
  private val dir = sf("sf0.01")

  test("slots are budget-bounded prefix sums led by the fused top-1") {
    val out = Registry.queries("search7_rag_context")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 8)
    // dense slots 1..n in order
    assert(out.map(_.getLong(0)).toSeq === (1L to out.length))
    // cum_tokens is the running sum of n_tokens and never exceeds 256
    var cum = 0L
    out.foreach { r =>
      cum += r.getLong(5)
      assert(r.getLong(6) === cum)
    }
    assert(cum <= 256L)
    // slot 1 is search6's relevance argmax (round 1 has no sim penalty)
    val fused = Registry.queries("search6_hybrid_chunks")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val top = fused.maxBy { case (d, k, rrf) => (rrf, -d, -k) }
    assert((out.head.getLong(1), out.head.getLong(2)) === ((top._1, top._2)))
    // every pick is a distinct fused candidate
    val cands = fused.map(t => (t._1, t._2)).toSet
    val picks = out.map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(picks.distinct === picks)
    assert(picks.forall(cands))
  }
}
