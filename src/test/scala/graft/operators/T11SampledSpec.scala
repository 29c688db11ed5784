package graft.operators

/** Sample-thinned BPE training + fixed-table encode — the production
  * split of the t11/t18 tokenizer loop: determinism of the sampled
  * trainer, rate=1 ≡ the registry trainer, and encode-with-given-merges
  * ≡ t18 when given the full-corpus merge table (pinning that the
  * factored rewrite round is the same rewrite t11 trains with).
  */
class T11SampledSpec extends graft.SparkSpec {

  test("sampled trainer is deterministic; rate=1 equals the registry t11 table") {
    val d = sf("sf0.001")
    val full = graft.SparkEntry.queries("t11_bpe_merges")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(full.nonEmpty)
    assert(TextOps.bpeTrainSampled(spark, d, 1L) === full)
    val s1 = TextOps.bpeTrainSampled(spark, d, 3L)
    val s2 = TextOps.bpeTrainSampled(spark, d, 3L)
    assert(s1.nonEmpty)
    assert(s1 === s2) // same corpus + rate => same table, bit-for-bit
  }

  test("encode with the full-trained merge table reproduces t18 bit-for-bit") {
    val d = sf("sf0.001")
    val merges = TextOps.bpeTrainSampled(spark, d, 1L).map(m => (m._2, m._3))
    val want = graft.SparkEntry.queries("t18_bpe_encode")(spark, d)
      .collect().map(_.toSeq).toSeq
    val got = TextOps.bpeEncodeWithMerges(spark, d, merges)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty)
    assert(got === want)
  }
}
