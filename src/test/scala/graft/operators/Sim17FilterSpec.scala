package graft.operators

import org.apache.spark.sql.functions._

/** sim17 (filtered residual IVFPQ): at gate scale the selectivity-
  * adaptive widening saturates to ALL k cells (10 labels ⇒ ⌈N/cnt⌉ ≈ 10
  * ≥ k/nprobe) and every label's corpus count sits under the rerank
  * pool (≈40 < 100), so the full stack — trained coarse quantizer,
  * residual codes, cdot-restored ADC, label co-key join, exact rerank —
  * must reproduce EXACT filtered brute force bit-for-bit: the ADC may
  * only affect the POOL ORDER, and a saturated pool makes order
  * irrelevant. The unwidened probe (nprobe cells of a label-filtered
  * index) must strictly starve — that pins the widening knob as
  * load-bearing, not decorative (Sim15FilterSpec's contract, replayed
  * over the residual index).
  */
class Sim17FilterSpec extends graft.SparkSpec {

  private def labeled(d: String) = graft.Tables.embeddings(spark, d)
    .select(
      col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000000, 0).cast("long")).as("v"),
      col("label").cast("long").as("lbl"))
    .withColumn("nrm", graft.functions.VectorFunctions.normSqLong(col("v")))

  private def bruteFiltered(d: String) = {
    val dot = graft.functions.VectorFunctions.dotLong _
    val e = labeled(d)
    val q = e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("qid"), col("v").as("va"),
        col("nrm").as("na"), col("lbl"))
    val c = e.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("nbr"), col("v").as("vb"),
        col("nrm").as("nb"), col("lbl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nbr"))
    q.join(c, Seq("lbl"))
      .withColumn("dot", dot(col("va"), col("vb")))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("rnk"), col("nbr"),
        floor(col("cos") * 1000000).cast("long").as("cos_e6"),
        col("lbl").as("label"))
      .orderBy("qid", "rnk")
  }

  test("widened sim17 ≡ exact filtered brute force at gate scale (saturation makes ADC order irrelevant)") {
    val d = sf("sf0.001")
    val want = bruteFiltered(d).collect().map(_.toSeq).toSeq
    val got = graft.SparkEntry.queries("sim17_filtered_residual")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty)
    assert(got === want)
    // every result respects the predicate: nbr's label = qid's label is
    // structural (the co-key join), but pin it anyway
    val lbls = labeled(d).select(col("vec_id"), col("lbl")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(lbls(r(0).asInstanceOf[Long]) === r(4).asInstanceOf[Long])
      assert(lbls(r(2).asInstanceOf[Long]) === r(4).asInstanceOf[Long])
    }
  }

  test("the unwidened probe strictly starves — the widening knob is load-bearing") {
    val d = sf("sf0.001")
    val brute = bruteFiltered(d).select("qid", "nbr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unwidened = Similarity.ivfpqVariant(spark, d,
        iters = 2, rerankPool = 100, residual = true,
        coarseIters = 2, filteredByLabel = true, filterWiden = false)
      .select("qid", "nbr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe cells of a label-filtered index miss true neighbors: recall
    // strictly below 1 (on this corpus it is far below)
    assert((brute -- unwidened).nonEmpty)
    assert(unwidened.intersect(brute).size < brute.size)
  }
}
