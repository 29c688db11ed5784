package graft.operators

import org.apache.spark.sql.functions._

/** sim14 incremental IVFPQ quality: the batch probed against the stored
  * cell-partitioned PQ-code index must recover most of the true top-3
  * index neighbors — the exact truth is the batch×index brute-force
  * cosine top-3, computed inline (Sim9RecallSpec's harness). sim14
  * stacks TWO approximations (IVF cell restriction + 8-byte ADC coarse
  * scoring before the top-50 exact rerank), so its recall is bounded
  * above by sim9's IVF-only recall on the same no-gap worst-case corpus
  * (sim9 measured 0.650 at sf0.01); the PQ coarse stage costs little on
  * top because the top-50 rerank pool absorbs ADC ranking noise.
  * Measured 0.643 at sf0.01 (193/300) with the round-11 TRAINED
  * codebook (2 Lloyd rounds per subspace) — up from 0.630 (189/300)
  * with the untrained lowest-64-ids stand-in, and only 0.007 below
  * sim9's IVF-only recall (the trained PQ coarse stage is nearly
  * free); floor pinned at ≥0.60.
  */
class Sim14RecallSpec extends graft.SparkSpec {

  test("sim14 incremental IVFPQ recall@3 vs exact batch-vs-index top-3 at sf0.01") {
    val d = sf("sf0.01")
    val dot = graft.functions.VectorFunctions.dotLong _
    val e = Similarity.scaledVectors(spark, d).localCheckpoint()
    val q = e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("qid"), col("v").as("va"), col("nrm").as("na"))
    val c = e.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("nbr"), col("v").as("vb"), col("nrm").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("nbr"))
    val exact = q.crossJoin(c)
      .withColumn("dot", dot(col("va"), col("vb")))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("qid", "nbr")
    val got = graft.SparkEntry.queries("sim14_ann_ivfpq")(spark, d)
      .select("qid", "nbr")
    val nTruth = exact.count()
    assert(nTruth > 0L)
    val hit = exact.intersect(got).count()
    assert(hit.toDouble / nTruth >= 0.60,
      s"sim14 recall regressed: $hit / $nTruth")
  }
}
