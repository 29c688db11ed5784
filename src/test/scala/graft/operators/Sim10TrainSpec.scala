package graft.operators

import org.apache.spark.sql.functions._

/** sim10 k-means training quality: the trained codebook must strictly
  * reduce total corpus quantization error (Σ over vectors of min-over-
  * centroids L2² distance) versus the vec_id<k init codebook — Lloyd
  * iterations can only decrease this objective, so a regression here
  * means the assignment argmin or the integer M-step broke. Both
  * objectives are computed inline in the same exact integer arithmetic
  * the operator uses (full |v−c|² — the reduced form the operator ranks
  * with differs only by the per-vector |v|² shift, which cancels in the
  * comparison anyway).
  */
class Sim10TrainSpec extends graft.SparkSpec {

  private def objective(corpus: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame): Long = {
    val dot = graft.functions.VectorFunctions.dotLong _
    corpus.crossJoin(broadcast(cent))
      .withColumn("nc", graft.functions.VectorFunctions.normSqLong(col("vc")))
      .withColumn("dist", col("nrm") + col("nc") - lit(2L) * dot(col("v"), col("vc")))
      .groupBy("vec_id").agg(min("dist").as("md"))
      .agg(sum("md")).head.getLong(0)
  }

  test("trained codebook beats the init codebook on quantization error at sf0.01") {
    val d = sf("sf0.01")
    val e = Similarity.scaledVectors(spark, d).localCheckpoint()
    val init = e.filter(col("vec_id") < 8).select(col("v").as("vc"))
    // reconstruct the trained codebook from the operator's flattened output
    val trained = graft.SparkEntry.queries("sim10_kmeans_train")(spark, d)
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("d"), col("cv")))).as("z"))
      .select(transform(col("z"), p => p.getField("cv")).as("vc"))
    val objInit = objective(e, init)
    val objTrained = objective(e, trained)
    assert(objTrained < objInit,
      s"training did not reduce quantization error: $objTrained >= $objInit")
    // 3 Lloyd rounds on this corpus cut the objective by a solid margin;
    // pin a conservative floor so a subtly-broken M-step can't hide
    assert(objTrained.toDouble < objInit.toDouble * 0.9,
      s"trained objective $objTrained not <10% below init $objInit")
  }
}
