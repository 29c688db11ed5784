package graft.operators

import org.apache.spark.sql.functions._

/** Cross-operator invariant for semantic dedup: dd16 restricts dd5's
  * global cosine-pair search to within-k-means-cluster candidates at the
  * SAME threshold, so every (keeper, dup) pair dd16 reports must appear
  * in dd5's exhaustive pair list — clustering may lose cross-cluster
  * pairs (that's the recall trade) but can never invent one.
  */
class Dd16Spec extends graft.SparkSpec {

  test("dd16 dup pairs are a subset of dd5's exhaustive cosine pairs") {
    val d = sf("sf0.001")
    val dd16 = graft.SparkEntry.queries("dd16_semantic_dedup")(spark, d)
      .filter(col("is_dup"))
      .select(col("keeper").as("ida"), col("vec_id").as("idb"))
    val dd5 = graft.SparkEntry.queries("dd5_embed_neardup")(spark, d)
      .select(col("ida"), col("idb"))
    val invented = dd16.join(dd5, Seq("ida", "idb"), "left_anti").count()
    assert(invented == 0, s"$invented dd16 pairs missing from dd5's exhaustive list")
    // and the one-hop rule is internally consistent: keeper < vec_id
    val bad = graft.SparkEntry.queries("dd16_semantic_dedup")(spark, d)
      .filter(col("is_dup") && col("keeper") >= col("vec_id")).count()
    assert(bad == 0)
  }
}
