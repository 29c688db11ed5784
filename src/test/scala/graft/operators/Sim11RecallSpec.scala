package graft.operators

import org.apache.spark.sql.functions._

/** sim11 range-join quality: the banded-LSH candidate pass must recover
  * most of the TRUE cross-parity pairs with cos ≥ 0.35, where truth is
  * the brute-force A×B range join computed inline here. Deterministic
  * end to end (fixed hyperplanes, exact-int scoring). Measured 104/137
  * = 0.76 at sf0.01 — the threshold sits in the flat part of the cosine
  * histogram, so most true pairs are barely-over-threshold ones whose
  * band-collision probability is lowest; raising recall is the standard
  * band/width trade (more, narrower bands), at candidate-count cost.
  * Floor pinned at ≥ 0.70; precision is exact by construction (every
  * emitted pair is cosine-verified), which the spec also asserts.
  */
class Sim11RecallSpec extends graft.SparkSpec {

  test("sim11 range join recall vs brute-force cross-parity pairs at sf0.01") {
    val d = sf("sf0.01")
    val dot = graft.functions.VectorFunctions.dotLong _
    val e = Similarity.scaledVectors(spark, d).localCheckpoint()
    val a = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("ida"), col("v").as("va"), col("nrm").as("na"))
    val b = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("idb"), col("v").as("vb"), col("nrm").as("nb"))
    val exact = a.crossJoin(b)
      .withColumn("dot", dot(col("va"), col("vb")))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .filter(col("cos") >= 0.35)
      .select("ida", "idb")
    val got = graft.SparkEntry.queries("sim11_range_join")(spark, d)
      .select("ida", "idb")
    val nTruth = exact.count()
    assert(nTruth > 0L)
    val hit = exact.intersect(got).count()
    // precision: every emitted pair is a true pair (exact verify)
    assert(got.except(exact).count() === 0L)
    assert(hit.toDouble / nTruth >= 0.70,
      s"sim11 recall regressed: $hit / $nTruth")
  }
}
