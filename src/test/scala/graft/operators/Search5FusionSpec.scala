package graft.operators

import org.apache.spark.sql.functions._

/** search5 hybrid RRF fusion: the fused ranking must equal reciprocal
  * rank fusion recomputed HERE in plain Scala from the two component
  * lists — the lexical leg taken from search1's committed top-20 output
  * (rank = position in its total order) and the semantic leg recomputed
  * inline as the exact cosine top-20 for query vector 0. Both lists are
  * ≤20 rows, so the driver-side recompute is bounded. Also pins the
  * fusion property that motivates RRF: any doc present in BOTH lists
  * outscores every doc that appears at rank ≥ its ranks in only one.
  */
class Search5FusionSpec extends graft.SparkSpec {

  test("search5 equals driver-side RRF of search1 top-20 + exact cosine top-20 at sf0.01") {
    val d = sf("sf0.01")
    val dot = graft.functions.VectorFunctions.dotLong _

    // lexical leg: search1's own output IS the top-20 in rank order
    val lex = graft.SparkEntry.queries("search1_bm25")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val lexRank = lex.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap

    // semantic leg: exact cosine top-20 for vec 0, recomputed inline
    val e = Similarity.scaledVectors(spark, d)
    val qv = e.filter(col("vec_id") === 0L)
      .select(col("v").as("va"), col("nrm").as("na"))
    val sem = e.filter(col("vec_id") =!= 0L)
      .select(col("vec_id").as("doc_id"), col("v").as("vb"), col("nrm").as("nb"))
      .crossJoin(broadcast(qv))
      .withColumn("dot", dot(col("va"), col("vb")))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .orderBy(col("cos").desc, col("doc_id")).limit(20)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val semRank = sem.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap

    def rrf(id: Long): Long =
      lexRank.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L) +
        semRank.get(id).map(r => 1000000L / (60L + r)).getOrElse(0L)

    val expected = (lexRank.keySet ++ semRank.keySet).toSeq
      .map(id => (id, rrf(id), lexRank.getOrElse(id, 0L), semRank.getOrElse(id, 0L)))
      .sortBy { case (id, s, _, _) => (-s, id) }
      .take(15)

    val got = graft.SparkEntry.queries("search5_hybrid_rrf")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    assert(got == expected, s"fusion mismatch:\n got=$got\n exp=$expected")

    // the RRF property that motivates fusion: a doc in BOTH lists beats
    // any doc in only one list whose single rank is no better than both
    // of the two-list doc's ranks (1/(60+r) is monotone; the second leg
    // adds a strictly positive term)
    val both = got.filter(r => r._3 > 0 && r._4 > 0)
    assert(both.nonEmpty, "corpus should have at least one doc in both lists")
    for {
      b <- both
      x <- got if (x._3 == 0) != (x._4 == 0)
      xRank = math.max(x._3, x._4)
      if b._3 <= xRank && b._4 <= xRank
    } assert(b._2 > x._2, s"two-list doc $b should outscore one-list doc $x")
  }
}
