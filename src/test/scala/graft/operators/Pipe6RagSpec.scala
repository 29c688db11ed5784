package graft.operators

import org.apache.spark.sql.functions._

/** pipe6/search6 — the chunk-grain RAG index + hybrid retrieval stack.
  *  - index coverage: pipe6's manifest holds EXACTLY the nonzero-vector
  *    chunks (zero-vector chunks are lexical-only by contract), each
  *    assigned to a real centroid chunk.
  *  - lexical-leg consistency: every search6 row with lex_rank > 0 is
  *    search4's chunk at the same rank — the fusion reads the committed
  *    BM25 list, not a private variant.
  *  - semantic-leg quality: the IVF probe's top-20 must recover most of
  *    the brute-force hashed-vector cosine top-20 (recall floor pinned
  *    from the measured value; the probe scans nprobe of ⌈√C⌉ cells).
  */
class Pipe6RagSpec extends graft.SparkSpec {

  test("pipe6 index covers exactly the nonzero-vector chunks, cells are real chunks") {
    val d = sf("sf0.01")
    val idx = graft.SparkEntry.queries("pipe6_rag_index")(spark, d).localCheckpoint()
    val vn = TrainPrep.pipe6ChunkVectors(spark, d)
      .groupBy("doc_id", "k").agg(sum(expr("w * w")).as("nrm2"))
    assert(idx.count() == vn.count(),
      "index rows must equal nonzero-vector chunk count")
    // every cell key is itself an indexed chunk (centroids are chunks)
    val cells = idx.select(col("cell_doc").as("doc_id"), col("cell_k").as("chunk_id")).distinct()
    val orphan = cells.join(idx.select("doc_id", "chunk_id"), Seq("doc_id", "chunk_id"),
      "left_anti").count()
    assert(orphan == 0L, s"$orphan cells are not indexed chunks")
  }

  test("search6 lexical leg agrees with search4's committed top-20") {
    val d = sf("sf0.01")
    val s4 = graft.SparkEntry.queries("search4_chunk_bm25")(spark, d)
      .select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    val s6 = graft.SparkEntry.queries("search6_hybrid_chunks")(spark, d)
      .filter(col("lex_rank") > 0)
      .select("doc_id", "chunk_id", "lex_rank").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(s6.nonEmpty, "fused list should contain lexical hits")
    s6.foreach { case (key, lrank) =>
      assert(s4.get(key).contains(lrank),
        s"lex_rank mismatch for $key: fused=$lrank search4=${s4.get(key)}")
    }
  }

  test("search6 semantic probe recall@20 vs brute-force hashed cosine") {
    val d = sf("sf0.01")
    val parts = TrainPrep.pipe6Parts(spark, d)
    // brute truth: exact cosine of the hashed query vector over ALL
    // chunks — built from the SPARSE twin (pipe6ChunkVectors), so the
    // dense frame the query uses is cross-checked by independent code
    val hm = conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
    import spark.implicits._
    val qw = Seq("hash", "join", "scan").toDF("tok")
      .select(pmod(hm, lit(16L)).as("dim"),
        when(shiftright(hm, 4) % 2L === 0L, 1L).otherwise(-1L).as("sgn"))
      .groupBy("dim").agg(sum("sgn").as("qwt"))
      .filter(col("qwt") =!= 0L)
    val qn = qw.agg(sum(expr("qwt * qwt")).as("qnrm"))
    val sparse = TrainPrep.pipe6ChunkVectors(spark, d).localCheckpoint()
    val vnrm = sparse.groupBy("doc_id", "k").agg(sum(expr("w * w")).as("vnrm"))
    val dots = sparse.join(broadcast(qw), "dim")
      .groupBy("doc_id", "k").agg(sum(expr("w * qwt")).as("dot"))
    val truth = vnrm.join(dots, Seq("doc_id", "k"), "left")
      .withColumn("dot", coalesce(col("dot"), lit(0L)))
      .crossJoin(broadcast(qn))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("qnrm").cast("double")) * sqrt(col("vnrm").cast("double"))))
      .orderBy(col("cos").desc, col("doc_id"), col("k")).limit(20)
      .select("doc_id", "k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.SparkEntry.queries("search6_hybrid_chunks")(spark, d)
      .filter(col("sem_rank") > 0)
      .select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = (got & truth).size
    assert(truth.size == 20)
    // measured at sf0.01: 10 of the fused 15 carry sem_rank > 0 and ALL
    // 10 are in the brute top-20 — the probe's survivors are genuine
    // (precision 1.0) and the fused list keeps ≥ 0.40 of the truth even
    // after the RRF cut to 15 rows
    assert(hit.toDouble / got.size >= 0.80,
      s"semantic survivors should be true top-20 chunks: $hit/${got.size}")
    assert(hit.toDouble / truth.size >= 0.40,
      s"semantic probe recall regressed: $hit/20")
  }
}
