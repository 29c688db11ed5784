package graft.operators

import graft.{Registry, SparkSpec}

/** mine1_hard_negatives: on a corpus where the lexical and semantic
  * signals are controlled independently, the miner must surface the
  * lexically-confusable docs as candidates, flag the semantically-far
  * one as a hard negative, and leave the paraphrase (semantically
  * near) unflagged — plus structural invariants on the gate corpus.
  */
class Mine1Spec extends SparkSpec {
  import spark.implicits._

  test("hard flag separates the decoy from the paraphrase") {
    val tmp = java.nio.file.Files.createTempDirectory("mine1").toString
    val shared = "apple banana cherry"
    Seq(
      (0L, s"$shared date", "en", "src0", 1L), // the query doc (0 % 100 = 0)
      (1L, s"$shared elder", "en", "src1", 1L), // lexical decoy
      (2L, s"$shared fig", "en", "src1", 1L), // paraphrase
      (3L, "kiwi lemon mango", "en", "src1", 1L)) // lexically disjoint
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def vec(head: Float*) =
      (head ++ Seq.fill(64 - head.size)(0.0f)).toArray
    Seq(
      (0L, vec(1.0f), 0L),
      (1L, vec(0.0f, 1.0f), 0L), // orthogonal to the query: cos 0 → hard
      (2L, vec(1.0f, 0.05f), 0L), // near-parallel: cos ≈ 0.999 → not hard
      (3L, vec(0.5f, 0.5f), 0L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("mine1_hard_negatives")(spark, tmp).collect()
    val byCand = out.map(r => r.getLong(2) ->
      ((r.getLong(0), r.getLong(3), r.getBoolean(5)))).toMap
    // only the term-sharing docs are candidates; the disjoint doc is not
    assert(byCand.keySet === Set(1L, 2L))
    assert(byCand.values.forall(_._1 == 0L))
    assert(byCand.values.forall(_._2 > 0L)) // real lexical overlap
    assert(byCand(1L)._3 === true) // decoy: confusable AND far → hard
    assert(byCand(2L)._3 === false) // paraphrase: near → kept out
  }

  test("a candidate without an embedding keeps its rank, unjudgeable != hard") {
    val tmp = java.nio.file.Files.createTempDirectory("mine1e").toString
    val shared = "apple banana cherry"
    Seq(
      (0L, s"$shared date", "en", "src0", 1L),
      (1L, s"$shared elder", "en", "src1", 1L), // NO embedding row
      (2L, s"$shared fig", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def vec(head: Float*) =
      (head ++ Seq.fill(64 - head.size)(0.0f)).toArray
    Seq((0L, vec(1.0f), 0L), (2L, vec(0.0f, 1.0f), 0L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("mine1_hard_negatives")(spark, tmp)
      .collect().sortBy(_.getLong(1))
    // both candidates survive with dense ranks despite the coverage hole
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    val byCand = out.map(r =>
      r.getLong(2) -> ((r.isNullAt(4), r.getBoolean(5)))).toMap
    assert(byCand(1L) === ((true, false))) // no vector: null cos, NOT hard
    assert(byCand(2L) === ((false, true))) // orthogonal: judged hard
  }

  test("gate-corpus structure: dense per-query ranks, monotone lex scores") {
    val out = Registry.queries("mine1_hard_negatives")(spark, sf("sf0.001"))
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rows.length))
      val scores = sorted.map(_.getLong(3)).toSeq
      assert(scores === scores.sorted(Ordering[Long].reverse), s"qid $qid")
      assert(scores.forall(_ > 0L))
      rows.foreach(r => assert(r.getBoolean(5) === (r.getLong(4) < 500000L)))
    }
  }
}
