package graft.operators

/** t11 BPE pair-merge semantics on a hand-traced corpus, including the
  * overlapping-run case ("a a a a" must merge leftmost-non-overlapping:
  * positions 0 and 2, NOT 0/1/2) and the count-desc / lhs-asc / rhs-asc
  * tie-break.
  *
  * Trace for doc1 = "a a a a b", doc2 = "c a a d":
  *   r1: (a,a) count 4 (3 in doc1's run + 1 in doc2) wins; doc1 →
  *       ["a a","a a","b"], doc2 → ["c","a a","d"]
  *   r2: all pairs count 1; tie-break picks ("a a","a a"); doc1 →
  *       ["a a a a","b"]
  *   r3: tie-break lhs "a a" < "a a a a" < "c" → ("a a","d"); doc2 →
  *       ["c","a a d"]
  *   r4: ("a a a a","b") < ("c","a a d") → doc1 → ["a a a a b"]
  *   r5: ("c","a a d") → doc2 → ["c a a d"]
  *   r6: no adjacent pairs remain → early stop (5 rows, not 6)
  */
class T11BpeSpec extends graft.SparkSpec {

  test("greedy leftmost-non-overlapping merges with deterministic tie-break") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t11").toString
    Seq(1L -> "a a a a b", 2L -> "c a a d").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("t11_bpe_merges")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(
      (1L, "a", "a", 4L),
      (2L, "a a", "a a", 1L),
      (3L, "a a", "d", 1L),
      (4L, "a a a a", "b", 1L),
      (5L, "c", "a a d", 1L)))
  }
}
