package graft.operators

import org.apache.spark.sql.functions._

/** The single-pass native BPE encode expression
  * ([[graft.functions.VectorFunctions.bpeEncode]]) vs the k-round
  * window-algebra replay it replaced ([[TextOps.bpeReplayWindowed]]) —
  * FULL token sequences, not just counts. The two formulations claim the
  * same semantics (each merge rewrites leftmost-non-overlapping
  * adjacencies, in training order); this pins them bit-equal on the
  * trained sf0.001 table, on hand-traced adversarial self-merge runs
  * (the only place greedy vs even-offset selection could diverge), and
  * on chained merges whose outputs feed later merges.
  */
class BpeEncodeSpec extends graft.SparkSpec {

  private def exprSeqs(docs: org.apache.spark.sql.DataFrame,
      merges: Seq[(String, String)]): Seq[(Long, Long, String)] =
    docs.select(col("doc_id"), posexplode(
        graft.functions.VectorFunctions.bpeEncode(split(col("text"), " "), merges)))
      .select(col("doc_id"), col("pos").cast("long"), col("col"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted

  private def windowSeqs(docs: org.apache.spark.sql.DataFrame,
      merges: Seq[(String, String)]): Seq[(Long, Long, String)] =
    TextOps.bpeReplayWindowed(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted

  test("expression encode == window replay on the trained sf0.001 corpus") {
    val d = sf("sf0.001")
    val merges = TextOps.bpeTrainSampled(spark, d, 1L).map(m => (m._2, m._3))
    assert(merges.nonEmpty)
    val docs = graft.Tables.documents(spark, d)
    assert(exprSeqs(docs, merges) === windowSeqs(docs, merges))
  }

  test("adversarial cases: self-merge runs, chained merges, no-op re-application") {
    import spark.implicits._
    val docs = Seq(
      1L -> "x x x x x",        // odd self-merge run: (xx)(xx)x
      2L -> "x x x x",          // even run: (xx)(xx)
      3L -> "x",                // single token: untouched
      4L -> "a b a b",          // merge (a,b) twice, then ("a b","a b")
      5L -> "a a b b",          // (a,b) merges the MIDDLE pair only
      6L -> "q w e r t y")      // no merge matches: untouched
      .toDF("doc_id", "text")
    val merges = Seq(("x", "x"), ("a", "b"), ("a b", "a b"), ("x x", "x"))
    assert(exprSeqs(docs, merges) === windowSeqs(docs, merges))
    // hand-traced expectations (merge order matters):
    //  doc1: (x,x) → [xx, xx, x]; (x x, x) → [xx, xxx]  — the SECOND
    //        pair matches (the first is (xx,xx)), pinning left-to-right
    //  doc4: (a,b) → [ab, ab]; (ab,ab) → [abab]
    //  doc5: (a,b) → [a, ab, b] — the middle pair, run isolation
    val got = exprSeqs(docs, merges)
    def doc(id: Long) = got.filter(_._1 == id).map(_._3)
    assert(doc(1L) === Seq("x x", "x x x"))
    assert(doc(2L) === Seq("x x", "x x"))
    assert(doc(3L) === Seq("x"))
    assert(doc(4L) === Seq("a b a b"))
    assert(doc(5L) === Seq("a", "a b", "b"))
    assert(doc(6L) === Seq("q", "w", "e", "r", "t", "y"))
  }

  test("interpreted path (no codegen) agrees with codegen") {
    import spark.implicits._
    val docs = Seq(1L -> "x x x x x", 2L -> "a b a b", 3L -> "a a b b")
      .toDF("doc_id", "text")
    val merges = Seq(("x", "x"), ("a", "b"), ("a b", "a b"), ("x x", "x"))
    val want = exprSeqs(docs, merges)
    val conf = spark.conf
    val prev = (conf.get("spark.sql.codegen.wholeStage"),
      conf.get("spark.sql.codegen.factoryMode"))
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(exprSeqs(docs, merges) === want)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prev._1)
      conf.set("spark.sql.codegen.factoryMode", prev._2)
    }
  }

  test("empty merge table and empty-ish docs pass through") {
    import spark.implicits._
    val docs = Seq(1L -> "a b", 2L -> "").toDF("doc_id", "text")
    // split("") = [""] — one empty-string token, untouched
    assert(exprSeqs(docs, Nil) === Seq((1L, 0L, "a"), (1L, 1L, "b"),
      (2L, 0L, "")))
  }
}
