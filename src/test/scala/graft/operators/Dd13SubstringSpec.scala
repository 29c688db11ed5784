package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** dd13 exact substring-level dedup: maximal repeated W=8-token spans
  * across documents, on a hand-built corpus where the expected spans are
  * derivable by eye (the DuckDB oracle covers the sf corpus; this pins
  * the span semantics — maximal merge, cross-doc-only repetition, W
  * boundary — on adversarial micro-cases).
  */
class Dd13SubstringSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dd13").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    Registry.queries("dd13_substring_dedup")(spark, tmp)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("shared 10-token block yields one maximal span in both docs") {
    val shared = words("s", 10) // 10 tokens shared verbatim
    val out = run(Seq(
      1L -> s"${words("a", 5)} $shared ${words("b", 5)}",
      2L -> s"${words("c", 7)} $shared"))
    // doc 1: shared block at tokens 5..14 → grams at i=5..7 (W=8) merge
    // to one span [5, 14]; doc 2: block at 7..16 → span [7, 16]
    assert(out === Seq((1L, 5L, 14L, 10L), (2L, 7L, 16L, 10L)))
  }

  test("a 7-token shared run (< W) produces no spans") {
    val shared = words("s", 7)
    val out = run(Seq(
      1L -> s"$shared ${words("a", 8)}",
      2L -> s"$shared ${words("b", 8)}"))
    assert(out.isEmpty)
  }

  test("within-doc repetition alone does not count (cross-doc only)") {
    val block = words("r", 8)
    val out = run(Seq(
      1L -> s"$block ${words("a", 4)} $block",
      2L -> words("z", 20)))
    assert(out.isEmpty)
  }

  test("two disjoint shared blocks stay two spans; identical docs merge fully") {
    val b1 = words("p", 8)
    val b2 = words("q", 8)
    val out = run(Seq(
      1L -> s"$b1 ${words("a", 6)} $b2",
      2L -> s"$b1 ${words("b", 6)} $b2",
      3L -> words("z", 20)))
    // blocks at tokens 0..7 and 14..21 in both docs, gap of 6 unique
    // tokens: grams overlapping the gap are doc-unique, so islands split
    assert(out === Seq(
      (1L, 0L, 7L, 8L), (1L, 14L, 21L, 8L),
      (2L, 0L, 7L, 8L), (2L, 14L, 21L, 8L)))

    val full = words("f", 12)
    val dup = run(Seq(1L -> full, 2L -> full))
    assert(dup === Seq((1L, 0L, 11L, 12L), (2L, 0L, 11L, 12L)))
  }

  private def runResidual(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dd14").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    Registry.queries("dd14_residual_corpus")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("dd14: repeated spans are cut, unique text survives in order, untouched docs pass through") {
    val shared = words("s", 10)
    val out = runResidual(Seq(
      1L -> s"${words("a", 5)} $shared ${words("b", 5)}",
      2L -> s"${words("c", 7)} $shared",
      3L -> words("z", 9)))
    assert(out === Seq(
      (1L, s"${words("a", 5)} ${words("b", 5)}", 20L, 10L),
      (2L, words("c", 7), 17L, 10L),
      (3L, words("z", 9), 9L, 0L)))
  }

  test("dd14: a fully-duplicated doc empties; its twin empties too (canonical copy lives in dd12)") {
    val full = words("f", 12)
    val out = runResidual(Seq(1L -> full, 2L -> full, 3L -> words("z", 20)))
    assert(out === Seq(
      (1L, "", 12L, 12L), (2L, "", 12L, 12L), (3L, words("z", 20), 20L, 0L)))
  }
}
