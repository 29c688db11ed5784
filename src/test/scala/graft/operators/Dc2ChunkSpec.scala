package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** dc2_chunk_decontaminate: the chunk-grain check must catch what the
  * doc-grain check (dc1) structurally cannot — a quoted benchmark span
  * inside an otherwise-clean document dilutes below dc1's 20% doc
  * threshold while still dominating ONE pk6 chunk — and must agree with
  * dc1 on the easy cases (verbatim copy: everything contaminated;
  * disjoint vocabulary: nothing).
  */
class Dc2ChunkSpec extends SparkSpec {

  private def mkCorpus(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("dc2").toString
    val bench = (0 until 70).map(i => s"q$i").mkString(" ") // doc 0: held-out
    val quote = (10 until 30).map(i => s"q$i").mkString(" ") // 20-token span of it
    val copy = bench // doc 11: verbatim train copy
    val clean = (0 until 140).map(i => s"c$i").mkString(" ") // doc 12: disjoint
    // doc 13: 48 clean + 20-token quote + 72 clean = 140 tokens. Doc-level
    // contamination 18/138 ≈ 13% (< 20%, dc1-clean); chunk 1 (tokens
    // 48..111) holds the whole quote: 18/62 ≈ 29% (≥ 20%, contaminated).
    val partial = ((0 until 48).map(i => s"f$i") ++ quote.split(" ") ++
      (48 until 120).map(i => s"f$i")).mkString(" ")
    spark.createDataFrame(Seq(
      (0L, bench, "en", "src0", bench.length.toLong),
      (11L, copy, "en", "src1", copy.length.toLong),
      (12L, clean, "en", "src1", clean.length.toLong),
      (13L, partial, "en", "src1", partial.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("dc2 catches a chunk-local quote that dc1's doc grain dilutes away") {
    val dir = mkCorpus()
    val dc1 = Registry.queries("dc1_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(dc1(11L) === true) // verbatim copy: doc-level catches it
    assert(dc1(12L) === false)
    assert(dc1(13L) === false) // the dilution hole: doc-level misses the quote
    val dc2 = Registry.queries("dc2_chunk_decontaminate")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(4)).toMap
    // verbatim copy: every chunk contaminated; disjoint: every chunk clean
    assert(dc2.collect { case ((11L, _), c) => c }.nonEmpty)
    assert(dc2.forall { case ((id, _), c) => id != 11L || c })
    assert(dc2.forall { case ((id, _), c) => id != 12L || !c })
    // the quote chunk flags; the quote-free tail chunk stays clean
    assert(dc2((13L, 1L)) === true)
    assert(dc2((13L, 2L)) === false)
  }

  test("dc2 shingle domains are symmetric under stray double spaces") {
    // pk6 drops empty tokens on the chunk side; the held-out fingerprint
    // side must shingle the same token domain, or a verbatim copy of a
    // double-spaced held-out doc reads as clean
    val tmp = java.nio.file.Files.createTempDirectory("dc2s").toString
    val bench = (0 until 70).map(i => s"q$i").mkString("  ") // DOUBLE spaces
    val copy = (0 until 70).map(i => s"q$i").mkString(" ") // clean re-spacing
    spark.createDataFrame(Seq(
      (0L, bench, "en", "src0", bench.length.toLong),
      (11L, copy, "en", "src1", copy.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("dc2_chunk_decontaminate")(spark, tmp).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(4)), "verbatim copy must flag every chunk")
  }
}
