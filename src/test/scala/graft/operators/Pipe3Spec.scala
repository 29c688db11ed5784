package graft.operators

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** pipe3_incremental_prep — the incremental ingest twin of pipe2.
  *
  * The oracle (CORRECTNESS gate) pins the full stage-by-stage semantics;
  * this spec pins the APPEND contract the oracle's value-hash cannot
  * express as named invariants: output is batch-only, offsets CONTINUE
  * from the stored per-shard totals with no gap and no overlap, and the
  * gates actually fire on the corpus (non-vacuous).
  */
class Pipe3Spec extends SparkSpec {
  private val dir = sf("sf0.001")
  private lazy val out =
    Registry.queries("pipe3_incremental_prep")(spark, dir).cache()

  test("pipe3: output is batch-split only, held-out excluded") {
    assert(out.count() > 0)
    assert(out.filter(col("doc_id") % 7 =!= 3).count() === 0L)
    assert(out.filter(col("doc_id") % 10 === 0).count() === 0L)
  }

  test("pipe3: per-shard pos continues the stored manifest contiguously") {
    // stored per-shard totals recomputed independently over the store side
    val nWords = size(split(col("text"), " ")).cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
    val hkey = conv(substring(md5(
      concat(col("doc_id").cast("string"), lit(":42"))), 1, 15), 16, 10)
      .cast("long")
    val store = Tables.documents(spark, dir)
      .filter(nWords >= 10L && nAlpha * 2L > col("n_chars"))
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), nWords.as("n_tokens"))
      .withColumn("shard", pmod(hkey, lit(8L)))
      .groupBy("shard")
      .agg(count(lit(1)).as("cnt0"), sum("n_tokens").as("tot0"))
    val w = Window.partitionBy("shard").orderBy("pos")
    val joined = out.join(store, Seq("shard"), "left").cache()
    // first new pos per shard == stored count; steps are +1 (contiguous)
    val firsts = joined
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
    assert(firsts.filter(col("pos") =!= coalesce(col("cnt0"), lit(0L)))
      .count() === 0L)
    assert(joined
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .filter(col("prev").isNotNull && col("pos") =!= col("prev") + 1L)
      .count() === 0L)
    // first start_off per shard == stored token total; each subsequent
    // start_off == previous start_off + previous n_tokens (append-only,
    // nothing already written ever shifts)
    assert(firsts.filter(col("start_off") =!= coalesce(col("tot0"), lit(0L)))
      .count() === 0L)
    assert(joined
      .withColumn("po", lag(col("start_off"), 1).over(w))
      .withColumn("pn", lag(col("n_tokens"), 1).over(w))
      .filter(col("po").isNotNull && col("start_off") =!= col("po") + col("pn"))
      .count() === 0L)
  }

  test("pipe3: the fuzzy/decon gates fire (non-vacuous) and cost is O(batch)") {
    val nWords = size(split(col("text"), " ")).cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
    val batchQ = Tables.documents(spark, dir)
      .filter(nWords >= 10L && nAlpha * 2L > col("n_chars"))
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 3)
      .count()
    val accepted = out.count()
    assert(accepted < batchQ, s"gates dropped nothing ($accepted of $batchQ)")
    assert(accepted <= batchQ)
  }
}
