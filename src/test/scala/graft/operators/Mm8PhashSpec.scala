package graft.operators

import org.apache.spark.sql.functions._

/** mm8 perceptual-hash near-dup: the 8-band pigeonhole candidate join
  * must be LOSSLESS at the ≤6 threshold — any pair with Hamming ≤ 7
  * agrees on at least one of 8 disjoint 8-bit bands, so the banded
  * output must equal brute-force all-pairs Hamming over the same
  * hashes (the cap is inert on the gate corpus, as dd9's is). Also pins
  * the packing contract: each half is an unsigned 32-bit value, so the
  * int64 columns never go negative (bit 63 vs sign was the design
  * constraint).
  */
class Mm8PhashSpec extends graft.SparkSpec {

  test("mm8 banded pairs equal brute-force Hamming<=6 over thumb hashes at sf0.01") {
    val d = sf("sf0.01")
    val h = Multimodal.thumbHashes(Multimodal.mediaPayloads(spark, d))
      .localCheckpoint()
    val a = h.select(col("doc_id").as("doc_a"), col("h_lo").as("lo_a"),
      col("h_hi").as("hi_a"))
    val b = h.select(col("doc_id").as("doc_b"), col("h_lo").as("lo_b"),
      col("h_hi").as("hi_b"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)").cast("long"))
      .filter(col("hamming") <= 6)
      .select("doc_a", "doc_b", "hamming")
      .collect().map(_.toSeq).toSet
    val got = graft.SparkEntry.queries("mm8_phash_neardup")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(got == brute,
      s"banding must be lossless at <=6: got ${got.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "gate corpus should contain near-dup thumbnails")
  }

  test("mm8 hash halves are unsigned 32-bit") {
    val d = sf("sf0.01")
    val h = Multimodal.thumbHashes(Multimodal.mediaPayloads(spark, d))
    val bad = h.filter(col("h_lo") < 0 || col("h_lo") > 4294967295L ||
      col("h_hi") < 0 || col("h_hi") > 4294967295L).count()
    assert(bad == 0L)
  }
}
