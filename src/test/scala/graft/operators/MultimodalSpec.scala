package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal path on real bytes: synthesized-but-genuine BMP/WAV
  * payloads, partition-parallel format parsing, and the decode →
  * features → ANN composition. Byte-level format details are pinned in
  * CodecsSpec; this spec covers the Spark-side contract.
  */
class MultimodalSpec extends SparkSpec {

  private def payloads = Multimodal.mediaPayloads(spark, sf("sf0.001"))

  test("mediaPayloads: every row carries a parseable BMP and WAV") {
    val rows = payloads.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val img = Codecs.decodeBmp(r.getAs[Array[Byte]]("img"))
      assert(img.width >= 12 && img.width <= 20 && img.height >= 8)
      // dims sized to sample the whole text
      assert(img.width * img.height >= 48)
      val wav = Codecs.decodeWav(r.getAs[Array[Byte]]("wav"))
      assert(wav.samples.length >= 64 && wav.samples.length <= 192)
      assert(wav.sampleRate >= 8000 && wav.sampleRate <= 15000)
    }
  }

  test("decodeMedia: parsed features equal the synthesis formula") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val decoded = Multimodal.decodeMedia(payloads).collect()
    assert(decoded.length === docs.size)
    decoded.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val txt = docs(id).getBytes("UTF-8")
      val len = txt.length
      val (w, h) = Multimodal.synthDims(len)
      assert(r.getAs[Long]("img_w") === w.toLong)
      assert(r.getAs[Long]("img_h") === h.toLong)
      val idx = 0L until (w.toLong * h)
      assert(r.getAs[Long]("img_sum_b") === idx.map(i => (txt((i % len).toInt) & 0xff).toLong).sum)
      assert(r.getAs[Long]("img_sum_g") === idx.map(i => (id + 2 * i) % 256).sum)
      assert(r.getAs[Long]("img_sum_r") === idx.map(i => (7 * i) % 256).sum)
      assert(r.getAs[Long]("img_row0_b") ===
        (0 until w).map(i => (txt(i % len) & 0xff).toLong).sum)
      val n = 64 + len % 129
      val samples = (0 until n).map(i => ((id * 31 + i * 17) % 4096) - 2048)
      assert(r.getAs[Long]("wav_rate") === 8000 + (id % 8) * 1000)
      assert(r.getAs[Long]("wav_n") === n.toLong)
      assert(r.getAs[Long]("wav_sum") === samples.sum)
      assert(r.getAs[Long]("wav_sumsq") === samples.map(s => s * s).sum)
    }
  }

  test("mediaSignatures: identical images collide, self-distance is zero") {
    val sig = Multimodal.mediaSignatures(payloads).cache()
    assert(sig.count() === payloads.count())
    assert(sig.select(size(col("hist"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(16))
    // centered histogram sums to 0 ⇒ 16·Σhist = 16·npix; spot-check the
    // histogram really counts pixels
    val bad = sig.join(
      Multimodal.decodeMedia(payloads).select(col("doc_id"), (col("img_w") * col("img_h")).as("npix")),
      "doc_id")
      .filter(aggregate(col("hist"), lit(0L), (a, x) => a + x) =!= col("npix"))
    assert(bad.count() === 0)
    // a duplicated payload set: every doc's twin is at Hamming 0
    val dup = payloads.select(col("doc_id"), col("img"))
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .unionByName(payloads.select(col("doc_id"), col("img")))
    val s2 = Multimodal.mediaSignatures(dup)
    val twins = s2.as("a").join(s2.as("b"),
        col("a.doc_id") + 1000000L === col("b.doc_id"))
      .filter(col("a.simhash") =!= col("b.simhash"))
    assert(twins.count() === 0)
  }

  test("mm5: sampled frames are full except a doc's last, and start at frame 0") {
    val out = graft.Registry.queries("mm5_audio_frames")(spark, sf("sf0.001")).cache()
    assert(out.filter(col("frame_id") % 4 =!= 0).count() === 0)
    assert(out.filter(col("frame_id") === 0).count() ===
      Multimodal.mediaPayloads(spark, sf("sf0.001")).count())
    // a short frame can only be a doc's maximal sampled frame
    val lastPerDoc = out.groupBy("doc_id").agg(max("frame_id").as("mf"))
    val short = out.join(lastPerDoc, "doc_id")
      .filter(col("f_n") =!= 16L && col("frame_id") =!= col("mf"))
    assert(short.count() === 0)
  }

  test("mm4: banded candidates are complete for Hamming <= 5 (vs brute force)") {
    val out = graft.Registry.queries("mm4_media_ann")(spark, sf("sf0.001"))
    val sig = Multimodal.mediaSignatures(payloads).select("doc_id", "simhash")
    val brute = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .filter(col("hamming") <= 5L)
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"), col("hamming"))
    assert(out.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(out).count() === 0)
  }
}
