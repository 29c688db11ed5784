package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal plumbing contract: opaque binary payloads, stubbed
  * partition-parallel decode/feature extraction, and the decode →
  * features → similarity composition.
  */
class MultimodalSpec extends SparkSpec {

  private def payloads = Multimodal.binaryPayloads(spark, sf("sf0.001"))

  test("decodeStub: partition-parallel, deterministic, metadata schema") {
    val meta = Multimodal.decodeStub(spark, payloads)
    // names+types match the declared contract (encoder nullability may
    // legitimately widen, e.g. String fields)
    assert(meta.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === Multimodal.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val n = payloads.count()
    assert(meta.count() === n)
    // deterministic: same input → identical rows
    val a = meta.orderBy("doc_id").collect()
    val b = Multimodal.decodeStub(spark, payloads).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // dims derive from payload bytes, within the stub's documented ranges
    assert(meta.filter(col("width") < 64 || col("width") >= 128 ||
      col("height") < 64 || col("height") >= 128).count() === 0)
    assert(meta.filter(col("n_bytes") <= 0).count() === 0)
  }

  test("featuresStub: fixed-dim float vectors feeding cosine similarity") {
    val feats = Multimodal.featuresStub(payloads, dim = 16).cache()
    assert(feats.count() === payloads.count())
    assert(feats.select(size(col("features"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(16))

    // decode → features → ANN composition: cosine of a vector with
    // itself is 1 (top-1 self-similarity on a doubled dataset)
    val base = feats.orderBy("doc_id").limit(20)
    val dup = base.withColumn("vid", col("doc_id") * 2)
      .unionByName(base.withColumn("vid", col("doc_id") * 2 + 1))
    val a = dup.select(col("vid").as("ia"), col("features").as("fa"))
    val b = dup.select(col("vid").as("ib"), col("features").as("fb"))
    val dot = graft.functions.VectorFunctions.dotLong _
    val scaled = (c: org.apache.spark.sql.Column) =>
      transform(c, x => round(x.cast("double") * 1000000, 0).cast("long"))
    val pairs = a.crossJoin(b).filter(col("ia") % 2 === 0 && col("ib") === col("ia") + 1)
      .withColumn("dp", dot(scaled(col("fa")), scaled(col("fb"))))
      .withColumn("na", dot(scaled(col("fa")), scaled(col("fa"))))
      .withColumn("cos", col("dp").cast("double") / col("na").cast("double"))
    // identical vectors: cosine exactly 1 in exact integer arithmetic
    assert(pairs.filter(col("cos") =!= 1.0).count() === 0)
    assert(pairs.count() > 0)
  }
}
