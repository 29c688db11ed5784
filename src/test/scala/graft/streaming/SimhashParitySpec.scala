package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The streaming scalar simhash must agree bit-for-bit with the batch
  * word-vote construction (Dedup.simhashDf, the dd4/dd8 oracle formula)
  * — otherwise the online gate and the batch reconciliation pass would
  * disagree about what "near-duplicate" means.
  */
class SimhashParitySpec extends SparkSpec {

  test("simhash32 equals the batch simhashDf(bits=32) on real corpus data") {
    val d = sf("sf0.001")
    val batch = graft.operators.Dedup.simhashDf(spark, d, 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      assert(Streams.simhash32(r.getString(1)) === batch(r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
  }
}
