package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** streamingIndexAssign — pipe6's online index-maintenance twin: with
  * the batch build's own centroid table and the same documents, the
  * streamed assignment must be BIT-IDENTICAL to pipe6_rag_index (the
  * JVM twin re-derives chunker windows, t10 hashing, norms, dl, and the
  * cosine argmax tie-break from scratch — any drift in one constant
  * breaks equality). Runs split across two triggers to pin that the
  * operator is genuinely stateless (per-doc rows are trigger-invariant).
  */
class StreamingIndexSpec extends graft.SparkSpec {

  test("streamingIndexAssign matches pipe6_rag_index bit-for-bit at sf0.001") {
    val d = sf("sf0.001")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = graft.SparkEntry.queries("pipe6_rag_index")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sorted

    val cents = graft.operators.TrainPrep.pipe6Parts(spark, d).cent
      .collect()
      .map(r => Streams.IndexCentroid(r.getLong(0), r.getLong(1),
        r.getAs[scala.collection.Seq[Long]](2).toArray, r.getLong(3)))
      .toSeq

    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => Streams.IndexDocIn(r.getLong(0), r.getString(1)))
    val (firstHalf, secondHalf) = docs.partition(_.doc_id % 2 == 0)

    val stream = MemoryStream[Streams.IndexDocIn]
    val q = Streams.streamingIndexAssign(stream.toDS(), cents)
      .writeStream.format("memory").queryName("ragindex")
      .outputMode("append").start()
    try {
      stream.addData(firstHalf.toIndexedSeq: _*)
      q.processAllAvailable()
      stream.addData(secondHalf.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ragindex").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sorted

    assert(got.size == batch.size,
      s"row count: streamed ${got.size} vs batch ${batch.size}")
    assert(got == batch, "streamed index rows must equal the batch build")
  }
}
