package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** streamingDsirGate — mix3's online quality gate: scored against
  * mix4's maintained weight table, the streamed per-doc scores must be
  * BIT-IDENTICAL to the batch dsirScoreAll on the same corpus (the JVM
  * twin re-derives split semantics, bigram joining, md5-60-bit bucket
  * hashing, and the integer mean from scratch), the keep flag must be
  * exactly the threshold comparison, and a doc whose vocabulary the
  * stored corpus never bucketed must score the exact Laplace floor.
  */
class StreamingDsirSpec extends graft.SparkSpec {

  test("streamingDsirGate matches batch dsirScoreAll bit-for-bit at sf0.001") {
    val d = sf("sf0.001")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val wt = graft.SparkEntry.queries("mix4_incremental_dsir")(spark, d)
      .collect()
    val weights = wt.map(r => r.getLong(0) -> r.getLong(3)).toMap
    val tn = wt.map(_.getLong(1)).sum
    val cn = wt.map(_.getLong(2)).sum

    val batch = graft.operators.TrainPrep
      .dsirScoreAll(graft.Tables.documents(spark, d), "src0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    // production threshold: the median batch score — admits roughly half
    val threshold = batch.map(_._3).sorted.apply(batch.size / 2)

    val docs = graft.Tables.documents(spark, d)
      .filter("source <> 'src0'")
      .select("doc_id", "text").collect()
      .map(r => Streams.DsirDocIn(r.getLong(0), r.getString(1)))
    val (a, b) = docs.partition(_.doc_id % 2 == 0)

    val stream = MemoryStream[Streams.DsirDocIn]
    val q = Streams.streamingDsirGate(stream.toDS(), weights, tn, cn, threshold)
      .writeStream.format("memory").queryName("dsirgate")
      .outputMode("append").start()
    try {
      stream.addData(a.toIndexedSeq: _*)
      q.processAllAvailable()
      stream.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("dsirgate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)) === batch)
    assert(got.forall(t => t._4 === (t._3 >= threshold)))
    // the threshold is non-trivial on this corpus: both outcomes occur
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  test("unseen-bucket vocabulary scores the exact Laplace floor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val B = 128L
    // a stored table that populates only bucket 0
    val weights = Map(0L -> 123456L)
    val tn = 10L; val cn = 20L
    val floorW = (1000000000L / (tn + B)) * 1000000L /
      math.max(1L, 1000000000L / (cn + B))
    // find two tokens whose unigram AND joined-bigram buckets all avoid
    // bucket 0, so every feature of the doc takes the floor weight
    val pair = (0 until 500).flatMap { i =>
      val (x, y) = (s"zx$i", s"zy$i")
      val bs = Seq(x, y, s"$x $y").map(f => Streams.termHash(f) % B)
      if (bs.forall(_ != 0L)) Some((x, y)) else None
    }.head
    val stream = MemoryStream[Streams.DsirDocIn]
    val q = Streams.streamingDsirGate(stream.toDS(), weights, tn, cn, 0L)
      .writeStream.format("memory").queryName("dsirfloor")
      .outputMode("append").start()
    try {
      stream.addData(Streams.DsirDocIn(7L, s"${pair._1} ${pair._2}"))
      q.processAllAvailable()
    } finally q.stop()
    val r = spark.table("dsirfloor").collect().head
    assert(r.getLong(0) === 7L)
    assert(r.getLong(1) === 3L) // 2 unigrams + 1 bigram
    assert(r.getLong(2) === floorW) // mean of three identical floor weights
  }
}
