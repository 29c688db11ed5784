package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming family's 100 TB state story, executed: every stateful
  * twin runs on whatever `spark.sql.streaming.stateStore.providerClass`
  * names, and the production choice for state that grows with corpus
  * history (dedupKeepMin's admitted-digest set, streamingIndexMaintenance's
  * per-term stats) is RocksDB — state lives on executor DISK with a
  * block-cache, not in the JVM heap, so a digest set the size of dd1's
  * stored table bounds memory instead of OOMing it. This spec runs the
  * full ingest chain (two chained flatMapGroupsWithState operators)
  * under `RocksDBStateStoreProvider` across two triggers and pins
  * (a) bit-identical chunk output vs pipe5 — the state encoding is
  * provider-independent — and (b) that RocksDB was genuinely live,
  * via the rocksdb custom metrics in the query progress (absent under
  * the default HDFS-backed provider).
  */
class RocksDbStateSpec extends SparkSpec {

  test("streamingIngestChunks under RocksDBStateStoreProvider: pipe5 parity, rocksdb metrics live") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val expect = graft.SparkEntry.queries("pipe5_incremental_chunks")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_docs"),
          r.getAs[String]("chunk_md5"), r.getAs[Long]("n_seqs"),
          r.getAs[String]("seq_starts_csv"), r.getAs[Boolean]("is_full"))))
      .toMap
    assert(expect.nonEmpty)
    val nWords = size(split(col("text"), " ")).cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
    val gatedStore = graft.Tables.documents(spark, dir)
      .filter(nWords >= 10L && nAlpha * 2L > col("n_chars"))
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 =!= 3)
    val storeDocs = gatedStore.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toSeq
    val testTexts = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).select("text").collect()
      .map(_.getString(0)).toSeq
    val store = Streams.buildPrepStore(storeDocs, testTexts)
    val chunkPriors = Streams.buildChunkPriors(storeDocs)
    val batchDocs = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 7 === 3)
      .select("doc_id", "text", "source", "n_chars").collect()
      .map(r => Streams.PrepDoc(r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"))).toIndexedSeq
      // triggers pack in arrival order: split on a prefix of the
      // per-shard (md5-hkey, doc_id) pack order (the multi-trigger
      // parity contract shared with StreamsSpec)
      .sortBy(d => (Streams.termHash(s"${d.doc_id}:42"), d.doc_id))
    val (t1, t2) = batchDocs.splitAt(batchDocs.length / 2)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val s = MemoryStream[Streams.PrepDoc]
    val q = Streams.streamingIngestChunks(s.toDS(), store,
        chunkPriors = chunkPriors)
      .writeStream.format("memory").queryName("rocks_chunks")
      .outputMode("append").start()
    try {
      for (trig <- Seq(t1, t2)) { s.addData(trig: _*); q.processAllAvailable() }
      // (b) the provider is genuinely RocksDB: its custom metrics are in
      // the progress (the HDFS-backed default emits none of these keys)
      import scala.jdk.CollectionConverters._
      val customKeys = q.lastProgress.stateOperators.toSeq
        .flatMap(_.customMetrics.keySet.asScala)
      assert(customKeys.exists(_.startsWith("rocksdb")),
        s"no rocksdb metrics in progress: $customKeys")
      // (a) output parity: latest-wins per chunk key equals pipe5
      val got = spark.table("rocks_chunks").as[Streams.ChunkRow].collect()
        .toSeq.zipWithIndex
        .groupBy { case (r, _) => (r.shard, r.chunk_id) }
        .map { case (k, vs) =>
          val r = vs.maxBy(_._2)._1
          k -> ((r.n_tokens, r.n_docs, r.chunk_md5, r.n_seqs,
            r.seq_starts_csv, r.is_full))
        }
      assert(got === expect)
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
