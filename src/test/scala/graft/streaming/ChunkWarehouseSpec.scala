package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Closes the loop from chunk EMISSION to the maintained warehouse
  * table a trainer reads: streamingChunkAssembly's upsert feed (the
  * open chunk re-emitted per trigger as it grows) lands in a catalog
  * table through Catalog.upsert's latest-wins dynamic-overwrite merge —
  * foreachBatch per trigger, exactly the production wiring — and after
  * N nightly batches the table is bit-equal to the full single-shot
  * rebuild. mergeAppend (first-write-wins) would freeze each open
  * chunk's FIRST emission; upsert is the operator this feed needs.
  * Small-files maintenance: upsert rewrites each touched shard
  * partition to one file per run, and Catalog.compactPartitions finds
  * nothing left to do.
  */
class ChunkWarehouseSpec extends SparkSpec {

  test("nightly chunk upserts equal the full rebuild; partitions stay one file") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val textOf = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // the accepted batch in pipe5's per-shard pack order (pipe3's output
    // is (shard, pos)-sorted, so any prefix split preserves it)
    val docs = graft.SparkEntry.queries("pipe3_incremental_prep")(spark, dir)
      .collect()
      .map(r => Streams.ChunkDocIn(r.getAs[Long]("doc_id"),
        textOf(r.getAs[Long]("doc_id")))).toIndexedSeq
    assert(docs.size >= 3)
    // full rebuild: all docs in one trigger, fresh state
    def assembly(s: MemoryStream[Streams.ChunkDocIn]) =
      Streams.streamingChunkAssembly(s.toDS())
    val sFull = MemoryStream[Streams.ChunkDocIn]
    val qFull = assembly(sFull)
      .writeStream.format("memory").queryName("chunks_full")
      .outputMode("append").start()
    val expect =
      try {
        sFull.addData(docs: _*)
        qFull.processAllAvailable()
        spark.table("chunks_full").as[Streams.ChunkRow].collect().toSeq
          .map(r => (r.shard, r.chunk_id) ->
            ((r.n_tokens, r.n_docs, r.chunk_md5, r.n_seqs,
              r.seq_starts_csv, r.is_full))).toMap
      } finally qFull.stop()
    assert(expect.nonEmpty)
    // production wiring: three nightly triggers, each upserted into the
    // catalog table from foreachBatch
    val db = "chunkwh_test"
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunkwh").toString
    graft.sources.Catalog.ensureDatabase(spark, db, Some(s"$tmp/db"))
    val t = s"$db.training_chunks"
    val sInc = MemoryStream[Streams.ChunkDocIn]
    val qInc = assembly(sInc)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.ChunkRow], _: Long) =>
        graft.sources.Catalog.upsert(spark, df.toDF(), t,
          keys = Seq("shard", "chunk_id"), partitionBy = Seq("shard"))
        ()
      }
      .outputMode("append").start()
    try {
      val third = docs.size / 3
      Seq(docs.slice(0, third), docs.slice(third, 2 * third),
          docs.slice(2 * third, docs.size)).foreach { night =>
        sInc.addData(night: _*)
        qInc.processAllAvailable()
      }
    } finally qInc.stop()
    // the maintained table IS the full rebuild — open-chunk rewrites
    // superseded, closed chunks intact
    val got = spark.table(t)
      .select("shard", "chunk_id", "n_tokens", "n_docs", "chunk_md5",
        "n_seqs", "seq_starts_csv", "is_full")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5),
          r.getString(6), r.getBoolean(7)))).toMap
    assert(got === expect)
    // upsert's per-run partition rewrite keeps one file per shard: the
    // compaction pass finds nothing fragmented
    val partFiles = spark.table(t).select("shard").distinct().collect()
      .map(r => spark.table(t)
        .filter(col("shard") === r.getLong(0)).inputFiles.length)
    assert(partFiles.forall(_ == 1), s"files per shard: ${partFiles.toSeq}")
    assert(graft.sources.Catalog.compactPartitions(
      spark, t, partitionBy = Seq("shard"), maxFiles = 1).isEmpty)
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("upsert vs mergeAppend on a growing open chunk: only upsert tracks it") {
    import spark.implicits._
    val db = "chunkwh_semantics"
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunkup").toString
    graft.sources.Catalog.ensureDatabase(spark, db, Some(s"$tmp/db"))
    val night1 = Seq((0L, 5L, 100L, false), (1L, 2L, 512L, true))
      .toDF("shard", "chunk_id", "n_tokens", "is_full")
    val night2 = Seq((0L, 5L, 512L, true), (0L, 6L, 40L, false))
      .toDF("shard", "chunk_id", "n_tokens", "is_full")
    val tU = s"$db.up"; val tM = s"$db.ma"
    for (n <- Seq(night1, night2)) {
      graft.sources.Catalog.upsert(spark, n, tU,
        keys = Seq("shard", "chunk_id"), partitionBy = Seq("shard"))
      graft.sources.Catalog.mergeAppend(spark, n, tM,
        keys = Seq("shard", "chunk_id"), partitionBy = Seq("shard"))
    }
    val openU = spark.table(tU)
      .filter(col("shard") === 0L && col("chunk_id") === 5L)
      .select("n_tokens", "is_full").head()
    assert(openU.getLong(0) === 512L && openU.getBoolean(1))
    // first-write-wins keeps the stale 100-token open row — the exact
    // failure upsert exists to prevent
    val openM = spark.table(tM)
      .filter(col("shard") === 0L && col("chunk_id") === 5L)
      .select("n_tokens").head().getLong(0)
    assert(openM === 100L)
    // untouched keys identical in both
    assert(spark.table(tU).filter(col("chunk_id") =!= 5L).count() === 2L)
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
