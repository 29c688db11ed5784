package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class E(ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class CE(ts: Timestamp, user_id: Long, event_id: Long)

class StreamsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumblingCounts over MemoryStream matches batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      E(ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
      E(ts("2024-01-01 00:25:00"), 2L, "click", 2.0),
      E(ts("2024-01-01 00:55:00"), 1L, "view", 3.0),
      E(ts("2024-01-01 01:10:00"), 3L, "click", 4.0),
      E(ts("2024-01-01 02:05:00"), 1L, "view", 5.0))

    val stream = MemoryStream[E]
    stream.addData(data: _*)
    val q = Streams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumbling")
      .orderBy("w_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = Streams.tumblingCounts(data.toDF())
      .orderBy("w_start", "event_type")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === batch.toSeq)
    assert(got.toSeq === Seq(
      ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 00:00:00.0", "view", 1L, 3.0),
      ("2024-01-01 01:00:00.0", "click", 1L, 4.0),
      ("2024-01-01 02:00:00.0", "view", 1L, 5.0)))
  }

  test("sessionWindows groups gap-separated activity per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[E]
    stream.addData(
      E(ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      E(ts("2024-01-01 00:10:00"), 1L, "view", 1.0), // same session (gap 10m)
      E(ts("2024-01-01 01:00:00"), 1L, "click", 1.0), // new session (gap 50m)
      E(ts("2024-01-01 00:00:00"), 2L, "click", 1.0))
    val q = Streams.sessionWindows(stream.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sessions").orderBy("user_id", "start")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("runningWatchTime advances custom state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import Streams.Progress
    val stream = MemoryStream[Progress]
    val q = Streams.runningWatchTime(stream.toDS())
      .writeStream.format("memory").queryName("watch")
      .outputMode("update").start()
    try {
      // batch 1: anchor at pct 0.2, then +0.3 over 10s → credit min(10, 0.3*100)=10
      stream.addData(
        Progress("m1", "v1", ts("2024-01-01 00:00:00"), 0.2, 100.0),
        Progress("m1", "v1", ts("2024-01-01 00:00:10"), 0.5, 100.0))
      q.processAllAvailable()
      val b1 = spark.table("watch").collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
      assert(b1 === Seq(("m1", 10.0)))

      // batch 2: state persisted — +0.2 over 5s → +5; total 15
      stream.addData(Progress("m1", "v1", ts("2024-01-01 00:00:15"), 0.7, 100.0))
      q.processAllAvailable()
      val b2 = spark.table("watch").orderBy("n_events").collect()
        .map(r => (r.getDouble(2), r.getLong(3))).toSeq
      assert(b2.last === (15.0, 3L))

      // batch 3: late event behind anchor credits nothing; flat re-anchors
      stream.addData(
        Progress("m1", "v1", ts("2024-01-01 00:00:05"), 0.9, 100.0), // late, ignored
        Progress("m2", "v1", ts("2024-01-01 00:00:00"), 0.0, 50.0)) // pct 0: not started
      q.processAllAvailable()
      val b3 = spark.table("watch").collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
      assert(b3(("m1", "v1")) === 15.0)
      assert(b3(("m2", "v1")) === 0.0)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[CE]
    val purchases = MemoryStream[CE]
    val q = Streams.streamClickAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      clicks.addData(
        CE(ts("2024-01-01 10:00:00"), 1L, 100L),
        CE(ts("2024-01-01 10:20:00"), 1L, 101L), // latest click before purchase
        CE(ts("2024-01-01 10:00:00"), 2L, 102L))
      purchases.addData(
        CE(ts("2024-01-01 10:30:00"), 1L, 900L), // joins clicks 100 AND 101 (both within 30m)
        CE(ts("2024-01-01 11:00:00"), 2L, 901L)) // click 102 is 60m old: outside interval
      q.processAllAvailable()
      val got = spark.table("attr")
        .select("user_id", "click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((1L, 100L, 900L), (1L, 101L, 900L)))
    } finally q.stop()
  }

  test("streamingDedup drops duplicate ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[E]
    val q = Streams.streamingDedup(stream.toDF(), Seq("user_id"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      stream.addData(
        E(ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        E(ts("2024-01-01 00:01:00"), 1L, "view", 2.0), // dup user within watermark
        E(ts("2024-01-01 00:02:00"), 2L, "click", 3.0))
      q.processAllAvailable()
      stream.addData(E(ts("2024-01-01 00:03:00"), 1L, "view", 4.0)) // still dup
      q.processAllAvailable()
      assert(spark.table("dedup").select("user_id").as[Long].collect().sorted
        === Array(1L, 2L))
    } finally q.stop()
  }

  test("streamingNearDup drops near-identical docs across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 24).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 24).map(i => if (i == 12) "CHANGED" else s"tok$i").mkString(" ")
    val other = (1 to 24).map(i => s"other$i").mkString(" ")
    // precondition for the single-band gate: the near-dup pair must
    // collide in the keyed band and sit within the Hamming budget
    val (ha, hb) = (Streams.simhash32(base), Streams.simhash32(nearDup))
    assume((ha & 2047L) == (hb & 2047L) && java.lang.Long.bitCount(ha ^ hb) <= 2)
    val stream = MemoryStream[Streams.DocIn]
    val q = Streams.streamingNearDup(stream.toDS())
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      stream.addData(Streams.DocIn(1L, base, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      stream.addData(
        Streams.DocIn(2L, base, ts("2024-01-01 00:01:00")), // exact dup
        Streams.DocIn(3L, nearDup, ts("2024-01-01 00:02:00")), // near dup
        Streams.DocIn(4L, other, ts("2024-01-01 00:03:00"))) // distinct
      q.processAllAvailable()
      assert(spark.table("neardup").select("doc_id").as[Long].collect().sorted
        === Array(1L, 4L))
    } finally q.stop()
  }

  test("streamingNearDup: event-time TTL evicts idle band state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 24).map(i => s"tok$i").mkString(" ")
    val other1 = (1 to 24).map(i => s"aaa$i").mkString(" ")
    val other2 = (1 to 24).map(i => s"bbb$i").mkString(" ")
    // the fillers must land on other band codes, or they'd refresh (or
    // collide with) the state under test
    val hb = Streams.simhash32(base)
    assume((Streams.simhash32(other1) & 2047L) != (hb & 2047L))
    assume((Streams.simhash32(other2) & 2047L) != (hb & 2047L))
    val stream = MemoryStream[Streams.DocIn]
    val q = Streams.streamingNearDup(stream.toDS(),
      watermarkDelay = "0 seconds", stateTtlMs = 60000L)
      .writeStream.format("memory").queryName("neardup_ttl")
      .outputMode("append").start()
    try {
      stream.addData(Streams.DocIn(1L, base, ts("2024-01-01 00:00:00")))
      q.processAllAvailable() // watermark → 00:00; band deadline 00:01
      stream.addData(Streams.DocIn(2L, other1, ts("2024-01-01 00:10:00")))
      q.processAllAvailable() // watermark → 00:10, past the deadline
      // next batch fires the timeout for base's (now dataless) band
      stream.addData(Streams.DocIn(3L, other2, ts("2024-01-01 00:20:00")))
      q.processAllAvailable()
      // exact dup of doc 1: ADMITTED — its band state was evicted
      // (without the TTL this is the dropped-duplicate case of the
      // cross-micro-batch test above)
      stream.addData(Streams.DocIn(4L, base, ts("2024-01-01 00:25:00")))
      q.processAllAvailable()
      assert(spark.table("neardup_ttl").select("doc_id").as[Long].collect().sorted
        === Array(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("LateDropAccumulator counts rows dropped behind the watermark, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val acc = new Streams.LateDropAccumulator
    spark.streams.addListener(acc)
    val stream = MemoryStream[E]
    val q = Streams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("latedrop")
      .outputMode("append").start()
    try {
      // batch 1: max event time 12:00 → watermark 11:30 for batch 2
      stream.addData(E(ts("2024-01-01 12:00:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      assert(acc.droppedLateRows(q.id) === 0L)
      // batch 2: two rows behind the 11:30 watermark (windows already
      // closed) plus one live row — exactly 2 dropped
      stream.addData(
        E(ts("2024-01-01 10:00:00"), 2L, "click", 1.0),
        E(ts("2024-01-01 10:20:00"), 3L, "view", 1.0),
        E(ts("2024-01-01 12:05:00"), 4L, "click", 1.0))
      q.processAllAvailable()
      assert(acc.droppedLateRows(q.id) === 2L)
      // batch 3: one more late row — the total ACCUMULATES (lastProgress
      // alone would reset to this batch's count)
      stream.addData(E(ts("2024-01-01 10:40:00"), 5L, "click", 1.0))
      q.processAllAvailable()
      assert(acc.droppedLateRows(q.id) === 3L)
    } finally {
      q.stop()
      spark.streams.removeListener(acc)
    }
  }

  test("availableNow sink processes a raw-zone directory incrementally (T5)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ckpt = s"$dir/ckpt"
    val in = s"$dir/in"
    new java.io.File(in).mkdirs()
    Seq(E(ts("2024-01-01 00:05:00"), 1L, "click", 1.0))
      .toDF().write.mode("append").parquet(in)

    val read = spark.readStream.schema(
      Seq.empty[E].toDF().schema).parquet(in)
    var total = 0L
    val q = Streams.availableNowSink(read, ckpt) { (batch, _) =>
      total += batch.count()
    }.start()
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()
    assert(total === 1L)

    // second activation sees only the newly-arrived file (checkpoint = HWM)
    Seq(E(ts("2024-01-01 00:06:00"), 2L, "view", 2.0),
      E(ts("2024-01-01 00:07:00"), 3L, "view", 2.0))
      .toDF().write.mode("append").parquet(in)
    var second = 0L
    val q2 = Streams.availableNowSink(read, ckpt) { (batch, _) =>
      second += batch.count()
    }.start()
    try q2.awaitTermination(60000) finally if (q2.isActive) q2.stop()
    assert(second === 2L)
  }

  test("streamingIndexMaintenance: stored+batch micro-batches emit search3's row set (batch/stream parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => Streams.DocIn(r.getLong(0), r.getString(1), ts("2024-01-01 00:00:00")))
    val stored = docs.filter(_.doc_id % 5 != 0) // search3's stored index
    val batch = docs.filter(_.doc_id % 5 == 0)  // search3's new batch
    assert(stored.nonEmpty && batch.nonEmpty)
    // capture the LAST non-empty micro-batch's emissions — the upsert
    // row set the second activation writes
    val captured = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val stream = MemoryStream[Streams.DocIn]
    val q = Streams.streamingIndexMaintenance(stream.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Streams.IdxUpdate], _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) {
          captured.clear()
          captured ++= rows.map(u => (u.term, u.df_total, u.tf_total))
        }
        ()
      }.start()
    try {
      stream.addData(stored.toIndexedSeq: _*); q.processAllAvailable()
      stream.addData(batch.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val expected = graft.SparkEntry.queries("search3_incremental_index")(spark, dir)
      .select("term", "df_total", "tf_total").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(captured.toSet === expected)
  }

  test("streamingManifestAppend: one trigger matches pipe3 stage-5; split triggers keep the append contract") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 40L).map(i => Streams.ManifestIn(i, i * 3L))
    val nTok = docs.map(d => d.doc_id -> d.n_tokens).toMap
    val priors = (0L until 8L).map(s => s -> (10L * (s + 1), 100L * (s + 1))).toMap
    // batch reference: pipe3's stage-5 arithmetic replayed in memory
    val ref = docs.map(d => (d, Streams.termHash(s"${d.doc_id}:42")))
      .groupBy { case (_, h) => java.lang.Math.floorMod(h, 8L) }
      .toSeq.flatMap { case (shard, rows) =>
        val sorted = rows.sortBy { case (d, h) => (h, d.doc_id) }
        var (cnt, tot) = priors(shard)
        sorted.map { case (d, _) =>
          val r = Streams.ManifestRow(d.doc_id, shard, cnt, tot)
          cnt += 1; tot += d.n_tokens
          r
        }
      }.sortBy(r => (r.shard, r.pos))
    // one trigger: bit-for-bit parity with the batch twin
    val s1 = MemoryStream[Streams.ManifestIn]
    val q1 = Streams.streamingManifestAppend(s1.toDS(), priors = priors)
      .writeStream.format("memory").queryName("manifest1")
      .outputMode("update").start()
    try {
      s1.addData(docs: _*)
      q1.processAllAvailable()
      val got = spark.table("manifest1").as[Streams.ManifestRow]
        .collect().sortBy(r => (r.shard, r.pos)).toSeq
      assert(got === ref)
    } finally q1.stop()
    // two triggers: offsets continue across micro-batches — per-shard pos
    // contiguous from the priors, start_off chains exactly, and the final
    // per-shard counters equal the single-batch run's (order-insensitive)
    val s2 = MemoryStream[Streams.ManifestIn]
    val q2 = Streams.streamingManifestAppend(s2.toDS(), priors = priors)
      .writeStream.format("memory").queryName("manifest2")
      .outputMode("update").start()
    try {
      s2.addData(docs.take(25): _*); q2.processAllAvailable()
      s2.addData(docs.drop(25): _*); q2.processAllAvailable()
      val got = spark.table("manifest2").as[Streams.ManifestRow].collect()
      assert(got.map(_.doc_id).sorted.toSeq === docs.map(_.doc_id).sorted)
      got.groupBy(_.shard).foreach { case (shard, rs) =>
        val sorted = rs.sortBy(_.pos)
        val (cnt0, tot0) = priors(shard)
        assert(sorted.map(_.pos).toSeq === (cnt0 until cnt0 + rs.length))
        assert(sorted.head.start_off === tot0)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b.start_off === a.start_off + nTok(a.doc_id))
          case _ =>
        }
      }
      val finals = got.groupBy(_.shard).map { case (s, rs) =>
        s -> (priors(s)._1 + rs.length,
          priors(s)._2 + rs.map(r => nTok(r.doc_id)).sum)
      }
      val refFinals = ref.groupBy(_.shard).map { case (s, rs) =>
        s -> (priors(s)._1 + rs.length,
          priors(s)._2 + rs.map(r => nTok(r.doc_id)).sum)
      }
      assert(finals === refFinals)
    } finally q2.stop()
  }

  test("streamingIncrementalPrep: full pipe3 pipeline parity on the real corpus, 1 and 2 triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val expect = graft.SparkEntry.queries("pipe3_incremental_prep")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos"), r.getAs[Long]("start_off"))).toSet
    assert(expect.nonEmpty)
    // store model + priors from the corpus, the same predicates pipe3 uses
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
    val hkeyCol = conv(substring(md5(
      concat(col("doc_id").cast("string"), lit(":42"))), 1, 15), 16, 10)
      .cast("long")
    val priors = gatedStore
      .select(col("doc_id"), nWords.as("n_tokens"))
      .withColumn("shard", pmod(hkeyCol, lit(8L)))
      .groupBy("shard")
      .agg(count(lit(1)).as("cnt0"), sum("n_tokens").as("tot0"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // stream input: the RAW batch slice (the pipeline gates it itself)
    val batchDocs = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 7 === 3)
      .select("doc_id", "text", "source", "n_chars").collect()
      .map(r => Streams.PrepDoc(r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"))).toIndexedSeq
    // one trigger: bit-for-bit the batch twin's manifest
    val s1 = MemoryStream[Streams.PrepDoc]
    val q1 = Streams.streamingIncrementalPrep(s1.toDS(), store, priors = priors)
      .writeStream.format("memory").queryName("prep1")
      .outputMode("append").start()
    try {
      s1.addData(batchDocs: _*)
      q1.processAllAvailable()
      val got = spark.table("prep1").as[Streams.ManifestRow].collect()
        .map(r => (r.doc_id, r.shard, r.pos, r.start_off)).toSet
      assert(got === expect)
    } finally q1.stop()
    // two triggers: accepted set identical, per-shard offsets contiguous
    // from the priors, final counters equal the one-trigger run's
    val s2 = MemoryStream[Streams.PrepDoc]
    val q2 = Streams.streamingIncrementalPrep(s2.toDS(), store, priors = priors)
      .writeStream.format("memory").queryName("prep2")
      .outputMode("append").start()
    try {
      val (a, b) = batchDocs.partition(_.doc_id % 2 == 0)
      s2.addData(a: _*); q2.processAllAvailable()
      s2.addData(b: _*); q2.processAllAvailable()
      val got = spark.table("prep2").as[Streams.ManifestRow].collect()
      // expected accepted set under FIRST-ARRIVAL dedup semantics (the
      // documented cross-trigger contract): per accepted content group,
      // the min doc_id of the earliest trigger containing the group —
      // robust to a dup pair straddling the split (identical text ⇒
      // identical gate outcome, so group acceptance follows pipe3's)
      val contentOf = batchDocs.map(d =>
        d.doc_id -> org.apache.commons.codec.digest.DigestUtils.md5Hex(d.text))
        .toMap
      val acceptedContents = expect.map(e => contentOf(e._1))
      val expIds = batchDocs.groupBy(d => contentOf(d.doc_id))
        .filter { case (c, _) => acceptedContents.contains(c) }
        .map { case (_, ds) =>
          val (inA, inB) = ds.map(_.doc_id).partition(_ % 2 == 0)
          if (inA.nonEmpty) inA.min else inB.min
        }.toSet
      assert(got.map(_.doc_id).toSet === expIds)
      got.groupBy(_.shard).foreach { case (shard, rs) =>
        val (cnt0, _) = priors.getOrElse(shard, (0L, 0L))
        assert(rs.map(_.pos).sorted.toSeq === (cnt0 until cnt0 + rs.length))
      }
      val shardOf = (id: Long) =>
        java.lang.Math.floorMod(Streams.termHash(s"$id:42"), 8L)
      val expTotals = expIds.groupBy(shardOf).view.mapValues(_.size).toMap
      val gotTotals = got.groupBy(_.shard).view.mapValues(_.length).toMap
      assert(gotTotals === expTotals)
    } finally q2.stop()
  }

  test("streamingChunkAssembly: pipe5 chunk parity on the real corpus, 1 and 2 triggers (latest-wins)") {
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
    // priors: the stored open chunks (same gated store as pipe5's)
    val nWords = size(split(col("text"), " ")).cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
    val storeDocs = graft.Tables.documents(spark, dir)
      .filter(nWords >= 10L && nAlpha * 2L > col("n_chars"))
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 =!= 3)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toSeq
    val priors = Streams.buildChunkPriors(storeDocs)
    // stream input: pipe3's accepted batch docs WITH text, manifest order
    val textOf = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val batch = graft.SparkEntry.queries("pipe3_incremental_prep")(spark, dir)
      .collect()
      .map(r => Streams.ChunkDocIn(r.getAs[Long]("doc_id"),
        textOf(r.getAs[Long]("doc_id")))).toIndexedSeq
    def latestWins(rows: Seq[Streams.ChunkRow]) =
      rows.zipWithIndex
        .groupBy { case (r, _) => (r.shard, r.chunk_id) }
        .map { case (k, vs) =>
          val r = vs.maxBy(_._2)._1
          k -> ((r.n_tokens, r.n_docs, r.chunk_md5, r.n_seqs,
            r.seq_starts_csv, r.is_full))
        }
    // one trigger: exact pipe5 parity
    val s1 = MemoryStream[Streams.ChunkDocIn]
    val q1 = Streams.streamingChunkAssembly(s1.toDS(), priors = priors)
      .writeStream.format("memory").queryName("chunks1")
      .outputMode("append").start()
    try {
      s1.addData(batch: _*)
      q1.processAllAvailable()
      val got = latestWins(
        spark.table("chunks1").as[Streams.ChunkRow].collect().toSeq)
      assert(got === expect)
    } finally q1.stop()
    // two triggers, split mid-stream: latest-wins rows still equal pipe5
    // (the open-chunk row from trigger 1 is superseded by trigger 2)
    val s2 = MemoryStream[Streams.ChunkDocIn]
    val q2 = Streams.streamingChunkAssembly(s2.toDS(), priors = priors)
      .writeStream.format("memory").queryName("chunks2")
      .outputMode("append").start()
    try {
      val (a, b) = batch.splitAt(batch.length / 2)
      s2.addData(a: _*); q2.processAllAvailable()
      s2.addData(b: _*); q2.processAllAvailable()
      val rows = spark.table("chunks2").as[Streams.ChunkRow].collect().toSeq
      val got = latestWins(rows)
      assert(got === expect)
      // every is_full chunk was emitted exactly once across both triggers
      val fullCounts = rows.filter(_.is_full)
        .groupBy(r => (r.shard, r.chunk_id)).view.mapValues(_.size)
      assert(fullCounts.forall(_._2 == 1))
    } finally q2.stop()
  }

  test("streamingIngestChunks: raw docs to training chunks through the full chain equals pipe5") {
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
    // input: the RAW batch slice — the chain gates, dedups, and chunks it
    val batchDocs = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 7 === 3)
      .select("doc_id", "text", "source", "n_chars").collect()
      .map(r => Streams.PrepDoc(r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"))).toIndexedSeq
    val s1 = MemoryStream[Streams.PrepDoc]
    val q1 = Streams.streamingIngestChunks(s1.toDS(), store,
        chunkPriors = chunkPriors)
      .writeStream.format("memory").queryName("ingestchunks")
      .outputMode("append").start()
    try {
      s1.addData(batchDocs: _*)
      q1.processAllAvailable()
      val rows = spark.table("ingestchunks").as[Streams.ChunkRow].collect().toSeq
      val got = rows.zipWithIndex
        .groupBy { case (r, _) => (r.shard, r.chunk_id) }
        .map { case (k, vs) =>
          val r = vs.maxBy(_._2)._1
          k -> ((r.n_tokens, r.n_docs, r.chunk_md5, r.n_seqs,
            r.seq_starts_csv, r.is_full))
        }
      assert(got === expect)
    } finally q1.stop()
  }

  test("streamingIngestChunks: kill mid-stream, resume from checkpoint, " +
      "merged chunks equal the uninterrupted run") {
    // The per-trigger parity tests above never exercise RECOVERY: the
    // production contract is that a nightly ingest query can die between
    // triggers and resume from its checkpoint with both stateful
    // operators' state (dedup digests, manifest fold, open chunks)
    // restored. Trigger 1 runs, the query is STOPPED, a new query
    // restarts from the same checkpointLocation, trigger 2 arrives —
    // the latest-wins union across both incarnations must equal pipe5's
    // full output, and every is_full chunk must emit exactly once
    // ACROSS the restart (a chunk closed before the kill may not
    // re-emit after it).
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
      // pipe5 packs each shard's batch docs in (md5-hkey, doc_id) order;
      // assembly applies that sort WITHIN a trigger but packs triggers in
      // arrival order, so the split must be a prefix of the pack order
      // (same contract the other multi-trigger parity tests rely on)
      .sortBy(d => (Streams.termHash(s"${d.doc_id}:42"), d.doc_id))
    val (a, b) = batchDocs.splitAt(batchDocs.length / 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ick_ckpt").toString
    // foreachBatch, not format("memory"): the memory sink forces a temp
    // checkpoint (Spark refuses recovery through it), while foreachBatch
    // is the checkpoint-recoverable sink production would use. Each
    // incarnation drains into a driver-side buffer.
    val emitted = scala.collection.mutable.ArrayBuffer[Streams.ChunkRow]()
    // one source across both incarnations: the checkpoint's offsets are
    // positions in THIS stream, so the restarted query resumes reading
    // it exactly where incarnation 1 committed
    val s = MemoryStream[Streams.PrepDoc]
    def incarnation(batch: IndexedSeq[Streams.PrepDoc]): Seq[Streams.ChunkRow] = {
      val before = emitted.size
      val run = Streams.streamingIngestChunks(s.toDS(), store,
          chunkPriors = chunkPriors)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Streams.ChunkRow], _: Long) =>
          emitted.synchronized { emitted ++= df.collect() }; ()
        }
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        s.addData(batch: _*)
        run.processAllAvailable()
      } finally run.stop()
      emitted.synchronized(emitted.drop(before).toSeq)
    }
    // incarnation 1: trigger 1 only, then STOP (the kill)
    val rows1 = incarnation(a)
    // incarnation 2: a NEW query over the same source + checkpoint —
    // Spark restores both flatMapGroupsWithState stores from ckpt
    // (committed batch 0 is not replayed; trigger 2 starts from the
    // recovered state, not from empty)
    val rows2 = incarnation(b)
    // rows2 supersede rows1 per (shard, chunk_id): latest-wins merge
    val merged = (rows1 ++ rows2).zipWithIndex
      .groupBy { case (r, _) => (r.shard, r.chunk_id) }
      .map { case (k, vs) =>
        val r = vs.maxBy(_._2)._1
        k -> ((r.n_tokens, r.n_docs, r.chunk_md5, r.n_seqs,
          r.seq_starts_csv, r.is_full))
      }
    assert(merged === expect)
    // exactly-once closed-chunk emission ACROSS the restart
    val fullCounts = (rows1 ++ rows2).filter(_.is_full)
      .groupBy(r => (r.shard, r.chunk_id)).view.mapValues(_.size)
    assert(fullCounts.forall(_._2 == 1))
  }

  test("streamingFullChunksOnly: strict-append feed is the is_full subset, once each") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val expectFull = graft.SparkEntry.queries("pipe5_incremental_chunks")(spark, dir)
      .filter(col("is_full"))
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("chunk_id")) ->
        r.getAs[String]("chunk_md5")).toMap
    val nWords = size(split(col("text"), " ")).cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
    val storeDocs = graft.Tables.documents(spark, dir)
      .filter(nWords >= 10L && nAlpha * 2L > col("n_chars"))
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 =!= 3)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toSeq
    val priors = Streams.buildChunkPriors(storeDocs)
    val textOf = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val batch = graft.SparkEntry.queries("pipe3_incremental_prep")(spark, dir)
      .collect()
      .map(r => Streams.ChunkDocIn(r.getAs[Long]("doc_id"),
        textOf(r.getAs[Long]("doc_id")))).toIndexedSeq
    val s1 = MemoryStream[Streams.ChunkDocIn]
    val q1 = Streams.streamingFullChunksOnly(s1.toDS(), priors = priors)
      .writeStream.format("memory").queryName("fullchunks")
      .outputMode("append").start()
    try {
      val (x, y) = batch.splitAt(batch.length / 2)
      s1.addData(x: _*); q1.processAllAvailable()
      s1.addData(y: _*); q1.processAllAvailable()
      val rows = spark.table("fullchunks").as[Streams.ChunkRow].collect().toSeq
      // append-only: every key at most once, all is_full, set == pipe5's
      // closed chunks (the open tails are invisible by design)
      assert(rows.forall(_.is_full))
      assert(rows.groupBy(r => (r.shard, r.chunk_id)).forall(_._2.size == 1))
      assert(rows.map(r => (r.shard, r.chunk_id) -> r.chunk_md5).toMap
        === expectFull)
    } finally q1.stop()
  }

  test("streamingManifestAppend: end-to-end parity with pipe3's manifest on the real corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val batch = graft.SparkEntry.queries("pipe3_incremental_prep")(spark, dir)
      .collect()
    // stored per-shard totals, recomputed as Pipe3Spec does
    val nWords = size(split(col("text"), " ")).cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
    val hkeyCol = conv(substring(md5(
      concat(col("doc_id").cast("string"), lit(":42"))), 1, 15), 16, 10)
      .cast("long")
    val priors = graft.Tables.documents(spark, dir)
      .filter(nWords >= 10L && nAlpha * 2L > col("n_chars"))
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), nWords.as("n_tokens"))
      .withColumn("shard", pmod(hkeyCol, lit(8L)))
      .groupBy("shard")
      .agg(count(lit(1)).as("cnt0"), sum("n_tokens").as("tot0"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stream = MemoryStream[Streams.ManifestIn]
    val q = Streams.streamingManifestAppend(stream.toDS(), priors = priors)
      .writeStream.format("memory").queryName("manifest_e2e")
      .outputMode("update").start()
    try {
      stream.addData(batch.map(r =>
        Streams.ManifestIn(r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"))).toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("manifest_e2e").as[Streams.ManifestRow].collect()
        .map(r => (r.doc_id, r.shard, r.pos, r.start_off)).toSet
      val want = batch.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos"), r.getAs[Long]("start_off"))).toSet
      assert(got === want)
    } finally q.stop()
  }
}
