package graft.sources

import graft.SparkSpec
import graft.wistia.Schemas
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Tri-layer lake round-trip: K1 run-partitioned raw writes → S7 latest-
  * run discovery → S6 schema-enforced tolerant read → K2 staging →
  * K4/K5 warehouse policies.
  */
class RawZoneSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("rawzone").toString

  private val eventJson =
    """{"received_at":"2024-03-01T10:00:00Z","event_key":"e1","visitor_key":"v1",
      |"media_id":"m1","percent_viewed":0.5,"ip":"1.2.3.4","country":"US",
      |"user_agent_details":{"browser":"Firefox","platform":"linux","mobile":false}}"""
      .stripMargin.replace("\n", "")

  private def parsed(lines: String*) = {
    import spark.implicits._
    spark.read.schema(Schemas.rawEvent).json(lines.toDS)
  }

  test("K1/S7: run-partitioned writes and latest-run discovery") {
    val root = tmp()
    RawZone.writeRun(parsed(eventJson), root, "events", "20240301_100000")
    RawZone.writeRun(parsed(eventJson), root, "events", "20240302_090000")
    assert(RawZone.latestRun(spark, root, "events").contains("20240302_090000"))
    assert(RawZone.latestRun(spark, root, "nothing").isEmpty)
  }

  test("pruneRuns: run retention keeps the newest K, never the replay floor") {
    val root = tmp()
    for (s <- Seq("20240301_100000", "20240302_090000", "20240303_080000"))
      RawZone.writeRun(parsed(eventJson), root, "events", s)
    // nothing to prune when keep covers the history; absent entity no-ops
    assert(RawZone.pruneRuns(spark, root, "events", keep = 3) === Nil)
    assert(RawZone.pruneRuns(spark, root, "nothing", keep = 1) === Nil)
    // prune to the newest one: the two oldest stamps are returned and
    // physically gone, discovery and reads see only the survivor
    assert(RawZone.pruneRuns(spark, root, "events", keep = 1) ===
      Seq("20240301_100000", "20240302_090000"))
    assert(!new java.io.File(s"$root/events/run_ts=20240301_100000").exists())
    assert(RawZone.latestRun(spark, root, "events").contains("20240303_080000"))
    assert(RawZone.readJson(spark, root, "events", Schemas.rawEvent)
      .select("run_ts").distinct().collect().map(_.getString(0)).toSeq ===
      Seq("20240303_080000"))
    // idempotent at the floor
    assert(RawZone.pruneRuns(spark, root, "events", keep = 1) === Nil)
    intercept[IllegalArgumentException] {
      RawZone.pruneRuns(spark, root, "events", keep = 0)
    }
  }

  test("pruneRunsLanded: a lagging checkpoint BLOCKS the prune of unread runs; landed runs reclaim on schedule") {
    val root = tmp()
    val checkpoint = tmp() + "/ck"
    def drain(): Unit = {
      // the downstream consumer: an AvailableNow pass over the raw
      // entity dir, committing what exists right now into the checkpoint
      val q = spark.readStream.schema(Schemas.rawEvent)
        .json(s"$root/events")
        .writeStream.format("noop")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); ()
    }
    RawZone.writeRun(parsed(eventJson), root, "events", "20240301_100000")
    // no committed batch yet: NOTHING is landed, nothing prunes — the
    // caller-owned keep floor alone would have reclaimed stamps here
    RawZone.writeRun(parsed(eventJson), root, "events", "20240302_090000")
    assert(RawZone.pruneRunsLanded(spark, root, "events", 1, checkpoint)
      === Nil)
    drain() // consumer lands runs 1+2
    RawZone.writeRun(parsed(eventJson), root, "events", "20240303_080000")
    RawZone.writeRun(parsed(eventJson), root, "events", "20240304_070000")
    // keep=1 nominates runs 1..3; the checkpoint has only read 1+2, so
    // run 3 is BLOCKED (the lagging consumer still needs its replay)
    assert(RawZone.pruneRunsLanded(spark, root, "events", 1, checkpoint)
      === Seq("20240301_100000", "20240302_090000"))
    assert(new java.io.File(s"$root/events/run_ts=20240303_080000").exists())
    drain() // consumer catches up (runs 3+4)
    assert(RawZone.pruneRunsLanded(spark, root, "events", 1, checkpoint)
      === Seq("20240303_080000"))
    assert(RawZone.latestRun(spark, root, "events")
      .contains("20240304_070000"))
    intercept[IllegalArgumentException] {
      RawZone.pruneRunsLanded(spark, root, "events", 0, checkpoint)
    }
  }

  test("pruneRunsHwm: the fact HWM gates the batch lifecycle's prune — lagging fact blocks, landed runs reclaim, a null-ts run is kept for a human") {
    def at(ts: String) = eventJson.replace("2024-03-01T10:00:00Z", ts)
    def hwm(ts: String) = Some(java.sql.Timestamp.from(
      java.time.Instant.parse(ts)))
    val root = tmp()
    RawZone.writeRun(parsed(at("2024-03-01T10:00:00Z")), root, "events",
      "20240301_100000")
    RawZone.writeRun(parsed(at("2024-03-02T09:00:00Z"),
      at("2024-03-02T09:30:00Z")), root, "events", "20240302_090000")
    RawZone.writeRun(parsed(at("2024-03-03T08:00:00Z")), root, "events",
      "20240303_080000")
    // no fact rows yet (hwm None): the extreme lagging consumer — the
    // keep floor alone would have reclaimed two stamps here
    assert(RawZone.pruneRunsHwm(spark, root, "events", 1, None,
      Schemas.rawEvent) === Nil)
    // the fact has landed run 1 but not run 2's 09:30 row: run 2 BLOCKED
    assert(RawZone.pruneRunsHwm(spark, root, "events", 1,
      hwm("2024-03-02T09:00:00Z"), Schemas.rawEvent)
      === Seq("20240301_100000"))
    assert(new java.io.File(s"$root/events/run_ts=20240302_090000").exists())
    // the HWM moves past run 2; keep=1 still floors run 3 even though
    // it too is below the mark
    assert(RawZone.pruneRunsHwm(spark, root, "events", 1,
      hwm("2024-03-04T00:00:00Z"), Schemas.rawEvent)
      === Seq("20240302_090000"))
    assert(RawZone.latestRun(spark, root, "events")
      .contains("20240303_080000"))
    // a run with no parseable timestamp can never be proven landed —
    // retained, while a later empty-of-rows candidate would be vacuous
    RawZone.writeRun(parsed("""{"event_key":"no_ts"}"""), root, "events",
      "20240304_070000")
    RawZone.writeRun(parsed(at("2024-03-05T06:00:00Z")), root, "events",
      "20240305_060000")
    assert(RawZone.pruneRunsHwm(spark, root, "events", 1,
      hwm("2024-03-09T00:00:00Z"), Schemas.rawEvent)
      === Seq("20240303_080000"))
    assert(new java.io.File(s"$root/events/run_ts=20240304_070000").exists())
    intercept[IllegalArgumentException] {
      RawZone.pruneRunsHwm(spark, root, "events", 0, None, Schemas.rawEvent)
    }
  }

  test("randomized pruneRunsHwm walks match the retention model: a run holding any row above the HWM is never pruned") {
    // seeded random walk over ingest / HWM-advance / retention-pass
    // interleavings against a trivial in-memory model — the same
    // discipline the snapshot and vec-store lifecycles are pinned
    // with. The invariant under test is the one that matters for a
    // replay source: a run with ANY row above the fact HWM survives
    // every pass, whatever keep floor the policy chose.
    val rnd = new scala.util.Random(4117)
    val root = tmp()
    val base = 1709280000L // 2024-03-01T08:00:00Z
    def iso(sec: Long) = java.time.Instant.ofEpochSecond(sec).toString
    var live = Map[String, Seq[Long]]()
    var hwmSec = base
    var counter = 0
    for (step <- 1 to 24) {
      rnd.nextInt(3) match {
        case 0 => // ingest: 1-3 rows scattered around the moving mark
          counter += 1
          val stamp = f"20240301_$counter%06d"
          val times = Seq.fill(1 + rnd.nextInt(3))(
            base + rnd.nextInt(200000).toLong)
          RawZone.writeRun(parsed(times.map(t =>
            eventJson.replace("2024-03-01T10:00:00Z", iso(t))): _*),
            root, "events", stamp)
          live += stamp -> times
        case 1 => // the fact lands more history
          hwmSec += rnd.nextInt(60000).toLong
        case 2 => // nightly retention pass
          val keep = 1 + rnd.nextInt(2)
          val pruned = RawZone.pruneRunsHwm(spark, root, "events", keep,
            Some(java.sql.Timestamp.from(
              java.time.Instant.ofEpochSecond(hwmSec))), Schemas.rawEvent)
          val expect = live.keys.toSeq.sorted.dropRight(keep)
            .filter(s => live(s).max <= hwmSec)
          assert(pruned === expect, s"step $step (hwm=$hwmSec, keep=$keep)")
          live --= expect.toSet
          // every survivor still on disk, every pruned stamp gone
          val onDisk = new java.io.File(s"$root/events").listFiles()
            .map(_.getName).filter(_.startsWith("run_ts="))
            .map(_.stripPrefix("run_ts=")).toSet
          assert(onDisk === live.keySet, s"step $step: disk diverged")
      }
    }
    // end-state sanity: whatever survived still reads back whole
    if (live.nonEmpty)
      assert(RawZone.readJson(spark, root, "events", Schemas.rawEvent)
        .count() === live.values.map(_.size).sum.toLong)
  }

  test("S6: schema-enforced PERMISSIVE read tolerates corrupt records") {
    val root = tmp()
    import spark.implicits._
    val lines = Seq(eventJson, """{"received_at":"NOT A TIMESTAMP","event_key":"bad"}""",
      """this is not json at all""")
    // write raw text lines as a single-column json file the reader must survive
    Files.createDirectories(java.nio.file.Paths.get(s"$root/events/run_ts=20240301_100000"))
    Files.writeString(
      java.nio.file.Paths.get(s"$root/events/run_ts=20240301_100000/part-0.json"),
      lines.mkString("\n"))
    // Spark disallows querying _corrupt_record on the raw scan directly
    // (SPARK-21610) — cache materializes the parsed rows first.
    val df = RawZone.readJson(spark, root, "events", Schemas.rawEvent).cache()
    assert(df.count() === 3)
    // good row parses fully
    val good = df.filter(col("event_key") === "e1")
    assert(good.select("user_agent_details.browser").as[String].head() === "Firefox")
    assert(good.select("percent_viewed").as[Double].head() === 0.5)
    // unparseable timestamp nulls the field (reference warn-and-null), row kept
    assert(df.filter(col("event_key") === "bad").count() === 1)
    // garbage line lands in _corrupt_record
    assert(df.filter(col("_corrupt_record").isNotNull).count() >= 1)
    // run_ts partition column is surfaced
    assert(df.select(RawZone.RunColumn).distinct().as[String].head() === "20240301_100000")
  }

  test("S6: multiline mode reads reference-style whole-array page files") {
    val root = tmp()
    Files.createDirectories(java.nio.file.Paths.get(s"$root/events/run_ts=20240301_100000"))
    Files.writeString(
      java.nio.file.Paths.get(s"$root/events/run_ts=20240301_100000/page1.json"),
      s"[$eventJson,\n ${eventJson.replace("\"e1\"", "\"e2\"")}]")
    val df = RawZone.readJson(spark, root, "events", Schemas.rawEvent, multiline = true)
      .cache() // SPARK-21610: _corrupt_record unqueryable on the raw scan
    assert(df.count() === 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 0)
    import spark.implicits._
    assert(df.select("event_key").as[String].collect().sorted === Array("e1", "e2"))
  }

  test("S7: readLatestRun reads exactly one run partition") {
    val root = tmp()
    import spark.implicits._
    RawZone.writeRun(parsed(eventJson), root, "events", "20240301_100000")
    RawZone.writeRun(parsed(eventJson, eventJson), root, "events", "20240302_090000")
    val latest = RawZone.readLatestRun(spark, root, "events", Schemas.rawEvent).get
    assert(latest.count() === 2)
    assert(latest.select("media_id").as[String].collect().forall(_ == "m1"))
    // pruning reaches the scan: only the latest partition's files are read
    val scanned = latest.select(input_file_name()).distinct().as[String].collect()
    assert(scanned.forall(_.contains("run_ts=20240302_090000")))
  }

  test("K2/K4/K5: staging + warehouse append/truncate policies") {
    val root = tmp()
    import spark.implicits._
    val df = Seq(("m1", "2024-03-01"), ("m2", "2024-03-02")).toDF("media_id", "date")
    RawZone.stage(df, s"$root/staged")
    assert(spark.read.parquet(s"$root/staged").count() === 2)

    // K4 append accumulates (the reference's at-least-once fact policy, T3)
    RawZone.warehouseAppend(df, s"$root/fact", partitionBy = Seq("date"))
    RawZone.warehouseAppend(df, s"$root/fact", partitionBy = Seq("date"))
    assert(RawZone.warehouse(spark, s"$root/fact").count() === 4)
    // date partitioning materialized on disk
    assert(new java.io.File(s"$root/fact/date=2024-03-01").isDirectory)

    // K5 truncate refresh replaces (the prod dim_media policy, T4)
    RawZone.warehouseOverwrite(df.limit(1), s"$root/dim")
    RawZone.warehouseOverwrite(df, s"$root/dim")
    assert(RawZone.warehouse(spark, s"$root/dim").count() === 2)
  }

  test("staging round-trips the full type surface (struct/map/array/timestamp)") {
    val root = tmp()
    val full = eventJson.dropRight(1) +
      ""","conversion_data": {"a": "1", "b": "2"},
        |"thumbnail": {"url": "u", "width": 3, "height": 4, "fileSize": 5,
        | "contentType": "image/jpeg", "type": "still"}}"""
        .stripMargin.replace("\n", "")
    val df = parsed(full)
    RawZone.stage(df, s"$root/staged")
    val back = spark.read.schema(Schemas.rawEvent).parquet(s"$root/staged")
    val r = back.collect().head
    assert(r.getAs[Map[String, String]]("conversion_data") === Map("a" -> "1", "b" -> "2"))
    assert(r.getAs[org.apache.spark.sql.Row]("thumbnail").getAs[Long]("width") === 3L)
    assert(r.getAs[org.apache.spark.sql.Row]("user_agent_details")
      .getAs[Boolean]("mobile") === false)
    assert(r.getAs[java.sql.Timestamp]("received_at").toInstant.toString
      === "2024-03-01T10:00:00Z")
    // JSONL staging parses back identically through the declared schema
    RawZone.stageJsonl(df, s"$root/jsonl")
    val viaJsonl = spark.read.schema(Schemas.rawEvent).json(s"$root/jsonl")
    assert(viaJsonl.select("conversion_data", "thumbnail", "received_at").collect()
      .head === back.select("conversion_data", "thumbnail", "received_at").collect().head)
  }

  test("bucketed tables co-locate: join plan has no shuffle exchange") {
    import spark.implicits._
    val left = (0L until 1000L).map(i => (i % 100, i)).toDF("k", "a")
    val right = (0L until 500L).map(i => (i % 100, i * 2)).toDF("k", "b")
    RawZone.warehouseBucketed(left, "bk_left", Seq("k"))
    RawZone.warehouseBucketed(right, "bk_right", Seq("k"))
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        val physical = joined.queryExecution.executedPlan.toString
        assert(!physical.contains("Exchange"),
          s"bucketed join must not shuffle:\n$physical")
        assert(joined.count() === 5000) // 10 left x 5 right per key x 100 keys
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }

  test("warehouseMerge: empty batch is a no-op on existing and absent tables") {
    import spark.implicits._
    val path = s"${tmp()}/wh_empty"
    val empty = Seq.empty[(Long, String, Long)].toDF("k", "date", "v")
    // absent table: creates nothing readable but must not throw
    RawZone.warehouseMerge(spark, empty, path,
      keys = Seq("k", "date"), partitionBy = Seq("date"))
    val seed = Seq((1L, "2024-03-01", 10L)).toDF("k", "date", "v")
    RawZone.warehouseMerge(spark, seed, path,
      keys = Seq("k", "date"), partitionBy = Seq("date"))
    // existing table: empty batch leaves it untouched
    RawZone.warehouseMerge(spark, empty, path,
      keys = Seq("k", "date"), partitionBy = Seq("date"))
    assert(RawZone.warehouse(spark, path).count() === 1L)
  }

  test("warehouseMerge: randomized batches match a first-write-wins model") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // seeded: reproducible
    val path = s"${tmp()}/wh"
    val dates = Seq("2024-03-01", "2024-03-02", "2024-03-03")
    // reference model: key -> first-written (collapsed) value
    val model = scala.collection.mutable.LinkedHashMap.empty[(Long, String), Long]
    for (_ <- 1 to 6) {
      val rows = Seq.fill(30)((rnd.nextInt(15).toLong,
        dates(rnd.nextInt(dates.size)), rnd.nextInt(1000).toLong))
      RawZone.warehouseMerge(spark, rows.toDF("k", "date", "v"), path,
        keys = Seq("k", "date"), partitionBy = Seq("date"))
      // model: within-batch collapse = min over the full (k, date, v)
      // struct == min v per key here; then first-write-wins insert
      rows.groupBy(r => (r._1, r._2)).foreach { case (key, grp) =>
        model.getOrElseUpdate(key, grp.map(_._3).min)
      }
      // and a re-run of the SAME batch must be a no-op
      RawZone.warehouseMerge(spark, rows.toDF("k", "date", "v"), path,
        keys = Seq("k", "date"), partitionBy = Seq("date"))
      val got = RawZone.warehouse(spark, path)
        .select(col("k"), col("date").cast("string"), col("v"))
        .as[(Long, String, Long)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(got === model.toMap)
    }
  }
}
