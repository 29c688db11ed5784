package graft.sources

import graft.SparkSpec
import graft.wistia.Schemas
import org.apache.spark.sql.functions._

/** DSv2 connector spec: partition-per-page, media_id pushdown pruning,
  * column pruning, and parse parity with Spark's file JSON source —
  * driven over the reference repo's real page files.
  */
class WistiaRawSourceSpec extends SparkSpec {

  private val fixtures = "/root/reference/raw_data"
  private def exists = new java.io.File(fixtures).isDirectory

  private def read = spark.read.format("wistia-raw")
    .schema(Schemas.rawEvent).load(fixtures)

  test("reads all pages as one dataset, partition-per-page") {
    assume(exists)
    val df = read
    assert(df.count() === 934)
    val nPages = new java.io.File(fixtures).listFiles()
      .count(f => f.getName.startsWith("events_") && f.getName.endsWith(".json"))
    assert(df.rdd.getNumPartitions === nPages)
  }

  test("media_id equality pushdown prunes page files before IO") {
    assume(exists)
    val one = read.filter(col("media_id") === "gskhw4w4lm")
    val pagesForMedia = new java.io.File(fixtures).listFiles()
      .count(_.getName.startsWith("events_gskhw4w4lm_"))
    assert(one.rdd.getNumPartitions === pagesForMedia)
    // pushdown is visible in the scan description and results stay exact
    assert(one.queryExecution.executedPlan.toString.contains("pushedMediaId=gskhw4w4lm"))
    assert(one.count() === read.filter(col("media_id") === "gskhw4w4lm").count())
  }

  test("listing goes through Hadoop FS: file:// URI path plans the same pages") {
    assume(exists)
    val viaUri = spark.read.format("wistia-raw")
      .schema(Schemas.rawEvent).load(s"file://$fixtures")
    assert(viaUri.count() === 934)
    assert(viaUri.rdd.getNumPartitions === read.rdd.getNumPartitions)
  }

  test("received_at lower-bound pushdown prunes pages by run stamp (+24h skew)") {
    // synthetic three-day page set: stamp pruning keeps only pages whose
    // stamp + 24h clears the bound; results stay exact because Spark
    // re-evaluates the filter on surviving rows.
    val dir = java.nio.file.Files.createTempDirectory("wistia_stamp").toFile
    def page(name: String, received: String): Unit = {
      val json =
        s"""[{"received_at": "$received", "event_key": "$name",
           |  "visitor_key": "v1", "media_id": "m1"}]""".stripMargin
      java.nio.file.Files.writeString(new java.io.File(dir, name).toPath, json)
    }
    page("events_m1_20250510_120000.json", "2025-05-10T11:00:00.000Z")
    page("events_m1_20250511_120000.json", "2025-05-11T11:00:00.000Z")
    page("events_m1_20250512_120000.json", "2025-05-12T11:00:00.000Z")

    val all = spark.read.format("wistia-raw")
      .schema(Schemas.rawEvent).load(dir.getAbsolutePath)
    assert(all.rdd.getNumPartitions === 3)

    // bound 2025-05-12T10:00Z: day-10 page (stamp+24h = 05-11T12:00 ≤ bound)
    // prunes; day-11 (05-12T12:00 > bound) and day-12 survive.
    val bound = java.sql.Timestamp.from(java.time.Instant.parse("2025-05-12T10:00:00Z"))
    val pruned = all.filter(col("received_at") > lit(bound))
    assert(pruned.rdd.getNumPartitions === 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("pushedSinceMicros="))
    // exactness: only the day-12 event actually passes the row filter
    assert(pruned.select("event_key").collect().map(_.getString(0)).toSeq ===
      Seq("events_m1_20250512_120000.json"))

    // >= behaves identically at the page level
    val prunedGte = all.filter(col("received_at") >= lit(bound))
    assert(prunedGte.rdd.getNumPartitions === 2)

    // media pushdown composes with stamp pushdown
    val both = all.filter(col("media_id") === "m1" && col("received_at") > lit(bound))
    assert(both.rdd.getNumPartitions === 2)
  }

  test("a poisoned page file is isolated, not a failed scan") {
    val dir = java.nio.file.Files.createTempDirectory("wistia_poison").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "events_m1_20250510_120000.json").toPath,
      """[{"received_at": "2025-05-10T11:00:00.000Z", "event_key": "ok",
        |  "visitor_key": "v1", "media_id": "m1"}]""".stripMargin)
    java.nio.file.Files.writeString(
      new java.io.File(dir, "events_m1_20250510_130000.json").toPath,
      """{"this is [not valid json""")

    // schema without _corrupt_record: poisoned page skipped, scan succeeds
    val plain = spark.read.format("wistia-raw")
      .schema(Schemas.rawEvent).load(dir.getAbsolutePath)
    assert(plain.count() === 1)
    assert(plain.select("event_key").collect().head.getString(0) === "ok")

    // schema with _corrupt_record: poisoned page lands as one corrupt row
    val withCorrupt = spark.read.format("wistia-raw")
      .schema(Schemas.rawEvent.add("_corrupt_record", "string"))
      .load(dir.getAbsolutePath).cache()
    assert(withCorrupt.count() === 2)
    val bad = withCorrupt.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() === 1)
    assert(bad.select("_corrupt_record").collect().head.getString(0)
      .contains("events_m1_20250510_130000.json"))
    withCorrupt.unpersist()
  }

  test("column pruning reaches the parser; parity with the json file source") {
    assume(exists)
    val pruned = read.select("visitor_key")
    assert(pruned.queryExecution.executedPlan.toString.contains("readSchema=visitor_key"))
    assert(pruned.distinct().count() === 297)

    // full parse parity with Spark's own multiline JSON reader
    val viaJson = spark.read.schema(Schemas.rawEvent)
      .option("multiLine", "true").json(s"$fixtures/events_*.json")
      .select("event_key", "received_at", "visitor_key", "percent_viewed")
    val viaDsv2 = read.select("event_key", "received_at", "visitor_key", "percent_viewed")
    assert(viaDsv2.exceptAll(viaJson).count() === 0)
    assert(viaJson.exceptAll(viaDsv2).count() === 0)
  }
}
