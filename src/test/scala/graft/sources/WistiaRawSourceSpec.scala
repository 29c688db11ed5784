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
