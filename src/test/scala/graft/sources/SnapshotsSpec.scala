package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshots: versioned reads reproduce exact bytes, the pointer flip
  * is the commit (a crashed write — data dir present, pointer not
  * flipped — is invisible), rollback is metadata-only, and vacuum
  * bounds retention without touching the lineage window.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def frame(tag: String, n: Int) =
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")

  test("write/read: pinned versions reproduce exactly; latest follows the pointer") {
    val root = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    val v1 = Snapshots.write(frame("a", 3), root)
    val v2 = Snapshots.write(frame("b", 5), root)
    assert(v1 === 1L && v2 === 2L)
    assert(Snapshots.latestVersion(spark, root) === Some(2L))
    assert(Snapshots.read(spark, root).count() === 5L)
    val pinned = Snapshots.read(spark, root, Some(1L))
    assert(pinned.count() === 3L)
    assert(pinned.filter(col("tag") =!= "a").count() === 0L)
  }

  test("a crashed write (no pointer flip) is invisible and never re-claimed") {
    val root = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    Snapshots.write(frame("a", 3), root)
    // simulate a writer that died after data, before the pointer flip
    frame("orphan", 9).write.parquet(s"$root/_v=2")
    assert(Snapshots.latestVersion(spark, root) === Some(1L))
    assert(Snapshots.read(spark, root).count() === 3L)
    // the next successful write shadows the orphan, never re-claims v2
    val v3 = Snapshots.write(frame("c", 4), root)
    assert(v3 === 3L)
    assert(Snapshots.read(spark, root).count() === 4L)
  }

  test("rollback is a pointer flip; vacuum keeps the newest window") {
    val root = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    (1 to 4).foreach(i => Snapshots.write(frame(s"v$i", i), root))
    Snapshots.commitPointer(spark, root, 3L) // rollback, metadata-only
    assert(Snapshots.read(spark, root).count() === 3L)
    // keep the 2 newest committed (2, 3); version 4 is above the pointer
    // and untouched; version 1 goes
    val dropped = Snapshots.vacuum(spark, root, keep = 2)
    assert(dropped === Seq(1L))
    assert(Snapshots.versions(spark, root) === Seq(2L, 3L, 4L))
    assert(Snapshots.read(spark, root, Some(2L)).count() === 2L)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, root, Some(1L))
    }
  }

  test("nightly pipe6 index rebuild publishes as a snapshot; pinned readers are isolated") {
    // the intended consumer: pipe6's RAG index is REBUILT nightly (the
    // FAISS train side); publishing each rebuild as a snapshot version
    // lets search6/streamingIndexAssign readers pin the version they
    // started with and lets a bad rebuild roll back by pointer flip
    val root = java.nio.file.Files.createTempDirectory("snap").toString + "/rag"
    val small = graft.Registry.queries("pipe6_rag_index")(spark, sf("sf0.001"))
    val v1 = Snapshots.write(small, root)
    val grown = graft.Registry.queries("pipe6_rag_index")(spark, sf("sf0.01"))
    val v2 = Snapshots.write(grown, root)
    assert(v2 === v1 + 1)
    // latest follows the rebuild; the pinned v1 read is bit-equal to the
    // original build, untouched by the rebuild's write
    assert(Snapshots.read(spark, root).count() === grown.count())
    val pinned = Snapshots.read(spark, root, Some(v1))
    assert(pinned.exceptAll(small).count() === 0L)
    assert(small.exceptAll(pinned).count() === 0L)
  }

  test("diff between versions reports added/removed/changed and nothing else") {
    val root = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    val v1 = Snapshots.write(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag"), root)
    val v2 = Snapshots.write(
      Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("id", "tag"), root)
    val d = Snapshots.diff(spark, root, v1, v2, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "removed", 2L -> "changed", 4L -> "added"))
  }

  test("writeTables: one claim covers all tables; a failed table write leaks nothing") {
    val root = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    val v1 = Snapshots.writeTables(Seq(
      "a" -> Seq((1L, "x")).toDF("id", "tag"),
      "b" -> Seq((10L, 100L)).toDF("k", "v")), root)
    assert(Snapshots.latestVersion(spark, root) === Some(v1))
    assert(Snapshots.readTable(spark, root, "a", Some(v1)).count() === 1L)
    assert(Snapshots.readTable(spark, root, "b").count() === 1L)
    // a staged write that THROWS mid-table (the second table's plan
    // fails at execution) must commit nothing: no new version, pointer
    // unchanged, no staging directory left behind
    intercept[Exception] {
      Snapshots.writeTables(Seq(
        "a" -> Seq((2L, "y")).toDF("id", "tag"),
        "b" -> spark.range(1).selectExpr("assert_true(id > 10) AS boom")), root)
    }
    assert(Snapshots.latestVersion(spark, root) === Some(v1))
    assert(Snapshots.versions(spark, root) === Seq(v1))
    val leftovers = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("_staging"))
    assert(leftovers.isEmpty, s"staging leaked: ${leftovers.mkString(",")}")
    // the v1 tables are untouched by the failed attempt
    assert(Snapshots.readTable(spark, root, "a").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "x")))
  }

  test("partitioned snapshots read with partition pruning intact") {
    val root = java.nio.file.Files.createTempDirectory("snap").toString + "/t"
    val df = (1 to 10).map(i => (i.toLong, i % 2)).toDF("id", "p")
    Snapshots.write(df, root, partitionBy = Seq("p"))
    val one = Snapshots.read(spark, root).filter(col("p") === 1)
    assert(one.count() === 5L)
    // the predicate reaches the scan as a partition filter (pruned read)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(p"),
      s"no partition filter in:\n$plan")
  }
}
