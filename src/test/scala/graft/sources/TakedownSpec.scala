package graft.sources

import org.apache.spark.sql.functions._

/** Takedown.execute — the composed compliance flow through the REAL
  * layers: purge the documents catalog table, republish the RAG index
  * from its purged state, log both steps, and return the diff-backed
  * audit. Drives the sf0.001 corpus end-to-end.
  */
class TakedownSpec extends graft.SparkSpec {

  test("takedown: purge → republish → run log → diff audit, end-to-end") {
    val db = "takedown_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_takedown").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.documents"
    val ragRoot = java.nio.file.Files
      .createTempDirectory("graft_takedown_rag").toString + "/rag"
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_takedown_log").toString + "/runlog.parquet"
    val ts = java.sql.Timestamp.valueOf("2026-08-15 12:00:00")

    // the maintained documents table: the gate corpus, partitioned by a
    // shard column (keys arrive by doc_id — the realistic mismatch)
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .withColumn("shard", pmod(col("doc_id"), lit(4L)))
    Catalog.append(docs.repartition(col("shard")), t, Seq("shard"))
    val nDocs = spark.table(t).count()

    // initial index publish from the table's state (v1)
    val v1 = graft.operators.TrainPrep.publishRagStoreFrom(
      spark, spark.table(t), ragRoot, Some(runLog), ts)
    val doomed = spark.table(t).agg(min("doc_id")).first().getLong(0)
    val doomedChunks = Snapshots.readTable(spark, ragRoot, "chunklens", Some(v1))
      .filter(col("doc_id") === doomed).count()
    assert(doomedChunks > 0L)

    val r = Takedown.execute(spark, Seq(doomed), t, Seq("shard"),
      ragRoot, runLog, ts)
    assert(r.deletedRows === 1L)
    assert(r.ragVersionBefore === Some(v1))
    assert(r.ragVersionAfter === v1 + 1)
    assert(r.chunksRemoved === doomedChunks)

    // source of truth: the doc is physically gone, nothing else is
    assert(spark.table(t).filter(col("doc_id") === doomed).count() === 0L)
    assert(spark.table(t).count() === nDocs - 1L)
    // serving: the latest index no longer contains the doc in ANY table
    for (tbl <- Seq("chunklens", "index", "vecs", "postings"))
      assert(Snapshots.readTable(spark, ragRoot, tbl)
        .filter(col("doc_id") === doomed).count() === 0L, tbl)
    // lineage: the pre-takedown version still answers pinned readers
    // until retention erases it (vacuum is policy, not takedown)
    assert(Snapshots.readTable(spark, ragRoot, "chunklens", Some(v1))
      .filter(col("doc_id") === doomed).count() === doomedChunks)
    assert(Snapshots.vacuum(spark, ragRoot, keep = 1) === Seq(v1))
    intercept[Exception] {
      Snapshots.readTable(spark, ragRoot, "chunklens", Some(v1)).count()
    }
    // job history: one purge row with the deleted count + two publish rows
    val log = RunLog.read(spark, runLog).collect()
    assert(log.count(r0 => r0.getAs[String]("pipeline") == "takedown"
      && r0.getAs[String]("stage") == s"purge_$t"
      && r0.getAs[Long]("rows") == 1L
      && r0.getAs[String]("status") == "ok") === 1)
    assert(log.count(_.getAs[String]("pipeline") == "rag_index") === 2)

    // the compliance evidence table: every id-auditable layer clean
    val ver = Takedown.verifyErasure(spark, Seq(doomed),
      docsTable = Some(t), ragRoot = Some(ragRoot)).collect()
    assert(ver.map(_.getAs[String]("layer")).toSet ===
      Set("documents", "rag_vecs", "rag_index", "rag_postings",
        "rag_chunklens", "rag_tombstone_coverage"))
    assert(ver.forall(_.getAs[Boolean]("clean")),
      ver.filterNot(_.getAs[Boolean]("clean")).mkString(","))
    // and it actually DETECTS leftovers: a still-present doc is flagged
    val present = spark.table(t).agg(min("doc_id")).first().getLong(0)
    val dirty = Takedown.verifyErasure(spark, Seq(present),
      docsTable = Some(t)).collect()
    assert(dirty.length === 1 && !dirty(0).getAs[Boolean]("clean")
      && dirty(0).getAs[Long]("rows_remaining") === 1L)
  }

  test("completeErasure on the RAG root: per-retained-version evidence, then compact+vacuum erases pre-takedown serving history") {
    import spark.implicits._
    val db = "takedown_ce_rag_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_tdce").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.documents"
    val ragRoot = java.nio.file.Files
      .createTempDirectory("graft_tdce_rag").toString + "/rag"
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_tdce_log").toString + "/runlog.parquet"
    val ts = java.sql.Timestamp.valueOf("2026-08-16 10:00:00")
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .withColumn("shard", pmod(col("doc_id"), lit(4L)))
    Catalog.append(docs.repartition(col("shard")), t, Seq("shard"))
    val v1 = graft.operators.TrainPrep.publishRagStoreFrom(
      spark, spark.table(t), ragRoot, Some(runLog), ts)
    val doomed = spark.table(t).agg(min("doc_id")).first().getLong(0)
    val r = Takedown.execute(spark, Seq(doomed), t, Seq("shard"),
      ragRoot, runLog, ts)
    val v2 = r.ragVersionAfter
    // a post-takedown serving advance layers over the takedown rebuild
    def words(p: String) = (1 to 80).map(i => s"$p$i").mkString(" ")
    val v3 = graft.operators.TrainPrep.advanceRagStore(spark,
      Seq((900001L, words("fresh"))).toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("source", lit("synth")), ragRoot)
    assert(v3 > v2)
    // pre-completion: the retained pre-takedown version's residue is a
    // query result — rag_v1 unclean, serving + v2/v3 clean
    val pre = Takedown.verifyErasure(spark, Seq(doomed),
      docsTable = Some(t), ragRoot = Some(ragRoot),
      auditRetainedVersions = true).collect()
      .map(x => x.getAs[String]("layer") ->
        ((x.getAs[Long]("rows_remaining"), x.getAs[Boolean]("clean")))).toMap
    assert(pre(s"rag_v${v1}_residue")._1 > 0L && !pre(s"rag_v${v1}_residue")._2)
    assert(pre(s"rag_v${v2}_residue") === ((0L, true)))
    assert(pre(s"rag_v${v3}_residue") === ((0L, true)))
    assert(pre("rag_chunklens") === ((0L, true)))
    // completion with keep=1: v3's Append chain refs v2 (outside the
    // window) ⇒ compact, then vacuum erases v1/v2/v3 physically
    val c = Takedown.completeErasure(spark, Seq(doomed),
      docsTable = Some(t), ragRoot = Some(ragRoot), keep = 1,
      runLogPath = runLog, runTs = ts)
    assert(c.store.isEmpty && c.rag.nonEmpty)
    val v4 = c.rag.get.compactedTo.getOrElse(fail("compaction expected"))
    assert(c.rag.get.vacuumed.toSet === Set(v1, v2, v3))
    assert(Snapshots.versions(spark, ragRoot) === Seq(v4))
    assert(!new java.io.File(s"$ragRoot/_v=$v1").exists())
    assert(c.complete,
      c.evidence.filter(!col("clean")).collect().mkString(","))
    // serving survives completion: the purged doc is gone, the advanced
    // doc is retrievable, the tombstone registry carried through
    assert(Snapshots.readTable(spark, ragRoot, "chunklens")
      .filter(col("doc_id") === doomed).count() === 0L)
    assert(Snapshots.readTable(spark, ragRoot, "chunklens")
      .filter(col("doc_id") === 900001L).count() > 0L)
    assert(Snapshots.readTable(spark, ragRoot, "tombstones")
      .filter(col("doc_id") === doomed).count() === 1L)
    val log = RunLog.read(spark, runLog)
      .filter(col("pipeline") === "takedown_retention").collect()
      .map(x => x.getAs[String]("stage") -> x.getAs[Long]("rows")).toMap
    assert(log("compact_rag") === v4)
    assert(log("vacuum_rag") === 3L)
    assert(log("erasure_audit") === 0L)
  }

  test("takedown: a publish failure after a successful purge is retried once, both failures logged, error propagates") {
    val db = "takedown_retry_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_tdr").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.documents"
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_tdr_log").toString + "/runlog.parquet"
    val ts = java.sql.Timestamp.valueOf("2026-08-15 12:00:00")
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .withColumn("shard", pmod(col("doc_id"), lit(4L)))
    Catalog.append(docs.repartition(col("shard")), t, Seq("shard"))
    val doomed = spark.table(t).agg(min("doc_id")).first().getLong(0)
    // a regular FILE at the rag root makes every publish attempt fail
    val ragRoot = java.nio.file.Files
      .createTempDirectory("graft_tdr_rag").toString + "/rag"
    java.nio.file.Files.createFile(java.nio.file.Paths.get(ragRoot))
    intercept[Exception] {
      Takedown.execute(spark, Seq(doomed), t, Seq("shard"),
        ragRoot, runLog, ts)
    }
    // the purge half COMMITTED (the non-atomic seam the scaladoc names)
    assert(spark.table(t).filter(col("doc_id") === doomed).count() === 0L)
    val log = RunLog.read(spark, runLog).collect()
    assert(log.count(r => r.getAs[String]("pipeline") == "takedown"
      && r.getAs[String]("status") == "ok") === 1)
    // one failed publish row per attempt — the retry really ran
    assert(log.count(r => r.getAs[String]("pipeline") == "rag_index"
      && r.getAs[String]("status") == "failed") === 2)
  }
}
