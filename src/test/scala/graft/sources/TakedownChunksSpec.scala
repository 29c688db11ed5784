package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Takedown.executeChunks — erasure at the packed-training-chunk grain.
  * Seeds a maintained documents table, the nightly-prep store (a
  * Snapshots multi-table root since r15) and the trainer-read chunk
  * table (a full shard-grain pack — what prior pipe5 runs accumulated),
  * purges a takedown list spanning a heavy shard tail (so trailing
  * chunks VANISH), a mid-shard doc (so a prefix survives untouched) and
  * a never-packed held-out doc (partial-overlap handling), then pins:
  *  (a) the chunk table bit-equals a FROM-SCRATCH pack of the purged
  *      corpus (⇒ no emitted chunk contains any purged doc's tokens);
  *  (b) the rewritten store — ALL SIX tables, including the re-derived
  *      held-out fingerprint universe — bit-equals a from-scratch
  *      materializeStore on the purged corpus;
  *  (c) untouched shards' parquet files are byte-identical (same file
  *      list — neither the trim nor the upsert rewrote them);
  *  (d) a crash injected anywhere mid-flow leaves the pre-takedown
  *      store version committed and readable, and a re-run converges;
  *  (e) a held-out-only takedown rewrites test_shingles so the stored
  *      decontamination gate stops matching the erased doc, and a
  *      repeated identical takedown is a true no-op.
  */
class TakedownChunksSpec extends graft.SparkSpec {

  /** A full shard-grain pack of a store's manifest — what the chunk
    * table holds after every chunk of every prior run: shardChunksOf
    * with the emit floor at 0 for every shard.
    */
  private def fullPack(storeDir: String, docs: DataFrame): DataFrame = {
    val sman = graft.operators.TrainPrep.storeTable(spark, storeDir,
      "store_manifest")
    graft.operators.TrainPrep.shardChunksOf(
      sman.select(col("shard"), col("doc_id"), col("start_off"),
        col("n_tokens")).withColumn("open_start", lit(0L)),
      docs)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def store(dir: String, t: String): DataFrame =
    graft.operators.TrainPrep.storeTable(spark, dir, t)

  private val AllStoreTables = Seq("store_manifest", "store_totals",
    "store_opens", "store_bands", "store_shingles", "test_shingles")

  test("executeChunks: trim + rebuild bit-equal a from-scratch pack; untouched shards keep their files") {
    val d = sf("sf0.001")
    val db = "takedown_chunks_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_tc_db").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val docsT = s"$db.documents"
    val chunksT = s"$db.chunks"
    val storeDir = java.nio.file.Files.createTempDirectory("graft_tc_store").toString
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_tc_log").toString + "/runlog.parquet"
    val ts = java.sql.Timestamp.valueOf("2026-08-15 12:00:00")
    val allDocs = graft.Tables.documents(spark, d)

    // maintained documents table (partitioned so purgeKeys applies)
    Catalog.append(allDocs.withColumn("pt", pmod(col("doc_id"), lit(4L)))
      .repartition(col("pt")), docsT, Seq("pt"))
    // nightly-prep store + accumulated trainer-read chunk table
    val v0 = graft.operators.TrainPrep.materializeStore(spark, d, storeDir)
    Catalog.append(fullPack(storeDir, allDocs).repartition(col("shard")),
      chunksT, Seq("shard"))

    // takedown list: the token-heaviest shard's tail (trailing chunks
    // must vanish), a mid doc of another shard (prefix must survive),
    // and a held-out doc that was never packed
    val sman0 = store(storeDir, "store_manifest")
    val t0 = store(storeDir, "store_totals")
      .orderBy(col("tot0").desc).first()
    val (s0, tot0) = (t0.getAs[Long]("shard"), t0.getAs[Long]("tot0"))
    val tail0 = sman0.filter(col("shard") === s0 &&
        col("start_off") >= lit(tot0 / 2L))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(tail0.nonEmpty)
    val s1 = store(storeDir, "store_totals")
      .filter(col("shard") =!= s0).orderBy(col("tot0").desc)
      .first().getAs[Long]("shard")
    val mid1 = sman0.filter(col("shard") === s1).orderBy("start_off")
      .limit(3).orderBy(col("start_off").desc)
      .first().getAs[Long]("doc_id") // 3rd doc: two docs pack before it
    val heldOut = allDocs.filter(col("doc_id") % 10 === 0)
      .agg(min("doc_id")).first().getLong(0)
    val doomed = tail0 :+ mid1 :+ heldOut
    val nManifestDoomed = tail0.size + 1L

    val untouchedFiles = spark.table(chunksT)
      .filter(col("shard") =!= s0 && col("shard") =!= s1)
      .inputFiles.sorted.toSeq
    assert(untouchedFiles.nonEmpty)

    // the flow: source-of-truth purge, then the chunk-grain erasure
    import spark.implicits._
    val deletedDocs = Catalog.purgeKeys(spark, docsT,
      doomed.toDF("doc_id"), Seq("pt"))
    assert(deletedDocs === doomed.size.toLong)
    val r = Takedown.executeChunks(spark, doomed, docsT, storeDir,
      chunksT, runLog, ts)
    assert(r.manifestRowsPurged === nManifestDoomed)
    assert(r.shardsTouched === 2L)
    assert(r.chunksRewritten > 0L)
    assert(r.chunksDeleted > 0L, "the shard tail purge must retire trailing chunk ids")
    assert(r.storeVersion > v0)
    assert(Snapshots.latestVersion(spark, storeDir) === Some(r.storeVersion))

    // (a)+(b): from-scratch reference on the purged corpus — ALL SIX
    // store tables, incl. the held-out fingerprint universe (a held-out
    // doc is in the takedown list, so test_shingles must re-derive)
    val store2 = java.nio.file.Files.createTempDirectory("graft_tc_ref").toString
    val purgedDocs = allDocs.filter(!col("doc_id").isin(doomed: _*))
    graft.operators.TrainPrep.materializeStoreFrom(spark, purgedDocs, store2)
    val ref = fullPack(store2, purgedDocs)
    // the catalog table reorders the partition column last — align
    assert(rows(spark.table(chunksT).select(ref.columns.map(col): _*))
      === rows(ref))
    for (t <- AllStoreTables)
      assert(rows(store(storeDir, t)) === rows(store(store2, t)), t)
    // store_capped CARRIES rather than re-deriving (caveat (b): a
    // bucket dropped at original write stays dropped — its rows were
    // never stored to restore — so from-scratch equality is not the
    // contract for this table; empty-at-this-scale makes them equal
    // here anyway, but the pin is the carry)
    assert(rows(store(storeDir, "store_capped")) ===
      rows(Snapshots.readTable(spark, storeDir, "store_capped", Some(v0))))

    // the PRE-takedown store version stays pinned-readable (compliance
    // window: retention policy, not the takedown, decides its vacuum)
    assert(Snapshots.readTable(spark, storeDir, "store_manifest", Some(v0))
      .join(doomed.toDF("doc_id"), Seq("doc_id"), "left_semi")
      .count() === nManifestDoomed)

    // (c): untouched shards' files byte-identical (same paths — nothing
    // rewrote them)
    assert(spark.table(chunksT)
      .filter(col("shard") =!= s0 && col("shard") =!= s1)
      .inputFiles.sorted.toSeq === untouchedFiles)

    // job history: every step logged ok
    val log = RunLog.read(spark, runLog)
      .filter(col("pipeline") === "takedown_chunks")
      .select("stage", "status").collect()
      .map(r0 => r0.getString(0) -> r0.getString(1)).toMap
    assert(log === Map(
      s"rebuild_$chunksT" -> "ok", s"trim_$chunksT" -> "ok",
      s"upsert_$chunksT" -> "ok", "store_rewrite" -> "ok"))

    // idempotence of the layout: a second takedown of the same ids finds
    // nothing left to erase (the store already reflects the purge — the
    // held-out drift check reports zero, so NO new version commits)
    val r2 = Takedown.executeChunks(spark, doomed, docsT, storeDir,
      chunksT, runLog, ts)
    assert(r2 === Takedown.ChunksResult(0L, 0L, 0L, 0L, r.storeVersion))
    assert(Snapshots.latestVersion(spark, storeDir) === Some(r.storeVersion))

    // the compliance evidence table over the pack-store layers — incl.
    // the structural test_shingles drift layer (docsTable + storeDir)
    val ver = Takedown.verifyErasure(spark, doomed,
      docsTable = Some(docsT), storeDir = Some(storeDir)).collect()
    assert(ver.map(_.getAs[String]("layer")).toSet ===
      Set("documents", "store_manifest", "store_bands", "store_shingles",
        "test_shingles", "tombstone_coverage"))
    assert(ver.forall(_.getAs[Boolean]("clean")),
      ver.filterNot(_.getAs[Boolean]("clean")).mkString(","))
  }

  test("executeChunks: a crash injected mid-flow leaves the old store version committed; a re-run converges") {
    val d = sf("sf0.001")
    val db = "takedown_crash_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_tcr_db").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val docsT = s"$db.documents"
    val chunksT = s"$db.chunks"
    val storeDir = java.nio.file.Files.createTempDirectory("graft_tcr_store").toString
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_tcr_log").toString + "/runlog.parquet"
    val ts = java.sql.Timestamp.valueOf("2026-08-15 12:00:00")
    val allDocs = graft.Tables.documents(spark, d)
    Catalog.append(allDocs.withColumn("pt", pmod(col("doc_id"), lit(4L)))
      .repartition(col("pt")), docsT, Seq("pt"))
    val v0 = graft.operators.TrainPrep.materializeStore(spark, d, storeDir)
    Catalog.append(fullPack(storeDir, allDocs).repartition(col("shard")),
      chunksT, Seq("shard"))
    val sman0v0 = rows(store(storeDir, "store_manifest"))

    // doom two mid-shard packed docs
    val doomed = store(storeDir, "store_manifest")
      .orderBy("shard", "start_off").limit(2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    import spark.implicits._
    Catalog.purgeKeys(spark, docsT, doomed.toDF("doc_id"), Seq("pt"))

    // crash 1: before anything lands (the rebuild step) — pure abort
    intercept[IllegalStateException] {
      Takedown.executeChunks(spark, doomed, docsT, storeDir, chunksT,
        runLog, ts, failpointBefore = s"rebuild_$chunksT")
    }
    assert(Snapshots.latestVersion(spark, storeDir) === Some(v0))
    assert(rows(store(storeDir, "store_manifest")) === sman0v0)

    // crash 2: after the chunk-table trim+upsert but BEFORE the store
    // rewrite — the window the r14 flat layout could not survive. The
    // chunk table is mid-takedown, but the store still serves v0
    // consistently (all six tables the pre-takedown state).
    intercept[IllegalStateException] {
      Takedown.executeChunks(spark, doomed, docsT, storeDir, chunksT,
        runLog, ts, failpointBefore = "store_rewrite")
    }
    assert(Snapshots.latestVersion(spark, storeDir) === Some(v0))
    assert(rows(store(storeDir, "store_manifest")) === sman0v0)

    // re-run with no failpoint: converges to exactly the from-scratch
    // state (chunk table AND all six store tables)
    val r = Takedown.executeChunks(spark, doomed, docsT, storeDir,
      chunksT, runLog, ts)
    assert(r.storeVersion > v0)
    val store2 = java.nio.file.Files.createTempDirectory("graft_tcr_ref").toString
    val purgedDocs = allDocs.filter(!col("doc_id").isin(doomed: _*))
    graft.operators.TrainPrep.materializeStoreFrom(spark, purgedDocs, store2)
    val ref = fullPack(store2, purgedDocs)
    assert(rows(spark.table(chunksT).select(ref.columns.map(col): _*))
      === rows(ref))
    for (t <- AllStoreTables)
      assert(rows(store(storeDir, t)) === rows(store(store2, t)), t)
  }

  test("held-out-only takedown: test_shingles re-derives, the stored decontamination gate releases, repeat is a no-op") {
    import spark.implicits._
    // synthetic corpus with full control over the id conventions:
    //   10, 20 — held-out (id % 10 == 0); 10 shares NO text with 20
    //   1, 2, 11 — store docs (id % 10 != 0, id % 7 != 3)
    //   3 — batch doc (id % 7 == 3) whose text EQUALS held-out doc 10's
    //       ⇒ decontamination (pipe3 stage 4) drops it while 10's
    //       fingerprints are stored, accepts it after their erasure
    def words(prefix: String) =
      (1 to 12).map(i => s"$prefix$i").mkString(" ")
    val tA = words("alpha")   // doc 10 and batch doc 3
    val tB = words("beta")    // doc 20
    val docs = Seq(
      (10L, tA), (20L, tB),
      (1L, words("gamma")), (2L, words("delta")), (11L, words("epsil")),
      (3L, tA))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("synth"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tho").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val db = "takedown_heldout_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_tho_db").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val docsT = s"$db.documents"
    val chunksT = s"$db.chunks"
    Catalog.append(docs.withColumn("pt", pmod(col("doc_id"), lit(2L)))
      .repartition(col("pt")), docsT, Seq("pt"))
    val storeDir = java.nio.file.Files.createTempDirectory("graft_tho_store").toString
    val v0 = graft.operators.TrainPrep.materializeStore(spark, dir, storeDir)
    Catalog.append(fullPack(storeDir, docs).repartition(col("shard")),
      chunksT, Seq("shard"))
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_tho_log").toString + "/runlog.parquet"
    val ts = java.sql.Timestamp.valueOf("2026-08-15 12:00:00")

    // BEFORE: the stored gate (pipe3FromStore stage 4) rejects batch
    // doc 3 — its shingles all match held-out doc 10's fingerprints
    def acceptedBatchDocs(): Set[Long] =
      graft.operators.TrainPrep.pipe3ManifestFromStore(spark, dir, storeDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acceptedBatchDocs() === Set.empty)

    // the takedown: held-out doc 10 — never packed, so no chunk work,
    // but the fingerprint universe must re-derive
    Catalog.purgeKeys(spark, docsT, Seq(10L).toDF("doc_id"), Seq("pt"))
    val r = Takedown.executeChunks(spark, Seq(10L), docsT, storeDir,
      chunksT, runLog, ts)
    assert((r.manifestRowsPurged, r.shardsTouched, r.chunksRewritten,
      r.chunksDeleted) === ((0L, 0L, 0L, 0L)))
    assert(r.storeVersion > v0)

    // test_shingles bit-equals a from-scratch derivation on the purged
    // corpus (only doc 20's fingerprints remain)
    val purged = docs.filter(col("doc_id") =!= 10L)
    assert(rows(store(storeDir, "test_shingles")) ===
      rows(graft.operators.TrainPrep.testShinglesOf(purged)))
    // every other table carried forward unchanged
    for (t <- AllStoreTables.filterNot(_ == "test_shingles"))
      assert(rows(store(storeDir, t)) ===
        rows(Snapshots.readTable(spark, storeDir, t, Some(v0))), t)

    // AFTER: the gate releases batch doc 3 (dc1/dc2 no longer match
    // the erased doc's shingles); it must NOT release anything else
    assert(acceptedBatchDocs() === Set(3L))

    // the evidence table gains the structural layer and reports clean
    val ver = Takedown.verifyErasure(spark, Seq(10L),
      docsTable = Some(docsT), storeDir = Some(storeDir)).collect()
    assert(ver.map(_.getAs[String]("layer")).toSet.contains("test_shingles"))
    assert(ver.forall(_.getAs[Boolean]("clean")),
      ver.filterNot(_.getAs[Boolean]("clean")).mkString(","))

    // repeat of the identical takedown: drift is zero ⇒ true no-op, no
    // new version
    val r2 = Takedown.executeChunks(spark, Seq(10L), docsT, storeDir,
      chunksT, runLog, ts)
    assert(r2 === Takedown.ChunksResult(0L, 0L, 0L, 0L, r.storeVersion))
    assert(Snapshots.latestVersion(spark, storeDir) === Some(r.storeVersion))
  }

  test("a takedown CUTS the advance's append chain: vacuum then physically erases every pre-takedown version") {
    import spark.implicits._
    // the retention end-to-end the layered commits make subtle: nightly
    // advances commit batch-sized Append/Carry layers whose chains PIN
    // their history against vacuum (a retained read must not dangle) —
    // so physical erasure has to come from the takedown commit being
    // self-contained (all-Full, referencing nothing). This pins all
    // three acts: the chain protects history from vacuum while it
    // serves, the takedown cuts it, and the next vacuum reclaims every
    // pre-takedown byte while the store still serves the purged state.
    def words(prefix: String) =
      (1 to 12).map(i => s"$prefix$i").mkString(" ")
    val docs = Seq(
      (10L, words("alpha")), (20L, words("beta")), // held-out
      (1L, words("gamma")), (2L, words("delta")), (11L, words("epsil")),
      (3L, words("zeta"))) // batch doc (id % 7 == 3), unique text
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("synth"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tcut").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val db = "takedown_chaincut_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_tcut_db").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val docsT = s"$db.documents"
    val chunksT = s"$db.chunks"
    Catalog.append(docs.withColumn("pt", pmod(col("doc_id"), lit(2L)))
      .repartition(col("pt")), docsT, Seq("pt"))
    val storeDir = java.nio.file.Files.createTempDirectory("graft_tcut_store").toString
    val v1 = graft.operators.TrainPrep.materializeStore(spark, dir, storeDir)
    // night 2: the advance accepts batch doc 3 as a LAYERED commit
    val v2 = graft.operators.TrainPrep.advanceStore(spark, dir, storeDir)
    assert(v2 > v1)
    def baseOf(v: Long, t: String): Boolean =
      new java.io.File(s"$storeDir/_v=$v/$t/_base").exists()
    assert(baseOf(v2, "store_manifest") && baseOf(v2, "test_shingles"))
    Catalog.append(fullPack(storeDir, docs).repartition(col("shard")),
      chunksT, Seq("shard"))

    // while the chain serves, vacuum must SPARE its base: v1 is the
    // only reclaim candidate and v2's chain references it
    assert(Snapshots.vacuum(spark, storeDir, keep = 1) === Nil)
    assert(Snapshots.versions(spark, storeDir) === Seq(v1, v2))

    // the takedown dooms a PACKED store doc → Full store rewrite
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_tcut_log").toString + "/runlog.parquet"
    val ts = java.sql.Timestamp.valueOf("2026-08-15 12:00:00")
    Catalog.purgeKeys(spark, docsT, Seq(1L).toDF("doc_id"), Seq("pt"))
    val r = Takedown.executeChunks(spark, Seq(1L), docsT, storeDir,
      chunksT, runLog, ts)
    assert(r.manifestRowsPurged === 1L)
    val v3 = r.storeVersion
    // the CUT, structurally: no table of the takedown version carries a
    // base reference
    for (t <- AllStoreTables :+ "store_capped")
      assert(!baseOf(v3, t), s"takedown version must not reference: $t")

    // now vacuum reclaims the WHOLE pre-takedown history — v1 (the
    // chain base holding the erased doc's bytes) and v2 alike
    assert(Snapshots.vacuum(spark, storeDir, keep = 1) === Seq(v1, v2))
    assert(Snapshots.versions(spark, storeDir) === Seq(v3))
    // ... and the store still serves the purged state: doc 1 gone, the
    // advanced doc 3 still packed, evidence table clean — including the
    // tombstone-coverage layer (the re-entry guard registered)
    val manifest = store(storeDir, "store_manifest")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!manifest.contains(1L) && manifest.contains(3L))
    val ver = Takedown.verifyErasure(spark, Seq(1L),
      docsTable = Some(docsT), storeDir = Some(storeDir)).collect()
    assert(ver.map(_.getAs[String]("layer")).contains("tombstone_coverage"))
    assert(ver.forall(_.getAs[Boolean]("clean")),
      ver.filterNot(_.getAs[Boolean]("clean")).mkString(","))

    // the RESURRECTION pin: an at-least-once replay of PRE-takedown
    // input re-delivers the erased doc's row — the tombstone guard
    // must drop it (the membership guard cannot: the purge removed the
    // id, so it looks fresh) while a genuinely new doc in the same
    // batch still advances
    val replay = docs.filter(col("doc_id") === 1L)
      .unionByName(Seq((17L, words("fresh")))
        .toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")))
        .withColumn("source", lit("synth")))
    val v4 = graft.operators.TrainPrep.advanceStoreOver(spark, replay, storeDir)
    assert(v4 > v3)
    val manifest2 = store(storeDir, "store_manifest")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!manifest2.contains(1L),
      "a tombstoned id must never re-enter via an ingest replay")
    assert(manifest2.contains(17L), "the guard must be surgical")

    // a takedown of a NEVER-ingested id still registers the obligation
    // (a nothing-erased layered commit), and repeating it is a no-op
    val r9 = Takedown.executeChunks(spark, Seq(999L), docsT, storeDir,
      chunksT, runLog, ts)
    assert(r9.storeVersion > v4)
    assert(store(storeDir, "store_tombstones")
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 999L))
    val r10 = Takedown.executeChunks(spark, Seq(999L), docsT, storeDir,
      chunksT, runLog, ts)
    assert(r10 === Takedown.ChunksResult(0L, 0L, 0L, 0L, r9.storeVersion))
  }

  test("completeErasure: retained pre-takedown versions are a QUERY RESULT, then compact+vacuum physically erases them and the re-audit is clean") {
    import spark.implicits._
    def words(prefix: String) =
      (1 to 12).map(i => s"$prefix$i").mkString(" ")
    val docs = Seq(
      (10L, words("alpha")), (20L, words("beta")), // held-out
      (1L, words("gamma")), (2L, words("delta")), (11L, words("epsil")),
      (3L, words("zeta")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("synth"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ce").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val db = "complete_erasure_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_ce_db").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val docsT = s"$db.documents"
    val chunksT = s"$db.chunks"
    Catalog.append(docs.withColumn("pt", pmod(col("doc_id"), lit(2L)))
      .repartition(col("pt")), docsT, Seq("pt"))
    val storeDir = java.nio.file.Files.createTempDirectory("graft_ce_store").toString
    val v1 = graft.operators.TrainPrep.materializeStore(spark, dir, storeDir)
    val v2 = graft.operators.TrainPrep.advanceStore(spark, dir, storeDir)
    Catalog.append(fullPack(storeDir, docs).repartition(col("shard")),
      chunksT, Seq("shard"))
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_ce_log").toString + "/runlog.parquet"
    val ts = java.sql.Timestamp.valueOf("2026-08-16 09:00:00")
    // the takedown (chain-cut commit v3), then a post-takedown advance
    // (v4 layers over v3) — the realistic shape where completion runs
    // while nightly ingestion has already moved on
    Catalog.purgeKeys(spark, docsT, Seq(1L).toDF("doc_id"), Seq("pt"))
    val v3 = Takedown.executeChunks(spark, Seq(1L), docsT, storeDir,
      chunksT, runLog, ts).storeVersion
    val v4 = graft.operators.TrainPrep.advanceStoreOver(spark,
      Seq((17L, words("fresh"))).toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")))
        .withColumn("source", lit("synth")), storeDir)
    assert(v4 > v3)

    // BEFORE completion the evidence table must SAY the pre-takedown
    // versions still hold the erased id — a query result, not a
    // retention-policy doc comment. Serving latest is clean; the
    // retained v1/v2 layers are not.
    val pre = Takedown.verifyErasure(spark, Seq(1L),
      docsTable = Some(docsT), storeDir = Some(storeDir),
      auditRetainedVersions = true).collect()
      .map(r => r.getAs[String]("layer") ->
        (r.getAs[Long]("rows_remaining"), r.getAs[Boolean]("clean"))).toMap
    assert(pre("store_manifest") === ((0L, true))) // serving clean
    assert(pre(s"store_v${v1}_residue")._1 > 0L &&
      !pre(s"store_v${v1}_residue")._2,
      "the pre-takedown version must report its residue")
    assert(pre(s"store_v${v2}_residue")._1 > 0L)
    assert(pre(s"store_v${v3}_residue") === ((0L, true)))
    assert(pre(s"store_v${v4}_residue") === ((0L, true)))

    // completion with an immediate SLA (keep = 1): v4's chain refs v3
    // (outside the window) ⇒ compact to a self-contained v5, then
    // vacuum reclaims EVERY earlier version — physically
    val c = Takedown.completeErasure(spark, Seq(1L),
      docsTable = Some(docsT), storeDir = Some(storeDir), keep = 1,
      runLogPath = runLog, runTs = ts)
    val v5 = c.store.get.compactedTo.getOrElse(fail("compaction expected"))
    assert(c.store.get.vacuumed.toSet === Set(v1, v2, v3, v4))
    assert(Snapshots.versions(spark, storeDir) === Seq(v5))
    for (v <- Seq(v1, v2, v3, v4))
      assert(!new java.io.File(s"$storeDir/_v=$v").exists(),
        s"pre-completion _v=$v must be physically gone")
    // the re-audit: every layer — serving AND every retained version —
    // clean, from the returned evidence itself
    assert(c.complete, c.evidence.filter(!col("clean")).collect().mkString(","))
    val layers = c.evidence.collect().map(_.getAs[String]("layer")).toSet
    assert(layers.contains(s"store_v${v5}_residue"))
    assert(layers.contains("tombstone_coverage"))
    // the store still SERVES the advanced, purged state after completion
    val man = store(storeDir, "store_manifest")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!man.contains(1L) && man.contains(3L) && man.contains(17L))
    // one run-log row per completion step
    val log = RunLog.read(spark, runLog)
      .filter(col("pipeline") === "takedown_retention").collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("rows")).toMap
    assert(log("compact_store") === v5)
    assert(log("vacuum_store") === 4L)
    assert(log("erasure_audit") === 0L)

    // a LOOSE SLA is honest, not silent: after another takedown with a
    // wide keep window, the retained pre-takedown version's layer
    // reports residue and `complete` is false
    Catalog.purgeKeys(spark, docsT, Seq(2L).toDF("doc_id"), Seq("pt"))
    val v6 = Takedown.executeChunks(spark, Seq(2L), docsT, storeDir,
      chunksT, runLog, ts).storeVersion
    val c2 = Takedown.completeErasure(spark, Seq(2L),
      docsTable = Some(docsT), storeDir = Some(storeDir), keep = 5,
      runLogPath = runLog, runTs = ts)
    assert(!c2.complete, "a retained unclean version must fail `complete`")
    val ev2 = c2.evidence.collect()
      .map(r => r.getAs[String]("layer") ->
        r.getAs[Boolean]("clean")).toMap
    assert(!ev2(s"store_v${v5}_residue"), "v5 still holds doc 2")
    assert(ev2(s"store_v${v6}_residue"))
  }

  test("a PRE-registry store upgrades in place: advance and takedown introduce the tombstone table, never demand a re-materialization") {
    import spark.implicits._
    def words(prefix: String) =
      (1 to 12).map(i => s"$prefix$i").mkString(" ")
    val docs = Seq(
      (10L, words("alpha")), (20L, words("beta")),
      (1L, words("gamma")), (2L, words("delta")), (11L, words("epsil")),
      (3L, words("zeta")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("synth"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tpre").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val db = "takedown_preregistry_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_tpre_db").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val docsT = s"$db.documents"
    val chunksT = s"$db.chunks"
    Catalog.append(docs.withColumn("pt", pmod(col("doc_id"), lit(2L)))
      .repartition(col("pt")), docsT, Seq("pt"))
    val storeDir = java.nio.file.Files.createTempDirectory("graft_tpre_store").toString
    val v1 = graft.operators.TrainPrep.materializeStore(spark, dir, storeDir)
    // simulate a store published before the registry existed
    def deleteDir(p: String): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
    deleteDir(s"$storeDir/_v=$v1/store_tombstones")
    assert(!Snapshots.tableNames(spark, storeDir, v1).contains("store_tombstones"))

    // BEFORE any upgrade, the evidence table says the guard is NOT in
    // force — honest, not a crash
    val ver0 = Takedown.verifyErasure(spark, Seq(1L),
      storeDir = Some(storeDir)).collect()
    assert(ver0.find(_.getAs[String]("layer") == "tombstone_coverage")
      .exists(!_.getAs[Boolean]("clean")))

    // the nightly advance runs against the old layout and INTRODUCES
    // the registry (empty — no obligations yet)
    val v2 = graft.operators.TrainPrep.advanceStore(spark, dir, storeDir)
    assert(v2 > v1)
    assert(store(storeDir, "store_tombstones").isEmpty)

    // a takedown registers into it; the evidence table reads clean
    Catalog.append(fullPack(storeDir, docs).repartition(col("shard")),
      chunksT, Seq("shard"))
    val runLog = java.nio.file.Files
      .createTempDirectory("graft_tpre_log").toString + "/runlog.parquet"
    Catalog.purgeKeys(spark, docsT, Seq(1L).toDF("doc_id"), Seq("pt"))
    val r = Takedown.executeChunks(spark, Seq(1L), docsT, storeDir, chunksT,
      runLog, java.sql.Timestamp.valueOf("2026-08-15 12:00:00"))
    assert(r.manifestRowsPurged === 1L)
    assert(store(storeDir, "store_tombstones")
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
    val ver1 = Takedown.verifyErasure(spark, Seq(1L),
      docsTable = Some(docsT), storeDir = Some(storeDir)).collect()
    assert(ver1.forall(_.getAs[Boolean]("clean")),
      ver1.filterNot(_.getAs[Boolean]("clean")).mkString(","))
  }

  test("the audit set is DERIVED from the version's surface: a planted id-bearing table is audited, never silently excluded") {
    import spark.implicits._
    def words(prefix: String) = (1 to 12).map(i => s"$prefix$i").mkString(" ")
    val docs = Seq((1L, words("alpha")), (2L, words("beta")),
        (10L, words("gamma")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("synth"))
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_tdaudit").toString
    graft.operators.TrainPrep.materializeStoreFrom(spark, docs, storeDir)
    val v0 = Snapshots.latestVersion(spark, storeDir).get
    // a future engine adds an id-bearing side table the audit code
    // has never heard of — commit it alongside carries of everything
    val carried = Snapshots.tableNames(spark, storeDir, v0).map(t =>
      t -> (Snapshots.Carry(v0): Snapshots.TableSpec))
    Snapshots.writeTablesSpec(spark, carried :+
      ("planted_ids" -> (Snapshots.Full(Seq((1L, "residue"))
        .toDF("doc_id", "note")): Snapshots.TableSpec)), storeDir)
    // the derived audit set picks it up at the serving latest...
    val ver = Takedown.verifyErasure(spark, Seq(1L),
      storeDir = Some(storeDir), auditRetainedVersions = true).collect()
      .map(r => r.getAs[String]("layer") ->
        (r.getAs[Long]("rows_remaining"), r.getAs[Boolean]("clean"))).toMap
    assert(ver.contains("planted_ids"),
      s"planted table missing from the evidence: ${ver.keySet}")
    assert(ver("planted_ids") === ((1L, false)),
      "the planted residue must be reported, not silently excluded")
    // ...and per retained version: the planted version's layer carries
    // the residue, the pre-plant version audits only its own tables
    // (doc 1 was never erased here — this pins AUDIT COVERAGE, not an
    // erasure: every id-bearing layer must count it, planted included)
    val v1 = Snapshots.latestVersion(spark, storeDir).get
    assert(!ver(s"store_v${v1}_residue")._2)
    assert(ver(s"store_v${v1}_residue")._1 ===
      ver(s"store_v${v0}_residue")._1 + 1L,
      "the planted version's layer must count exactly the planted row on top")
    // the derivation itself: id-bearing ⇔ carries a doc_id column,
    // tombstone registries excluded by design
    assert(Takedown.idBearingTables(spark, storeDir, v1).toSet ===
      Set("store_manifest", "store_bands", "store_shingles", "planted_ids"))
  }
}
