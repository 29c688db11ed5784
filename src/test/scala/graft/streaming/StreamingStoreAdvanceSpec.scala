package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Streams.streamingStoreAdvance — the nightly store advance at the
  * trigger grain. Two activations over two disjoint batches must leave
  * the store BIT-EQUAL to two sequential batch advances on a twin
  * store; the gates must work ACROSS triggers (a near-dup of a doc
  * accepted in trigger 1 is fuzzy-gated out in trigger 2 because the
  * store advanced between them); and a replayed batch (fresh
  * checkpoint over already-processed files) must commit nothing — the
  * store's own dedup gate makes the at-least-once sink idempotent.
  */
class StreamingStoreAdvanceSpec extends graft.SparkSpec {

  private def words(prefix: String) =
    (1 to 12).map(i => s"$prefix$i").mkString(" ")

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("synth"))
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)
    .add("n_chars", LongType).add("source", StringType)

  test("per-trigger advances equal sequential batch advances; gates work across triggers; replay commits nothing") {
    import graft.operators.TrainPrep
    // bootstrap corpus: store docs + held-out (id % 10 == 0)
    val base = docsDf(Seq(
      (1L, words("gamma")), (2L, words("delta")), (11L, words("epsil")),
      (10L, words("alpha")), (20L, words("beta"))))
    val streamStore = java.nio.file.Files
      .createTempDirectory("graft_ssa_stream").toString
    val twinStore = java.nio.file.Files
      .createTempDirectory("graft_ssa_twin").toString
    TrainPrep.materializeStoreFrom(spark, base, streamStore)
    TrainPrep.materializeStoreFrom(spark, base, twinStore)

    // batch 1: a clean doc, an exact within-batch dup pair (keep-min),
    // and a doc contaminated by held-out doc 10's text
    val batch1 = Seq(
      (31L, words("zeta")),
      (32L, words("theta")), (33L, words("theta")), // dup pair: 32 kept
      (34L, words("alpha")))                        // contaminated: dropped
    // batch 2: a fresh doc + a NEAR-DUP of batch 1's accepted doc 31 —
    // the cross-trigger gate: it must be caught against the ADVANCED
    // store, not the bootstrap
    val batch2 = Seq(
      (41L, words("iota")),
      (42L, words("zeta"))) // identical text to accepted 31 ⇒ rejected

    val inDir = java.nio.file.Files.createTempDirectory("graft_ssa_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssa_ck").toString
    def publish(rows: Seq[(Long, String)]): Unit =
      docsDf(rows).coalesce(1).write.mode("append").parquet(inDir)
    def activate(ck: String): Unit = {
      val stream = spark.readStream.schema(docSchema).parquet(inDir)
      val q = Streams.streamingStoreAdvance(stream, streamStore, ck).start()
      q.awaitTermination(120000)
    }

    publish(batch1)
    activate(ckpt)
    val vAfter1 = graft.sources.Snapshots.latestVersion(spark, streamStore).get
    // accepted set of trigger 1: 31, 32 (33 within-batch dup, 34
    // contaminated)
    val man1 = TrainPrep.storeTable(spark, streamStore, "store_manifest")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(31L, 32L).subsetOf(man1) && !man1.contains(33L) && !man1.contains(34L))

    publish(batch2)
    activate(ckpt)
    val man2 = TrainPrep.storeTable(spark, streamStore, "store_manifest")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(man2.contains(41L), "the fresh doc must advance")
    assert(!man2.contains(42L),
      "the near-dup of trigger 1's accepted doc must be gated vs the ADVANCED store")
    assert(graft.sources.Snapshots.latestVersion(spark, streamStore).get > vAfter1)

    // twin: the same two batches as sequential BATCH advances
    TrainPrep.advanceStoreOver(spark, docsDf(batch1), twinStore)
    TrainPrep.advanceStoreOver(spark, docsDf(batch2), twinStore)
    for (t <- Seq("store_manifest", "store_totals", "store_opens",
        "store_bands", "store_capped", "store_shingles", "test_shingles"))
      assert(rows(TrainPrep.storeTable(spark, streamStore, t)) ===
        rows(TrainPrep.storeTable(spark, twinStore, t)), t)

    // replay: a FRESH checkpoint re-delivers every file; the store's own
    // gates reject all previously-accepted docs, the delta is empty, no
    // version commits — the at-least-once sink is idempotent
    val vFinal = graft.sources.Snapshots.latestVersion(spark, streamStore).get
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_ssa_ck2").toString
    activate(ckpt2)
    assert(graft.sources.Snapshots.latestVersion(spark, streamStore).get === vFinal)

    // mid-stream MAINTENANCE — the deployment discipline the trigger
    // cadence makes real (one chain layer per non-empty trigger):
    // compactLatest cuts the chain between triggers, vacuum reclaims
    // the whole accreted history, and the stream just keeps going
    val vC = graft.sources.Snapshots.compactLatest(spark, streamStore)
    for (t <- Seq("store_manifest", "store_totals", "store_opens",
        "store_bands", "store_capped", "store_shingles", "test_shingles")) {
      assert(!new java.io.File(s"$streamStore/_v=$vC/$t/_base").exists(),
        s"compacted version must be self-contained: $t")
      assert(rows(TrainPrep.storeTable(spark, streamStore, t)) ===
        rows(TrainPrep.storeTable(spark, twinStore, t)), s"post-compaction: $t")
    }
    assert(graft.sources.Snapshots.vacuum(spark, streamStore, keep = 1).nonEmpty)
    assert(graft.sources.Snapshots.versions(spark, streamStore) === Seq(vC))
    // replay against the COMPACTED store: the membership guard reads the
    // compacted manifest, still nothing commits...
    activate(java.nio.file.Files.createTempDirectory("graft_ssa_ck3").toString)
    assert(graft.sources.Snapshots.latestVersion(spark, streamStore).get === vC)
    // ... and a genuinely new trigger still advances
    publish(Seq((51L, words("kappa"))))
    activate(ckpt2)
    assert(TrainPrep.storeTable(spark, streamStore, "store_manifest")
      .select("doc_id").collect().map(_.getLong(0)).toSet.contains(51L))
    assert(graft.sources.Snapshots.latestVersion(spark, streamStore).get > vC)
  }

  test("the in-stream maintenance hook keeps chains bounded and history reclaimed as triggers commit") {
    import graft.operators.TrainPrep
    val base = docsDf(Seq((1L, words("gamma")), (10L, words("alpha"))))
    val store = java.nio.file.Files
      .createTempDirectory("graft_ssa_mt").toString
    TrainPrep.materializeStoreFrom(spark, base, store)
    val inDir = java.nio.file.Files.createTempDirectory("graft_ssa_mtin").toString
    // three distinct-content files → three non-empty triggers, each
    // normally one chain layer
    for ((id, w) <- Seq((31L, "zeta"), (41L, "iota"), (51L, "kappa")))
      docsDf(Seq((id, words(w)))).coalesce(1).write.mode("append").parquet(inDir)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val logDir = java.nio.file.Files
      .createTempDirectory("graft_ssa_mtlog").toString + "/run_log"
    val q = Streams.streamingStoreAdvance(stream, store,
      java.nio.file.Files.createTempDirectory("graft_ssa_mtck").toString,
      maintain = Some((1, 1)), runLogPath = Some(logDir)).start()
    q.awaitTermination(180000)
    // every accepted doc is served...
    val man = TrainPrep.storeTable(spark, store, "store_manifest")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(31L, 41L, 51L).subsetOf(man), man.toString)
    // ...while the aggressive (maxLayers=1, keep=1) policy kept every
    // chain cut and every superseded version reclaimed as the stream ran
    assert(graft.sources.Snapshots.layerReport(spark, store)
      .forall(_._2 === 1))
    assert(graft.sources.Snapshots.versions(spark, store).size === 1,
      graft.sources.Snapshots.versions(spark, store).toString)
    // ...and each NON-no-op maintenance pass left a run-log row (the
    // same observability the batch-side completion flow has) — with
    // this aggressive policy every non-empty trigger compacts+vacuums
    val mrows = graft.sources.RunLog.read(spark, logDir)
      .filter(col("pipeline") === "stream_maintain" &&
        col("stage") === "maintain").collect()
    assert(mrows.nonEmpty, "the firing policy must leave a trail")
    assert(mrows.forall(_.getAs[String]("status") == "ok"))
    assert(mrows.forall(r => r.getAs[String]("error").contains(store) &&
      r.getAs[String]("error").contains("compacted_to=")))
  }

  test("a trigger WAITS out a transiently-held store lease instead of dying") {
    import graft.operators.TrainPrep
    val base = docsDf(Seq((1L, words("gamma")), (10L, words("alpha"))))
    val store = java.nio.file.Files
      .createTempDirectory("graft_ssa_lk").toString
    TrainPrep.materializeStoreFrom(spark, base, store)
    val inDir = java.nio.file.Files.createTempDirectory("graft_ssa_lkin").toString
    docsDf(Seq((31L, words("zeta")))).coalesce(1)
      .write.mode("append").parquet(inDir)
    // a contending holder (a takedown, say) owns the lease; it releases
    // ~1 s into the trigger's retry window
    val lock = new java.io.File(store, "_commit.lock")
    java.nio.file.Files.writeString(lock.toPath, "takedown@elsewhere")
    val releaser = new Thread(() => { Thread.sleep(1000L); lock.delete(); () })
    releaser.start()
    val q = Streams.streamingStoreAdvance(
      spark.readStream.schema(docSchema).parquet(inDir), store,
      java.nio.file.Files.createTempDirectory("graft_ssa_lkck").toString,
      lockRetries = 30, lockWaitMs = 200L).start()
    q.awaitTermination(120000)
    releaser.join()
    // the trigger waited, then advanced
    assert(TrainPrep.storeTable(spark, store, "store_manifest")
      .select("doc_id").collect().map(_.getLong(0)).toSet.contains(31L))
  }
}
