package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TrainPrep.advanceStore — the nightly incremental advance of the
  * versioned pack store: tonight's accepted batch folds into a new
  * snapshot version whose order-independent tables are BIT-EQUAL to a
  * from-scratch build over the combined membership, whose manifest
  * appends without shifting anything already written, and whose replay
  * (same night, advanced store) is a true no-op. The cap algebra that
  * makes the band index exact ([[TrainPrep.advanceBands]]) is pinned
  * separately with constructed frames — no MinHash collisions needed to
  * exercise carry / transition / swallow.
  */
class AdvanceStoreSpec extends graft.SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def store(dir: String, t: String): DataFrame =
    TrainPrep.storeTable(spark, dir, t)

  test("advanceStore: order-independent tables bit-equal from-scratch; manifest appends; replay no-op; old version pinned") {
    val d = sf("sf0.001")
    val storeDir = java.nio.file.Files.createTempDirectory("graft_adv").toString
    val v1 = TrainPrep.materializeStore(spark, d, storeDir)
    val man0 = rows(store(storeDir, "store_manifest"))
    val acc = TrainPrep.pipe3ManifestFromStore(spark, d, storeDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("shard"), r.getAs[Long]("start_off"))).toSeq
    assert(acc.nonEmpty, "the batch must accept something for this pin to bite")

    val v2 = TrainPrep.advanceStore(spark, d, storeDir)
    assert(v2 > v1)
    assert(graft.sources.Snapshots.latestVersion(spark, storeDir) === Some(v2))

    // from-scratch reference over the COMBINED membership: the static
    // store convention plus tonight's accepted ids
    import spark.implicits._
    val docs = graft.Tables.documents(spark, d)
    val nWords = size(split(col("text"), " ")).cast("long")
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")
    val combined = docs
      .filter(nWords >= 10L && nAlpha * 2L > col("n_chars"))
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 =!= 3)
      .unionByName(docs.join(acc.map(_._1).toDF("doc_id"),
        Seq("doc_id"), "left_semi"))
    val refDir = java.nio.file.Files.createTempDirectory("graft_adv_ref").toString
    TrainPrep.materializeStoreOver(spark, combined, docs, refDir)
    for (t <- Seq("store_bands", "store_capped", "store_tombstones",
        "store_shingles", "test_shingles", "store_totals", "store_opens"))
      assert(rows(store(storeDir, t)) === rows(store(refDir, t)), t)

    // the manifest deliberately does NOT equal from-scratch (append-only
    // offsets never shift) — it equals old ∪ the accepted rows with the
    // store's hkey convention
    val hkey = conv(substring(md5(
      concat(col("doc_id").cast("string"), lit(":42"))), 1, 15), 16, 10)
      .cast("long")
    val accMan = rows(acc.toDF("doc_id", "n_tokens", "shard", "start_off")
      .withColumn("hkey", hkey)
      .select(store(storeDir, "store_manifest").columns.map(col): _*))
    assert(rows(store(storeDir, "store_manifest")) === man0 ++ accMan)
    // ... and from-scratch would have shifted offsets: same keys, at
    // least one different start_off (the interleave is the reason the
    // manifest is exempt above)
    assert(rows(store(refDir, "store_manifest")) !== man0 ++ accMan)

    // the pre-advance version stays pinned-readable
    assert(rows(graft.sources.Snapshots.readTable(spark, storeDir,
      "store_manifest", Some(v1))) === man0)

    // the commit itself was BATCH-sized (the layered-snapshot pin): the
    // manifest landed as an Append layer over v1 with a delta of exactly
    // the accepted rows, and the corpus-static fingerprint universe as a
    // Carry reference with zero data files of its own
    def baseOf(t: String): Option[Long] = {
      val f = new java.io.File(s"$storeDir/_v=$v2/$t/_base")
      if (!f.exists()) None else Some(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong)
    }
    assert(baseOf("store_manifest") === Some(v1))
    assert(spark.read.parquet(s"$storeDir/_v=$v2/store_manifest/_delta")
      .count() === acc.size.toLong)
    assert(baseOf("test_shingles") === Some(v1))
    assert(!new java.io.File(s"$storeDir/_v=$v2/test_shingles").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    assert(baseOf("store_shingles") === Some(v1))

    // replay the same night against the advanced store: every accepted
    // doc now sits in the band index and fuzzy-gates its replay out —
    // nothing accepted, no empty version committed, pipe5 emits nothing
    assert(TrainPrep.pipe3ManifestFromStore(spark, d, storeDir).isEmpty)
    assert(TrainPrep.advanceStore(spark, d, storeDir) === v2)
    assert(graft.sources.Snapshots.latestVersion(spark, storeDir) === Some(v2))
    assert(TrainPrep.pipe5FromStore(spark, d, storeDir).isEmpty)
  }

  test("replay of a doc accepted through a fully-CAPPED bucket is rejected by the manifest membership guard") {
    import spark.implicits._
    // a mass-near-duplicate store: cap+1 docs of IDENTICAL text, so
    // every one of their band buckets exceeds the cap — store_bands is
    // EMPTY for those buckets and the fuzzy gate has no stored
    // candidates. A batch doc with the same text is then accepted (the
    // cap is a documented performance guard that admits possibly-dup
    // docs — registry pipe3 semantics); what must NOT happen is the
    // same doc id re-entering on an at-least-once trigger REPLAY, which
    // only the manifest membership guard can prevent here.
    val cap = TrainPrep.pipe3MaxStoreBucket
    def words(prefix: String) =
      (1 to 12).map(i => s"$prefix$i").mkString(" ")
    val t = words("alpha")
    val storeDocs = spark.range(cap + 1L)
      .select((col("id") * 2L + 1L).as("doc_id"), lit(t).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("synth"))
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_adv_cap").toString
    TrainPrep.materializeStoreOver(spark, storeDocs, storeDocs, storeDir)
    assert(store(storeDir, "store_bands").isEmpty,
      "every bucket must be capped for this pin to bite")
    assert(!store(storeDir, "store_capped").isEmpty)

    val batch = Seq((900001L, t)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("synth"))
    val v1 = TrainPrep.advanceStoreOver(spark, batch, storeDir)
    assert(store(storeDir, "store_manifest")
      .filter(col("doc_id") === 900001L).count() === 1L)
    // the replay: same batch again — the gates cannot catch it (no
    // stored candidates), the membership guard must
    assert(TrainPrep.advanceStoreOver(spark, batch, storeDir) === v1)
    assert(store(storeDir, "store_manifest")
      .filter(col("doc_id") === 900001L).count() === 1L)
    assert(graft.sources.Snapshots.latestVersion(spark, storeDir) === Some(v1))
  }

  test("a forward-MIGRATED store still advances: the unknown manifest column fills as typed nulls for new rows") {
    import spark.implicits._
    // the engine-upgrade story: Snapshots.migrate adds a manifest
    // column (default for every existing row, all-Full chain cut);
    // an advance from an engine UNAWARE of the column must still
    // commit — the Append delta takes the stored schema, filling the
    // unknown column with typed nulls
    def words(prefix: String) =
      (1 to 12).map(i => s"$prefix$i").mkString(" ")
    val storeDocs = Seq((1L, words("gamma")), (2L, words("delta")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("synth"))
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_adv_mig").toString
    val v1 = TrainPrep.materializeStoreOver(spark, storeDocs, storeDocs,
      storeDir)
    val v2 = graft.sources.Snapshots.migrate(spark, storeDir,
      Map("store_manifest" -> Seq("lang" -> lit("und"))))
    assert(v2 > v1)
    val batch = Seq((17L, words("fresh"))).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("synth"))
    val v3 = TrainPrep.advanceStoreOver(spark, batch, storeDir)
    assert(v3 > v2)
    val man = store(storeDir, "store_manifest")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(man(1L) === Some("und") && man(2L) === Some("und"),
      "migrated rows keep their default")
    assert(man(17L) === None,
      "an unaware engine's new rows carry the typed null")
    // the advanced store still serves the from-store paths (the extra
    // column rides along, untouched): totals cover exactly the
    // manifest's shards
    assert(store(storeDir, "store_totals").select("shard").collect()
      .map(_.getLong(0)).toSet ===
      store(storeDir, "store_manifest").select("shard").collect()
        .map(_.getLong(0)).toSet)
    assert(TrainPrep.pipe3ManifestFromStoreOver(spark, batch, storeDir)
      .isEmpty, "replay after the advance must still gate out")
  }

  test("advanceBands cap algebra: carry, at-cap transition, capped-bucket swallow, untouched pass-through") {
    val cap = TrainPrep.pipe3MaxStoreBucket
    // bucket (0,111): stored exactly AT the cap — one batch row tips it
    //   over, so ALL cap+1 rows must drop and the bucket registers
    // bucket (0,222): 3 stored rows + 1 batch row = 4, stays kept
    // bucket (0,999): in the registry (no stored rows) — batch rows
    //   must be swallowed, registry entry survives
    // bucket (1,333): untouched by the batch — passes through verbatim
    val oldBands = spark.range(cap).select(col("id").as("doc_id"),
        lit(0).as("band"), lit(111L).as("key"))
      .unionByName(spark.range(3).select((col("id") + 1000L).as("doc_id"),
        lit(0).as("band"), lit(222L).as("key")))
      .unionByName(spark.range(5).select((col("id") + 2000L).as("doc_id"),
        lit(1).as("band"), lit(333L).as("key")))
    import spark.implicits._
    val oldCapped = Seq((0, 999L)).toDF("band", "key")
    val accBands = Seq(
      (9000L, 0, 111L), (9001L, 0, 999L), (9002L, 0, 999L), (9003L, 0, 222L))
      .toDF("doc_id", "band", "key")
    val (kept, capped) = TrainPrep.advanceBands(oldBands, oldCapped, accBands)
    val keptRows = kept.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[Long]("key"))).toSet
    assert(!keptRows.exists(_._3 == 111L), "the tipped bucket must drop wholesale")
    assert(!keptRows.exists(_._3 == 999L), "registry buckets swallow batch rows")
    assert(keptRows.count(_._3 == 222L) === 4)
    assert(keptRows.count(_._3 == 333L) === 5)
    val cappedRows = capped.collect()
      .map(r => (r.getAs[Int]("band"), r.getAs[Long]("key"))).toSet
    assert(cappedRows === Set((0, 999L), (0, 111L)))

    // the DELTA form advanceStore's layered commit uses must agree with
    // the total form on the same frames: overNew is exactly the tipped
    // bucket, accKept exactly the batch rows that survive both
    // registries (kept ≡ (old anti capped) ∪ accKept by construction)
    val (overNew, accKept) =
      TrainPrep.advanceBandsDelta(oldBands, oldCapped, accBands)
    assert(overNew.collect().map(r =>
      (r.getAs[Int]("band"), r.getAs[Long]("key"))).toSet === Set((0, 111L)))
    val accKeptRows = accKept.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("band"), r.getAs[Long]("key"))).toSet
    assert(accKeptRows === Set((9003L, 0, 222L)))
    assert(keptRows ===
      oldBands.join(capped, Seq("band", "key"), "left_anti").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
          r.getAs[Long]("key"))).toSet ++ accKeptRows)
  }

  test("conformTo: owed-migration drop is signalled, shared-column casts are lossless-or-loud, names resolve case-insensitively") {
    import spark.implicits._
    val stored = Seq((1L, "x", 0.5)).toDF("a", "b", "c").schema
    var drifts = Seq.empty[TrainPrep.SchemaDrift]
    // direction A (upgraded engine, unmigrated store): the delta's
    // extra column is dropped AND the owed migration is signalled
    val delta = Seq((1L, "y", 0.1, 7)).toDF("a", "b", "c", "extra")
    val out = TrainPrep.conformTo(delta, stored, "man", drifts :+= _)
    assert(out.columns.toSeq === Seq("a", "b", "c"))
    assert(drifts.map(d => (d.table, d.dropped, d.nullFilled)) ===
      Seq(("man", Seq("extra"), Nil)))
    // null-fill on an APPEND delta is designed behavior, NOT drift
    drifts = Nil
    val thin = Seq((2L, "z")).toDF("a", "b")
    val filled = TrainPrep.conformTo(thin, stored, "man", drifts :+= _)
    assert(filled.columns.toSeq === Seq("a", "b", "c") && drifts.isEmpty)
    assert(filled.collect().head.isNullAt(2))
    // ...but on a recomputed FULL it resets a migrated column: signalled
    TrainPrep.conformTo(thin, stored, "totals", drifts :+= _,
      fullRewrite = true)
    assert(drifts.map(d => (d.table, d.dropped, d.nullFilled)) ===
      Seq(("totals", Nil, Seq("c"))))
    // a case-variant shared column conforms instead of double-landing
    drifts = Nil
    val cased = TrainPrep.conformTo(
      Seq((3L, "w", 0.2)).toDF("A", "b", "c"), stored, "man", drifts :+= _)
    assert(cased.columns.toSeq === Seq("a", "b", "c") && drifts.isEmpty)
    // lossless type drift casts (int → long)...
    val up = TrainPrep.conformTo(
      Seq((4, "v", 0.3)).toDF("a", "b", "c"), stored, "man", drifts :+= _)
    assert(up.schema("a").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(up.collect().head.getLong(0) === 4L)
    // ...a lossy one is rejected, never silently truncated
    val narrow = Seq(("s", "u", 0.4)).toDF("a", "b", "c")
    val e = intercept[IllegalArgumentException] {
      TrainPrep.conformTo(narrow, stored, "man", drifts :+= _)
    }
    assert(e.getMessage.contains("not provably lossless"))
  }

  test("advanceStore on a migrated store: recomputed-Full tables keep the migrated column schema-stable and the drift is run-logged") {
    val d = sf("sf0.001")
    val storeDir = java.nio.file.Files.createTempDirectory("graft_advm").toString
    val logDir = java.nio.file.Files.createTempDirectory("graft_advm_log")
      .toString + "/run_log"
    TrainPrep.materializeStore(spark, d, storeDir)
    // an AWARE engine migrated store_totals forward; THIS engine's
    // advance recomputes totals without the column — pre-fix the
    // column silently vanished from the new version
    graft.sources.Snapshots.migrate(spark, storeDir,
      Map("store_totals" -> Seq("note" -> lit("migrated"))))
    val v = TrainPrep.advanceStore(spark, d, storeDir, Some(logDir))
    val totals = store(storeDir, "store_totals")
    assert(totals.columns.contains("note"),
      "the migrated column must survive the recomputed-Full rewrite")
    assert(totals.collect().forall(_.getAs[String]("note") == null),
      "an unaware engine can only null-fill it")
    val log = graft.sources.RunLog.read(spark, logDir)
      .filter(col("stage") === "schema_drift:store_totals").collect()
    assert(log.length === 1 && log.head.getAs[String]("status") === "warn")
    assert(log.head.getAs[String]("error").contains("note"))
    assert(graft.sources.Snapshots.latestVersion(spark, storeDir) === Some(v))
  }
}
