package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Takedown.executeChunks — erasure at the packed-training-chunk grain.
  * Seeds a maintained documents table, the nightly-prep store and the
  * trainer-read chunk table (a full shard-grain pack — what prior pipe5
  * runs accumulated), purges a takedown list spanning a heavy shard
  * tail (so trailing chunks VANISH), a mid-shard doc (so a prefix
  * survives untouched) and a never-packed held-out doc (partial-overlap
  * handling), then pins the three contracts of the r13 deferral:
  *  (a) the chunk table bit-equals a FROM-SCRATCH pack of the purged
  *      corpus (⇒ no emitted chunk contains any purged doc's tokens);
  *  (b) the rewritten store (manifest/totals/opens/bands/shingles)
  *      bit-equals a from-scratch materializeStore on the purged
  *      corpus;
  *  (c) untouched shards' parquet files are byte-identical (same file
  *      list — neither the trim nor the upsert rewrote them).
  */
class TakedownChunksSpec extends graft.SparkSpec {

  /** A full shard-grain pack of a store's manifest — what the chunk
    * table holds after every chunk of every prior run: shardChunksOf
    * with the emit floor at 0 for every shard.
    */
  private def fullPack(storeDir: String, docs: DataFrame): DataFrame = {
    val sman = spark.read.parquet(s"$storeDir/store_manifest.parquet")
    graft.operators.TrainPrep.shardChunksOf(
      sman.select(col("shard"), col("doc_id"), col("start_off"),
        col("n_tokens")).withColumn("open_start", lit(0L)),
      docs)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

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
    graft.operators.TrainPrep.materializeStore(spark, d, storeDir)
    Catalog.append(fullPack(storeDir, allDocs).repartition(col("shard")),
      chunksT, Seq("shard"))

    // takedown list: the token-heaviest shard's tail (trailing chunks
    // must vanish), a mid doc of another shard (prefix must survive),
    // and a held-out doc that was never packed
    val sman0 = spark.read.parquet(s"$storeDir/store_manifest.parquet")
    val t0 = spark.read.parquet(s"$storeDir/store_totals.parquet")
      .orderBy(col("tot0").desc).first()
    val (s0, tot0) = (t0.getAs[Long]("shard"), t0.getAs[Long]("tot0"))
    val tail0 = sman0.filter(col("shard") === s0 &&
        col("start_off") >= lit(tot0 / 2L))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(tail0.nonEmpty)
    val s1 = spark.read.parquet(s"$storeDir/store_totals.parquet")
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

    // (a)+(b): from-scratch reference on the purged corpus
    val store2 = java.nio.file.Files.createTempDirectory("graft_tc_ref").toString
    val purgedDocs = allDocs.filter(!col("doc_id").isin(doomed: _*))
    graft.operators.TrainPrep.materializeStoreFrom(spark, purgedDocs, store2)
    val ref = fullPack(store2, purgedDocs)
    // the catalog table reorders the partition column last — align
    assert(rows(spark.table(chunksT).select(ref.columns.map(col): _*))
      === rows(ref))
    for (t <- Seq("store_manifest", "store_totals", "store_opens",
        "store_bands", "store_shingles"))
      assert(rows(spark.read.parquet(s"$storeDir/$t.parquet"))
        === rows(spark.read.parquet(s"$store2/$t.parquet")), t)

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
    // nothing left to erase (the store already reflects the purge)
    val r2 = Takedown.executeChunks(spark, doomed, docsT, storeDir,
      chunksT, runLog, ts)
    assert(r2 === Takedown.ChunksResult(0L, 0L, 0L, 0L))

    // the compliance evidence table over the pack-store layers
    val ver = Takedown.verifyErasure(spark, doomed,
      docsTable = Some(docsT), storeDir = Some(storeDir)).collect()
    assert(ver.map(_.getAs[String]("layer")).toSet ===
      Set("documents", "store_manifest", "store_bands", "store_shingles"))
    assert(ver.forall(_.getAs[Boolean]("clean")),
      ver.filterNot(_.getAs[Boolean]("clean")).mkString(","))
  }
}
