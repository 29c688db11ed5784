package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** TrainPrep.advanceRagStore — the serving-side incremental advance of
  * the published RAG index: new docs' chunks assigned to the PINNED
  * stored centroids and Append-committed, so the from-store serving
  * path retrieves them between nightly rebuilds. Pins the honest
  * contract: advances compose associatively, a pinned pre-advance
  * version serves bit-identically afterwards, the advanced latest
  * retrieves the new docs, a replayed batch commits nothing (chunklens
  * membership guard), the commit itself is delta-sized, and the nightly
  * REBUILD stays the retrain/chain-cut (all-Full, vacuum then reclaims
  * the advance history).
  */
class AdvanceRagStoreSpec extends graft.SparkSpec {

  private def rows(root: String, t: String): Set[Seq[Any]] =
    Snapshots.readTable(spark, root, t).collect().map(_.toSeq).toSet

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("source", lit("synth"))
  }

  // a doc that MUST rank for search6's fixed query terms: 80 tokens of
  // "hash join scan ..." → a full 64-token chunk saturated in all three
  private val hot = (9000001L,
    (1 to 27).map(_ => "hash join scan").mkString(" "))
  private val mild = (9000002L,
    (1 to 80).map(i => s"filler$i").mkString(" "))

  test("advance serves new docs at latest, pins the old version, composes associatively, replays to a no-op; rebuild cuts the chain") {
    val d = sf("sf0.001")
    val rootA = java.nio.file.Files.createTempDirectory("graft_raga").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft_ragb").toString
    val v1a = TrainPrep.publishRagStore(spark, d, rootA)
    TrainPrep.publishRagStore(spark, d, rootB)
    val want6v1 = TextOps.search6FromStore(spark, rootA, Some(v1a))
      .collect().map(_.toSeq).toSeq
    assert(want6v1.nonEmpty)
    assert(!want6v1.exists(_.contains(hot._1)))

    // A: two advances; B: one advance of the union — all six tables equal
    val v2a = TrainPrep.advanceRagStore(spark, docsDf(Seq(hot)), rootA)
    val v3a = TrainPrep.advanceRagStore(spark, docsDf(Seq(mild)), rootA)
    assert(v1a < v2a && v2a < v3a)
    TrainPrep.advanceRagStore(spark, docsDf(Seq(hot, mild)), rootB)
    for (t <- Seq("vecs", "cent", "index", "postings", "chunklens", "stats"))
      assert(rows(rootA, t) === rows(rootB, t), t)

    // serving: the advanced latest retrieves the hot doc's chunks...
    val latest6 = TextOps.search6FromStore(spark, rootA)
      .collect().map(_.toSeq).toSeq
    assert(latest6.exists(_.contains(hot._1)),
      "a doc saturated in the query terms must surface after the advance")
    // ... while the PINNED pre-advance version reproduces exactly
    assert(TextOps.search6FromStore(spark, rootA, Some(v1a))
      .collect().map(_.toSeq).toSeq === want6v1)

    // the commit was delta-sized: data tables appended over v1, the
    // centroids carried with zero data of their own
    def baseOf(v: Long, t: String): Boolean =
      new java.io.File(s"$rootA/_v=$v/$t/_base").exists()
    for (t <- Seq("vecs", "index", "postings", "chunklens"))
      assert(baseOf(v2a, t), s"$t must append over the pinned version")
    assert(baseOf(v2a, "cent") && !new java.io.File(s"$rootA/_v=$v2a/cent")
      .listFiles().exists(_.getName.endsWith(".parquet")))
    // the stats fold is exact: one row, totals = old + delta
    val st = Snapshots.readTable(spark, rootA, "stats").collect()
    assert(st.length === 1)
    val dlAll = Snapshots.readTable(spark, rootA, "chunklens")
    assert(st(0).getAs[Long]("n") === dlAll.count())
    assert(st(0).getAs[Long]("tt") ===
      dlAll.agg(sum("dl")).first().getLong(0))

    // replay: both docs already in chunklens ⇒ membership guard drops
    // the whole batch, nothing commits
    assert(TrainPrep.advanceRagStore(spark, docsDf(Seq(hot, mild)), rootA) === v3a)
    assert(Snapshots.latestVersion(spark, rootA) === Some(v3a))

    // the nightly REBUILD is the retrain AND the chain cut: it commits
    // all-Full (references nothing), so the next vacuum reclaims the
    // advance history while the store keeps serving the grown corpus
    val d2 = java.nio.file.Files.createTempDirectory("graft_ragc2").toString
    graft.Tables.documents(spark, d)
      .select("doc_id", "text", "n_chars", "source")
      .unionByName(docsDf(Seq(hot, mild)))
      .write.parquet(s"$d2/documents.parquet")
    val v4a = TrainPrep.publishRagStore(spark, d2, rootA)
    for (t <- Seq("vecs", "cent", "index", "postings", "chunklens", "stats"))
      assert(!baseOf(v4a, t), s"rebuild must be self-contained: $t")
    assert(Snapshots.vacuum(spark, rootA, keep = 1) === Seq(v1a, v2a, v3a))
    assert(TextOps.search6FromStore(spark, rootA)
      .collect().map(_.toSeq).exists(_.contains(hot._1)))

    // TAKEDOWN + RESURRECTION pin: republish WITHOUT the hot doc and
    // with its id tombstoned (Takedown.execute's republish form) — an
    // at-least-once replay re-delivering the erased doc must be
    // refused by the advance's tombstone guard (the membership guard
    // cannot catch it: the id is absent from the purged chunklens),
    // while a genuinely new doc in the same batch still advances; the
    // evidence table's rag_tombstone_coverage layer reads clean
    val d3 = java.nio.file.Files.createTempDirectory("graft_ragc3").toString
    graft.Tables.documents(spark, d)
      .select("doc_id", "text", "n_chars", "source")
      .unionByName(docsDf(Seq(mild)))
      .write.parquet(s"$d3/documents.parquet")
    val v5a = TrainPrep.publishRagStore(spark, d3, rootA) // purged corpus...
    // ...but publishRagStore has no tombstone arg — write the takedown
    // form directly over it
    val v6a = TrainPrep.publishRagStoreFrom(spark,
      graft.Tables.documents(spark, d3), rootA, addTombstones = Seq(hot._1))
    assert(v6a > v5a)
    val fresh2 = (9000003L, (1 to 80).map(i => s"novel$i").mkString(" "))
    val v7a = TrainPrep.advanceRagStore(spark, docsDf(Seq(hot, fresh2)), rootA)
    assert(v7a > v6a)
    val served = Snapshots.readTable(spark, rootA, "chunklens")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!served.contains(hot._1),
      "a tombstoned id must never re-enter via an advance replay")
    assert(served.contains(fresh2._1), "the guard must be surgical")
    val ver = graft.sources.Takedown.verifyErasure(spark, Seq(hot._1),
      ragRoot = Some(rootA)).collect()
    assert(ver.map(_.getAs[String]("layer")).contains("rag_tombstone_coverage"))
    assert(ver.forall(_.getAs[Boolean]("clean")),
      ver.filterNot(_.getAs[Boolean]("clean")).mkString(","))
  }

  test("a forward-MIGRATED RAG store still advances: Append deltas conform to the stored schema") {
    val d = sf("sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_ragmig").toString
    val v1 = TrainPrep.publishRagStoreFrom(spark,
      graft.Tables.documents(spark, d), root)
    // the upgrade adds a provenance column to chunklens and postings
    val v2 = Snapshots.migrate(spark, root, Map(
      "chunklens" -> Seq("lang" -> lit("und")),
      "postings" -> Seq("lang" -> lit("und"))))
    assert(v2 > v1)
    // an engine UNAWARE of the column advances: typed nulls for its rows
    val v3 = TrainPrep.advanceRagStore(spark, docsDf(Seq(mild)), root)
    assert(v3 > v2)
    val byDoc = Snapshots.readTable(spark, root, "chunklens")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byDoc(mild._1) === None, "unaware engine's rows carry typed null")
    assert(byDoc.filter(_._1 != mild._1).values.toSet === Set(Some("und")),
      "migrated rows keep their default")
    assert(Snapshots.readTable(spark, root, "postings")
      .columns.contains("lang"))
    // replay still a no-op against the migrated+advanced store
    assert(TrainPrep.advanceRagStore(spark, docsDf(Seq(mild)), root) === v3)
  }

  test("streaming twin: one trigger advances the RAG store; a replayed trigger commits nothing") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val base = docsDf(Seq(
      (1L, (1 to 80).map(i => s"alpha$i").mkString(" ")),
      (2L, (1 to 80).map(i => s"beta$i").mkString(" "))))
    val root = java.nio.file.Files.createTempDirectory("graft_ragstr").toString
    val v1 = TrainPrep.publishRagStoreFrom(spark, base, root)
    val inDir = java.nio.file.Files.createTempDirectory("graft_ragin").toString
    docsDf(Seq(hot)).coalesce(1).write.mode("append").parquet(inDir)
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("n_chars", LongType).add("source", StringType)
    def activate(ck: String): Unit = {
      val q = graft.streaming.Streams.streamingRagAdvance(
        spark.readStream.schema(schema).parquet(inDir), root, ck).start()
      q.awaitTermination(120000)
    }
    activate(java.nio.file.Files.createTempDirectory("graft_ragck").toString)
    val v2 = Snapshots.latestVersion(spark, root).get
    assert(v2 > v1)
    assert(Snapshots.readTable(spark, root, "chunklens")
      .filter(col("doc_id") === hot._1).count() > 0L)
    // fresh checkpoint re-delivers the file; the membership guard makes
    // the at-least-once sink idempotent
    activate(java.nio.file.Files.createTempDirectory("graft_ragck2").toString)
    assert(Snapshots.latestVersion(spark, root) === Some(v2))
  }
}
